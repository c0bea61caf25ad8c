"""Multi-host execution: 2 real processes via jax.distributed (CPU + gloo).

The reference runs every distributed test under real MPI at 2-8 ranks
(src/tests/mesh/CMakeLists.txt:52-140); here the TPU-native equivalent is
two jax processes joined by jax.distributed.initialize, a host-aware
(dcn, ici) mesh from parallel/multihost.py, and the band-sharded shallow
water stepped across the process boundary.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device count
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return procs, outs


def test_two_process_sharded_swe_matches_serial():
    # one retry: under a fully loaded CI host the two extra jax processes
    # can hit gloo coordination timeouts (contention flake, not a product
    # failure — the run is deterministic when it starts cleanly)
    for attempt in (0, 1):
        procs, outs = _run_workers()
        if all(p.returncode == 0 for p in procs):
            break
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST-OK pid={pid}" in out, out[-3000:]
