"""Worker for the 2-process multi-host test (spawned by test_multihost.py).

Each process is one "host" with 4 virtual CPU devices; jax.distributed
connects them (CPU cross-process collectives ride gloo), giving a global
8-device mesh laid out (dcn=2 hosts, ici=4 per host). The sharded SWE step
must match the serial model on every owned row — the TPU-native analog of
the reference's MPI-rank tests (src/tests/mesh/CMakeLists.txt:52-140).
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from atlas_tpu.parallel.multihost import (host_aware_mesh,
                                              initialize_distributed)

    initialize_distributed(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc

    from atlas_tpu import Grid
    from atlas_tpu.model import ShallowWaterModel
    from atlas_tpu.model.sharded_swe import ShardedShallowWater

    grid = Grid("O32")
    mesh = host_aware_mesh()  # (dcn=2, ici=4)
    assert mesh.devices.shape == (nproc, 4)
    serial = ShallowWaterModel(grid, dtype=np.float32)
    sh = ShardedShallowWater(grid, nparts=8, dtype=np.float32, mesh=mesh)

    s0 = serial.initial_state_williamson2()
    dt = serial.suggested_dt()
    s_sh = sh.scatter_state({k: np.asarray(v) for k, v in s0.items()})
    out = sh.step(s_sh, dt)
    ref = serial.step(s0, dt)

    # multi-host: only this process's shards are addressable — compare them
    s = serial.sfvm.shifts
    scale = {k: max(float(np.abs(np.asarray(ref[k])).max()),
                    np.sqrt(9.80616 * 3000.0)) for k in ("h", "u", "v")}
    checked = 0
    for k in ("h", "u", "v"):
        refk = np.asarray(ref[k])[0]
        for shard in out[k].addressable_shards:
            p = shard.index[0].start or 0
            lo, hi = sh.starts[p], sh.starts[p + 1]
            blk = np.asarray(shard.data)[0]
            m = s.mask[lo:hi].astype(bool)
            err = np.abs(blk[: hi - lo, : s.nxw][m] - refk[lo:hi][m]).max()
            assert err / scale[k] < 1e-5, (k, p, err)
            checked += 1
    assert checked >= 3 * 4  # 4 local shards x 3 fields per process
    print(f"MULTIHOST-OK pid={pid} shards_checked={checked}", flush=True)


if __name__ == "__main__":
    main()
