"""Scoped timers with nested call-stack aggregation (reference: atlas
runtime/Trace.h:94-96, runtime/trace/TraceT.h:39, Timings.h:31-45).

ATLAS_TRACE-style usage:

    with Trace("build_mesh"):
        with Trace("edges"):
            ...
    print(trace_report())

Timings aggregate by the nested title path; ATLAS_TPU_TRACE_BARRIERS=1 inserts
jax.block_until_ready-style device syncs around traced regions so device time
is attributed to the right scope (the reference's ATLAS_TRACE_BARRIERS inserts
MPI barriers, library/Library.cc:169).
"""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List


@dataclass
class _Node:
    count: int = 0
    total: float = 0.0
    min: float = float("inf")
    max: float = 0.0

    def update(self, dt: float):
        self.count += 1
        self.total += dt
        self.min = min(self.min, dt)
        self.max = max(self.max, dt)


_local = threading.local()
_registry: Dict[tuple, _Node] = {}
_lock = threading.Lock()


def _stack() -> List[str]:
    if not hasattr(_local, "stack"):
        _local.stack = []
    return _local.stack


def _barriers_enabled() -> bool:
    return os.environ.get("ATLAS_TPU_TRACE_BARRIERS", "0") not in ("0", "", "false")


def _device_sync():
    try:
        import jax

        (jax.device_put(0.0) + 0).block_until_ready()
    except Exception:
        pass


class Trace:
    def __init__(self, title: str, labels: tuple = ()):
        self.title = title
        self.labels = labels
        self._t0 = None
        self.elapsed = 0.0

    def __enter__(self):
        if _barriers_enabled():
            _device_sync()
        _stack().append(self.title)
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if _barriers_enabled():
            _device_sync()
        self.elapsed = time.perf_counter() - self._t0
        path = tuple(_stack())
        _stack().pop()
        with _lock:
            _registry.setdefault(path, _Node()).update(self.elapsed)
        return False

    def stop(self):
        self.__exit__()


def trace_reset():
    with _lock:
        _registry.clear()


def trace_report(exclude: tuple = (), indent: int = 2) -> str:
    """Aggregated nested timing report (reference Trace::report)."""
    with _lock:
        items = sorted(_registry.items())
    lines = [f"{'timers':<50} {'count':>7} {'total[s]':>10} {'min[s]':>10} {'max[s]':>10}"]
    for path, node in items:
        name = " " * indent * (len(path) - 1) + path[-1]
        if any(x in "/".join(path) for x in exclude):
            continue
        lines.append(
            f"{name:<50} {node.count:>7} {node.total:>10.4f} {node.min:>10.4f} {node.max:>10.4f}"
        )
    return "\n".join(lines)
