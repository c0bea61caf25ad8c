"""Multi-host scaffolding: jax.distributed init + host-aware device meshes.

Reference context: the reference scales across nodes with MPI ranks
(parallel/mpi/mpi.h); the TPU-native equivalent is multi-host SPMD — one
process per host, `jax.distributed.initialize`, and a `jax.sharding.Mesh`
laid out so that the FAST (inner) mesh axis maps to intra-host ICI links and
the slow axis to the cross-host DCN (SURVEY 5.8, "DCN handled transparently
by multi-host pjit"). Single-host runs (including the virtual-CPU test mesh)
degenerate to a (1, ndevices) layout.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh

_initialized = False


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Initialize jax.distributed from args or standard env vars.

    Env fallbacks: ATLAS_TPU_COORDINATOR, ATLAS_TPU_NUM_PROCESSES,
    ATLAS_TPU_PROCESS_ID (matching the reference's mpirun-provided rank
    model). No-op when single-process (nothing configured) or already
    initialized.
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "ATLAS_TPU_COORDINATOR")
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["ATLAS_TPU_NUM_PROCESSES"])
        if "ATLAS_TPU_NUM_PROCESSES" in os.environ else None)
    process_id = process_id if process_id is not None else (
        int(os.environ["ATLAS_TPU_PROCESS_ID"])
        if "ATLAS_TPU_PROCESS_ID" in os.environ else None)
    if coordinator_address is None and num_processes in (None, 1):
        return  # single process: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def host_aware_mesh(axis_names: tuple[str, str] = ("dcn", "ici"),
                    devices=None) -> Mesh:
    """(nhosts, ndevices_per_host) mesh with hosts on the OUTER axis.

    Collectives along the inner axis stay on ICI; only the outer axis
    crosses DCN — the layout the >= 90% weak-scaling target requires
    (SURVEY section 7, multi-host). Works unchanged on one host.
    """
    devs = list(devices if devices is not None else jax.devices())
    devs.sort(key=lambda d: (d.process_index, d.id))
    hosts = sorted({d.process_index for d in devs})
    per_host = len(devs) // max(len(hosts), 1)
    if per_host * len(hosts) != len(devs):
        raise ValueError("uneven devices per host; pass devices explicitly")
    arr = np.array(devs, dtype=object).reshape(len(hosts), per_host)
    return Mesh(arr, axis_names)


def flat_mesh(axis: str = "sp", devices=None) -> Mesh:
    """1-D mesh over all devices, host-major order (band decompositions:
    neighboring bands on the same host exchange halos over ICI; only the
    two bands at each host boundary cross DCN)."""
    devs = list(devices if devices is not None else jax.devices())
    devs.sort(key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (axis,))
