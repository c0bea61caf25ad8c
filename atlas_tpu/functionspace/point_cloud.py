"""PointCloud function space (reference: atlas functionspace/PointCloud.h:46-76).

Arbitrary point sets; serves as an interpolation source/target and supports
fields without connectivity. With a grid + partitioner/distribution (or an
explicit partition array) it becomes DISTRIBUTED: each part owns its points
and carries ghost copies of every point within `halo_radius` radians of an
owned point (reference builds halos for arbitrary point sets the same way —
src/tests/functionspace/test_pointcloud_halo_creation.cc), with partition /
global_index / remote_index fields and a static ppermute halo-exchange
schedule (parallel/halo.py) for the device path.
"""

from __future__ import annotations

import numpy as np

from ..field import Field
from .base import FunctionSpace


class PointCloud(FunctionSpace):
    def __init__(self, lonlat: np.ndarray, levels: int | None = None,
                 distribution=None, partitioner=None, nb_parts: int | None = None,
                 halo_radius: float = 0.0):
        grid = lonlat if hasattr(lonlat, "lonlat") else None
        if grid is not None:
            lonlat = grid.lonlat()
        self._lonlat = np.asarray(lonlat, dtype=np.float64).reshape(-1, 2)
        self.levels = levels
        self.distribution = None
        self.halo_radius = float(halo_radius)
        if distribution is not None or partitioner is not None:
            if distribution is None:
                from ..partition import Partitioner
                from ..partition.distribution import Distribution

                if isinstance(partitioner, str):
                    partitioner = Partitioner(partitioner, nb_parts=nb_parts or 1)
                if grid is not None:
                    part = partitioner.partition(grid)
                else:
                    part = partitioner.partition(_CloudAsGrid(self._lonlat))
                distribution = _ArrayDistribution(part, partitioner.nb_parts)
            self.distribution = distribution
            self._build_halos()

    # ------------------------------------------------------------------ setup
    def _build_halos(self):
        from ..parallel.halo import build_halo_schedule
        from ..util.kdtree import IndexKDTree

        part = np.asarray(self.distribution.partition)
        nparts = self.distribution.nb_parts
        self.nb_parts = nparts
        n = self.size

        owned_lists = [np.flatnonzero(part == p) for p in range(nparts)]
        self.nb_owned = np.array([len(o) for o in owned_lists])

        ghosts = [np.empty(0, np.int64)] * nparts
        if self.halo_radius > 0:
            tree = IndexKDTree(self._lonlat)
            for p in range(nparts):
                if not len(owned_lists[p]):
                    continue
                near = tree.closest_points_within_radius(
                    self._lonlat[owned_lists[p]], self.halo_radius)
                cand = np.unique(np.concatenate([np.asarray(x) for x in near]))
                ghosts[p] = cand[part[cand] != p].astype(np.int64)

        # local layout per part: owned first (point order), then ghosts;
        # padded to a common nloc + 1 dummy row
        tables = [np.concatenate([owned_lists[p], ghosts[p]]) for p in range(nparts)]
        nloc = max(len(t) for t in tables) + 1
        self.nloc = nloc
        self.dummy = nloc - 1
        self.local_tables = tables

        owner_local = np.full(n, -1, np.int64)
        for p in range(nparts):
            owner_local[owned_lists[p]] = np.arange(len(owned_lists[p]))
        self._owner_local = owner_local

        gp, gl, sp, sl = [], [], [], []
        for p in range(nparts):
            gh = ghosts[p]
            gp.append(np.full(len(gh), p, np.int64))
            gl.append(np.arange(len(owned_lists[p]),
                                len(owned_lists[p]) + len(gh)))
            sp.append(part[gh].astype(np.int64))
            sl.append(owner_local[gh])
        self.schedule = build_halo_schedule(
            np.concatenate(gp), np.concatenate(gl),
            np.concatenate(sp), np.concatenate(sl), nparts, self.dummy)

        # per-part parallel fields (reference: ghost/partition/remote_index
        # fields on the PointCloud)
        self.ghost = np.zeros((nparts, nloc), bool)
        self.partition = np.full((nparts, nloc), -1, np.int32)
        self.global_index = np.full((nparts, nloc), -1, np.int64)
        self.remote_index = np.full((nparts, nloc), -1, np.int64)
        for p, t in enumerate(tables):
            self.ghost[p, len(owned_lists[p]): len(t)] = True
            self.partition[p, : len(t)] = part[t]
            self.global_index[p, : len(t)] = t
            self.remote_index[p, : len(t)] = owner_local[t]

    @property
    def size(self) -> int:
        return len(self._lonlat)

    def lonlat(self) -> np.ndarray:
        return self._lonlat

    # -------------------------------------------------------------- dist ops
    def scatter(self, f_global: np.ndarray) -> np.ndarray:
        """(size, ...) -> (nparts, nloc, ...), owned slots filled."""
        self._require_dist()
        tail = f_global.shape[1:]
        out = np.zeros((self.nb_parts, self.nloc) + tail, f_global.dtype)
        for p, t in enumerate(self.local_tables):
            nown = self.nb_owned[p]
            out[p, :nown] = f_global[t[:nown]]
        return out

    def gather(self, f_local: np.ndarray) -> np.ndarray:
        self._require_dist()
        f_local = np.asarray(f_local)
        tail = f_local.shape[2:]
        out = np.zeros((self.size,) + tail, f_local.dtype)
        for p, t in enumerate(self.local_tables):
            nown = self.nb_owned[p]
            out[t[:nown]] = f_local[p, :nown]
        return out

    def halo_exchange(self, data, axis_name=None, mesh=None):
        """Serial no-op without a distribution; otherwise fill ghost slots."""
        if self.distribution is None:
            return data
        if isinstance(data, np.ndarray):
            out = data.copy()
            part = np.asarray(self.distribution.partition)
            for p, t in enumerate(self.local_tables):
                gh = t[self.nb_owned[p]: len(t)]
                rows = np.arange(self.nb_owned[p], len(t))
                out[p, rows] = data[part[gh], self._owner_local[gh]]
            return out
        return self._device_halo_exchange(data, axis_name, mesh)

    def _device_halo_exchange(self, f_local, axis_name, mesh):
        from functools import partial

        import jax
        from jax.sharding import Mesh, PartitionSpec as P

        from ..parallel.halo import apply_schedule

        ax = axis_name or "pc"
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()[: self.nb_parts]), (ax,))
        sched = self.schedule

        @partial(jax.shard_map, mesh=mesh, in_specs=P(ax), out_specs=P(ax))
        def run(f):
            return apply_schedule(sched, f[0], ax)[None]

        return run(f_local)

    def _require_dist(self):
        if self.distribution is None:
            raise ValueError("PointCloud was built without a distribution")

    def __repr__(self):
        extra = ""
        if self.distribution is not None:
            extra = f", nb_parts={self.nb_parts}, halo_radius={self.halo_radius}"
        return f"PointCloud(size={self.size}{extra})"


class _CloudAsGrid:
    """Duck-typed grid facade so grid partitioners accept raw point sets."""

    def __init__(self, lonlat):
        self._ll = lonlat
        self.size = len(lonlat)

    def lonlat(self):
        return self._ll


class _ArrayDistribution:
    def __init__(self, partition, nb_parts):
        self.partition = np.asarray(partition, np.int32)
        self.nb_parts = int(nb_parts)
