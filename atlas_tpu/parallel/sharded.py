"""Sharded fvm: domain-decomposed Nabla operators over a jax device mesh.

Reference behavior: the combination of atlas's partitioned NodeColumns +
HaloExchange + fvm::Nabla (SURVEY.md sections 2.6-2.8): each MPI rank owns a
subdomain's nodes, keeps ghost copies of the neighbour ring, halo-exchanges
field values, then runs the identical edge/node loops locally.

TPU design: ONE host builds the global geometry, partitions the nodes, and
stacks per-shard padded local geometry into (nparts, ...) arrays laid out over
a `jax.sharding.Mesh` axis. The operators run under `shard_map`; the halo
exchange is a static `ppermute` schedule (parallel/halo.py). Results on owned
rows are bit-identical to the serial operators because each shard executes the
same per-node accumulation over the same (replicated) incident edges.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fvm.method import FvmMethod
from ..partition import Partitioner
from ..util.constants import DEG2RAD
from .halo import build_halo_schedule, apply_schedule


@dataclass
class _ShardGeom:
    """Stacked per-shard geometry; all arrays lead with the nparts axis."""

    nparts: int
    nloc: int  # local rows incl. ghosts + 1 dummy
    nown_max: int
    e0: np.ndarray  # (nparts, emax) local edge endpoint 0
    e1: np.ndarray
    S: np.ndarray  # (nparts, emax, 2)
    pole_mask: np.ndarray  # (nparts, emax)
    inc_node: np.ndarray  # (nparts, imax)
    inc_edge: np.ndarray
    inc_sign: np.ndarray
    metric_x: np.ndarray  # (nparts, nloc)
    metric_y: np.ndarray
    cos_lat: np.ndarray
    lat: np.ndarray
    pole_n2: np.ndarray  # (nparts, pmax) local node for pole corr (dummy pad)
    pole_eid: np.ndarray  # (nparts, pmax) local edge id (0 pad, sign via mask)
    pole_valid: np.ndarray  # (nparts, pmax) float mask


class ShardedFvm:
    """Domain-decomposed fvm operators.

    Fields are carried as (nparts, nown_max) owned blocks (padded); the class
    scatters them into (nparts, nloc) local blocks with ghost rows, runs the
    kernels under shard_map, and returns owned blocks.
    """

    def __init__(
        self,
        grid,
        nparts: int,
        partitioner: str = "equal_regions",
        mesh: Optional[Mesh] = None,
        axis_name: str = "shard",
        halo: int = 1,
    ):
        """halo >= 2 grows the ghost region by k rings (reference
        mesh/actions/BuildHalo.cc:1372 iterative growth) so operators can be
        evaluated at rings <= halo-1 without re-exchanging — e.g. `laplacian`
        (div of grad) runs with ONE exchange when halo >= 2, matching the
        reference's halo-2 avoidance of a mid-operator exchange."""
        self.grid = grid
        self.nparts = int(nparts)
        self.axis_name = axis_name
        self.halo = int(halo)
        self.method = FvmMethod(grid)
        self.part = Partitioner(partitioner, nb_parts=nparts).partition(grid)
        self._build_local()
        if mesh is None:
            devices = np.array(jax.devices()[: self.nparts])
            if len(devices) < self.nparts:
                raise ValueError(
                    f"need {self.nparts} devices, have {len(jax.devices())}"
                )
            mesh = Mesh(devices, (axis_name,))
        self.mesh = mesh
        self._sharding = NamedSharding(mesh, P(axis_name))
        self._geom_dev = None

    # ------------------------------------------------------------------ setup
    def _build_local(self):
        g = self.method.geometry
        m = self.method.mesh
        nparts = self.nparts
        nn = m.nb_nodes
        global_index = m.nodes.global_index  # grid index of every mesh node

        # --- representative (periodic-folded) space --------------------------
        # Mesh ghost nodes are periodic x+360 copies with INCOMPLETE incidence
        # (only the zipper strip's edges). Operators must never be evaluated
        # at them, so everything here lives in "rep" space: each ghost folds
        # onto its owner grid node, whose union of incidence (its own entries
        # + its copies') is complete. Seam edges then appear multiple times;
        # they are deduped to one canonical copy, with contribution signs
        # flipped where a copy's dual normal is the canonical one reversed.
        rep = np.where(m.nodes.ghost, global_index, np.arange(nn))
        en_m = g.edge_nodes  # (nedges_mesh, 2) mesh node ids
        er = rep[en_m]
        ekey = np.minimum(er[:, 0], er[:, 1]) * nn + np.maximum(er[:, 0], er[:, 1])
        uniq, canon_first, inv = np.unique(
            ekey, return_index=True, return_inverse=True)
        edge_canon = canon_first[inv]  # mesh edge -> canonical mesh edge id
        keep_edges = canon_first  # canonical copies, in first-seen order
        canon_id = np.full(g.nedges, -1, np.int64)
        canon_id[keep_edges] = np.arange(len(keep_edges))
        S_all = m.fields["dual_normals"]
        # orientation of each copy vs its canonical copy
        flip = np.sign(
            np.einsum("ij,ij->i", S_all, S_all[edge_canon])
        )
        flip[flip == 0] = 1.0

        en = er[keep_edges]  # canonical edges, rep endpoints
        S = S_all[keep_edges]
        pole_mask_g = g.pole_mask[keep_edges]
        nedges = len(en)

        # incidence in rep space: map receivers to owners, edges to canonical
        # copies (sign-adjusted), drop duplicate (node, edge) contributions
        inc_n_r = rep[g.inc_node]
        inc_e_r = canon_id[edge_canon[g.inc_edge]]
        inc_s_r = g.inc_sign * flip[g.inc_edge]
        ikey = inc_n_r * nedges + inc_e_r
        _, first = np.unique(ikey, return_index=True)
        inc_node_g = inc_n_r[first]
        inc_edge_g = inc_e_r[first]
        inc_sign_g = inc_s_r[first]

        pe_r = canon_id[edge_canon[g.pole_edge_ids]]
        pole_edge_ids = np.unique(pe_r)

        node_part = self.part[global_index]
        is_phys = ~m.nodes.ghost

        # --- owned node lists per part (rep node ids, grid order) -----------
        owned_ids = [
            np.flatnonzero(is_phys & (node_part == p)) for p in range(nparts)
        ]
        self.nown = np.array([len(o) for o in owned_ids])
        nown_max = int(self.nown.max())
        self.owned_ids = owned_ids

        # --- halo-k ring growth over the rep node adjacency -----------------
        # (reference BuildHalo.cc:1184 iterative interior growth, done as k
        # sparse mat-vec sweeps over ALL parts at once — no per-part isin)
        from scipy import sparse

        A = sparse.csr_matrix(
            (np.ones(2 * nedges, np.int8),
             (np.r_[en[:, 0], en[:, 1]], np.r_[en[:, 1], en[:, 0]])),
            shape=(nn, nn),
        )
        owned_mat = np.zeros((nparts, nn), bool)
        owned_mat[node_part[is_phys], np.flatnonzero(is_phys)] = True
        members = owned_mat.copy()
        front = owned_mat
        for _ in range(self.halo):
            nxt = np.asarray(front @ A) > 0
            nxt &= ~members
            members |= nxt
            front = nxt
        # evaluation set: nodes where operators are computed locally
        eval_mask = owned_mat.copy()
        front = owned_mat
        for _ in range(self.halo - 1):
            nxt = np.asarray(front @ A) > 0
            nxt &= ~eval_mask
            eval_mask |= nxt
            front = nxt

        # --- edges per part: incident to an evaluation node -----------------
        e_inc = eval_mask[:, en[:, 0]] | eval_mask[:, en[:, 1]]  # (nparts, ne)
        edge_sets = [np.flatnonzero(e_inc[p]) for p in range(nparts)]
        emax = max(len(e) for e in edge_sets)

        # --- local node tables: owned first, then ghost rings ---------------
        local_tables = []
        nloc_counts = []
        for p in range(nparts):
            ref = np.zeros(nn, bool)
            ref[en[edge_sets[p]].ravel()] = True
            ref |= members[p]
            ref &= ~owned_mat[p]
            ghosts = np.flatnonzero(ref)
            table = np.concatenate([owned_ids[p], ghosts])
            local_tables.append(table)
            nloc_counts.append(len(table))
        nloc = max(nloc_counts) + 1  # +1 dummy row
        self.nloc = nloc
        self.nown_max = nown_max
        self.local_tables = local_tables
        self._eval_mask = eval_mask

        # mesh-node -> (part, local) lookup for owners
        owner_local = np.full(m.nb_nodes, -1, dtype=np.int64)
        for p in range(nparts):
            owner_local[owned_ids[p]] = np.arange(len(owned_ids[p]))

        # local index of each mesh node on part p
        local_of = []
        for p in range(nparts):
            lut = np.full(m.nb_nodes, nloc - 1, dtype=np.int64)  # dummy
            lut[local_tables[p]] = np.arange(len(local_tables[p]))
            local_of.append(lut)
        self.local_of = local_of

        # ghost descriptors: ghosts are physical nodes owned elsewhere; the
        # value source is the owner part's local row of the same node
        gp, gl, sp, sl = [], [], [], []
        for p in range(nparts):
            table = local_tables[p]
            ghosts = table[len(owned_ids[p]) :]
            q = node_part[ghosts]
            gp.append(np.full(len(ghosts), p))
            gl.append(np.arange(len(owned_ids[p]), len(table)))
            sp.append(q)
            sl.append(owner_local[ghosts])
        ghost_part = np.concatenate(gp)
        ghost_local = np.concatenate(gl)
        src_part = np.concatenate(sp)
        src_local = np.concatenate(sl)
        assert (src_local >= 0).all()
        self.schedule = build_halo_schedule(
            ghost_part, ghost_local, src_part, src_local, nparts, nloc - 1
        )

        # --- stacked local geometry ----------------------------------------
        lat_rad = m.nodes.lonlat[:, 1] * DEG2RAD
        scale = DEG2RAD * DEG2RAD * g.vol * self.method.radius
        metric_y_g = 1.0 / scale
        e0 = np.zeros((nparts, emax), dtype=np.int32)
        e1 = np.zeros((nparts, emax), dtype=np.int32)
        Sl = np.zeros((nparts, emax, 2))
        pm = np.zeros((nparts, emax))
        metric_x = np.ones((nparts, nloc))
        metric_y = np.ones((nparts, nloc))
        cos_lat = np.ones((nparts, nloc))
        lat_l = np.zeros((nparts, nloc))
        inc_lists = []
        pole_lists = []
        for p in range(nparts):
            e_ids = edge_sets[p]
            lut = local_of[p]
            ne = len(e_ids)
            e0[p, :ne] = lut[en[e_ids, 0]]
            e1[p, :ne] = lut[en[e_ids, 1]]
            # padded edges point dummy->dummy with S=0
            e0[p, ne:] = nloc - 1
            e1[p, ne:] = nloc - 1
            Sl[p, :ne] = S[e_ids]
            pm[p, :ne] = pole_mask_g[e_ids]
            table = local_tables[p]
            metric_x[p, : len(table)] = 1.0 / (scale[table] * np.cos(lat_rad[table]))
            metric_y[p, : len(table)] = metric_y_g[table]
            cos_lat[p, : len(table)] = np.cos(lat_rad[table])
            lat_l[p, : len(table)] = lat_rad[table]

            # incidence restricted to EVALUATION nodes of p (owned + rings
            # <= halo-1); ghost rows beyond that are never written
            local_eid = np.full(nedges, -1, dtype=np.int64)
            local_eid[e_ids] = np.arange(ne)
            sel = eval_mask[p][inc_node_g]
            inc_n = lut[inc_node_g[sel]]
            inc_e = local_eid[inc_edge_g[sel]]
            inc_s = inc_sign_g[sel]
            assert (inc_e >= 0).all()
            order = np.argsort(inc_n, kind="stable")
            inc_lists.append((inc_n[order], inc_e[order], inc_s[order]))

            # pole-edge corrections where n2 is an evaluation node of p
            pe = pole_edge_ids
            pe_n2 = en[pe, 1]
            selp = eval_mask[p][pe_n2]
            pole_lists.append((lut[pe_n2[selp]], local_eid[pe[selp]]))

        imax = max(len(x[0]) for x in inc_lists)
        inc_node = np.full((nparts, imax), nloc - 1, dtype=np.int32)
        inc_edge = np.zeros((nparts, imax), dtype=np.int32)
        inc_sign = np.zeros((nparts, imax))
        for p, (n_, e_, s_) in enumerate(inc_lists):
            inc_node[p, : len(n_)] = n_
            inc_edge[p, : len(e_)] = e_
            inc_sign[p, : len(s_)] = s_

        pmax = max(max(len(x[0]) for x in pole_lists), 1)
        pole_n2 = np.full((nparts, pmax), nloc - 1, dtype=np.int32)
        pole_eid = np.zeros((nparts, pmax), dtype=np.int32)
        pole_valid = np.zeros((nparts, pmax))
        for p, (n_, e_) in enumerate(pole_lists):
            if len(n_):
                assert (e_ >= 0).all()
                pole_n2[p, : len(n_)] = n_
                pole_eid[p, : len(e_)] = e_
                pole_valid[p, : len(n_)] = 1.0

        self.geom = _ShardGeom(
            nparts=nparts,
            nloc=nloc,
            nown_max=nown_max,
            e0=e0,
            e1=e1,
            S=Sl,
            pole_mask=pm,
            inc_node=inc_node,
            inc_edge=inc_edge,
            inc_sign=inc_sign,
            metric_x=metric_x,
            metric_y=metric_y,
            cos_lat=cos_lat,
            lat=lat_l,
            pole_n2=pole_n2,
            pole_eid=pole_eid,
            pole_valid=pole_valid,
        )

        # owned -> local scatter (owned rows are the first rows of each table)
        # and global grid-order gather/scatter helpers
        self.owned_grid_index = [global_index[o] for o in owned_ids]

    # --------------------------------------------------------------- fields
    def scatter_field(self, f_global: np.ndarray) -> jax.Array:
        """Grid-ordered global field -> sharded (nparts, nown_max, ...) block."""
        tail = f_global.shape[1:]
        out = np.zeros((self.nparts, self.nown_max) + tail, f_global.dtype)
        for p in range(self.nparts):
            out[p, : self.nown[p]] = f_global[self.owned_grid_index[p]]
        return jax.device_put(jnp.asarray(out), self._sharding)

    def gather_field(self, f_sharded) -> np.ndarray:
        """Sharded owned block -> grid-ordered global field (host numpy)."""
        f = np.asarray(f_sharded)
        tail = f.shape[2:]
        out = np.zeros((self.grid.size,) + tail, f.dtype)
        for p in range(self.nparts):
            out[self.owned_grid_index[p]] = f[p, : self.nown[p]]
        return out

    def _dev_geom(self, dtype):
        key = jnp.dtype(dtype).name
        if self._geom_dev is None:
            self._geom_dev = {}
        if key not in self._geom_dev:
            g = self.geom
            shard = lambda a, cast=True: jax.device_put(
                jnp.asarray(a, dtype if cast and a.dtype.kind == "f" else None),
                self._sharding,
            )
            self._geom_dev[key] = {
                "e0": shard(g.e0),
                "e1": shard(g.e1),
                "S": shard(g.S),
                "pole_mask": shard(g.pole_mask),
                "inc_node": shard(g.inc_node),
                "inc_edge": shard(g.inc_edge),
                "inc_sign": shard(g.inc_sign),
                "metric_x": shard(g.metric_x),
                "metric_y": shard(g.metric_y),
                "cos_lat": shard(g.cos_lat),
                "lat": shard(g.lat),
                "pole_n2": shard(g.pole_n2),
                "pole_eid": shard(g.pole_eid),
                "pole_valid": shard(g.pole_valid),
            }
        return self._geom_dev[key]

    # ------------------------------------------------------------- operators
    def _expand(self, f_own):
        """(nown_max, ...) -> (nloc, ...) local block with ghosts filled."""
        raise NotImplementedError  # done inside the shard_map kernels

    def _shard_fn(self, kernel, f_sharded, *extra):
        geom = self._dev_geom(f_sharded.dtype)
        ax = self.axis_name
        sched = self.schedule
        nloc = self.nloc
        nown_max = self.nown_max

        from jax.sharding import PartitionSpec

        spec = P(self.axis_name)

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(spec, {k: spec for k in geom}),
            out_specs=spec,
        )
        def run(f_own, gd):
            # squeeze the leading parts axis (block views carry size-1 axis 0)
            f_own = f_own[0]
            gd = {k: v[0] for k, v in gd.items()}
            # local block with ghost+dummy rows
            pad = [(0, nloc - nown_max)] + [(0, 0)] * (f_own.ndim - 1)
            f_loc = jnp.pad(f_own, pad)
            f_loc = apply_schedule(sched, f_loc, ax)
            out = kernel(gd, f_loc, ax)
            return out[None, :nown_max]

        return run(f_sharded, geom)

    def gradient(self, f_sharded):
        """Sharded scalar gradient: (nparts, nown_max, nlev) -> (..., 2)."""
        return self._shard_fn(_k_gradient, f_sharded)

    def divergence(self, v_sharded, metric_approach: int = 0):
        return self._shard_fn(
            partial(_k_divcurl, which="div", metric_approach=metric_approach),
            v_sharded,
        )

    def curl(self, v_sharded, metric_approach: int = 0):
        return self._shard_fn(
            partial(_k_divcurl, which="curl", metric_approach=metric_approach),
            v_sharded,
        )

    def laplacian(self, f_sharded):
        """div(grad f) with ONE halo exchange (requires halo >= 2).

        Reference fvm::Nabla::laplacian (numerics/fvm/Nabla.cc:560-568)
        re-exchanges between grad and div; with halo-2 ghosts the gradient is
        valid at every ring-1 node, so the divergence of it is valid at every
        owned node without a mid-operator exchange.
        """
        if self.halo < 2:
            raise ValueError("sharded laplacian requires halo >= 2")
        return self._shard_fn(_k_laplacian, f_sharded)


# ------------------------------------------------------------------ kernels


def _acc(gd, per_edge, nloc):
    gathered = per_edge[gd["inc_edge"]]
    sign = gd["inc_sign"].reshape((-1,) + (1,) * (per_edge.ndim - 1))
    return jax.ops.segment_sum(
        gathered * sign.astype(per_edge.dtype),
        gd["inc_node"],
        num_segments=nloc,
        indices_are_sorted=True,
    )


def _k_gradient(gd, f_loc, ax):
    dtype = f_loc.dtype
    d2r = jnp.asarray(DEG2RAD, dtype)
    nloc = f_loc.shape[0]
    favg = (f_loc[gd["e0"]] + f_loc[gd["e1"]]) * jnp.asarray(0.5, dtype)
    avgS = favg[..., None] * (gd["S"].astype(dtype) * d2r)[:, None, :]
    grad = _acc(gd, avgS, nloc)
    metric = jnp.stack([gd["metric_x"], gd["metric_y"]], axis=-1).astype(dtype)
    return grad * metric[:, None, :]


def _k_laplacian(gd, f_loc, ax):
    grad = _k_gradient(gd, f_loc, ax)  # (nloc, nlev, 2), valid at eval rows
    return _k_divcurl(gd, grad, ax, which="div")


def _k_divcurl(gd, v_loc, ax, which="div", metric_approach=0):
    dtype = v_loc.dtype
    d2r = jnp.asarray(DEG2RAD, dtype)
    nloc = v_loc.shape[0]
    pbc = (1.0 - gd["pole_mask"]).astype(dtype)
    cl = gd["cos_lat"].astype(dtype)
    if metric_approach == 0:
        c0 = cl[gd["e0"]] * pbc
        c1 = cl[gd["e1"]] * pbc
    else:
        cm = jnp.cos(0.5 * (gd["lat"][gd["e0"]] + gd["lat"][gd["e1"]])).astype(dtype) * pbc
        c0 = c1 = cm
    Sd = gd["S"].astype(dtype) * d2r
    half = jnp.asarray(0.5, dtype)
    if which == "div":
        u_avg = (v_loc[gd["e0"], :, 0] + v_loc[gd["e1"], :, 0]) * half
        v_avg = (v_loc[gd["e0"], :, 1] * c0[:, None] + v_loc[gd["e1"], :, 1] * c1[:, None]) * half
        per_edge = u_avg * Sd[:, None, 0] + v_avg * Sd[:, None, 1]
    else:
        u_avg = (v_loc[gd["e0"], :, 0] * c0[:, None] + v_loc[gd["e1"], :, 0] * c1[:, None]) * half
        v_avg = (v_loc[gd["e0"], :, 1] + v_loc[gd["e1"], :, 1]) * half
        per_edge = v_avg * Sd[:, None, 0] - u_avg * Sd[:, None, 1]
    out = _acc(gd, per_edge, nloc)
    metric = (gd["metric_y"] * (1.0 / gd["cos_lat"])).astype(dtype)
    return out * metric[:, None]
