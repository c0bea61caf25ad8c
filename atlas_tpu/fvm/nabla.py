"""Median-dual finite-volume operators as jax kernels.

Reference behavior: atlas numerics/fvm/Nabla.cc —
  gradient_of_scalar (:96-188): edge loop avgS = S * deg2rad * 0.5 (f1 + f2);
    node loop grad = sum(sign * avgS) * metric, metric_y = 1/(V deg2rad^2 R),
    metric_x = metric_y / cos(lat).
  gradient_of_vector (:192-318): pole-bc factor pbc = 1 - 2*is_pole on the f2
    term, post-correction -2 avgS metric_y at pole-edge node 2 for the dLAT
    components.
  divergence (:322-438): v pre-multiplied by cos(lat) (metric_approach 0) or
    the edge-mean cos (approach 1); pole edges fully masked (pbc = 0).
  curl (:440-558): u pre-multiplied by cos(lat); metric includes 1/cos(lat).
  laplacian (:560-568): div(grad) with halo exchange between.

TPU design: the two hot loops become (a) an edge gather + elementwise VPU work,
(b) a sorted segment-sum over the flattened node<-edge incidence — no atomics,
deterministic accumulation order, fully fusible by XLA. Fields are
(nnodes, nlev) or (nnodes, nlev, nvar).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..util.constants import DEG2RAD
from .method import FvmGeometry, FvmMethod


class _JaxGeom:
    """Geometry arrays with a chosen dtype, registered as a jax pytree."""

    _fields = (
        "e0", "e1", "S", "vol", "lat", "inc_node", "inc_edge", "inc_sign",
        "pole_mask", "pole_ids", "pole_n2", "halo_src", "halo_dst",
        "metric_y", "metric_x", "inv_cos", "cos_lat",
    )

    def __init__(self, g: FvmGeometry, dtype):
        self.dtype = dtype
        self.nnodes = g.nnodes
        self.nedges = g.nedges
        self.e0 = jnp.asarray(g.edge_nodes[:, 0])
        self.e1 = jnp.asarray(g.edge_nodes[:, 1])
        self.S = jnp.asarray(g.dual_normals, dtype)
        self.vol = jnp.asarray(g.vol, dtype)
        self.lat = jnp.asarray(g.lat_rad, dtype)
        self.inc_node = jnp.asarray(g.inc_node)
        self.inc_edge = jnp.asarray(g.inc_edge)
        self.inc_sign = jnp.asarray(g.inc_sign, dtype)
        self.pole_mask = jnp.asarray(g.pole_mask, dtype)
        self.pole_ids = jnp.asarray(g.pole_edge_ids)
        self.pole_n2 = self.e1[self.pole_ids] if len(g.pole_edge_ids) else jnp.zeros(0, jnp.int32)
        self.halo_src = jnp.asarray(g.halo_src)
        self.halo_dst = jnp.asarray(g.halo_dst)
        self.radius = g.radius
        # metric factors
        scale = DEG2RAD * DEG2RAD * g.radius
        metric_y = 1.0 / (g.vol * scale)
        self.metric_y = jnp.asarray(metric_y, dtype)
        self.metric_x = jnp.asarray(metric_y / np.cos(g.lat_rad), dtype)
        self.inv_cos = jnp.asarray(1.0 / np.cos(g.lat_rad), dtype)
        self.cos_lat = jnp.asarray(np.cos(g.lat_rad), dtype)

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self._fields), (
            self.dtype,
            self.nnodes,
            self.nedges,
            self.radius,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.dtype, obj.nnodes, obj.nedges, obj.radius = aux
        for f, c in zip(cls._fields, children):
            setattr(obj, f, c)
        return obj


jax.tree_util.register_pytree_node_class(_JaxGeom)


def _accumulate(geom: _JaxGeom, per_edge):
    """Signed node accumulation: sum over incident edges (sorted segment sum)."""
    gathered = per_edge[geom.inc_edge]
    sign = geom.inc_sign.reshape((-1,) + (1,) * (per_edge.ndim - 1))
    return jax.ops.segment_sum(
        gathered * sign, geom.inc_node, num_segments=geom.nnodes, indices_are_sorted=True
    )


class Nabla:
    """Factory name "fvm" (reference: NablaBuilder __fvm_nabla, Nabla.cc:36)."""

    def __init__(self, method: FvmMethod, metric_approach: int = 0):
        self.method = method
        self.metric_approach = int(metric_approach)
        self._geom_cache: dict = {}

    def _geom(self, dtype) -> _JaxGeom:
        key = jnp.dtype(dtype).name
        if key not in self._geom_cache:
            self._geom_cache[key] = _JaxGeom(self.method.geometry, jnp.dtype(dtype))
        return self._geom_cache[key]

    # -- public API ---------------------------------------------------------
    def gradient(self, f, halo_exchange: bool = True):
        """Scalar gradient. f: (nnodes,) or (nnodes, nlev) -> (..., 2)."""
        f = jnp.asarray(f)
        squeeze = f.ndim == 1
        if squeeze:
            f = f[:, None]
        out = _gradient_impl(self._geom(f.dtype), f)
        if halo_exchange:
            out = self._halo(out)
        return out[:, 0] if squeeze else out

    def gradient_of_vector(self, v, halo_exchange: bool = True):
        """Vector gradient. v: (nnodes, [nlev,] 2) -> (..., 4) as
        (dLONdLON, dLONdLAT, dLATdLON, dLATdLAT)."""
        v = jnp.asarray(v)
        squeeze = v.ndim == 2
        if squeeze:
            v = v[:, None, :]
        out = _gradient_vector_impl(self._geom(v.dtype), v)
        if halo_exchange:
            out = self._halo(out)
        return out[:, 0] if squeeze else out

    def divergence(self, v, halo_exchange: bool = True):
        v = jnp.asarray(v)
        squeeze = v.ndim == 2
        if squeeze:
            v = v[:, None, :]
        out = _divergence_impl(self._geom(v.dtype), v, self.metric_approach)
        if halo_exchange:
            out = self._halo(out)
        return out[:, 0] if squeeze else out

    def curl(self, v, halo_exchange: bool = True):
        v = jnp.asarray(v)
        squeeze = v.ndim == 2
        if squeeze:
            v = v[:, None, :]
        out = _curl_impl(self._geom(v.dtype), v, self.metric_approach)
        if halo_exchange:
            out = self._halo(out)
        return out[:, 0] if squeeze else out

    def laplacian(self, f, halo_exchange: bool = True):
        f = jnp.asarray(f)
        grad = self.gradient(f, halo_exchange=True)
        out = self.divergence(grad, halo_exchange=halo_exchange)
        return out

    def _halo(self, out):
        g = self._geom(out.dtype)
        return out.at[g.halo_dst].set(out[g.halo_src])


# ---------------------------------------------------------------------------
# jitted kernels (geometry passed as a static-ish closure via weak hashing)


@jax.jit
def _gradient_impl(geom: _JaxGeom, f):
    d2r = jnp.asarray(DEG2RAD, geom.dtype)
    favg = (f[geom.e0] + f[geom.e1]) * jnp.asarray(0.5, geom.dtype)  # (nedges, nlev)
    avgS = favg[..., None] * (geom.S * d2r)[:, None, :]  # (nedges, nlev, 2)
    grad = _accumulate(geom, avgS)  # (nnodes, nlev, 2)
    metric = jnp.stack([geom.metric_x, geom.metric_y], axis=-1)  # (nnodes, 2)
    return grad * metric[:, None, :]


@jax.jit
def _gradient_vector_impl(geom: _JaxGeom, v):
    d2r = jnp.asarray(DEG2RAD, geom.dtype)
    pbc = (1.0 - 2.0 * geom.pole_mask).astype(geom.dtype)  # -1 on pole edges
    avg = (v[geom.e0] + pbc[:, None, None] * v[geom.e1]) * jnp.asarray(0.5, geom.dtype)
    Sd = geom.S * d2r  # (nedges, 2)
    # components (LONdLON, LONdLAT, LATdLON, LATdLAT)
    avgS = jnp.stack(
        [
            Sd[:, None, 0] * avg[..., 0],
            Sd[:, None, 1] * avg[..., 0],
            Sd[:, None, 0] * avg[..., 1],
            Sd[:, None, 1] * avg[..., 1],
        ],
        axis=-1,
    )  # (nedges, nlev, 4)
    grad = _accumulate(geom, avgS)
    metric = jnp.stack(
        [geom.metric_x, geom.metric_y, geom.metric_x, geom.metric_y], axis=-1
    )
    grad = grad * metric[:, None, :]
    # pole-edge correction at node 2 for the dLAT components (Nabla.cc:295-303)
    if len(geom.pole_ids):
        my = geom.metric_y[geom.pole_n2][:, None]
        corr1 = 2.0 * avgS[geom.pole_ids, :, 1] * my
        corr3 = 2.0 * avgS[geom.pole_ids, :, 3] * my
        grad = grad.at[geom.pole_n2, :, 1].add(-corr1)
        grad = grad.at[geom.pole_n2, :, 3].add(-corr3)
    return grad


@partial(jax.jit, static_argnums=2)
def _divergence_impl(geom: _JaxGeom, v, metric_approach):
    d2r = jnp.asarray(DEG2RAD, geom.dtype)
    pbc = (1.0 - geom.pole_mask).astype(geom.dtype)  # 0 on pole edges
    cos0 = geom.cos_lat[geom.e0]
    cos1 = geom.cos_lat[geom.e1]
    if metric_approach == 0:
        c0 = cos0 * pbc
        c1 = cos1 * pbc
    else:
        cm = jnp.cos(0.5 * (geom.lat[geom.e0] + geom.lat[geom.e1])) * pbc
        c0 = c1 = cm
    u_avg = (v[geom.e0, :, 0] + v[geom.e1, :, 0]) * jnp.asarray(0.5, geom.dtype)
    v_avg = (v[geom.e0, :, 1] * c0[:, None] + v[geom.e1, :, 1] * c1[:, None]) * jnp.asarray(
        0.5, geom.dtype
    )
    Sd = geom.S * d2r
    flux = u_avg * Sd[:, None, 0] + v_avg * Sd[:, None, 1]  # (nedges, nlev)
    div = _accumulate(geom, flux)
    metric = geom.metric_y * geom.inv_cos
    return div * metric[:, None]


@partial(jax.jit, static_argnums=2)
def _curl_impl(geom: _JaxGeom, v, metric_approach):
    d2r = jnp.asarray(DEG2RAD, geom.dtype)
    pbc = (1.0 - geom.pole_mask).astype(geom.dtype)
    cos0 = geom.cos_lat[geom.e0]
    cos1 = geom.cos_lat[geom.e1]
    if metric_approach == 0:
        c0 = cos0 * pbc
        c1 = cos1 * pbc
    else:
        cm = jnp.cos(0.5 * (geom.lat[geom.e0] + geom.lat[geom.e1])) * pbc
        c0 = c1 = cm
    u_avg = (v[geom.e0, :, 0] * c0[:, None] + v[geom.e1, :, 0] * c1[:, None]) * jnp.asarray(
        0.5, geom.dtype
    )
    v_avg = (v[geom.e0, :, 1] + v[geom.e1, :, 1]) * jnp.asarray(0.5, geom.dtype)
    Sd = geom.S * d2r
    circ = v_avg * Sd[:, None, 0] - u_avg * Sd[:, None, 1]  # (nedges, nlev)
    curl = _accumulate(geom, circ)
    metric = geom.metric_y * geom.inv_cos
    return curl * metric[:, None]
