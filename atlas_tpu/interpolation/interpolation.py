"""Interpolation facade (reference: atlas interpolation/Interpolation.h).

`Interpolation(config, source, target)` builds a named method; execute applies
it to fields; execute_adjoint applies the transpose (reference Method.cc:439-448).

All methods reduce to (indices, weights) products built once on the host
(SURVEY.md section 7 design stance); execution is a jitted gather-dot, with a
transpose segment-sum for the adjoint.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..util.config import Config
from ..util.factory import Factory

interpolation_factory = Factory("interpolation")


class Method:
    """Base: subclasses produce self.idx (ntgt, k) int32 and self.w (ntgt, k)."""

    idx: np.ndarray
    w: np.ndarray
    nsrc: int

    def execute(self, field):
        """field: (nsrc, ...) -> (ntgt, ...)."""
        field = jnp.asarray(field)
        return _apply(jnp.asarray(self.idx), jnp.asarray(self.w, field.dtype), field)

    def execute_adjoint(self, field):
        """Transpose-apply: (ntgt, ...) -> (nsrc, ...)."""
        field = jnp.asarray(field)
        return _apply_adjoint(
            jnp.asarray(self.idx), jnp.asarray(self.w, field.dtype), field, self.nsrc
        )

    def matrix(self):
        """The weight matrix as scipy CSR (reference Method::setMatrix)."""
        import scipy.sparse as sp

        ntgt, k = self.idx.shape
        rows = np.repeat(np.arange(ntgt), k)
        return sp.csr_matrix(
            (self.w.ravel(), (rows, self.idx.ravel())), shape=(ntgt, self.nsrc)
        )


@jax.jit
def _apply(idx, w, field):
    vals = field[idx]  # (ntgt, k, ...)
    wshape = w.shape + (1,) * (field.ndim - 1)
    return (vals * w.reshape(wshape)).sum(axis=1)


def _apply_adjoint(idx, w, field, nsrc):
    k = idx.shape[1]
    wshape = w.shape + (1,) * (field.ndim - 1)
    contrib = field[:, None] * w.reshape(wshape)  # (ntgt, k, ...)
    flat = contrib.reshape((-1,) + field.shape[1:])
    return jax.ops.segment_sum(flat, idx.reshape(-1), num_segments=nsrc)


class MatrixCache:
    """Reuse interpolation weights across Interpolation instances.

    Reference: interpolation/Cache.h:48-146 — a MatrixCache created from one
    Interpolation can seed another with the same (method, source, target), and
    matrices can be stored on / loaded from disk. Here the cached product is
    the padded (idx, w) pair keyed by (method, source uid, target uid).
    """

    def __init__(self, interpolation=None):
        self._store: dict = {}
        if interpolation is not None and hasattr(interpolation, "_cache_key"):
            self.add(interpolation._cache_key, interpolation)

    def add(self, key, method_obj):
        self._store[key] = (
            np.asarray(method_obj.idx),
            np.asarray(method_obj.w),
            int(method_obj.nsrc),
        )

    def get(self, key):
        return self._store.get(key)

    def __contains__(self, key):
        return key in self._store

    # ------------------------------------------------------------- disk IO
    def save(self, key, path: str):
        idx, w, nsrc = self._store[key]
        np.savez_compressed(path + ".tmp.npz", idx=idx, w=w,
                            nsrc=np.int64(nsrc))
        import os

        os.replace(path + ".tmp.npz", path)

    @staticmethod
    def load(key, path: str) -> "MatrixCache":
        c = MatrixCache()
        with np.load(path) as z:
            c._store[key] = (z["idx"], z["w"], int(z["nsrc"]))
        return c


class _CachedMethod(Method):
    """A Method rebuilt from cached (idx, w, nsrc)."""

    def __init__(self, idx, w, nsrc):
        self.idx = idx
        self.w = w
        self.nsrc = nsrc


def _cache_key(method: str, source, target):
    def uid(x):
        u = getattr(x, "uid", None)
        return u() if callable(u) else repr(x)

    return (method, uid(source), uid(target))


def Interpolation(config, source, target, cache: "MatrixCache | None" = None):
    """Build an interpolation method; optionally seed from a MatrixCache.

    With `cache` given and a hit on (type, source uid, target uid), setup is
    skipped entirely and the cached weights are wrapped (reference
    Interpolation(config, fsA, fsB, cache) constructor). With
    `use_cache: true` in the config (or ATLAS_TPU_INTERP_CACHE=1), weights
    are additionally persisted to the disk cache keyed by (type, src uid,
    tgt uid) — the reference's interpolation MatrixCache reuse
    (interpolation/Cache.h:48-146) for expensive setups (conservative
    remap, finite-element search).
    """
    import os

    config = Config(config) if not isinstance(config, str) else Config(type=config)
    method = config.get_str("type")
    key = _cache_key(method, source, target)
    if cache is not None and key in cache:
        m = _CachedMethod(*cache.get(key))
        m._cache_key = key
        return m
    use_disk = config.get_bool("use_cache", False) or (
        os.environ.get("ATLAS_TPU_INTERP_CACHE", "0") == "1")
    path = None
    if use_disk:
        import hashlib

        from ..io.cache import cache_path

        h = hashlib.md5(repr(key).encode()).hexdigest()[:16]
        path = cache_path("interp", f"{method}-{h}")
        if os.path.exists(path):
            try:
                m = _CachedMethod(*MatrixCache.load(key, path).get(key))
                m._cache_key = key
                return m
            except Exception:
                pass  # unreadable cache entry: rebuild
    m = interpolation_factory.build(method, config, source, target)
    m._cache_key = key
    if cache is not None:
        cache.add(key, m)
    if path is not None and getattr(m, "_sep", None) is None:
        # persist (idx, w) — but never force the lazy flat build of the
        # separable fast path just to cache it
        try:
            mc = MatrixCache()
            mc.add(key, m)
            mc.save(key, path)
        except Exception:
            pass
    return m
