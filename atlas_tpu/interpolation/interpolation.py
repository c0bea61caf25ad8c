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


def Interpolation(config, source, target):
    config = Config(config) if not isinstance(config, str) else Config(type=config)
    method = config.get_str("type")
    return interpolation_factory.build(method, config, source, target)
