"""Non-linear (missing-value) treatments for interpolation.

Reference behavior: atlas interpolation/nonlinear/ — when a source field
carries missing values, the interpolation matrix is modified row-by-row
before application:

  missing-if-any-missing       target missing if ANY stencil source is missing
  missing-if-all-missing       target missing only if ALL stencil sources are;
                               otherwise weights renormalized over valid ones
  missing-if-heaviest-missing  target missing if the largest-weight source is
                               missing; otherwise renormalized

(`interpolation/nonlinear/NonLinear.h`, `Missing.cc` registrations
"missing-if-any-missing" etc.)  Here the treatment is a jit-compatible masked
execute — no matrix mutation, the mask math happens inline.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

TREATMENTS = (
    "missing-if-any-missing",
    "missing-if-all-missing",
    "missing-if-heaviest-missing",
)


def execute_nonlinear(method, field, missing_value, treatment="missing-if-any-missing"):
    """Apply `method` (any Method with idx/w) to `field` honoring missing values.

    field: (nsrc, ...); missing entries equal missing_value (or NaN).
    Returns (ntgt, ...) with missing_value where the treatment says so.
    """
    if treatment not in TREATMENTS:
        raise ValueError(f"unknown non-linear treatment {treatment!r}; expected one of {TREATMENTS}")
    field = jnp.asarray(field)
    idx = jnp.asarray(method.idx)
    w = jnp.asarray(method.w, field.dtype)
    vals = field[idx]  # (ntgt, k, ...)
    if np.isnan(missing_value):
        miss = jnp.isnan(vals)
    else:
        miss = vals == missing_value
    wshape = w.shape + (1,) * (field.ndim - 1)
    wb = jnp.broadcast_to(w.reshape(wshape), vals.shape)
    # zero weights on missing sources, renormalize over the valid ones
    wv = jnp.where(miss, 0.0, wb)
    norm = wv.sum(axis=1)
    safe = jnp.where(norm == 0, 1.0, norm)
    out = (jnp.where(miss, 0.0, vals) * wv).sum(axis=1) / safe

    any_missing = (miss & (wb != 0)).any(axis=1)
    all_missing = ((wb == 0) | miss).all(axis=1)
    heaviest = jnp.argmax(jnp.abs(wb), axis=1, keepdims=True)
    heaviest_missing = jnp.take_along_axis(miss, heaviest, axis=1)[:, 0]
    if treatment == "missing-if-any-missing":
        is_missing = any_missing
    elif treatment == "missing-if-all-missing":
        is_missing = all_missing
    else:
        is_missing = heaviest_missing | all_missing
    mv = jnp.nan if np.isnan(missing_value) else missing_value
    return jnp.where(is_missing, jnp.asarray(mv, field.dtype), out)
