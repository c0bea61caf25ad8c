"""Linear algebra layer: sparse matmul backends, dense GEMM, FFT.

Reference behavior: atlas linalg/ — `SparseMatrixStorage` with SpMM backends
("openmp", "eckit_linalg", "hicsparse" for GPU; linalg/sparse/Backend.h,
SparseMatrixMultiply_*.cc), dense GEMM backends, and an FFT interface with
FFTW/pocketfft backends (linalg/fft/FFT.h:22-105), selectable via
ATLAS_LINALG_{SPARSE,DENSE,FFT}_BACKEND.

TPU design: one storage (`SparseMatrix`, COO triplets padded per-row) with
three execution backends —
  "gather"  padded gather-dot (ELL-style), the TPU fast path: every row does
            k fused multiply-adds from HBM, no scatter;
  "bcoo"    jax.experimental.sparse BCOO dot for very sparse/ragged matrices;
  "dense"   materialized matmul on the MXU for small operators.
Backend selection: config > $ATLAS_TPU_LINALG_SPARSE_BACKEND > "gather".
"""

from __future__ import annotations

import os

import numpy as np


class SparseMatrix:
    """Row-major sparse matrix from COO triplets (reference
    SparseMatrixStorage, linalg/sparse/SparseMatrixStorage.h)."""

    def __init__(self, rows, cols, vals, shape):
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals, dtype=np.float64)
        self.shape = (int(shape[0]), int(shape[1]))
        order = np.argsort(rows, kind="stable")
        self.rows, self.cols, self.vals = rows[order], cols[order], vals[order]
        counts = np.bincount(self.rows, minlength=self.shape[0])
        self.kmax = max(int(counts.max()) if counts.size else 0, 1)
        # padded ELL layout
        offs = np.concatenate([[0], np.cumsum(counts)])
        slot = np.arange(len(self.rows)) - offs[self.rows]
        self.ell_idx = np.zeros((self.shape[0], self.kmax), dtype=np.int32)
        self.ell_w = np.zeros((self.shape[0], self.kmax))
        self.ell_idx[self.rows, slot] = self.cols
        self.ell_w[self.rows, slot] = self.vals

    @classmethod
    def from_scipy(cls, m):
        coo = m.tocoo()
        return cls(coo.row, coo.col, coo.data, coo.shape)

    def to_scipy(self):
        import scipy.sparse as sp

        return sp.csr_matrix((self.vals, (self.rows, self.cols)), shape=self.shape)

    @property
    def nnz(self) -> int:
        return len(self.vals)

    def transpose(self) -> "SparseMatrix":
        return SparseMatrix(self.cols, self.rows, self.vals, (self.shape[1], self.shape[0]))

    def footprint(self) -> int:
        return self.ell_idx.nbytes + self.ell_w.nbytes + self.vals.nbytes * 2


def _backend(config_backend=None, kind="SPARSE"):
    return (
        config_backend
        or os.environ.get(f"ATLAS_TPU_LINALG_{kind}_BACKEND")
        or ("gather" if kind == "SPARSE" else "default")
    )


def sparse_matrix_multiply(A: SparseMatrix, x, backend: str | None = None):
    """y = A @ x for x of shape (ncols, ...). jit-compatible."""
    import jax.numpy as jnp

    backend = _backend(backend, "SPARSE")
    x = jnp.asarray(x)
    if backend == "gather":
        w = jnp.asarray(A.ell_w, x.dtype)
        idx = jnp.asarray(A.ell_idx)
        vals = x[idx]  # (nrows, kmax, ...)
        wshape = w.shape + (1,) * (x.ndim - 1)
        return (vals * w.reshape(wshape)).sum(axis=1)
    if backend == "bcoo":
        from jax.experimental import sparse as jsparse

        mat = jsparse.BCOO(
            (jnp.asarray(A.vals, x.dtype), jnp.stack([jnp.asarray(A.rows), jnp.asarray(A.cols)], axis=1)),
            shape=A.shape,
        )
        return mat @ x
    if backend == "dense":
        dense = jnp.zeros(A.shape, x.dtype).at[jnp.asarray(A.rows), jnp.asarray(A.cols)].add(jnp.asarray(A.vals, x.dtype))
        return jnp.tensordot(dense, x, axes=([1], [0]))
    raise ValueError(f"unknown sparse backend {backend!r} (gather|bcoo|dense)")


def matrix_multiply(a, b, backend: str | None = None):
    """Dense GEMM (reference linalg/dense). On TPU this is always the MXU."""
    import jax.numpy as jnp

    return jnp.asarray(a) @ jnp.asarray(b)


class FFT:
    """Batched real FFT interface (reference linalg/fft/FFT.h). On TPU the
    backend is XLA's FFT; the API mirrors the reference's plan-execute shape."""

    def __init__(self, backend: str | None = None):
        self.backend = _backend(backend, "FFT")

    def irfft(self, spec, n: int):
        import jax.numpy as jnp

        return jnp.fft.irfft(jnp.asarray(spec), n=n, axis=-1)

    def rfft(self, x):
        import jax.numpy as jnp

        return jnp.fft.rfft(jnp.asarray(x), axis=-1)


__all__ = ["SparseMatrix", "sparse_matrix_multiply", "matrix_multiply", "FFT"]
