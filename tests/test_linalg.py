"""linalg layer tests (reference: src/tests/linalg/test_linalg_sparse.cc,
test_linalg_dense.cc, trans FFT tests)."""

import numpy as np
import pytest

from atlas_tpu.linalg import FFT, SparseMatrix, matrix_multiply, sparse_matrix_multiply


@pytest.fixture(scope="module")
def mats():
    rng = np.random.default_rng(5)
    nrows, ncols, nnz = 40, 30, 200
    rows = rng.integers(0, nrows, nnz)
    cols = rng.integers(0, ncols, nnz)
    vals = rng.standard_normal(nnz)
    A = SparseMatrix(rows, cols, vals, (nrows, ncols))
    import scipy.sparse as sp

    ref = sp.csr_matrix((vals, (rows, cols)), shape=(nrows, ncols))
    return A, ref


@pytest.mark.parametrize("backend", ["gather", "bcoo", "dense"])
def test_spmm_backends(mats, backend):
    A, ref = mats
    rng = np.random.default_rng(6)
    for shape in [(30,), (30, 3)]:
        x = rng.standard_normal(shape)
        y = np.asarray(sparse_matrix_multiply(A, x, backend=backend))
        np.testing.assert_allclose(y, ref @ x, atol=1e-10)


def test_transpose_adjoint(mats):
    A, ref = mats
    rng = np.random.default_rng(7)
    x = rng.standard_normal(30)
    y = rng.standard_normal(40)
    Ax = np.asarray(sparse_matrix_multiply(A, x))
    ATy = np.asarray(sparse_matrix_multiply(A.transpose(), y))
    assert abs(Ax @ y - x @ ATy) < 1e-10


def test_scipy_roundtrip(mats):
    A, ref = mats
    assert (A.to_scipy() != ref).nnz == 0
    B = SparseMatrix.from_scipy(ref)
    # scipy sums duplicate (row, col) triplets on conversion, so compare the
    # resulting operators, not triplet counts
    assert (B.to_scipy() != ref).nnz == 0


def test_dense_gemm():
    a = np.arange(6.0).reshape(2, 3)
    b = np.arange(12.0).reshape(3, 4)
    np.testing.assert_allclose(np.asarray(matrix_multiply(a, b)), a @ b)


def test_fft_roundtrip():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((5, 64))
    fft = FFT()
    spec = np.asarray(fft.rfft(x))
    back = np.asarray(fft.irfft(spec, n=64))
    np.testing.assert_allclose(back, x, atol=1e-12)


def test_windowed_ell_matches_gather():
    """Locality-sorted windowed ELL SpMM reproduces the plain gather-dot
    (reference cache-ordered CSR SpMM, interpolation/method/Method.cc:169-290)."""
    import numpy as np

    from atlas_tpu.linalg import WindowedELL

    rng = np.random.default_rng(3)
    nsrc, ntgt, k = 4000, 2500, 6
    base = rng.integers(0, nsrc - 30, (ntgt, 1))
    idx = np.minimum(base + rng.integers(0, 30, (ntgt, k)), nsrc - 1)
    idx[::50] = rng.integers(0, nsrc, (len(idx[::50]), k))  # scattered rows
    w = rng.standard_normal((ntgt, k))
    w[:, -1] = 0.0  # padded taps must not widen windows
    well = WindowedELL(idx, w, nsrc, block=64, max_W=256)
    assert 0.5 < well.fast_fraction <= 1.0
    f = rng.standard_normal((nsrc, 3))
    ref = (f[idx] * w[..., None]).sum(axis=1)
    np.testing.assert_allclose(np.asarray(well.apply(f)), ref, atol=1e-10)
    # scalar field path
    np.testing.assert_allclose(
        np.asarray(well.apply(f[:, 0])), ref[:, 0], atol=1e-10)


def test_windowed_ell_src_order():
    """A locality-improving source permutation captures rows a raw ordering
    leaves on the gather path, without changing results."""
    import numpy as np

    from atlas_tpu.linalg import WindowedELL

    rng = np.random.default_rng(5)
    nsrc, ntgt, k = 4000, 2000, 5
    # taps clustered in a SHUFFLED source: raw spans are huge
    perm = rng.permutation(nsrc)
    base = rng.integers(0, nsrc - 30, (ntgt, 1))
    idx_sorted = np.minimum(base + rng.integers(0, 30, (ntgt, k)), nsrc - 1)
    idx = perm[idx_sorted]
    w = rng.standard_normal((ntgt, k))
    inv = np.empty(nsrc, np.int64)
    inv[perm] = np.arange(nsrc)
    well = WindowedELL(idx, w, nsrc, block=64, max_W=256, src_order=perm)
    assert well.fast_fraction > 0.95
    f = rng.standard_normal((nsrc, 2))
    ref = (f[idx] * w[..., None]).sum(axis=1)
    np.testing.assert_allclose(np.asarray(well.apply(f)), ref, atol=1e-10)
