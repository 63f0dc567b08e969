"""Format construction, conversion round-trips, and SpMV correctness.

The reference has no per-kernel unit tests; SURVEY.md §4 prescribes adding
them: every format's matvec/matvech is checked against the dense product,
and every conversion must round-trip through CSR.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from lis_tpu.matrix.convert import convert_matrix
from lis_tpu.matrix.base import _MATRIX_REGISTRY
from tests.problems import poisson2d, random_sparse, tridiag

FORMATS = ["csr", "csc", "msr", "dia", "ell", "jad", "bsr", "bsc", "vbr",
           "coo", "dns"]


@pytest.fixture(scope="module")
def prob():
    a = random_sparse(37, density=0.15, seed=3)
    dense = a.to_dense()
    x = np.random.default_rng(7).standard_normal(37)
    return a, dense, x


@pytest.mark.parametrize("fmt", FORMATS)
def test_matvec_matches_dense(prob, fmt):
    a, dense, x = prob
    m = convert_matrix(a, fmt)
    y = np.asarray(m.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("fmt", FORMATS)
def test_matvech_matches_dense(prob, fmt):
    a, dense, x = prob
    m = convert_matrix(a, fmt)
    y = np.asarray(m.matvech(jnp.asarray(x)))
    np.testing.assert_allclose(y, dense.T @ x, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("fmt", FORMATS)
def test_conversion_roundtrip(prob, fmt):
    a, dense, x = prob
    m = convert_matrix(a, fmt)
    back = convert_matrix(m, "csr")
    np.testing.assert_allclose(back.to_dense(), dense, rtol=1e-14, atol=1e-14)


@pytest.mark.parametrize("fmt", FORMATS)
def test_stencil_matrix(fmt):
    a = poisson2d(6, 5)
    dense = a.to_dense()
    x = np.arange(30, dtype=float)
    m = convert_matrix(a, fmt)
    np.testing.assert_allclose(np.asarray(m.matvec(jnp.asarray(x))),
                               dense @ x, rtol=1e-13, atol=1e-13)


def test_nonsquare_matvec():
    rng = np.random.default_rng(0)
    dense = np.where(rng.random((9, 13)) < 0.3, rng.standard_normal((9, 13)), 0.0)
    from lis_tpu.matrix.csr import CSRMatrix
    a = CSRMatrix.from_dense(dense)
    x = rng.standard_normal(13)
    y = rng.standard_normal(9)
    np.testing.assert_allclose(np.asarray(a.matvec(jnp.asarray(x))), dense @ x,
                               rtol=1e-13)
    np.testing.assert_allclose(np.asarray(a.matvech(jnp.asarray(y))),
                               dense.T @ y, rtol=1e-13)


def test_get_diagonal_and_split():
    a = tridiag(11)
    d = np.asarray(a.get_diagonal())
    np.testing.assert_allclose(d, np.full(11, 2.0))
    from lis_tpu.matrix.split import split_matrix
    s = split_matrix(a)
    dense = a.to_dense()
    np.testing.assert_allclose(s.L.to_dense(), np.tril(dense, -1))
    np.testing.assert_allclose(s.U.to_dense(), np.triu(dense, 1))
    np.testing.assert_allclose(np.asarray(s.D), np.diag(dense))


def test_assembler_set_value():
    from lis_tpu.matrix.assembly import MatrixAssembler, LIS_ADD_VALUE, LIS_INS_VALUE
    asm = MatrixAssembler((4, 4))
    for i in range(4):
        asm.set_value(LIS_INS_VALUE, i, i, 2.0)
    asm.set_value(LIS_ADD_VALUE, 0, 0, 1.0)     # accumulate
    asm.set_value(LIS_INS_VALUE, 1, 1, 5.0)     # overwrite
    asm.set_value(LIS_INS_VALUE, 2, 3, -1.0)
    a = asm.assemble("csr")
    dense = a.to_dense()
    assert dense[0, 0] == 3.0
    assert dense[1, 1] == 5.0
    assert dense[2, 3] == -1.0


def test_registry_covers_all_lis_formats():
    for fmt in FORMATS:
        assert fmt in _MATRIX_REGISTRY


def test_hybrid_hdi_format():
    """HDI (dominant diagonals + gather remainder — TPU-first extension):
    exact matvec/matvech, auto-routing for quasi-banded operators."""
    import scipy.sparse as sp
    from lis_tpu.matrix.hybrid import HybridMatrix
    from lis_tpu.solvers.driver import auto_storage
    from tests.problems import poisson2d
    n = 400
    a = sp.csr_matrix(np.asarray(poisson2d(20, 20).to_dense())) \
        + sp.random(n, n, density=0.0015, random_state=7)
    a = a.tocsr(); a.sort_indices()
    H = HybridMatrix.from_csr_arrays(a.indptr, a.indices, a.data, a.shape)
    assert H is not None and len(H.rem.value) < 0.25 * a.nnz
    x = np.random.default_rng(2).standard_normal(n)
    np.testing.assert_allclose(np.asarray(H.matvec(x)), a @ x, atol=1e-12)
    np.testing.assert_allclose(np.asarray(H.matvech(x)), a.T @ x, atol=1e-12)
    # csr round trip preserves the matrix
    p2, i2, v2 = H.to_csr_arrays()
    a2 = sp.csr_matrix((np.asarray(v2), np.asarray(i2), np.asarray(p2)),
                       shape=a.shape)
    assert abs(a2 - a).max() < 1e-14
    # dense (fully random) matrices must NOT route to hdi
    import lis_tpu
    from lis_tpu.matrix.csr import CSRMatrix
    r = sp.random(100, 100, density=0.2, random_state=1).tocsr()
    r.sort_indices()
    R = CSRMatrix.from_csr_arrays(r.indptr, r.indices, r.data, r.shape)
    assert auto_storage(R).format_name == "csr"


def test_poisson3d27_dia_generator():
    """Direct-DIA stencil construction matches the COO/CSR path."""
    from lis_tpu.utils.testmat import poisson3d27, poisson3d27_dia
    A = poisson3d27(5, 4, 3)
    D = poisson3d27_dia(5, 4, 3)
    np.testing.assert_allclose(np.asarray(D.to_dense()),
                               np.asarray(A.to_dense()))
