"""Complex scalar support — the analogue of the reference's
--enable-complex build (configure.ac:42, LIS_SCALAR = double complex).

The same solver/precon/format machinery runs on complex operands:
conj-aware dots (lis_vector_dot is Hermitian, nhdot is the transpose
product the CO* solvers use), conj-transposed ILU plans, complex Givens
in MINRES, complex Arnoldi/Lanczos reductions.  SA-AMG is real-only like
the reference's F90 AMG module.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import lis_tpu
from lis_tpu.matrix.csr import CSRMatrix
from lis_tpu.matrix.convert import convert_matrix


def _csr(spm):
    spm = spm.tocsr()
    spm.sort_indices()
    return CSRMatrix.from_csr_arrays(spm.indptr, spm.indices, spm.data,
                                     spm.shape)


@pytest.fixture(scope="module")
def general():
    """Non-Hermitian, non-symmetric complex tridiagonal."""
    n = 36
    a = sp.diags([-(1 + 0.5j), 4 + 1j, -(1 - 0.25j)], [-1, 0, 1],
                 shape=(n, n), format="csr")
    rng = np.random.RandomState(5)
    return _csr(a), a.toarray(), rng.randn(n) + 1j * rng.randn(n)


@pytest.fixture(scope="module")
def hermitian():
    """Hermitian positive definite: B Bᴴ/n + diag(1..n)."""
    n = 24
    rng = np.random.RandomState(2)
    b = rng.randn(n, n) + 1j * rng.randn(n, n)
    h = b @ b.conj().T / n + np.diag(np.arange(1.0, n + 1))
    return _csr(sp.csr_matrix(h)), h, rng.randn(n) + 1j * rng.randn(n)


@pytest.fixture(scope="module")
def symmetric():
    """Complex SYMMETRIC (A = Aᵀ, not Hermitian) — the COCG/COCR class."""
    n = 36
    a = sp.diags([-(1 + 0.5j), 4 + 1j, -(1 + 0.5j)], [-1, 0, 1],
                 shape=(n, n), format="csr")
    rng = np.random.RandomState(7)
    return _csr(a), a.toarray(), rng.randn(n) + 1j * rng.randn(n)


GENERAL_SOLVERS = ["bicg", "cgs", "bicgstab", "bicgstabl", "gpbicg",
                   "gmres", "fgmres", "bicgsafe", "bicr", "crs",
                   "bicrstab", "gpbicr", "bicrsafe", "idrs", "idr1"]


@pytest.mark.parametrize("s", GENERAL_SOLVERS)
def test_general_complex_solvers(general, s):
    m, dense, b = general
    r = lis_tpu.solve(m, b, options=f"-i {s} -tol 1e-10 -maxiter 3000")
    assert r.status == lis_tpu.LIS_SUCCESS, (s, r)
    x = np.asarray(r.x)
    assert x.dtype.kind == "c"
    assert np.linalg.norm(dense @ x - b) / np.linalg.norm(b) < 1e-8


@pytest.mark.parametrize("s", ["cg", "minres", "cr"])
def test_hermitian_complex_solvers(hermitian, s):
    m, dense, b = hermitian
    r = lis_tpu.solve(m, b, options=f"-i {s} -tol 1e-10")
    assert r.status == lis_tpu.LIS_SUCCESS, (s, r)
    x = np.asarray(r.x)
    assert np.linalg.norm(dense @ x - b) / np.linalg.norm(b) < 1e-8


@pytest.mark.parametrize("s", ["cocg", "cocr"])
def test_complex_symmetric_solvers(symmetric, s):
    """COCG/COCR exist FOR this class (conjugate-free transpose dots);
    on a complex-symmetric matrix they match BiCG (reference
    lis_solver_cocg.c)."""
    m, dense, b = symmetric
    r = lis_tpu.solve(m, b, options=f"-i {s} -tol 1e-10")
    rb = lis_tpu.solve(m, b, options="-i bicg -tol 1e-10")
    assert r.status == lis_tpu.LIS_SUCCESS, (s, r)
    x = np.asarray(r.x)
    assert np.linalg.norm(dense @ x - b) / np.linalg.norm(b) < 1e-8
    # BiCG on a complex-symmetric matrix reduces to COCG: same counts
    assert abs(r.iters - rb.iters) <= 2


@pytest.mark.parametrize("p", ["jacobi", "ssor", "ilu", "ilut", "iluc",
                               "is", "sainv", "bjacobi", "hybrid"])
def test_complex_precons(general, p):
    m, dense, b = general
    r = lis_tpu.solve(m, b, options=f"-i gmres -p {p} -tol 1e-10")
    assert r.status == lis_tpu.LIS_SUCCESS, (p, r)
    x = np.asarray(r.x)
    tol = 1e-5 if p == "hybrid" else 1e-8   # hybrid: inner-solve-limited
    assert np.linalg.norm(dense @ x - b) / np.linalg.norm(b) < tol


def test_saamg_complex_rejected(general):
    """Parity: the reference's SA-AMG is the real-only F90 module."""
    m, _, b = general
    with pytest.raises(NotImplementedError, match="complex"):
        lis_tpu.solve(m, b, options="-i gmres -p saamg")


ALL_FORMATS = ["csr", "csc", "msr", "dia", "ell", "jad", "bsr", "bsc",
               "vbr", "coo", "dns", "hdi", "bes", "css"]


@pytest.mark.parametrize("fmt", ALL_FORMATS)
def test_complex_matvec_all_formats(general, fmt):
    m, dense, b = general
    mf = convert_matrix(m, fmt)
    np.testing.assert_allclose(np.asarray(mf.matvec(b)), dense @ b,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(mf.matvech(b)),
                               dense.conj().T @ b, atol=1e-12)


@pytest.mark.parametrize("e", ["pi", "ii", "rqi", "cg", "cr", "si", "li",
                               "ai"])
def test_complex_hermitian_esolvers(hermitian, e):
    """All 8 standard families on a complex Hermitian operator: the
    converged value must be in the (real) spectrum."""
    m, dense, _ = hermitian
    w = np.linalg.eigvalsh(dense)
    r = lis_tpu.esolve(m, options=f"-e {e} -ss 3 -emaxiter 5000 "
                                  "-etol 1e-8")
    assert r.status == lis_tpu.LIS_SUCCESS, (e, r)
    assert np.min(np.abs(w - r.evalue)) < 1e-6, (e, r.evalue)


def test_complex_mm_roundtrip(tmp_path, general):
    m, dense, b = general
    p = str(tmp_path / "c.mtx")
    from lis_tpu.io import write_matrix_market, read_matrix_market
    write_matrix_market(p, m)
    m2 = read_matrix_market(p)
    np.testing.assert_allclose(np.asarray(m2.to_dense()), dense,
                               rtol=1e-12)


def test_complex_scipy_binding(general):
    """interop cg/bicgstab keep complex dtype end-to-end."""
    from lis_tpu.interop import bicgstab, to_scipy
    m, dense, b = general
    a = to_scipy(m)
    x, info = bicgstab(a, b, rtol=1e-10)
    assert info == 0
    assert np.iscomplexobj(x)
    assert np.linalg.norm(dense @ x - b) / np.linalg.norm(b) < 1e-8


@pytest.mark.parametrize("e", ["gpi", "gii", "grqi", "gcg", "gcr", "gli",
                               "gai"])
def test_complex_generalized_esolvers(hermitian, e):
    """G* families on a complex Hermitian pencil (A complex HPD, B real
    SPD): converged value in the real generalized spectrum.  (gsi is
    exercised separately — deflated SI can stagnate a hair above etol,
    the same plateau as the standard family.)"""
    import scipy.linalg as sla
    m, dense, _ = hermitian
    n = dense.shape[0]
    bp = sp.diags([0.5, 2.0, 0.5], [-1, 0, 1], shape=(n, n)).toarray()
    bm = _csr(sp.csr_matrix(bp))
    w = np.sort(sla.eigvals(dense, bp).real)
    r = lis_tpu.gesolve(m, bm, options=f"-e {e} -ss 3 -emaxiter 5000 "
                                       "-etol 1e-8")
    assert r.status == lis_tpu.LIS_SUCCESS, (e, r)
    assert np.min(np.abs(w - r.evalue)) < 1e-6, (e, r.evalue)


@pytest.mark.parametrize("fmt", ["css", "bsr"])
def test_real_matrix_complex_vector_not_truncated(fmt):
    """A REAL matrix in the windowed formats times a COMPLEX vector must
    promote, not silently truncate the imaginary part (css/bsr slabs
    cast x to the slab dtype before the fix)."""
    n = 64
    rng = np.random.RandomState(9)
    a = sp.random(n, n, density=0.15, random_state=rng, format="csr") \
        + sp.eye(n) * 4.0
    a = a.tocsr()
    a.sort_indices()
    m = convert_matrix(_csr(a), fmt)
    x = rng.randn(n) + 1j * rng.randn(n)
    np.testing.assert_allclose(np.asarray(m.matvec(x)), a @ x, atol=1e-11)
    np.testing.assert_allclose(np.asarray(m.matvech(x)),
                               a.T.conj() @ x, atol=1e-11)
