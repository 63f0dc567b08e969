"""On-chip lowering + correctness tier (`LIS_TEST_TPU=1 pytest -m tpu`).

The 467-test CPU suite structurally cannot catch TPU (Mosaic) lowering
bugs: every Pallas kernel is guarded behind ``jax.default_backend() !=
"cpu"``.  This tier re-runs the format/kernel oracles ON the chip — the
analogue of the reference running one suite across serial/OMP/MPI builds
(test/test.sh:14-50).  A fuller sweep lives in experiments/chip_smoke.py
(the pre-commit gate for Pallas changes); these are the fast pinned
regressions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.problems import poisson2d, random_sparse

pytestmark = pytest.mark.tpu


FORMATS = ["csr", "csc", "msr", "dia", "ell", "jad", "bsr", "bsc", "vbr",
           "coo", "dns", "bes", "css", "cst"]


@pytest.fixture(scope="module")
def prob():
    a = random_sparse(37, density=0.15, seed=3)
    return a, a.to_dense(), np.random.default_rng(7).standard_normal(37)


@pytest.mark.parametrize("fmt", FORMATS)
def test_matvec_on_chip(prob, fmt):
    from lis_tpu.matrix.convert import convert_matrix
    a, dense, x = prob
    m = convert_matrix(a, fmt)
    y = np.asarray(jax.jit(m.matvec)(jnp.asarray(x)))
    np.testing.assert_allclose(y, dense @ x, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("fmt", FORMATS)
def test_matvech_on_chip(prob, fmt):
    from lis_tpu.matrix.convert import convert_matrix
    a, dense, x = prob
    m = convert_matrix(a, fmt)
    y = np.asarray(jax.jit(m.matvech)(jnp.asarray(x)))
    np.testing.assert_allclose(y, dense.T @ x, rtol=2e-5, atol=2e-5)


def _random_cst(n, k, seed=0):
    import scipy.sparse as sp
    from lis_tpu.matrix.cst import CSTMatrix
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), k)
    cols = rng.integers(0, n, size=n * k)
    m = sp.coo_matrix((rng.standard_normal(n * k).astype(np.float32),
                       (rows, cols)), shape=(n, n)).tocsr()
    m.sum_duplicates()
    m.sort_indices()
    A = CSTMatrix.from_csr_arrays(m.indptr, m.indices, m.data, m.shape,
                                  transpose=False)
    return A, m


# (n, k) classes: Kp<=8 legacy tile, Kp=32 (the round-4 Mosaic
# regression: W//Kp=32 was an illegal output block), beta=16384 fused
# front (G widened from 4 to 8)
@pytest.mark.parametrize("n,k", [(1 << 16, 3), (1 << 16, 16),
                                 (1 << 14, 100)])
def test_cst_matvec_kernel_classes(n, k):
    A, m = _random_cst(n, k)
    x = np.random.default_rng(1).standard_normal(n).astype(np.float32)
    got = np.asarray(jax.jit(A.matvec)(jnp.asarray(x)))
    want = m @ x
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-6, (rel, A.Kp, A.beta)


def test_fused_front_equals_unfused():
    """ADVICE r4: pin _fused_front's BlockSpec bucket transpose against
    the unfused select/multiply/swapaxes chain."""
    A, _ = _random_cst(1 << 16, 16, seed=2)
    assert A._front_tile() is not None
    x = np.random.default_rng(3).standard_normal(1 << 16).astype(np.float32)
    xp = jnp.pad(jnp.asarray(x), (0, A.n_pad - (1 << 16)))
    fused = np.asarray(A._fused_front(xp))
    sel = A._select(jnp.asarray(x))
    contrib = sel * A.val
    CB = A.n_pad // 128
    t = jnp.swapaxes(contrib.reshape(CB, A.RBc, A.beta), 0, 1)
    np.testing.assert_allclose(fused, np.asarray(t).reshape(-1),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("Kp", [4, 32, 128])
def test_plan_apply_rowsum(Kp):
    """ShufflePlan.apply_rowsum (fused final pass + row reduction) across
    the Kp tile classes, vs the unfused numpy oracle."""
    from lis_tpu.ops.shuffle import plan_shuffle
    rng = np.random.default_rng(5)
    M = 1 << 18
    nreal = M // 2
    src = rng.choice(M, size=nreal, replace=False).astype(np.int64)
    dst = rng.choice(M, size=nreal, replace=False).astype(np.int64)
    perm = np.full(M, -1, dtype=np.int64)
    perm[src] = dst
    plan = plan_shuffle(perm, exact_holes=True)
    v = np.zeros(M, dtype=np.float32)
    v[src] = rng.standard_normal(nreal).astype(np.float32)
    want_full = np.zeros(M, dtype=np.float32)
    want_full[dst] = v[src]
    got = np.asarray(jax.jit(lambda t: plan.apply_rowsum(t, Kp))(
        jnp.asarray(v)))
    np.testing.assert_allclose(got, want_full.reshape(-1, Kp).sum(axis=1),
                               rtol=2e-5, atol=2e-5)


def test_solve_cg_on_chip():
    """End-to-end solve on the chip (auto-routing to DIA)."""
    import lis_tpu
    a = poisson2d(24, 24)
    b = np.ones(a.nrows)
    r = lis_tpu.solve(a, b, options="-i cg -p jacobi -tol 1e-8")
    assert r.status == 0
    assert r.true_resid < 1e-6


def test_forced_gather_storage_warns():
    """-storage ell (or any gather-bound format) on a TPU backend must
    warn loudly about the ~1000x roofline penalty and point at
    auto-routing (VERDICT r4 weak #7)."""
    import warnings
    import lis_tpu
    a = poisson2d(12, 12)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        lis_tpu.solve(a, np.ones(a.nrows),
                      options="-i cg -tol 1e-6 -storage ell -maxiter 60")
    assert any("gather-bound" in str(x.message) for x in w)


def test_esolve_on_chip():
    """End-to-end eigensolve on the chip (inverse iteration on the 2-D
    Poisson operator; smallest eigenvalue known analytically)."""
    import lis_tpu
    a = poisson2d(16, 16)
    r = lis_tpu.esolve(a, options="-e ii -etol 1e-8 -emaxiter 2000")
    assert r.status == lis_tpu.LIS_SUCCESS
    lam = 4 * (np.sin(np.pi / 34) ** 2 + np.sin(np.pi / 34) ** 2)
    assert abs(r.evalue - lam) < 1e-5, (r.evalue, lam)
