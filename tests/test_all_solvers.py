"""Every solver in the registry converges on suitable problems.

Parity model: the reference asserts convergence behavior, not exact
floating-point values (its own serial/OMP/MPI runs differ in last-ulp
residuals, doc/lis-ug-en.tex:576-640).
"""

import numpy as np
import pytest
import jax.numpy as jnp

import lis_tpu
from lis_tpu import solve
from lis_tpu.runtime.options import SOLVER_NAMES
from lis_tpu.solvers.base import SOLVER_FNS
from tests.problems import poisson2d, random_sparse

SPD_SOLVERS = ["cg", "cr", "minres", "orthomin", "gmres", "fgmres"]
GENERAL = ["bicg", "bicr", "cgs", "crs", "bicgstab", "bicrstab",
           "bicgstabl", "gpbicg", "gpbicr", "bicgsafe", "bicrsafe",
           "tfqmr", "idrs", "idr1", "gmres", "fgmres", "orthomin"]
STATIONARY = ["jacobi", "gs", "sor"]
COMPLEX_SYM = ["cocg", "cocr"]


def _resid(a, b, x):
    return (np.linalg.norm(np.asarray(b) - a.to_dense() @ np.asarray(x))
            / np.linalg.norm(np.asarray(b)))


def test_registry_complete():
    """All 25 reference solver names are implemented."""
    base = {k for k in SOLVER_FNS if not k.endswith("_quad")}
    assert set(SOLVER_NAMES) == base


@pytest.mark.parametrize("name", sorted(set(SPD_SOLVERS + GENERAL)))
def test_solver_spd(name):
    a = poisson2d(9, 9)
    b = np.ones(81)
    res = solve(a, b, options=f"-i {name} -tol 1e-10 -maxiter 2000")
    assert res.status == lis_tpu.LIS_SUCCESS, res
    assert _resid(a, b, res.x) < 1e-8, res


@pytest.mark.parametrize("name", sorted(set(GENERAL)))
def test_solver_nonsymmetric(name):
    a = random_sparse(70, density=0.07, seed=11)
    b = np.arange(1, 71, dtype=float)
    res = solve(a, b, options=f"-i {name} -tol 1e-10 -maxiter 2000")
    assert res.status == lis_tpu.LIS_SUCCESS, res
    assert _resid(a, b, res.x) < 1e-8, res


@pytest.mark.parametrize("name", STATIONARY)
def test_solver_stationary(name):
    a = random_sparse(50, density=0.05, seed=4, spd=True)  # diag dominant
    b = np.ones(50)
    res = solve(a, b, options=f"-i {name} -tol 1e-10 -maxiter 5000")
    assert res.status == lis_tpu.LIS_SUCCESS, res
    assert _resid(a, b, res.x) < 1e-8, res


@pytest.mark.parametrize("name", COMPLEX_SYM)
def test_solver_complex_symmetric(name):
    import scipy.sparse as sp
    from lis_tpu.matrix.csr import CSRMatrix
    rng = np.random.default_rng(3)
    n = 40
    re = sp.random(n, n, density=0.1, random_state=rng)
    im = sp.random(n, n, density=0.1, random_state=rng)
    c = (re + re.T) + 1j * (im + im.T) + n * sp.identity(n)
    a = CSRMatrix.from_dense(c.toarray())
    b = np.ones(n, dtype=complex)
    res = solve(a, b, options=f"-i {name} -tol 1e-10")
    assert res.status == lis_tpu.LIS_SUCCESS, res
    assert _resid(a, b, res.x) < 1e-8, res


@pytest.mark.parametrize("name", ["cg", "bicg", "gmres", "bicgstab", "idrs"])
def test_solver_with_jacobi_precon(name):
    a = poisson2d(8, 8)
    b = np.ones(64)
    res = solve(a, b, options=f"-i {name} -p jacobi -tol 1e-10")
    assert res.status == lis_tpu.LIS_SUCCESS
    assert _resid(a, b, res.x) < 1e-8


def test_gmres_restart_effect():
    a = random_sparse(120, density=0.04, seed=9)
    b = np.ones(120)
    res_small = solve(a, b, options="-i gmres -restart 5 -tol 1e-10")
    res_big = solve(a, b, options="-i gmres -restart 40 -tol 1e-10")
    assert res_big.status == lis_tpu.LIS_SUCCESS
    assert res_big.iters <= res_small.iters


def test_bicgstabl_ell_option():
    a = random_sparse(60, density=0.08, seed=13)
    b = np.ones(60)
    for ell in (1, 2, 4):
        res = solve(a, b, options=f"-i bicgstabl -ell {ell} -tol 1e-10")
        assert res.status == lis_tpu.LIS_SUCCESS, (ell, res)


def test_idrs_shadow_dim():
    a = random_sparse(60, density=0.08, seed=13)
    b = np.ones(60)
    for s in (1, 2, 4):
        res = solve(a, b, options=f"-i idrs -irestart {s} -tol 1e-10")
        assert res.status == lis_tpu.LIS_SUCCESS, (s, res)
