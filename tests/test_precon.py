"""Preconditioner coverage: all 11 reference types + additive Schwarz."""

import numpy as np
import pytest

import lis_tpu
from lis_tpu import solve
from lis_tpu.precon.base import PRECON_REGISTRY
from lis_tpu.runtime.options import PRECON_NAMES
from tests.problems import poisson2d, random_sparse

ALL_PRECONS = ["none", "jacobi", "ssor", "ilu", "ilut", "iluc",
               "hybrid", "is", "sainv", "bjacobi", "saamg"]


def _resid(a, b, x):
    return (np.linalg.norm(np.asarray(b) - a.to_dense() @ np.asarray(x))
            / np.linalg.norm(np.asarray(b)))


def test_registry_complete():
    assert set(PRECON_NAMES) - {"none"} == set(PRECON_REGISTRY)


@pytest.mark.parametrize("p", ALL_PRECONS)
def test_precon_bicgstab(p):
    a = poisson2d(9, 9)
    b = np.ones(81)
    res = solve(a, b, options=f"-i bicgstab -p {p} -tol 1e-10 -maxiter 2000")
    assert res.status == lis_tpu.LIS_SUCCESS, (p, res)
    assert _resid(a, b, res.x) < 1e-8


@pytest.mark.parametrize("p", ["jacobi", "ssor", "ilu", "saamg"])
def test_precon_accelerates_cg(p):
    a = poisson2d(12, 12)
    b = np.ones(144)
    base = solve(a, b, options="-i cg -tol 1e-10")
    pre = solve(a, b, options=f"-i cg -p {p} -tol 1e-10")
    assert pre.status == lis_tpu.LIS_SUCCESS
    assert pre.iters <= base.iters + 1, (p, pre.iters, base.iters)


@pytest.mark.parametrize("p", ["jacobi", "ssor", "ilu", "ilut", "sainv"])
def test_precon_with_bicg_needs_psolveh(p):
    """BiCG exercises psolveh (Mᴴ solve) — the transpose plans must be
    consistent with psolve."""
    a = random_sparse(60, density=0.08, seed=21)
    b = np.ones(60)
    res = solve(a, b, options=f"-i bicg -p {p} -tol 1e-10 -maxiter 2000")
    assert res.status == lis_tpu.LIS_SUCCESS, (p, res)
    assert _resid(a, b, res.x) < 1e-8


def test_ilu_fill_levels():
    a = poisson2d(10, 10)
    b = np.ones(100)
    iters = {}
    for k in (0, 1, 2):
        res = solve(a, b, options=f"-i cg -p ilu -ilu_fill {k} -tol 1e-10")
        assert res.status == lis_tpu.LIS_SUCCESS
        iters[k] = res.iters
    assert iters[2] <= iters[0]    # more fill, better preconditioner


def test_saamg_coarsens():
    from lis_tpu.precon.saamg import build_hierarchy
    import scipy.sparse as sp
    a = poisson2d(20, 20)
    ptr, idx, val = a.to_csr_arrays()
    levels, coarse = build_hierarchy(sp.csr_matrix((val, idx, ptr)))
    assert len(levels) >= 2
    assert coarse.shape[0] < 400 / 4


def test_additive_schwarz_wrapper():
    a = poisson2d(9, 9)
    b = np.ones(81)
    plain = solve(a, b, options="-i cg -p ssor -tol 1e-10")
    adds = solve(a, b, options="-i cg -p ssor -adds true -adds_iter 1 -tol 1e-10")
    assert adds.status == lis_tpu.LIS_SUCCESS
    assert adds.iters <= plain.iters


def test_hybrid_inner_options():
    a = poisson2d(8, 8)
    b = np.ones(64)
    res = solve(a, b, options="-i gmres -p hybrid -hybrid_i gmres "
                              "-hybrid_maxiter 10 -tol 1e-10")
    assert res.status == lis_tpu.LIS_SUCCESS
