"""The reference's `make check` sequence (test/test.sh:28-50), replicated
end-to-end: linear solve on testmat.mtx, eigensolve on testmat.mtx, the
quad-precision demo (test5), and CG+SAAMG on generated 2-D Poisson
(test2).  The Fortran-interface step maps to the compat shim, covered in
test_compat.py."""

import os

import numpy as np
import pytest

import lis_tpu
from lis_tpu import solve, esolve
from tests.problems import poisson2d, gamma_matrix

TESTMAT = "/root/reference/test/testmat.mtx"
needs_testmat = pytest.mark.skipif(not os.path.exists(TESTMAT),
                                   reason="reference testmat not mounted")


@needs_testmat
def test_linear_solvers_step():
    """$ test1 testmat.mtx 0  — default BiCG, b from file or A*1."""
    A, b, _ = lis_tpu.lis_input(TESTMAT)
    if b is None:
        b = A.matvec(np.ones(A.nrows))
    r = solve(A, b)                        # reference defaults: BiCG, 1e-12
    assert r.status == lis_tpu.LIS_SUCCESS
    # user guide: 15 iterations, rel resid ~6.3e-15 (doc/lis-ug-en.tex:578)
    assert r.iters == 15
    assert r.resid < 1e-12


@needs_testmat
def test_eigensolvers_step():
    """$ etest1 testmat.mtx — default eigensolver on the test matrix."""
    A, _, _ = lis_tpu.lis_input(TESTMAT)
    r = esolve(A, options="-e ii -etol 1e-8")
    assert r.status == lis_tpu.LIS_SUCCESS
    assert r.resid < 1e-7


def test_quad_precision_step():
    """$ test5 200 2.0 -f double|quad — double stalls on the gamma matrix,
    quad converges."""
    g = gamma_matrix(200, 2.0)
    b = np.asarray(g.to_dense() @ np.ones(200))
    rd = solve(g, b, options="-i bicg -f double -tol 1e-12 -maxiter 1000")
    rq = solve(g, b, options="-i bicg -f quad -tol 1e-12 -maxiter 1000")
    assert rd.status == lis_tpu.LIS_MAXITER          # double stalls
    assert rq.status == lis_tpu.LIS_SUCCESS          # quad converges
    assert np.abs(np.asarray(rq.x) - 1.0).max() < 1e-8


def test_saamg_step():
    """$ test2 10 10 1 -i cg -p saamg — CG+SAAMG on 2-D 5-pt Poisson."""
    A = poisson2d(10, 10)
    b = A.matvec(np.ones(100))
    r = solve(A, b, options="-i cg -p saamg -tol 1e-12")
    assert r.status == lis_tpu.LIS_SUCCESS
    assert r.iters < 30                    # AMG: few iterations
    assert np.abs(np.asarray(r.x) - 1.0).max() < 1e-9
