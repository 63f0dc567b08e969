"""scipy.sparse.linalg-compatible bindings (the language-bindings analogue,
SURVEY.md §2.12; reference src/fortran/lisf_*.c)."""

import numpy as np
import pytest
import scipy.sparse as sp

from lis_tpu.interop import (cg, bicgstab, gmres, from_scipy, to_scipy,
                             aslinearoperator)
from tests.problems import poisson2d


@pytest.fixture(scope="module")
def spd():
    a = to_scipy(poisson2d(15, 15))
    b = np.ones(225)
    return a, b


def test_cg_matches_scipy(spd):
    a, b = spd
    x, info = cg(a, b, rtol=1e-10)
    assert info == 0
    xs, infos = __import__("scipy.sparse.linalg", fromlist=["cg"]).cg(
        a, b, rtol=1e-10)
    np.testing.assert_allclose(x, xs, atol=1e-7)


def test_bicgstab_with_precon_name(spd):
    a, b = spd
    x, info = bicgstab(a, b, rtol=1e-10, M="ilu")
    assert info == 0
    assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 1e-9


def test_gmres_restart(spd):
    a, b = spd
    x, info = gmres(a, b, rtol=1e-10, restart=30)
    assert info == 0
    assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 1e-9


def test_maxiter_info(spd):
    a, b = spd
    x, info = cg(a, b, rtol=1e-14, maxiter=3)
    assert info > 0


def test_from_scipy_formats(spd):
    a, _ = spd
    m = from_scipy(a, matrix_type="ell")
    np.testing.assert_allclose(np.asarray(m.to_dense()), a.toarray())


def test_aslinearoperator(spd):
    a, b = spd
    op = aslinearoperator(from_scipy(a))
    np.testing.assert_allclose(op @ b, a @ b, rtol=1e-12)


def test_user_supplied_precon_object(spd):
    """solve(M=<object>) — the analogue of lis_precon_register user
    preconditioners (lis_precon.c:411)."""
    from lis_tpu import solve
    from lis_tpu.precon.ilu import create_iluk
    from lis_tpu.runtime.options import SolverOptions
    a, b = spd
    m = from_scipy(a)
    M = create_iluk(m, SolverOptions.from_string("-ilu_fill 1"))
    res = solve(m, b, options="-i cg -tol 1e-10", M=M)
    assert res.status == 0
    assert res.true_resid < 1e-9
