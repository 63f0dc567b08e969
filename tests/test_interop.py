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


def test_fortran_abi_binding():
    """The Fortran/C binding shim (_native/lisf_tpu.c — the analogue of
    the reference's src/fortran/lisf_*.c layer): build the shared library
    (embedding CPython), compile the demo driver that calls it through
    the exact gfortran ABI (trailing underscores, by-reference args,
    hidden string length), and run the reference's test4f flow."""
    import os
    import shutil
    import subprocess
    import sys
    if shutil.which("gcc") is None or shutil.which("python3-config") is None:
        pytest.skip("no C toolchain")
    here = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "lis_tpu", "_native")
    lib = os.path.join(here, "liblisf_tpu.so")
    inc = subprocess.run(["python3-config", "--includes"],
                        capture_output=True, text=True).stdout.split()
    ld = subprocess.run(["python3-config", "--ldflags", "--embed"],
                        capture_output=True, text=True).stdout.split()
    r = subprocess.run(["gcc", "-shared", "-fPIC",
                        os.path.join(here, "lisf_tpu.c")] + inc + ld
                       + ["-o", lib], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    exe = os.path.join(here, "lisf_demo_test")
    r = subprocess.run(["gcc", os.path.join(here, "lisf_demo.c"),
                        "-L" + here, "-llisf_tpu", "-Wl,-rpath," + here,
                        "-o", exe], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(here)))
    r = subprocess.run([exe], capture_output=True, text=True, env=env,
                       timeout=240)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "F77-ABI binding OK" in r.stdout
    os.unlink(exe)
