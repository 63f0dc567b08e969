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


# ---- reference Fortran test-program flows (test/test1f.F, test2f.F90,
# ---- test6f.F90, test7f.F, etest1f.F) through the F77-ABI shim ----------------

import os as _os
import subprocess as _sp

_NATIVE = _os.path.join(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))), "lis_tpu", "_native")
_FTEST = _os.path.join(_NATIVE, "ftest")


@pytest.fixture(scope="module")
def ftest_build():
    """Build liblisf_tpu.so and the C drivers that emit the exact
    gfortran call sequences of the reference's Fortran test programs."""
    import shutil
    if shutil.which("gcc") is None or shutil.which("python3-config") is None:
        pytest.skip("no C toolchain")
    lib = _os.path.join(_NATIVE, "liblisf_tpu.so")
    inc = _sp.run(["python3-config", "--includes"],
                  capture_output=True, text=True).stdout.split()
    ld = _sp.run(["python3-config", "--ldflags", "--embed"],
                 capture_output=True, text=True).stdout.split()
    r = _sp.run(["gcc", "-shared", "-fPIC",
                 _os.path.join(_NATIVE, "lisf_tpu.c")] + inc + ld
                + ["-o", lib], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    exes = {}
    for t in ("test1f", "test2f", "test6f", "test7f", "test8f",
              "etest1f", "etest4f"):
        exe = _os.path.join(_FTEST, t)
        r = _sp.run(["gcc", _os.path.join(_FTEST, t + ".c"), "-I" + _FTEST,
                     "-L" + _NATIVE, "-llisf_tpu", "-Wl,-rpath," + _NATIVE,
                     "-o", exe], capture_output=True, text=True)
        assert r.returncode == 0, (t, r.stderr)
        exes[t] = exe
    return exes


def _run_ftest(exe, *args, timeout=300):
    env = dict(_os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=_os.path.dirname(_os.path.dirname(_NATIVE)))
    return _sp.run([exe, *map(str, args)], capture_output=True, text=True,
                   env=env, timeout=timeout)


def test_fortran_test1f_flow(ftest_build, tmp_path):
    """test1f: file-driven solve with -print/-optionC, solution +
    rhistory written (reference test/test1f.F)."""
    mtx = "/root/reference/test/testmat.mtx"
    if not _os.path.exists(mtx):
        pytest.skip("reference testmat.mtx not available")
    sol, rh = tmp_path / "sol.mtx", tmp_path / "rh.txt"
    r = _run_ftest(ftest_build["test1f"], mtx, 1, sol, rh,
                   "-i", "bicg", "-tol", "1e-12")
    assert r.returncode == 0, (r.stdout, r.stderr)
    # the rebuilt reference binary: test1f testmat.mtx 1 ... -i bicg
    # converges in 15 iterations at tol 1e-12
    assert "bicg: number of iterations = 15" in r.stdout
    assert sol.exists() and rh.exists()
    assert float(rh.read_text().splitlines()[0]) == 1.0


def test_fortran_test2f_flow(ftest_build, tmp_path):
    """test2f: set_csr assembly from caller-owned Fortran buffers +
    convert + solve (reference test/test2f.F90)."""
    sol, rh = tmp_path / "sol.mtx", tmp_path / "rh.txt"
    r = _run_ftest(ftest_build["test2f"], 10, 10, 1, sol, rh,
                   "-i", "cg", "-p", "jacobi", "-tol", "1e-10")
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "matrix size = 100 x 100 (460 nonzero entries)" in r.stdout
    assert "cg: number of iterations = 15" in r.stdout


def test_fortran_test6f_flow(ftest_build):
    """test6f: dense direct solve through lis_array_* on raw
    column-major Fortran buffers (reference test/test6f.F90)."""
    r = _run_ftest(ftest_build["test6f"], 8, 8)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "matrix size = 64 x 64 (288 nonzero entries)" in r.stdout
    resid = float(r.stdout.rsplit("relative residual    = ", 1)[1].split()[0])
    assert resid < 1e-12


def test_fortran_test7f_flow(ftest_build):
    """test7f: vector print/conjugate/dot/nrm2 (reference
    test/test7f.F; driven real-valued like the reference's default
    non-COMPLEX build)."""
    r = _run_ftest(ftest_build["test7f"])
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "inner product (v,v) = 40.0" in r.stdout


def test_fortran_etest1f_flow(ftest_build, tmp_path):
    """etest1f: file-driven eigensolve with esolver getters + rhistory
    (reference test/etest1f.F)."""
    mtx = "/root/reference/test/testmat.mtx"
    if not _os.path.exists(mtx):
        pytest.skip("reference testmat.mtx not available")
    ev, rh = tmp_path / "ev.mtx", tmp_path / "rh.txt"
    r = _run_ftest(ftest_build["etest1f"], mtx, ev, rh,
                   "-e", "pi", "-emaxiter", "2000")
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "pi: eigenvalue           = 7.36" in r.stdout
    assert ev.exists() and rh.exists()


def test_fortran_test8f_psd_flow(ftest_build):
    """test8f: the PSD (Preconditioner and Solver Decoupled) workflow —
    lis_solver_set_matrix + lis_precon_psd_create + lis_solve_kernel,
    then lis_matrix_psd_set_value / lis_precon_psd_update /
    psd_reset_scale and a second decoupled solve (reference
    test/test8f.F90)."""
    import re
    r = _run_ftest(ftest_build["test8f"], 50)
    assert r.returncode == 0, (r.stdout, r.stderr)
    m1 = re.search(r"pass 1: iters = (\d+), resid = ([0-9.e+-]+)", r.stdout)
    m2 = re.search(r"pass 2: iters = (\d+), resid = ([0-9.e+-]+)", r.stdout)
    assert m1 and m2, r.stdout
    # both converged under the 1e-12 tolerance; the refreshed ILU on the
    # better-conditioned pass needs no more iterations than pass 1
    assert float(m1.group(2)) < 1e-11 and float(m2.group(2)) < 1e-11
    assert int(m2.group(1)) <= int(m1.group(1))


def test_fortran_etest4f_flow(ftest_build):
    """etest4f: assembled 1-D Laplacian eigensolve with -e from the
    captured command line, full getter surface (reference
    test/etest4f.F). The exact smallest eigenvalue of tridiag(-1,2,-1)
    at n=50 under inverse iteration is 2-2cos(pi/51)."""
    import math
    r = _run_ftest(ftest_build["etest4f"], 50, "-e", "ii", "-emaxiter",
                   "3000", "-etol", "1e-10")
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "matrix size = 50 x 50 (148 nonzero entries)" in r.stdout
    line = [l for l in r.stdout.splitlines() if "eigenvalue" in l][0]
    ev = float(line.split("=")[1])
    assert abs(ev - (2 - 2 * math.cos(math.pi / 51))) < 1e-8
    assert "ii: number of iterations" in r.stdout
