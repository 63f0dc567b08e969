"""CLI smoke tests (reference: the installed binaries are themselves the
integration tests, test/Makefile.am:68-76 + test/test.sh)."""

import io
import sys

import numpy as np
import pytest

import lis_tpu
from lis_tpu.io.mm import write_matrix_market, write_vector_mm
from tests.problems import poisson2d


@pytest.fixture()
def mtx(tmp_path):
    p = tmp_path / "a.mtx"
    write_matrix_market(str(p), poisson2d(6, 6))
    return str(p)


def _run(mod, argv):
    import importlib
    m = importlib.import_module(f"lis_tpu.cli.{mod}")
    old = sys.stdout
    sys.stdout = buf = io.StringIO()
    try:
        rc = m.main(argv)
    finally:
        sys.stdout = old
    return rc, buf.getvalue()


def test_lsolve_cli(mtx, tmp_path):
    sol = str(tmp_path / "x.mtx")
    rc, out = _run("lsolve", [mtx, "2", sol, "-i", "cg", "-tol", "1e-10"])
    assert rc == 0
    assert "number of iterations" in out
    from lis_tpu.io.mm import read_vector_mm
    x = np.asarray(read_vector_mm(sol))
    np.testing.assert_allclose(x, 1.0, atol=1e-7)


def test_lsolve_cli_rhs_file(mtx, tmp_path):
    bfile = str(tmp_path / "b.mtx")
    write_vector_mm(bfile, np.ones(36))
    rc, out = _run("lsolve", [mtx, bfile, "-i", "bicgstab"])
    assert rc == 0


def test_esolve_cli(mtx):
    rc, out = _run("esolve", [mtx, "-e", "pi", "-etol", "1e-8"])
    assert rc == 0
    assert "eigenvalue" in out


def test_spmvtest_cli():
    rc, out = _run("spmvtest", ["1", "200", "3"])
    assert rc == 0
    assert "MFLOPS" in out


def test_spmvtest4_filelist(mtx, tmp_path):
    lst = tmp_path / "list.txt"
    lst.write_text(mtx + "\n")
    rc, out = _run("spmvtest", ["4", str(lst), "3"])
    assert rc == 0


def test_hpcg_cli():
    rc, out = _run("hpcg", ["4", "4", "4", "-tol", "1e-6"])
    assert rc == 0


def test_scaling_cli():
    rc, out = _run("scaling", ["weak", "16", "16", "5", "1", "2"])
    assert rc == 0
    assert "efficiency" in out


def test_cli_reference_binary_names(tmp_path):
    """The reference installs esolve/esolver/gesolve/gesolver as distinct
    binaries (test/Makefile.am:68-76); all four names run here."""
    import subprocess, sys
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/root"}
    mat = "/root/reference/test/testmat.mtx"
    for mod, args in (("esolver", [mat, "-e", "pi", "-etol", "1e-6"]),
                      ("gesolve", [mat, mat, "-e", "gpi",
                                   "-etol", "1e-6"]),
                      ("gesolver", [mat, mat, "-e", "gpi",
                                    "-etol", "1e-6"])):
        out = subprocess.run([sys.executable, "-m", f"lis_tpu.cli.{mod}",
                              *args], capture_output=True, text=True,
                             env=env)
        assert out.returncode == 0, (mod, out.stderr[-300:])
        assert "eigenvalue" in out.stdout


def test_gesolve_missing_b_is_usage_error():
    """gesolve without a B matrix must print usage and exit nonzero, not
    silently solve the standard problem under a 'gesolve' label."""
    import subprocess, sys
    out = subprocess.run([sys.executable, "-m", "lis_tpu.cli.gesolve",
                          "/root/reference/test/testmat.mtx", "-e", "gpi"],
                         capture_output=True, text=True,
                         env={"PYTHONPATH": "/root/repo",
                              "PATH": "/usr/bin:/bin",
                              "JAX_PLATFORMS": "cpu", "HOME": "/root"})
    assert out.returncode == 1
    assert "Usage" in out.stdout
