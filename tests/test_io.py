"""I/O tests: Matrix Market, Harwell-Boeing, Lis ASCII, checkpointing."""

import os

import numpy as np
import pytest

import lis_tpu
from lis_tpu.io.mm import (read_matrix_market, read_vector_mm,
                           write_matrix_market, write_vector_mm)
from lis_tpu.io.lisio import read_lis_file, write_lis_file
from lis_tpu.io.hb import read_harwell_boeing
from tests.problems import poisson2d, random_sparse


def test_mm_roundtrip(tmp_path):
    a = random_sparse(40, 0.1, seed=2)
    p = str(tmp_path / "a.mtx")
    write_matrix_market(p, a)
    b = read_matrix_market(p)
    np.testing.assert_allclose(b.to_dense(), a.to_dense(), rtol=1e-15)


def test_mm_symmetric_expansion(tmp_path):
    p = str(tmp_path / "s.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("3 3 4\n1 1 2.0\n2 2 2.0\n3 3 2.0\n3 1 -1.0\n")
    a = read_matrix_market(p)
    d = a.to_dense()
    assert d[0, 2] == -1.0 and d[2, 0] == -1.0


def test_mm_pattern(tmp_path):
    p = str(tmp_path / "p.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write("2 2 2\n1 1\n2 2\n")
    a = read_matrix_market(p)
    np.testing.assert_allclose(a.to_dense(), np.eye(2))


def test_mm_vector_roundtrip(tmp_path):
    v = np.linspace(0, 1, 17)
    p = str(tmp_path / "v.mtx")
    write_vector_mm(p, v)
    np.testing.assert_allclose(np.asarray(read_vector_mm(p)), v)


def test_lis_ascii_roundtrip(tmp_path):
    a = poisson2d(4, 4)
    b = np.arange(16.0)
    p = str(tmp_path / "a.lis")
    write_lis_file(p, a, b=b)
    a2, b2, x2 = read_lis_file(p)
    np.testing.assert_allclose(a2.to_dense(), a.to_dense())
    np.testing.assert_allclose(np.asarray(b2), b)
    assert x2 is None


def test_hb_read(tmp_path):
    """Write a minimal fixed-format RUA file and read it back."""
    p = str(tmp_path / "t.rua")
    # 2x2 matrix [[4,-1],[0,3]] in CSC
    lines = [
        "title".ljust(72) + "key".ljust(8),
        f"{3:14d}{1:14d}{1:14d}{1:14d}{0:14d}",
        "RUA".ljust(14) + f"{2:14d}{2:14d}{3:14d}{0:14d}",
        "(3I8)".ljust(16) + "(3I8)".ljust(16) + "(3E20.12)".ljust(20),
        f"{1:8d}{2:8d}{4:8d}",
        f"{1:8d}{1:8d}{2:8d}",
        f"{4.0:20.12E}{-1.0:20.12E}{3.0:20.12E}",
    ]
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    a = read_harwell_boeing(p)
    np.testing.assert_allclose(a.to_dense(), [[4.0, -1.0], [0.0, 3.0]])


def test_reference_testmat_readable():
    path = "/root/reference/test/testmat.mtx"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    a = read_matrix_market(path)
    assert a.shape == (100, 100) and a.nnz == 460


def test_checkpoint_resume(tmp_path):
    from lis_tpu import solve
    from lis_tpu.utils.checkpoint import (save_checkpoint, resume_solve,
                                          output_rhistory)
    a = poisson2d(10, 10)
    b = np.ones(100)
    part = solve(a, b, options="-i cg -tol 1e-12 -maxiter 8")
    assert part.status == lis_tpu.LIS_MAXITER
    ck = str(tmp_path / "ck.npz")
    save_checkpoint(ck, part)
    res = resume_solve(a, b, ck, options="-i cg -tol 1e-12")
    assert res.status == lis_tpu.LIS_SUCCESS
    assert res.resid < 1e-12
    rh = str(tmp_path / "rh.txt")
    output_rhistory(rh, res)
    assert len(open(rh).readlines()) == len(res.rhistory)


def test_lis_input_autodetect(tmp_path):
    from lis_tpu.io import lis_input, lis_input_vector, lis_output
    from lis_tpu.io.plain import write_vector_plain
    from lis_tpu.io.mm import write_matrix_market
    from tests.problems import poisson2d
    a = poisson2d(5, 5)
    write_matrix_market(str(tmp_path / "a.mtx"), a)
    m, b, x = lis_input(str(tmp_path / "a.mtx"))
    assert b is None and m.shape == (25, 25)
    np.testing.assert_allclose(m.to_dense(), a.to_dense())

    lis_output(str(tmp_path / "a.lis"), a, b=np.arange(25.0), fmt="lis")
    m2, b2, _ = lis_input(str(tmp_path / "a.lis"))
    np.testing.assert_allclose(m2.to_dense(), a.to_dense())
    np.testing.assert_allclose(np.asarray(b2), np.arange(25.0))


def test_plain_vector_roundtrip(tmp_path):
    from lis_tpu.io import lis_input_vector
    from lis_tpu.io.plain import read_vector_plain, write_vector_plain
    v = np.linspace(-3, 9, 17)
    write_vector_plain(str(tmp_path / "v.txt"), v)
    np.testing.assert_allclose(np.asarray(read_vector_plain(str(tmp_path / "v.txt"))), v)
    np.testing.assert_allclose(np.asarray(lis_input_vector(str(tmp_path / "v.txt"))), v)


def test_mm_binary_roundtrip(tmp_path):
    """Binary MatrixMarket (LIS_FMT_MMB, lis_output_mm.c:387): packed
    16-byte records, endianness on the size line, b/x appended as packed
    vector records — bit-exact value roundtrip."""
    from lis_tpu.io import lis_output, lis_input
    from tests.problems import poisson2d
    a = poisson2d(7, 6)
    b = np.linspace(0.5, 2.0, 42)
    x = np.linspace(-1.0, 1.0, 42)
    p = tmp_path / "m.mmb"
    lis_output(str(p), a, b=b, x=x, fmt="mmb")
    a2, b2, x2 = lis_input(str(p))
    np.testing.assert_array_equal(np.asarray(a.to_dense()),
                                  np.asarray(a2.to_dense()))
    np.testing.assert_array_equal(np.asarray(b2), b)
    np.testing.assert_array_equal(np.asarray(x2), x)


def test_mm_binary_byteswap(tmp_path):
    """A binary MM file written with FOREIGN endianness (isbin flag for the
    other byte order) reads back correctly — the lis_bswap_* analogue
    (src/system/lis_sort.c:278-352)."""
    from lis_tpu.io import lis_input
    from lis_tpu.io.mm import _MATFMT, _VECFMT
    from tests.problems import tridiag
    a = tridiag(9)
    ptr, idx, val = [np.asarray(v) for v in a.to_csr_arrays()]
    rows = np.repeat(np.arange(9), np.diff(ptr))
    bo = ">" if np.little_endian else "<"          # deliberately foreign
    isbin = 1 if np.little_endian else 2
    p = tmp_path / "swapped.mmb"
    with open(p, "wb") as f:
        f.write(b"%%MatrixMarket matrix coordinate real general\n")
        f.write(f"9 9 {len(val)} 1 0 {isbin}\n".encode())
        rec = np.empty(len(val), dtype=_MATFMT[bo])
        rec["i"] = rows + 1
        rec["j"] = idx + 1
        rec["v"] = val
        f.write(rec.tobytes())
        vrec = np.zeros(9, dtype=_VECFMT[bo])
        vrec["i"] = np.arange(1, 10)
        vrec["v"] = np.arange(9.0)
        f.write(vrec.tobytes())
    a2, b2, _ = lis_input(str(p))
    np.testing.assert_array_equal(np.asarray(a.to_dense()),
                                  np.asarray(a2.to_dense()))
    np.testing.assert_array_equal(np.asarray(b2), np.arange(9.0))


def test_mm_ascii_vectors_roundtrip(tmp_path):
    """ASCII MM with the Lis isb/isx extension on the size line."""
    from lis_tpu.io import lis_output, lis_input
    from tests.problems import tridiag
    a = tridiag(11)
    b = np.arange(1.0, 12.0)
    p = tmp_path / "m.mtx"
    lis_output(str(p), a, b=b, fmt="mm")
    a2, b2, x2 = lis_input(str(p))
    assert x2 is None
    np.testing.assert_allclose(np.asarray(b2), b)
    np.testing.assert_allclose(np.asarray(a.to_dense()),
                               np.asarray(a2.to_dense()))


def test_hb_write_roundtrip(tmp_path):
    """HB write → HB read → same matrix; cross-format: mm → hb → mmb → mm
    preserves values end-to-end."""
    from lis_tpu.io import lis_output, lis_input
    from lis_tpu.io.hb import write_harwell_boeing, read_harwell_boeing
    from tests.problems import poisson2d
    a = poisson2d(6, 5)
    p = tmp_path / "m.rua"
    write_harwell_boeing(str(p), a)
    a2 = read_harwell_boeing(str(p))
    np.testing.assert_allclose(np.asarray(a.to_dense()),
                               np.asarray(a2.to_dense()), rtol=1e-14)
    # chain through every writer
    p2 = tmp_path / "m2.mmb"
    lis_output(str(p2), a2, fmt="mmb")
    a3, _, _ = lis_input(str(p2))
    p3 = tmp_path / "m3.mtx"
    lis_output(str(p3), a3, fmt="mm")
    a4, _, _ = lis_input(str(p3))
    np.testing.assert_allclose(np.asarray(a.to_dense()),
                               np.asarray(a4.to_dense()), rtol=1e-14)


def test_lis_vector_ascii_reference_layout(tmp_path):
    """#LIS A vec writer emits the reference's exact byte layout
    (lis_output_vector_lis_ascii: %28.20e values three per line under
    "# pe n" section headers) and the reader concatenates PE sections."""
    from lis_tpu.io import lis_input_vector, lis_output_vector
    v = np.linspace(-2.0, 3.0, 11)
    p = tmp_path / "v.lis"
    lis_output_vector(str(p), v, fmt="lis", nprocs=3)
    text = p.read_text()
    lines = text.splitlines()
    assert lines[0] == "#LIS A vec"
    assert lines[1] == "3"
    # section headers carry the block-row partition sizes 3/4/4
    assert lines[2] == "# 0 3"
    # values are right-aligned %28.20e, three per line
    assert lines[3] == "%28.20e %28.20e %28.20e " % (v[0], v[1], v[2])
    v2 = lis_input_vector(str(p))
    np.testing.assert_allclose(np.asarray(v2), v, rtol=0, atol=0)


def test_lis_vector_binary_roundtrip_both_endians(tmp_path):
    """The B/L binary vec flavors round-trip with byte-swapping: a
    big-endian file on a little-endian host exercises the swap branch
    (lis_input.c:486-495's LIS_BINARY_BIG/LITTLE classification)."""
    from lis_tpu.io import lis_input_vector, lis_output_vector
    v = np.linspace(0.5, -7.25, 10)
    for fmt in ("lisb", "lisl"):
        p = tmp_path / f"v.{fmt}"
        lis_output_vector(str(p), v, fmt=fmt, nprocs=4)
        head = p.read_bytes()[:10]
        assert head == (b"#LIS B vec" if fmt == "lisb" else b"#LIS L vec")
        v2 = lis_input_vector(str(p))
        np.testing.assert_array_equal(np.asarray(v2, dtype=np.float64), v)


def test_hb_complex_cua_roundtrip(tmp_path):
    """CUA (complex unsymmetric assembled) HB files round-trip — the
    reference's --enable-complex branch accepts mxtype 'c'
    (lis_input_hb.c:234); values are stored as (re, im) pairs."""
    from lis_tpu.io.hb import write_harwell_boeing, read_harwell_boeing
    from lis_tpu.matrix.csr import CSRMatrix
    rng = np.random.default_rng(4)
    dense = np.where(rng.random((12, 12)) < 0.25,
                     rng.standard_normal((12, 12))
                     + 1j * rng.standard_normal((12, 12)), 0.0)
    dense += 5.0 * np.eye(12)
    a = CSRMatrix.from_dense(dense)
    p = tmp_path / "m.cua"
    write_harwell_boeing(str(p), a)
    assert open(p).readlines()[2].startswith("CUA")
    a2 = read_harwell_boeing(str(p))
    np.testing.assert_allclose(np.asarray(a2.to_dense()), dense, rtol=1e-14)


def test_hb_hermitian_expansion(tmp_path):
    """A CHA-typed file (Hermitian, lower triangle stored) expands to the
    full matrix with conjugated mirror entries."""
    from lis_tpu.io.hb import read_harwell_boeing
    import scipy.sparse as sp
    rng = np.random.default_rng(6)
    dense = np.where(rng.random((8, 8)) < 0.3,
                     rng.standard_normal((8, 8))
                     + 1j * rng.standard_normal((8, 8)), 0.0)
    herm = np.tril(dense, -1) + np.tril(dense, -1).conj().T \
        + np.diag(6.0 + np.arange(8.0))
    low = sp.csc_matrix(np.tril(herm))            # stored lower triangle
    low.sort_indices()
    ptr, idx, val = low.indptr + 1, low.indices + 1, low.data
    vals = np.empty(2 * len(val))
    vals[0::2], vals[1::2] = val.real, val.imag

    def lines_of(vs, per, fmt):
        return ["".join(fmt % v for v in vs[k:k + per])
                for k in range(0, len(vs), per)]

    pl = lines_of(ptr, 10, "%8d")
    il = lines_of(idx, 10, "%8d")
    vl = lines_of(vals, 3, "%25.16E")
    p = tmp_path / "m.cha"
    with open(p, "w") as f:
        f.write(f"{'herm test':<72.72}{'T':<8.8}\n")
        f.write(f"{len(pl)+len(il)+len(vl):14d}{len(pl):14d}"
                f"{len(il):14d}{len(vl):14d}{0:14d}\n")
        f.write(f"{'CHA':<14.14}{8:14d}{8:14d}{low.nnz:14d}{0:14d}\n")
        f.write(f"{'(10I8)':<16.16}{'(10I8)':<16.16}{'(3E25.16)':<20.20}"
                f"{'':<20.20}\n")
        for ln in pl + il + vl:
            f.write(ln + "\n")
    a = read_harwell_boeing(str(p))
    np.testing.assert_allclose(np.asarray(a.to_dense()), herm, rtol=1e-14)


def test_lis_vector_complex_roundtrip(tmp_path):
    """Complex vectors round-trip through all three LIS vector flavors —
    the ascii mode writes (re, im) pairs like the reference's _COMPLEX
    build (lis_output.c:519); the binary flavors negate the section
    count to mark c16 payloads."""
    from lis_tpu.io.lisio import write_lis_vector, read_lis_vector
    rng = np.random.default_rng(12)
    v = rng.standard_normal(23) + 1j * rng.standard_normal(23)
    for mode, tol in (("A", 1e-19), ("B", 0.0), ("L", 0.0)):
        p = tmp_path / f"v{mode}.vec"
        write_lis_vector(str(p), v, mode=mode, nprocs=3)
        back = np.asarray(read_lis_vector(str(p)))
        assert np.iscomplexobj(back)
        np.testing.assert_allclose(back, v, atol=tol, rtol=1e-18)


def test_lis_vector_truncated_rejected(tmp_path):
    """A LIS vector file whose section holds fewer values than declared
    must raise, not silently load short (lis_input would fail too)."""
    import pytest
    from lis_tpu.io.lisio import write_lis_vector, read_lis_vector
    v = np.arange(12.0)
    p = tmp_path / "v.vec"
    write_lis_vector(str(p), v, mode="A")
    lines = open(p).readlines()
    open(p, "w").writelines(lines[:-2])         # drop the last value rows
    with pytest.raises(ValueError, match="truncated"):
        read_lis_vector(str(p))
    pb = tmp_path / "v.bvec"
    write_lis_vector(str(pb), v, mode="L")
    raw = open(pb, "rb").read()
    open(pb, "wb").write(raw[:-16])             # drop last two f8 values
    with pytest.raises(ValueError, match="truncated"):
        read_lis_vector(str(pb))


def test_compat_output_vector_lis_format(tmp_path):
    """lis_output_vector with LIS_FMT_LIS (3) writes the '#LIS A vec'
    flavor (previously silently fell back to MatrixMarket), and the
    binary id (4) writes the host-endian binary flavor."""
    import lis_tpu.compat as lis
    from lis_tpu.io.lisio import read_lis_vector
    v = lis.lis_vector_create()
    lis.lis_vector_set_size(v, 0, 7)
    for i in range(7):
        lis.lis_vector_set_value(lis.LIS_INS_VALUE, i, float(i) + 0.5, v)
    p3 = tmp_path / "v.lis"
    lis.lis_output_vector(v, 3, str(p3))
    assert open(p3).readline().startswith("#LIS A vec")
    np.testing.assert_allclose(np.asarray(read_lis_vector(str(p3))),
                               np.arange(7) + 0.5)
    p4 = tmp_path / "v.lisb"
    lis.lis_output_vector(v, 4, str(p4))
    assert open(p4, "rb").read(10).startswith(b"#LIS")
    np.testing.assert_allclose(np.asarray(read_lis_vector(str(p4))),
                               np.arange(7) + 0.5)


def test_mm_malformed_files_clean_errors(tmp_path):
    """Malformed MatrixMarket inputs raise clean ValueErrors (the
    reference's lis_input_mm returns LIS_ERR_FILE_IO); in particular a
    file declaring more entries than it holds must NOT load silently
    short."""
    import pytest
    cases = {
        "empty": "",
        "nosize": "%%MatrixMarket matrix coordinate real general\n",
        "badsizeline": "%%MatrixMarket matrix coordinate real general\n"
                       "3 3\n",
        "short": "%%MatrixMarket matrix coordinate real general\n"
                 "3 3 5\n1 1 1.0\n2 2 2.0\n",
    }
    from lis_tpu.io.mm import read_matrix_market
    for name, content in cases.items():
        p = tmp_path / f"{name}.mtx"
        p.write_text(content)
        with pytest.raises(ValueError):
            read_matrix_market(str(p))
    # truncated binary flavor too
    from lis_tpu.io import lis_output
    from tests.problems import poisson2d
    pb = tmp_path / "t.mmb"
    lis_output(str(pb), poisson2d(4, 4), fmt="mmb")
    raw = pb.read_bytes()
    pb.write_bytes(raw[:-40])
    with pytest.raises(ValueError, match="truncated"):
        read_matrix_market(str(pb))


def test_mm_appended_vectors_truncation_rejected(tmp_path):
    """The Lis-extension appended b/x sections are validated too: a file
    declaring isb=1 with fewer than nrows b entries raises instead of
    zero-filling silently; array-format short files likewise."""
    import pytest
    from lis_tpu.io.mm import read_matrix_market
    p = tmp_path / "bx.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n"
                 "3 3 3 1 0\n1 1 4.0\n2 2 4.0\n3 3 4.0\n1 5.0\n")
    with pytest.raises(ValueError, match="truncated"):
        read_matrix_market(str(p), return_vectors=True)
    pa = tmp_path / "arr.mtx"
    pa.write_text("%%MatrixMarket matrix array real general\n3 3\n1.0\n2.0\n")
    with pytest.raises(ValueError, match="truncated"):
        read_matrix_market(str(pa))
    pb = tmp_path / "arrbad.mtx"
    pb.write_text("%%MatrixMarket matrix array real general\n3\n")
    with pytest.raises(ValueError, match="size line"):
        read_matrix_market(str(pb))
