"""Lis native file formats (reference: lis_input/lis_output,
src/system/lis_input.c:67, src/system/lis_output.c:63-449).

Matrix flavor: header + triplet list (the reference's LIS_FMT_LIS matrix
reader is compiled out — lis_input.c:109-117 comments the banner match —
so the triplet layout here is our own, kept stable since round 1).

Vector flavor: the reference's `#LIS A vec` layout exactly
(lis_output_vector_lis_ascii, lis_output.c:56 — "%28.20e " values three
per line under per-PE "# pe n" section headers), plus the binary `B`/`L`
mode flavors whose headers lis_input_vector_lis (lis_input.c:470-495)
detects and byte-swap-classifies but whose payload the reference leaves
LIS_ERR_NOT_IMPLEMENTED: we complete them as big/little-endian i64/f64
records so the byte-swap branch is actually exercised.
"""

from __future__ import annotations

import struct
import sys

import numpy as np

from lis_tpu.matrix.base import SparseMatrix
from lis_tpu.matrix.coo import COOMatrix
from lis_tpu.matrix.convert import convert_matrix


def write_lis_file(path: str, matrix: SparseMatrix, b=None, x=None):
    """Write the Lis native matrix triplet flavor (+ optional b, x)."""
    ptr, index, value = matrix.to_csr_arrays()
    n, m = matrix.shape
    rows = np.repeat(np.arange(n), np.diff(ptr))
    with open(path, "w") as f:
        f.write("#LIS ascii coo\n")
        f.write(f"{n} {m} {len(value)} "
                f"{1 if b is not None else 0} {1 if x is not None else 0}\n")
        for r, c, v in zip(rows, index, value):
            f.write(f"{r+1} {c+1} {v:.16e}\n")
        for vec in (b, x):
            if vec is not None:
                for i, v in enumerate(np.asarray(vec)):
                    f.write(f"{i+1} {v:.16e}\n")


def read_lis_file(path: str, matrix_type: str = "csr", **kw):
    """Returns (matrix, b or None, x or None)."""
    import jax.numpy as jnp
    with open(path) as f:
        header = f.readline()
        if not header.startswith("#LIS"):
            raise ValueError(f"not a LIS ascii file: {header!r}")
        n, m, nnz, has_b, has_x = (int(t) for t in f.readline().split()[:5])
        data = np.loadtxt(f, max_rows=nnz, ndmin=2)
        rows = data[:, 0].astype(np.int32) - 1
        cols = data[:, 1].astype(np.int32) - 1
        vals = data[:, 2]
        b = x = None
        if has_b:
            bd = np.loadtxt(f, max_rows=n, ndmin=2)
            b = jnp.asarray(bd[:, 1])
        if has_x:
            xd = np.loadtxt(f, max_rows=n, ndmin=2)
            x = jnp.asarray(xd[:, 1])
    coo = COOMatrix.from_arrays(rows, cols, vals, (n, m))
    return convert_matrix(coo, matrix_type, **kw), b, x


# ---------------------------------------------------------------------------
# Vector flavor: "#LIS <mode> vec"
# ---------------------------------------------------------------------------

_VEC_MAGIC = {"A": b"#LIS A vec", "B": b"#LIS B vec", "L": b"#LIS L vec"}


def _sections(vec, nprocs: int):
    """Split vec into nprocs contiguous block-row sections (ranges.py rule)."""
    v = np.asarray(vec)
    gn = v.shape[0]
    starts = [(gn * p) // nprocs for p in range(nprocs + 1)]
    return [(p, v[starts[p]:starts[p + 1]]) for p in range(nprocs)]


def write_lis_vector(path: str, vec, mode: str = "A", nprocs: int = 1):
    """Write a vector in the Lis native format.

    mode="A": byte-compatible with lis_output_vector_lis_ascii
    (lis_output.c:56) — "#LIS A vec", nprocs line, then per PE a
    "# pe n" header and "%28.20e " values three per line.
    mode="B"/"L": the binary flavors (big/little endian) — same logical
    layout with i64 counts and f64 values.
    """
    if mode not in _VEC_MAGIC:
        raise ValueError(f"lis vector mode must be A, B or L, got {mode!r}")
    secs = _sections(vec, nprocs)
    is_complex = np.iscomplexobj(np.asarray(vec))
    if mode == "A":
        with open(path, "w") as f:
            f.write("#LIS A vec\n")
            f.write(f"{nprocs}\n")
            for pe, part in secs:
                f.write(f"# {pe} {len(part)}\n")
                for i, val in enumerate(part):
                    if is_complex:
                        # the reference's _COMPLEX build writes (re, im)
                        # pairs per entry (lis_output.c:519)
                        f.write("%28.20e %28.20e " % (val.real, val.imag))
                    else:
                        f.write("%28.20e " % float(val))
                    if (i + 1) % 3 == 0:
                        f.write("\n")
                if len(part) % 3 != 0:
                    f.write("\n")
        return
    end = ">" if mode == "B" else "<"
    with open(path, "wb") as f:
        f.write(_VEC_MAGIC[mode] + b"\n")
        f.write(struct.pack(end + "q", nprocs))
        for pe, part in secs:
            # complex sections (our extension — the reference's binary
            # branch is NOT_IMPLEMENTED) store the count negated and
            # c16 payloads
            f.write(struct.pack(end + "qq", pe,
                                -len(part) if is_complex else len(part)))
            f.write(np.asarray(part, dtype=end + ("c16" if is_complex
                                                  else "f8")).tobytes())


def read_lis_vector(path: str):
    """Read a Lis native vector file (any mode; binary modes byte-swap when
    the file's endianness differs from the host, the analogue of
    lis_input.c:486-495's LIS_BINARY_BIG/LITTLE classification)."""
    import jax.numpy as jnp
    with open(path, "rb") as f:
        head = f.read(10)
    if not head.startswith(b"#LIS"):
        raise ValueError(f"not a LIS vector file: {head!r}")
    mode = chr(head[5])
    if mode == "A":
        parts = {}
        declared = {}
        with open(path) as f:
            f.readline()
            nprocs = int(f.readline().split()[0])
            pe = None
            vals: list[float] = []
            for line in f:
                if line.startswith("#"):
                    if pe is not None:
                        parts[pe] = vals
                    _, pe_s, n_s = line.split()
                    pe, vals = int(pe_s), []
                    declared[pe] = int(n_s)
                else:
                    vals.extend(float(t) for t in line.split())
            if pe is not None:
                parts[pe] = vals
        if len(parts) != nprocs:
            raise ValueError(f"expected {nprocs} PE sections, got {len(parts)}")
        out = []
        for p in sorted(parts):
            vals, n = parts[p], declared[p]
            if len(vals) == n:                      # real section
                out.append(np.asarray(vals))
            elif len(vals) == 2 * n:                # (re, im) pairs
                a = np.asarray(vals)
                out.append(a[0::2] + 1j * a[1::2])
            else:
                raise ValueError(
                    f"LIS vector section pe={p} declares n={n} but holds "
                    f"{len(vals)} values — truncated or corrupt file")
        return jnp.asarray(np.concatenate(out))
    if mode not in ("B", "L"):
        raise ValueError(f"unknown LIS vector mode {mode!r}")
    end = ">" if mode == "B" else "<"
    with open(path, "rb") as f:
        f.read(11)  # magic + newline
        (nprocs,) = struct.unpack(end + "q", f.read(8))
        chunks = {}
        for _ in range(nprocs):
            hdr = f.read(16)
            if len(hdr) < 16:
                raise ValueError("LIS binary vector file truncated "
                                 "(missing section header)")
            pe, n = struct.unpack(end + "qq", hdr)
            cplx = n < 0                            # negated count = c16
            n = -n if cplx else n
            esz = 16 if cplx else 8
            raw = f.read(esz * n)
            if len(raw) < esz * n:
                raise ValueError(
                    f"LIS binary vector section pe={pe} declares n={n} "
                    f"but holds {len(raw) // esz} values — truncated file")
            chunks[pe] = np.frombuffer(raw,
                                       dtype=end + ("c16" if cplx else "f8"))
    flat = np.concatenate([chunks[p] for p in sorted(chunks)])
    if (end == ">") != (sys.byteorder == "big"):
        flat = flat.astype("=c16" if np.iscomplexobj(flat) else "=f8")
    return jnp.asarray(flat)
