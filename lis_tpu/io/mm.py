"""Matrix Market I/O.

Reference: lis_input_mm (src/system/lis_input_mm.c:62, CSR fast path :699)
and lis_output_mm (src/system/lis_output_mm.c:60).  Supports coordinate and
array formats, real/integer/complex/pattern fields, general/symmetric/
skew-symmetric/hermitian symmetries, and the Lis extension of a vector
appended after the matrix entries.  Reading is host-side (numpy), returning
format objects whose arrays live on device.
"""

from __future__ import annotations

import numpy as np

from lis_tpu.matrix.base import SparseMatrix
from lis_tpu.matrix.coo import COOMatrix
from lis_tpu.matrix.convert import convert_matrix


def _parse_header(line: str):
    parts = line.strip().split()
    if len(parts) < 4 or parts[0] != "%%MatrixMarket":
        raise ValueError(f"not a MatrixMarket file: {line!r}")
    obj, fmt = parts[1].lower(), parts[2].lower()
    field = parts[3].lower() if len(parts) > 3 else "real"
    symm = parts[4].lower() if len(parts) > 4 else "general"
    return obj, fmt, field, symm


def read_matrix_market(path: str, matrix_type: str = "csr", **kw):
    """Read a MatrixMarket matrix file into the requested format."""
    with open(path) as f:
        header = f.readline()
        obj, fmt, field, symm = _parse_header(header)
        if obj != "matrix":
            raise ValueError(f"expected matrix object, got {obj}")
        skip = 1
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
            skip += 1
        skip += 1                      # the size line itself
        sizes = line.split()
        if fmt == "coordinate":
            nrows, ncols, nnz = int(sizes[0]), int(sizes[1]), int(sizes[2])
            native = None
            if field in ("real", "integer", "pattern"):
                from lis_tpu import _native
                native = _native.mm_parse_coords(path, skip, nnz,
                                                 field == "pattern")
            if native is not None:
                rows, cols, vals = native
                rows = rows.astype(np.int64)
                cols = cols.astype(np.int64)
            else:
                data = np.loadtxt(f, max_rows=nnz, ndmin=2)
                rows = data[:, 0].astype(np.int64) - 1
                cols = data[:, 1].astype(np.int64) - 1
                if field == "pattern":
                    vals = np.ones(nnz)
                elif field == "complex":
                    vals = data[:, 2] + 1j * data[:, 3]
                else:
                    vals = data[:, 2]
        elif fmt == "array":
            nrows, ncols = int(sizes[0]), int(sizes[1])
            flat = np.loadtxt(f, max_rows=nrows * ncols)
            dense = np.asarray(flat).reshape(ncols, nrows).T  # column-major
            rows, cols = np.nonzero(dense)
            vals = dense[rows, cols]
        else:
            raise ValueError(f"unknown MM format {fmt}")

    if symm in ("symmetric", "skew-symmetric", "hermitian"):
        off = rows != cols
        sign = -1.0 if symm == "skew-symmetric" else 1.0
        mirror = np.conj(vals[off]) if symm == "hermitian" else sign * vals[off]
        rows, cols, vals = (np.concatenate([rows, cols[off]]),
                            np.concatenate([cols, rows[off]]),
                            np.concatenate([vals, mirror]))

    coo = COOMatrix.from_arrays(rows.astype(np.int32), cols.astype(np.int32),
                                vals, (nrows, ncols))
    return convert_matrix(coo, matrix_type, **kw)


def read_vector_mm(path: str):
    """Read a MatrixMarket vector (array format or n×1 coordinate)."""
    import jax.numpy as jnp
    with open(path) as f:
        obj, fmt, field, symm = _parse_header(f.readline())
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        sizes = line.split()
        if fmt == "array":
            n = int(sizes[0])
            vals = np.loadtxt(f, max_rows=n)
        else:
            n, _, nnz = int(sizes[0]), int(sizes[1]), int(sizes[2])
            data = np.loadtxt(f, max_rows=nnz, ndmin=2)
            vals = np.zeros(n)
            vals[data[:, 0].astype(np.int64) - 1] = data[:, -1]
    return jnp.asarray(vals)


def write_matrix_market(path: str, matrix: SparseMatrix, field: str | None = None):
    """Write in coordinate/general form (like lis_output_mm)."""
    ptr, index, value = matrix.to_csr_arrays()
    n, m = matrix.shape
    rows = np.repeat(np.arange(n), np.diff(ptr))
    cplx = np.iscomplexobj(value)
    field = field or ("complex" if cplx else "real")
    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate {field} general\n")
        f.write(f"{n} {m} {len(value)}\n")
        for r, c, v in zip(rows, index, value):
            if cplx:
                f.write(f"{r+1} {c+1} {v.real:.16e} {v.imag:.16e}\n")
            else:
                f.write(f"{r+1} {c+1} {v:.16e}\n")


def write_vector_mm(path: str, vec):
    v = np.asarray(vec)
    with open(path, "w") as f:
        f.write("%%MatrixMarket vector array real general\n")
        f.write(f"{len(v)}\n")
        for x in v:
            f.write(f"{x:.16e}\n")
