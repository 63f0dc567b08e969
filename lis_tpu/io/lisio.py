"""Lis native ASCII format (reference: lis_input/lis_output,
src/system/lis_input.c:67, src/system/lis_output.c:63-449).

The Lis ASCII format is a simple header + triplet list; we read/write the
CSR flavor.  (The reference's binary flavor with byte-swapping is host-side
I/O plumbing; ASCII round-trips the same information.)
"""

from __future__ import annotations

import numpy as np

from lis_tpu.matrix.base import SparseMatrix
from lis_tpu.matrix.coo import COOMatrix
from lis_tpu.matrix.convert import convert_matrix


def write_lis_file(path: str, matrix: SparseMatrix, b=None, x=None):
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
