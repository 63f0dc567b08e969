"""L/D/U matrix splitting (lis_matrix_split, src/matrix/lis_matrix_ops.c:860).

Splits A into strictly-lower L, diagonal D, strictly-upper U (A = L + D + U)
for the stationary solvers (Jacobi/GS/SOR) and the SSOR preconditioner.  The
reference stores the split parts on the matrix (A->L/U/D/WD); here a
``SplitMatrix`` bundle holds three format objects plus the inverted diagonal,
all jit-traversable.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lis_tpu.matrix.base import SparseMatrix, host
from lis_tpu.matrix.csr import CSRMatrix


@dataclass(frozen=True)
class SplitMatrix:
    L: CSRMatrix          # strictly lower
    U: CSRMatrix          # strictly upper
    D: jax.Array          # diagonal vector
    Dinv: jax.Array       # 1/diagonal ("WD" in the reference)

    @property
    def n(self):
        return self.L.nrows


jax.tree_util.register_pytree_node(
    SplitMatrix,
    lambda s: ((s.L, s.U, s.D, s.Dinv), None),
    lambda aux, c: SplitMatrix(*c))


def split_matrix(matrix: SparseMatrix) -> SplitMatrix:
    ptr, index, value = matrix.to_csr_arrays()
    n = matrix.nrows
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(ptr))
    lower = index < rows
    upper = index > rows
    diag = np.zeros(n, dtype=value.dtype)
    isd = index == rows
    np.add.at(diag, rows[isd], value[isd])

    def build(mask):
        sel_rows, sel_idx, sel_val = rows[mask], index[mask], value[mask]
        p = np.zeros(n + 1, dtype=np.int32)
        np.add.at(p, sel_rows + 1, 1)
        p = np.cumsum(p).astype(np.int32)
        return CSRMatrix.from_csr_arrays(p, sel_idx, sel_val, matrix.shape)

    with np.errstate(divide="ignore"):
        dinv = np.where(diag != 0, 1.0 / np.where(diag != 0, diag, 1), 0.0)
    return SplitMatrix(L=build(lower), U=build(upper),
                       D=jnp.asarray(diag), Dinv=jnp.asarray(dinv))


def merge_matrix(s: SplitMatrix, shape=None):
    """Reassemble A = L + D + U from a split (lis_matrix_merge,
    src/matrix/lis_matrix_ops.c:1052)."""
    import scipy.sparse as sp
    from lis_tpu.matrix.csr import CSRMatrix
    lp, li, lv = s.L.to_csr_arrays()
    up, ui, uv = s.U.to_csr_arrays()
    shape = shape or s.L.shape
    n = shape[0]
    a = (sp.csr_matrix((np.asarray(lv), np.asarray(li), np.asarray(lp)),
                       shape=shape)
         + sp.csr_matrix((np.asarray(uv), np.asarray(ui), np.asarray(up)),
                         shape=shape)
         + sp.diags(np.asarray(s.D), shape=shape)).tocsr()
    a.sort_indices()
    return CSRMatrix.from_csr_arrays(a.indptr, a.indices, a.data, shape)
