"""CSC — compressed sparse column (reference: src/matrix/lis_matrix_csc.c).

In the reference CSC mainly serves as the explicit Aᵀ for the BiCG family's
``-use_at`` path (src/solver/lis_solver.c:836-843): CSC arrays of A are CSR
arrays of Aᵀ.  We exploit the same duality: matvec is a scatter-add over
rows, matvech is the fast sorted segment-sum (the exact mirror of CSR).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lis_tpu.matrix.base import SparseMatrix, matrix_format, static, host


@matrix_format("csc")
class CSCMatrix(SparseMatrix):
    ptr: jax.Array            # (ncols+1,) int32
    index: jax.Array          # (nnz,) int32 row indices
    value: jax.Array          # (nnz,)
    col_ids: jax.Array        # (nnz,) int32, column of each entry (sorted)
    nrows: int = static()
    ncols: int = static()
    nnz: int = static()

    @classmethod
    def from_csc_arrays(cls, ptr, index, value, shape) -> "CSCMatrix":
        ptr, index, value = host(ptr), host(index), host(value)
        col_ids = np.repeat(np.arange(shape[1], dtype=np.int32), np.diff(ptr))
        return cls(ptr=jnp.asarray(ptr, jnp.int32),
                   index=jnp.asarray(index, jnp.int32),
                   value=jnp.asarray(value),
                   col_ids=jnp.asarray(col_ids),
                   nrows=int(shape[0]), ncols=int(shape[1]),
                   nnz=int(len(value)))

    @classmethod
    def from_csr_arrays(cls, ptr, index, value, shape) -> "CSCMatrix":
        import scipy.sparse as sp
        a = sp.csr_matrix((host(value), host(index), host(ptr)),
                          shape=shape).tocsc()
        a.sort_indices()
        return cls.from_csc_arrays(a.indptr, a.indices, a.data, shape)

    def to_csr_arrays(self):
        import scipy.sparse as sp
        a = sp.csc_matrix((host(self.value), host(self.index), host(self.ptr)),
                          shape=self.shape).tocsr()
        a.sort_indices()
        return (a.indptr.astype(np.int32), a.indices.astype(np.int32), a.data)

    def matvec(self, x):
        prod = self.value * jnp.take(x, self.col_ids, axis=0)
        y = jnp.zeros(self.nrows, dtype=prod.dtype)
        return y.at[self.index].add(prod)

    def matvech(self, x):
        v = jnp.conj(self.value) if jnp.iscomplexobj(self.value) else self.value
        prod = v * jnp.take(x, self.index, axis=0)
        return jax.ops.segment_sum(prod, self.col_ids,
                                   num_segments=self.ncols,
                                   indices_are_sorted=True)
