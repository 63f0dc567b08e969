"""COO triplet format (reference: src/matrix/lis_matrix_coo.c).

Natural assembly format; SpMV is a scatter-add, which XLA supports but is
slower than the sorted segment-sum of CSR — matching the reference, where
COO exists for assembly/IO convenience rather than speed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lis_tpu.matrix.base import SparseMatrix, matrix_format, static, host, canonical_csr


@matrix_format("coo")
class COOMatrix(SparseMatrix):
    row: jax.Array            # (nnz,) int32
    col: jax.Array            # (nnz,) int32
    value: jax.Array          # (nnz,)
    nrows: int = static()
    ncols: int = static()
    nnz: int = static()

    @classmethod
    def from_arrays(cls, row, col, value, shape) -> "COOMatrix":
        return cls(row=jnp.asarray(host(row), jnp.int32),
                   col=jnp.asarray(host(col), jnp.int32),
                   value=jnp.asarray(host(value)),
                   nrows=int(shape[0]), ncols=int(shape[1]),
                   nnz=int(len(host(value))))

    @classmethod
    def from_csr_arrays(cls, ptr, index, value, shape) -> "COOMatrix":
        ptr = host(ptr)
        row = np.repeat(np.arange(shape[0], dtype=np.int32), np.diff(ptr))
        return cls.from_arrays(row, host(index), host(value), shape)

    def to_csr_arrays(self):
        import scipy.sparse as sp
        a = sp.coo_matrix((host(self.value), (host(self.row), host(self.col))),
                          shape=self.shape).tocsr()
        a.sum_duplicates()
        a.sort_indices()
        return (a.indptr.astype(np.int32), a.indices.astype(np.int32), a.data)

    def matvec(self, x):
        prod = self.value * jnp.take(x, self.col, axis=0)
        y = jnp.zeros(self.nrows, dtype=prod.dtype)
        return y.at[self.row].add(prod)

    def matvech(self, x):
        v = jnp.conj(self.value) if jnp.iscomplexobj(self.value) else self.value
        prod = v * jnp.take(x, self.row, axis=0)
        y = jnp.zeros(self.ncols, dtype=prod.dtype)
        return y.at[self.col].add(prod)
