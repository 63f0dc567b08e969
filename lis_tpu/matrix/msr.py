"""MSR — modified CSR with the diagonal split off.

Reference: src/matrix/lis_matrix_msr.c.  The diagonal lives in its own dense
vector (always length n), the strictly off-diagonal part in CSR arrays; SpMV
= diag*x + off-diagonal gather/segment-sum.  The split diagonal is also what
Jacobi-type preconditioning wants, making this format self-preconditioning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lis_tpu.matrix.base import SparseMatrix, matrix_format, static, host


@matrix_format("msr")
class MSRMatrix(SparseMatrix):
    diag: jax.Array           # (n,)
    ptr: jax.Array            # (n+1,) int32 over off-diagonal entries
    index: jax.Array          # (ndz,) int32
    value: jax.Array          # (ndz,)
    row_ids: jax.Array        # (ndz,) int32
    nrows: int = static()
    ncols: int = static()
    nnz: int = static()

    @classmethod
    def from_csr_arrays(cls, ptr, index, value, shape) -> "MSRMatrix":
        ptr, index, value = host(ptr), host(index), host(value)
        n = shape[0]
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(ptr))
        isdiag = index == rows
        diag = np.zeros(n, dtype=value.dtype)
        np.add.at(diag, rows[isdiag], value[isdiag])
        off = ~isdiag
        orow, oidx, oval = rows[off], index[off], value[off]
        optr = np.zeros(n + 1, dtype=np.int32)
        np.add.at(optr, orow + 1, 1)
        optr = np.cumsum(optr).astype(np.int32)
        return cls(diag=jnp.asarray(diag),
                   ptr=jnp.asarray(optr),
                   index=jnp.asarray(oidx.astype(np.int32)),
                   value=jnp.asarray(oval),
                   row_ids=jnp.asarray(orow.astype(np.int32)),
                   nrows=int(n), ncols=int(shape[1]), nnz=int(len(value)))

    def to_csr_arrays(self):
        import scipy.sparse as sp
        n, m = self.shape
        off = sp.csr_matrix((host(self.value), host(self.index), host(self.ptr)),
                            shape=self.shape)
        d = sp.diags(host(self.diag), shape=self.shape, format="csr")
        a = (off + d).tocsr()
        a.sort_indices()
        return a.indptr.astype(np.int32), a.indices.astype(np.int32), a.data

    def matvec(self, x):
        yoff = jax.ops.segment_sum(self.value * jnp.take(x, self.index, axis=0),
                                   self.row_ids, num_segments=self.nrows,
                                   indices_are_sorted=True)
        return self.diag * x[:self.nrows] + yoff

    def matvech(self, x):
        conj = jnp.conj if jnp.iscomplexobj(self.value) else (lambda a: a)
        prod = conj(self.value) * jnp.take(x, self.row_ids, axis=0)
        y = jnp.zeros(self.ncols, dtype=prod.dtype)
        y = y.at[self.index].add(prod)
        return y.at[:self.nrows].add(conj(self.diag) * x)

    def get_diagonal(self):
        return self.diag
