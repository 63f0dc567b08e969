"""BSR — block sparse row.

Reference: src/matrix/lis_matrix_bsr.c with unrolled kernels per block size
(src/matvec/lis_matvec_bsr.c:57+, all sizes ≤ 4×4).  On TPU the unrolled
scalar kernels become one batched einsum over the (bnnz, bnr, bnc) block
tensor — XLA maps the batched small matmuls to the MXU/VPU — plus a sorted
segment-sum over block rows.  Rows/cols are zero-padded up to a multiple of
the block size at construction (static), and sliced back after SpMV.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lis_tpu.matrix.base import SparseMatrix, matrix_format, static, host


@matrix_format("bsr")
class BSRMatrix(SparseMatrix):
    bptr: jax.Array           # (nr+1,) int32
    bindex: jax.Array         # (bnnz,) int32 block-column indices
    value: jax.Array          # (bnnz, bnr, bnc)
    brow_ids: jax.Array       # (bnnz,) int32
    nrows: int = static()     # true (unpadded) row count
    ncols: int = static()
    nnz: int = static()
    bnr: int = static()
    bnc: int = static()
    nr: int = static()        # number of block rows
    nc: int = static()        # number of block cols

    @classmethod
    def from_csr_arrays(cls, ptr, index, value, shape, bnr: int = 2,
                        bnc: int | None = None) -> "BSRMatrix":
        import scipy.sparse as sp
        bnc = bnc or bnr
        ptr, index, value = host(ptr), host(index), host(value)
        n, m = shape
        nr, nc = -(-n // bnr), -(-m // bnc)
        a = sp.csr_matrix((value, index, ptr), shape=shape)
        a.resize((nr * bnr, nc * bnc))
        b = sp.bsr_matrix(a, blocksize=(bnr, bnc))
        b.sort_indices()
        brow_ids = np.repeat(np.arange(nr, dtype=np.int32), np.diff(b.indptr))
        return cls(bptr=jnp.asarray(b.indptr.astype(np.int32)),
                   bindex=jnp.asarray(b.indices.astype(np.int32)),
                   value=jnp.asarray(b.data),
                   brow_ids=jnp.asarray(brow_ids),
                   nrows=int(n), ncols=int(m), nnz=int(len(value)),
                   bnr=bnr, bnc=bnc, nr=nr, nc=nc)

    def to_csr_arrays(self):
        import scipy.sparse as sp
        b = sp.bsr_matrix((host(self.value), host(self.bindex), host(self.bptr)),
                          shape=(self.nr * self.bnr, self.nc * self.bnc))
        a = b.tocsr()
        a.resize(self.shape)
        a = a.tocsr()
        a.eliminate_zeros()
        a.sort_indices()
        return a.indptr.astype(np.int32), a.indices.astype(np.int32), a.data

    def _pad_x(self, x):
        padded = self.nc * self.bnc
        if padded == x.shape[0]:
            return x
        return jnp.pad(x, (0, padded - x.shape[0]))

    def matvec(self, x):
        xb = self._pad_x(x).reshape(self.nc, self.bnc)
        xg = jnp.take(xb, self.bindex, axis=0)              # (bnnz, bnc)
        yb = jnp.einsum("kij,kj->ki", self.value, xg)       # block matvecs
        y = jax.ops.segment_sum(yb, self.brow_ids, num_segments=self.nr,
                                indices_are_sorted=True)
        return y.reshape(-1)[: self.nrows]

    def matvech(self, x):
        v = jnp.conj(self.value) if jnp.iscomplexobj(self.value) else self.value
        padded_r = self.nr * self.bnr
        xp = x if x.shape[0] == padded_r else jnp.pad(x, (0, padded_r - x.shape[0]))
        xb = xp.reshape(self.nr, self.bnr)
        xg = jnp.take(xb, self.brow_ids, axis=0)            # (bnnz, bnr)
        yb = jnp.einsum("kij,ki->kj", v, xg)                # blockᵀ matvecs
        y = jnp.zeros((self.nc, self.bnc), dtype=yb.dtype)
        y = y.at[self.bindex].add(yb)
        return y.reshape(-1)[: self.ncols]
