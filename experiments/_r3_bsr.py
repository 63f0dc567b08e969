"""Chip measurement: BSR windowed-slab matvec — VERDICT r3 missing #1c.

The reference unrolls scalar block kernels per block size
(src/matvec/lis_matvec_bsr.c:57); the TPU design run-clusters block
displacements into dense sliding-window einsum slabs (matrix/bsr.py).
Problem: a 2-D 5-point PDE operator kron'd with dof blocks — block
displacements {-nx, -1, 0, 1, +nx}, the classic multi-band block
operator.  Reports slab GB/s (bsr-equivalent bytes) and the gather-path
comparison on the same operator.

Run:  python experiments/_r3_bsr.py [nx] [bs]    (default 512, 4)
"""

from __future__ import annotations

import json
import sys

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "experiments")
from _timing import timed_apply  # noqa: E402

from lis_tpu.matrix.bsr import BSRMatrix  # noqa: E402


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    # 2-D 5-point Laplacian kron identity-coupled dof blocks
    lap1 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    lap2 = (sp.kron(sp.eye(nx), lap1) + sp.kron(lap1, sp.eye(nx))).tocsr()
    rng = np.random.default_rng(0)
    blk = rng.standard_normal((bs, bs)).astype(np.float32)
    blk += bs * np.eye(bs, dtype=np.float32)
    A = sp.kron(lap2, sp.csr_matrix(blk)).tocsr()
    A.sort_indices()
    n, nnz = A.shape[0], A.nnz

    Ab = BSRMatrix.from_csr_arrays(A.indptr, A.indices,
                                   A.data.astype(np.float32), A.shape,
                                   bnr=bs, bnc=bs)
    # force-gather variant for comparison: windows disabled
    Ag = BSRMatrix.from_csr_arrays(A.indptr, A.indices,
                                   A.data.astype(np.float32), A.shape,
                                   bnr=bs, bnc=bs, max_windows=0)
    x = jnp.ones(n, dtype=jnp.float32)

    # bsr-equivalent bytes: block values (4 B) + 4 B block index per
    # block + x read + y write
    bnnz = nnz // (bs * bs)
    bytes_equiv = nnz * 4 + bnnz * 4 + 2 * n * 4

    t_slab = timed_apply(lambda A, v: A.matvec(v), x, iters_a=5,
                         iters_b=55, data=Ab)
    t_gath = timed_apply(lambda A, v: A.matvec(v), x, iters_a=2,
                         iters_b=12, data=Ag)

    print(json.dumps({
        "metric": "bsr_slab_spmv",
        "value": round(bytes_equiv / t_slab / 1e9, 2),
        "unit": "bsr-equiv GB/s",
        "rows": n, "nnz": int(nnz), "block": bs,
        "windows": len(Ab.slabs), "spill": bool(Ab.has_spill),
        "mflops": round(2 * nnz / t_slab / 1e6, 1),
        "gather_gbs": round(bytes_equiv / t_gath / 1e9, 2),
        "speedup_vs_gather": round(t_gath / t_slab, 1),
    }))


if __name__ == "__main__":
    main()
