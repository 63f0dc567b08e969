"""Chip measurement: CSS (chunk-sorted select-stream) on LOCALITY-FREE
sparsity — VERDICT r3 missing #1b.

The reference's lis_matvec_csr (src/matvec/lis_matvec_csr.c:53) serves
ANY CSR at memory bandwidth per rank; a naive CSR port on TPU gathers x
per entry (~0.14 G elem/s).  CSS removes the x-side gather with a fused
one-hot select-reduce (matrix/css.py).  This measures both on the same
uniformly-random matrix (no band RCM could expose) and reports
G nnz/s + csr-equivalent GB/s.

Run:  python experiments/_r3_css.py [n] [nnz_per_row]   (default 2^19, 16)
"""

from __future__ import annotations

import json
import sys

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "experiments")
from _timing import timed_apply  # noqa: E402

from lis_tpu.matrix.csr import CSRMatrix  # noqa: E402
from lis_tpu.matrix.css import CSSMatrix  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 19
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rng = np.random.default_rng(0)
    rows = np.repeat(np.arange(n), k)
    cols = rng.integers(0, n, size=n * k)          # uniform: zero locality
    a = sp.coo_matrix((rng.standard_normal(n * k).astype(np.float32),
                       (rows, cols)), shape=(n, n)).tocsr()
    a.sum_duplicates(); a.sort_indices()
    nnz = a.nnz

    Acss = CSSMatrix.from_csr_arrays(a.indptr, a.indices, a.data, a.shape,
                                     transpose=False)
    Acsr = CSRMatrix.from_csr_arrays(a.indptr, a.indices,
                                     a.data.astype(np.float32), a.shape)
    x = jnp.ones(n, dtype=jnp.float32)

    # csr-equivalent bytes per matvec: value + index (4+4 B/nnz) + x + y
    bytes_csr_equiv = nnz * 8 + 2 * n * 4

    t_css = timed_apply(Acss.matvec, x, iters_a=5, iters_b=55)
    t_csr = timed_apply(Acsr.matvec, x, iters_a=2, iters_b=12)

    print(json.dumps({
        "metric": "css_locality_free_spmv",
        "value": round(bytes_csr_equiv / t_css / 1e9, 2),
        "unit": "csr-equiv GB/s",
        "rows": n, "nnz": int(nnz),
        "gnnz_per_s": round(nnz / t_css / 1e9, 3),
        "fill_blowup": round(float(Acss.fill_blowup), 2),
        "rem_frac": round((Acss.rem.nnz if Acss.rem is not None else 0)
                          / nnz, 4),
        "csr_gather_gbs": round(bytes_csr_equiv / t_csr / 1e9, 2),
        "csr_gather_gnnz_per_s": round(nnz / t_csr / 1e9, 3),
        "speedup_vs_gather": round(t_csr / t_css, 1),
    }))


if __name__ == "__main__":
    main()
