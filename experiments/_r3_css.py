"""Chip measurement: locality-free SpMV — VERDICT r3 missing #1b.

The reference's lis_matvec_csr (src/matvec/lis_matvec_csr.c:53) serves
ANY CSR at memory bandwidth per rank; a naive CSR port on TPU gathers x
per entry (~0.14 G elem/s).  Three TPU paths measured on the same
uniformly-random matrix (no band RCM could expose):

- CST (matrix/cst.py): gather- AND scatter-free — lane-shuffle select +
  Benes-routed ELL row-sum (ops/shuffle.py).  The headline.
- CSS (matrix/css.py): one-hot select (x side regular) + scatter-add
  (y side irregular) — the round-3 design, cheap setup.
- CSR: plain XLA gather/scatter baseline.

Run:  python experiments/_r3_css.py [n] [nnz_per_row]   (default 2^19, 16)
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "experiments")
from _timing import timed_apply  # noqa: E402

from lis_tpu.matrix.csr import CSRMatrix  # noqa: E402
from lis_tpu.matrix.css import CSSMatrix  # noqa: E402
from lis_tpu.matrix.cst import CSTMatrix  # noqa: E402


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
    x = jnp.ones(n, dtype=jnp.float32)
    # csr-equivalent bytes per matvec: value + index (4+4 B/nnz) + x + y
    bytes_eq = nnz * 8 + 2 * n * 4

    t0 = time.perf_counter()
    Acst = CSTMatrix.from_csr_arrays(a.indptr, a.indices, a.data, a.shape,
                                     transpose=False)
    build_cst = time.perf_counter() - t0
    Acss = CSSMatrix.from_csr_arrays(a.indptr, a.indices, a.data, a.shape,
                                     transpose=False)
    Acsr = CSRMatrix.from_csr_arrays(a.indptr, a.indices, a.data, a.shape)

    want = a @ np.ones(n, dtype=np.float32)
    got = np.asarray(Acst.matvec(x))
    ok = bool(np.allclose(got, want, rtol=1e-4, atol=1e-4))
    print(json.dumps({"cst_matvec_ok": ok}), flush=True)

    t_cst = timed_apply(lambda A, v: A.matvec(v), x, iters_a=10,
                        iters_b=60, data=Acst)
    t_css = timed_apply(lambda A, v: A.matvec(v), x, iters_a=3,
                        iters_b=13, data=Acss)
    t_csr = timed_apply(lambda A, v: A.matvec(v), x, iters_a=2,
                        iters_b=7, data=Acsr)

    print(json.dumps({
        "metric": "cst_locality_free_spmv",
        "value": round(bytes_eq / t_cst / 1e9, 2),
        "unit": "csr-equiv GB/s",
        "rows": n, "nnz": int(nnz),
        "gnnz_per_s": round(nnz / t_cst / 1e9, 3),
        "ms_per_matvec": round(t_cst * 1e3, 3),
        "fill_blowup": round(float(Acst.fill_blowup), 2),
        "build_s": round(build_cst, 1),
        "benes_passes": len(Acst.plan.meta),
        "css_gbs": round(bytes_eq / t_css / 1e9, 2),
        "csr_gather_gbs": round(bytes_eq / t_csr / 1e9, 2),
        "speedup_vs_css": round(t_css / t_cst, 1),
        "speedup_vs_gather": round(t_csr / t_cst, 1),
    }))


if __name__ == "__main__":
    main()
