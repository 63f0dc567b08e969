"""Phase breakdown of the CST matvec on chip (round-4 optimization aid).

Times each pipeline stage in isolation (select / multiply / bucket
transpose / Benes passes / mask+rowsum) so optimization effort lands on
the dominant one.  Also reports the bytes each stage must move at
minimum, giving a per-stage roofline.

Run:  python experiments/_r4_cst_prof.py [n] [nnz_per_row]
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
sys.path.insert(0, ".")
from _timing import timed_apply  # noqa: E402

from lis_tpu.matrix.cst import CSTMatrix  # noqa: E402
from lis_tpu.ops.shuffle import _lane_shuffle  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 19
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rng = np.random.default_rng(0)
    rows = np.repeat(np.arange(n), k)
    cols = rng.integers(0, n, size=n * k)
    a = sp.coo_matrix((rng.standard_normal(n * k).astype(np.float32),
                       (rows, cols)), shape=(n, n)).tocsr()
    a.sum_duplicates(); a.sort_indices()
    x = jnp.ones(n, dtype=jnp.float32)

    t0 = time.perf_counter()
    A = CSTMatrix.from_csr_arrays(a.indptr, a.indices, a.data, a.shape,
                                  transpose=False)
    build = time.perf_counter() - t0
    M = A.n_pad * A.Kp
    CB = A.n_pad // 128

    # every phase fn is v(M,) -> (M,) so timed_apply can carry it
    def sel(A, v):
        return A._select(v[: A.nrows]).reshape(-1)

    def mul(A, v):
        return (v.reshape(-1, 128) * A.val).reshape(-1)

    def btrans(A, v):
        t = v.reshape(CB, A.RBc, A.beta)
        return jnp.swapaxes(t, 0, 1).reshape(-1)

    def benes(A, v):
        return A.plan.apply(v)

    def one_pass(A, v):
        (d, s), idx = A.plan.meta[0], A.plan.idxs[0]
        pre = M // (d * s)
        xx = v.reshape(pre, d, s)
        xx = jnp.swapaxes(xx, 1, 2).reshape(-1, 128)
        xx = _lane_shuffle(xx, idx)
        return jnp.swapaxes(xx.reshape(pre, s, d), 1, 2).reshape(-1)

    def center_pass(A, v):
        # a (d, s=1) pass has no reshape/transpose wrapper cost
        for (d, s), idx in zip(A.plan.meta, A.plan.idxs):
            if s == 1:
                return _lane_shuffle(v.reshape(-1, 128), idx).reshape(-1)
        return v

    def masksum(A, v):
        # exact-holes plans carry provable zeros in unreal slots, so the
        # row reduction needs no mask; + a broadcast back to M so the
        # loop carry keeps its shape
        y = v.reshape(A.n_pad, A.Kp).sum(axis=1)
        return jnp.broadcast_to(y[:, None], (A.n_pad, A.Kp)).reshape(-1)

    def fused_front(A, v):
        return A._fused_front(v[: A.n_pad])

    def fused_rowsum(A, v):
        # final Benes pass fused with the row sums (TPU path)
        y = A.plan.apply_rowsum(v, A.Kp)
        return jnp.broadcast_to(y[:, None], (A.n_pad, A.Kp)).reshape(-1)

    def full(A, v):
        return A.matvec(v)

    flat = jnp.ones(M, dtype=jnp.float32)

    # fused phases mirror CSTMatrix.matvec's dispatch guards: skip where
    # no Mosaic-legal tile exists or the backend is CPU (ADVICE r4)
    fused_ok = (jax.default_backend() != "cpu"
                and A._front_tile() is not None)
    out = {"rows": n, "nnz": int(a.nnz), "M": M, "Kp": A.Kp,
           "passes": len(A.plan.meta), "build_s": round(build, 1)}
    for name, fn, v in [("select", sel, flat), ("mul", mul, flat),
                        ("bucket_transpose", btrans, flat),
                        ("benes_all", benes, flat),
                        ("benes_first", one_pass, flat),
                        ("benes_center", center_pass, flat),
                        ("mask_rowsum_bc", masksum, flat),
                        ("fused_front", fused_front, flat),
                        ("fused_rowsum", fused_rowsum, flat),
                        ("full_matvec", full, x)]:
        if name == "fused_front" and not fused_ok:
            out[name + "_ms"] = None
            continue
        t = timed_apply(lambda A, v: fn(A, v), v, iters_a=5, iters_b=30,
                        data=A)
        out[name + "_ms"] = round(t * 1e3, 3)
        out[name + "_gbs_M4B"] = round(M * 4 / t / 1e9, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
