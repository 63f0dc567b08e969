"""Round-5 CST matvec timing: quantify the tile-local pass-run fusion.

Times jit(A.matvec) at a production-sized locality-free matrix with the
fused small-pass run enabled (default) and disabled
(LIS_TPU_NO_FUSED_SMALL=1 semantics, toggled in-process), plus the
apply_rowsum-only phase.  One process, loop-differenced timing
(bench.py methodology).

Run:  python experiments/_r5_cst_perf.py [log2_n] [k]     (default 18 16)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(make, arg, ia, ib, repeats=4, outer=2):
    fa, fb = make(ia), make(ib)
    float(fa(arg)); float(fb(arg))

    def best(f):
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(f(arg))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    est = []
    for _ in range(outer):
        est.append(max((best(fb) - best(fa)) / (ib - ia), 1e-12))
    return min(est)


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from lis_tpu.matrix.cst import CSTMatrix

    ln = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 1 << ln
    rng = np.random.default_rng(0)
    rows = np.repeat(np.arange(n), k)
    cols = rng.integers(0, n, size=n * k)
    m = sp.coo_matrix((rng.standard_normal(n * k).astype(np.float32),
                       (rows, cols)), shape=(n, n)).tocsr()
    m.sum_duplicates()
    m.sort_indices()
    t0 = time.perf_counter()
    A = CSTMatrix.from_csr_arrays(m.indptr, m.indices, m.data, m.shape,
                                  transpose=False)
    build_s = time.perf_counter() - t0
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    # correctness gate first
    got = np.asarray(jax.jit(A.matvec)(x))
    want = m @ np.asarray(x)
    rel = float(np.linalg.norm(got - want) / np.linalg.norm(want))
    assert rel < 1e-5, rel

    def make_loop(iters):
        @jax.jit
        def run(v):
            def body(i, vv):
                return A.matvec(vv) * jnp.float32(1.0 / 32.0)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, v))
        return run

    res = {"rows": n, "nnz": int(m.nnz), "Kp": A.Kp, "beta": A.beta,
           "meta": list(map(list, A.plan.meta)),
           "build_s": round(build_s, 1), "matvec_rel_err": rel}

    t_fused = timed(make_loop, x, 10, 60)
    res["matvec_fused_ms"] = round(t_fused * 1e3, 3)
    os.environ["LIS_TPU_NO_FUSED_SMALL"] = "1"
    jax.clear_caches()
    t_unf = timed(make_loop, x, 10, 60)
    del os.environ["LIS_TPU_NO_FUSED_SMALL"]
    res["matvec_unfused_ms"] = round(t_unf * 1e3, 3)
    res["fusion_speedup"] = round(t_unf / t_fused, 3)
    res["csr_equiv_gbs_fused"] = round(
        (m.nnz * 8 + 2 * n * 4) / t_fused / 1e9, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
