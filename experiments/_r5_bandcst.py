"""Round-5: band-concentrated sparsity through the Kp-escalated CST
route (auto_storage throughput-aware routing) — on-chip correctness +
rate.  Run: python experiments/_r5_bandcst.py"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from lis_tpu.solvers.driver import auto_storage
    from lis_tpu.matrix.csr import CSRMatrix

    rng = np.random.default_rng(3)
    n, k = 1 << 17, 16
    rows = np.repeat(np.arange(n), k)
    cols = np.clip(rows + rng.integers(-4000, 4001, size=n * k), 0, n - 1)
    m = sp.coo_matrix((rng.standard_normal(n * k).astype(np.float32),
                       (rows, cols)), shape=(n, n)).tocsr()
    m.sum_duplicates(); m.sort_indices()
    A = CSRMatrix.from_csr_arrays(m.indptr, m.indices, m.data, m.shape)
    t0 = time.perf_counter()
    R = auto_storage(A)
    build = time.perf_counter() - t0
    info = {"routed": type(R).__name__, "build_s": round(build, 1)}
    if hasattr(R, "Kp"):
        info.update(Kp=R.Kp, beta=R.beta, blowup=round(R.fill_blowup, 2))
    x = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(jax.jit(R.matvec)(jnp.asarray(x)))
    want = m @ x
    info["rel_err"] = float(np.linalg.norm(got - want)
                            / np.linalg.norm(want))

    def make(iters):
        @jax.jit
        def run(v):
            def body(i, vv):
                return R.matvec(vv) * jnp.float32(1.0 / 32.0)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, v))
        return run

    fa, fb = make(10), make(60)
    xa = jnp.asarray(x)
    float(fa(xa)); float(fb(xa))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(fa(xa)); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(fb(xa)); tb = time.perf_counter() - t0
        ts.append((tb - ta) / 50)
    t = min(ts)
    info["matvec_ms"] = round(t * 1e3, 3)
    info["csr_equiv_gbs"] = round((m.nnz * 8 + 2 * n * 4) / t / 1e9, 2)
    print(json.dumps(info))


if __name__ == "__main__":
    main()
