"""Chip measurement: SA-AMG lattice V-cycle cost + CG+SAAMG vs CG+SSOR duel.

Two numbers the judge asked for (VERDICT r3, missing #1a):
  1. V-cycle ms/application at 128^3 (2.097M rows) on the jump-coefficient
     Poisson operator — the round-2 liability was 330 ms/iter; the lattice
     box-decimation hierarchy (precon/saamg.py:355) should run at
     DIA-matvec speed.
  2. CG+SAAMG vs CG+SSOR wall-clock on the same operator: iterations AND
     seconds.  The reference's flagship AMG is
     src/fortran/amg/lis_m_solver_AMGCG.F90:50 — an AMG that never beats
     SSOR on the clock is parity on paper only.

Run:  python experiments/_r3_saamg.py [dim]     (default 128)
Emits one JSON line per measurement.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import lis_tpu
from lis_tpu.utils.testmat import poisson3d_jump


def timed_apply(fn, arg, iters_a=5, iters_b=25, repeats=5, outer=3):
    """Differenced per-application time (same methodology as bench.py:28)."""
    def make(iters):
        @jax.jit
        def run(v):
            def body(i, vv):
                return fn(vv) * jnp.asarray(1.0 / 32.0, vv.dtype)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, v))
        return run
    fa, fb = make(iters_a), make(iters_b)
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
        ta, tb = best(fa), best(fb)
        est.append(max((tb - ta) / (iters_b - iters_a), 1e-12))
    return min(est)


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = dim ** 3
    print(f"# building poisson3d_jump({dim}^3) = {n} rows ...",
          file=sys.stderr)
    t0 = time.perf_counter()
    A = poisson3d_jump(dim, dim, dim, jump=1e4)
    print(f"# built in {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    b = np.ones(n)

    # ---- 1. V-cycle ms/application ----------------------------------
    from lis_tpu.precon.base import create_precon
    from lis_tpu.runtime.options import SolverOptions
    opts = SolverOptions.from_string("-p saamg")
    t0 = time.perf_counter()
    M = create_precon("saamg", A, opts)
    setup_s = time.perf_counter() - t0
    x = jnp.ones(n, dtype=jnp.float64 if jax.config.jax_enable_x64
                 else jnp.float32)
    t_cycle = timed_apply(M.psolve, x)
    print(json.dumps({
        "metric": "saamg_vcycle_ms", "value": round(t_cycle * 1e3, 3),
        "unit": "ms/apply", "dim": dim, "rows": n,
        "levels": len(M.levels) + 1,
        "lattice": type(M.levels[0].P).__name__ == "ImplicitP",
        "setup_s": round(setup_s, 2),
    }))

    # ---- 2. CG+SAAMG vs CG+SSOR duel (reference precision = double;
    # f32 reported alongside for honesty: SSOR's relaxed sweeps are a
    # TPU superpower there) ---------------------------------------------
    for f, tol in (("double", "1e-8"), ("single", "1e-6")):
        duel = {}
        for p in ("saamg", "ssor"):
            o = f"-i cg -p {p} -tol {tol} -maxiter 2000 -f {f}"
            r = lis_tpu.solve(A, b, options=o)          # compile
            r = lis_tpu.solve(A, b, options=o)          # warm
            duel[p] = {"iters": int(r.iters), "itime_s": round(r.itime, 3),
                       "ptime_s": round(r.ptime, 3),
                       "resid": float(r.resid)}
        win = duel["saamg"]["itime_s"] < duel["ssor"]["itime_s"]
        print(json.dumps({
            "metric": "cg_saamg_vs_ssor", "dim": dim, "rows": n,
            "precision": f, "tol": tol,
            "saamg": duel["saamg"], "ssor": duel["ssor"],
            "saamg_wins_wallclock": bool(win),
            "speedup": round(duel["ssor"]["itime_s"]
                             / max(duel["saamg"]["itime_s"], 1e-9), 2),
        }))


if __name__ == "__main__":
    main()
