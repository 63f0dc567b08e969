"""BASELINE.md target: CG+ILU(0) and GMRES(30)+SSOR time-to-tolerance
on a 10M-row 3-D Poisson operator, one chip (216^3 = 10,077,696 rows,
27-pt stencil).  Warm-cache itime reported alongside marginal ms/iter.

Run: python experiments/_r5_10m.py [dim] [config]   (default 216, all)

Reproduction notes (measured 2026-08-20, BENCH.md "10M-row solves"):
- run ONE config per process at this size: buffers cached by a previous
  solve (routed operator + factors) otherwise push the next config over
  the 16 GB HBM edge (observed: GMRES's 30-vector basis OOMs after a
  CG+ILU solve in the same process but fits alone);
- `-f double` does not fit at 10M rows on one v5e regardless (emulated-
  f64 operator + ILU factors ~6.6 GB resident, XLA peak well above) —
  the per-config try/except records that honestly;
- the accuracy flagship is `-f switch_df` (f32 limb pairs): CG+Jacobi
  converged to TRUE residual 5.3e-11 in 34 s / 726 iters — beyond-f32
  accuracy at a size where f64 cannot even be resident.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import lis_tpu
    from lis_tpu.utils.testmat import poisson3d27

    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 216
    n = dim ** 3
    print(f"# building poisson3d27({dim}^3) = {n:,} rows", file=sys.stderr)
    t0 = time.perf_counter()
    A = poisson3d27(dim, dim, dim)
    print(f"# built in {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    import jax
    # f32 leaves host-side BEFORE any device transfer: the f64 operator
    # alone is 2.2 GB at 10M rows and the cast copies overflow HBM
    A32 = jax.tree.map(
        lambda a: np.asarray(a, np.float32)
        if getattr(a, "dtype", None) is not None
        and np.issubdtype(np.asarray(a).dtype, np.floating) else a, A)
    b = np.ones(n)
    only = sys.argv[2] if len(sys.argv) > 2 else None
    for name, opts in (
            ("cg_ilu0", "-i cg -p ilu -ilu_fill 0 -tol 1e-8 -maxiter 500"),
            ("gmres30_ssor", "-i gmres -restart 30 -p ssor -tol 1e-8 "
                             "-maxiter 500"),
            ("cg_jacobi_switch_df", "-i cg -p jacobi -tol 1e-9 "
                                    "-maxiter 900 -f switch_df"),
    ):
        if only and name != only:
            continue
        modes = ((("df", A32),) if "switch_df" in opts
                 else (("single", A32), ("double", A)))
        for f, Ain in modes:
            o = opts if "switch_df" in opts else f"{opts} -f {f}"
            try:
                r = lis_tpu.solve(Ain, b, options=o)       # compile
                r = lis_tpu.solve(Ain, b, options=o)       # warm
                print(json.dumps({
                    "metric": name, "rows": n, "precision": f,
                    "iters": int(r.iters), "itime_s": round(r.itime, 3),
                    "time_to_tol_s": round(r.time, 3),
                    "true_resid": float(r.true_resid),
                    "status": int(r.status),
                }))
            except Exception as e:
                print(json.dumps({"metric": name, "precision": f,
                                  "error": f"{type(e).__name__}: {e}"[:120]}))


if __name__ == "__main__":
    main()
