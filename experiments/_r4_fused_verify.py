"""Verify + time the fused Benes pass against the legacy path on chip.

Builds a CST-style block-local random permutation (block 2^21) at M=2^24,
checks ShufflePlan.apply (fused kernels) against the numpy oracle, then
times the full plan apply.

Run:  python experiments/_r4_fused_verify.py [log2M]
"""

from __future__ import annotations

import json
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "experiments")
sys.path.insert(0, ".")
from _timing import timed_apply  # noqa: E402

from lis_tpu.ops.shuffle import (plan_shuffle, block_digits,  # noqa: E402
                                 _apply_pass, _lane_shuffle)
import lis_tpu.ops.shuffle as shmod  # noqa: E402


def legacy_apply(plan, v):
    out = v
    for (d, s), idx in zip(plan.meta, plan.idxs):
        pre = plan.M // (d * s)
        x = out.reshape(pre, d, s)
        x = jnp.swapaxes(x, 1, 2).reshape(-1, 128)
        x = _lane_shuffle(x, idx)
        out = jnp.swapaxes(x.reshape(pre, s, d), 1, 2).reshape(-1)
    return out


def main():
    lm = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    M = 1 << lm
    L = min(M, 1 << 21)
    rng = np.random.default_rng(0)
    # block-local permutation with 50% load (CST-like slack)
    nreal = M // 2
    src = np.sort(rng.choice(M, size=nreal, replace=False))
    blk = src // L
    dst_local = np.full(nreal, -1, dtype=np.int64)
    for b in range(M // L):
        sel = np.flatnonzero(blk == b)
        dst_local[sel] = rng.choice(L, size=len(sel), replace=False)
    dst = blk * L + dst_local
    perm = np.full(M, -1, dtype=np.int64)
    perm[src] = dst

    plan = plan_shuffle(perm, digits=block_digits(M, L), validate=False)
    print(json.dumps({"passes": [list(m) for m in plan.meta],
                      "idx_dtype": str(plan.idxs[0].dtype)}), flush=True)

    v = rng.standard_normal(M).astype(np.float32)
    vd = jnp.asarray(v)
    got = np.asarray(plan.apply(vd))
    ok = bool(np.array_equal(got[dst], v[src]))
    print(json.dumps({"fused_ok": ok}), flush=True)
    if not ok:
        bad = np.flatnonzero(got[dst] != v[src])
        print(json.dumps({"n_bad": int(len(bad)),
                          "first": int(bad[0]) if len(bad) else -1}))
        return

    t_new = timed_apply(lambda p, x: p.apply(x), vd, iters_a=5,
                        iters_b=30, data=plan)
    t_old = timed_apply(legacy_apply, vd, iters_a=5, iters_b=30,
                        data=plan)
    print(json.dumps({
        "fused_ms": round(t_new * 1e3, 3),
        "legacy_ms": round(t_old * 1e3, 3),
        "speedup": round(t_old / t_new, 2),
        "fused_gbs_per_pass": round(
            M * 4 * len(plan.meta) / t_new / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
