"""Microbenchmarks for fused-Benes-pass building blocks (round 4).

Validates on chip, before committing to a kernel design:
  1. the current pass (XLA transpose + lane shuffle + XLA transpose back)
  2. a fused pallas pass: strided (1,128,128) block read from the
     (pre, d, s) view, in-kernel transpose, lane gather, contiguous write
  3. uint8 vs int32 shuffle indices
Run:  python experiments/_r4_pass_micro.py [log2M]
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "experiments")
sys.path.insert(0, ".")
from _timing import timed_apply  # noqa: E402


def current_pass(x, idx, pre, d, s):
    v = x.reshape(pre, d, s)
    v = jnp.swapaxes(v, 1, 2).reshape(-1, 128)
    from lis_tpu.ops.shuffle import _lane_shuffle
    v = _lane_shuffle(v, idx)
    return jnp.swapaxes(v.reshape(pre, s, d), 1, 2).reshape(-1)


def fused_pass(x, idx, pre, d, s, idx_dtype=jnp.int32):
    """out[(p, q, a')] = x[(p, idx[p*s+q, a'], q)] — output in (pre, s, d)
    layout (digit moves to lanes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    M = pre * d * s
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))

    def kernel(x_ref, i_ref, o_ref):
        xt = x_ref[0].T                     # (128 q, 128 a)
        ii = i_ref[:]
        if ii.dtype != jnp.int32:
            ii = ii.astype(jnp.int32)
        o_ref[:] = jax.lax.gather(
            xt, ii[..., None], dn, (1, 1),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    xv = x.reshape(pre, d, s)
    iv = idx.astype(idx_dtype)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(pre, s // 128),
            in_specs=[pl.BlockSpec((1, d, 128), lambda p, q: (p, 0, q),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((128, 128), lambda p, q: (p * (s // 128)
                                                             + q, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((128, 128), lambda p, q: (p * (s // 128)
                                                             + q, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M // 128, 128), x.dtype),
        )(xv, iv)
    return out.reshape(-1)


def main():
    lm = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    M = 1 << lm
    d = 128
    s = 1 << 14
    pre = M // (d * s)
    rng = np.random.default_rng(0)
    # one independent 128-perm per group row
    idx = np.argsort(rng.random((M // 128, 128)), axis=1).astype(np.int32)
    x = jnp.asarray(rng.standard_normal(M).astype(np.float32))
    idx32 = jnp.asarray(idx)
    idx8 = jnp.asarray(idx.astype(np.uint8))

    # correctness: fused output (pre,s,d) layout == current's intermediate
    xs = np.asarray(x).reshape(pre, d, s)
    want = np.take_along_axis(
        np.swapaxes(xs, 1, 2).reshape(-1, 128), idx, axis=1)
    got = np.asarray(fused_pass(x, idx32, pre, d, s)).reshape(-1, 128)
    ok_fused = bool(np.array_equal(want, got))
    got8 = np.asarray(fused_pass(x, idx8, pre, d, s,
                                 idx_dtype=jnp.uint8)).reshape(-1, 128)
    ok_u8 = bool(np.array_equal(want, got8))

    t_cur = timed_apply(lambda a, v: current_pass(v, a, pre, d, s), x,
                        iters_a=5, iters_b=30, data=idx32)
    t_fus = timed_apply(lambda a, v: fused_pass(v, a, pre, d, s), x,
                        iters_a=5, iters_b=30, data=idx32)
    t_fu8 = timed_apply(lambda a, v: fused_pass(v, a, pre, d, s,
                                                idx_dtype=jnp.uint8), x,
                        iters_a=5, iters_b=30, data=idx8)
    print(json.dumps({
        "M": M, "ok_fused": ok_fused, "ok_u8": ok_u8,
        "current_ms": round(t_cur * 1e3, 3),
        "fused_ms": round(t_fus * 1e3, 3),
        "fused_u8_ms": round(t_fu8 * 1e3, 3),
        "current_gbs": round(M * 4 / t_cur / 1e9, 1),
        "fused_gbs": round(M * 4 / t_fus / 1e9, 1),
        "fused_u8_gbs": round(M * 4 / t_fu8 / 1e9, 1),
    }))


if __name__ == "__main__":
    main()
