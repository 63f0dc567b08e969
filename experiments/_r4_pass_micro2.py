"""Round-4 fused-pass tile-size sweep + rowsum variants (chip).

The (1,128,128)-tile fused pass measured only ~26%% of HBM spec; this
sweeps wider lane tiles (amortizing the strided reads and transposes)
and measures rowsum formulations (reshape-sum vs MXU dot).

Run:  python experiments/_r4_pass_micro2.py [log2M]
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


def fused_pass_wide(x, idx, pre, d, s, W, idx_dtype=jnp.uint8):
    """W lanes per tile (W multiple of 128): one (d, W) strided read,
    one (d, W) -> (W, d) in-kernel transpose, one batched gather, one
    contiguous (W, d) write."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    M = pre * d * s
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))

    def kernel(x_ref, i_ref, o_ref):
        xt = x_ref[0].T                     # (W q, d a)
        ii = i_ref[:]
        if ii.dtype != jnp.int32:
            ii = ii.astype(jnp.int32)
        o_ref[:] = jax.lax.gather(
            xt, ii[..., None], dn, (1, 1),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    xv = x.reshape(pre, d, s)
    iv = idx.astype(idx_dtype).reshape(-1, 128)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(pre, s // W),
            in_specs=[pl.BlockSpec((1, d, W), lambda p, q: (p, 0, q),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((W, 128),
                                   lambda p, q: (p * (s // W) + q, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((W, 128),
                                   lambda p, q: (p * (s // W) + q, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M // 128, 128), x.dtype),
        )(xv, iv.reshape(M // 128, 128))
    return out.reshape(-1)


def gather_only(x, idx, idx_dtype=jnp.uint8, TS=512):
    """Contiguous lane shuffle (no transpose), uint8 idx variant of
    ops/shuffle._lane_shuffle32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    R = x.shape[0] * x.shape[1] // 128
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))

    def kernel(x_ref, i_ref, o_ref):
        ii = i_ref[:]
        if ii.dtype != jnp.int32:
            ii = ii.astype(jnp.int32)
        o_ref[:] = jax.lax.gather(
            x_ref[:], ii[..., None], dn, (1, 1),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    xv = x.reshape(R, 128)
    iv = idx.astype(idx_dtype).reshape(R, 128)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=(R // TS,),
            in_specs=[pl.BlockSpec((TS, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((TS, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TS, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xv.shape, x.dtype),
        )(xv, iv).reshape(x.shape)


def main():
    lm = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    M = 1 << lm
    d = 128
    s = 1 << 14
    pre = M // (d * s)
    Kp = 32
    rng = np.random.default_rng(0)
    idx = np.argsort(rng.random((M // 128, 128)), axis=1).astype(np.int32)
    x = jnp.asarray(rng.standard_normal(M).astype(np.float32))

    xs = np.asarray(x).reshape(pre, d, s)
    want = np.take_along_axis(
        np.swapaxes(xs, 1, 2).reshape(-1, 128), idx, axis=1)

    out = {"M": M}
    for W in (128, 512, 1024, 2048):
        got = np.asarray(fused_pass_wide(x, jnp.asarray(idx), pre, d, s,
                                         W)).reshape(-1, 128)
        ok = bool(np.array_equal(want, got))
        t = timed_apply(lambda a, v: fused_pass_wide(v, a, pre, d, s, W),
                        x, iters_a=5, iters_b=30, data=jnp.asarray(idx))
        print(json.dumps({"W": W, "ok": ok, "ms": round(t * 1e3, 3),
                          "gbs": round(M * 4 / t / 1e9, 1)}), flush=True)

    # plain contiguous gather with u8 idx (center-pass shape)
    xg = x.reshape(M // 128, 128)
    t8 = timed_apply(lambda a, v: gather_only(v, a), xg, iters_a=5,
                     iters_b=30, data=jnp.asarray(idx))
    print(json.dumps({"gather_u8_ms": round(t8 * 1e3, 3),
                      "gather_u8_gbs": round(M * 4 / t8 / 1e9, 1)}),
          flush=True)

    # rowsum variants over (n_pad, Kp)
    n_pad = M // Kp
    S = jnp.asarray((np.arange(128)[:, None] // Kp
                     == np.arange(128 // Kp)[None, :]).astype(np.float32))

    def rs_reshape(v):
        y = v.reshape(n_pad, Kp).sum(axis=1)
        return jnp.broadcast_to(y[:, None], (n_pad, Kp)).reshape(-1)

    def rs_dot(_, v):
        y = (v.reshape(M // 128, 128) @ S).reshape(-1)
        return jnp.broadcast_to(
            y.reshape(n_pad, 1), (n_pad, Kp)).reshape(-1)

    t_rs = timed_apply(rs_reshape, x, iters_a=5, iters_b=30, data=None)
    t_rd = timed_apply(rs_dot, x, iters_a=5, iters_b=30, data=S)
    print(json.dumps({"rowsum_reshape_ms": round(t_rs * 1e3, 3),
                      "rowsum_dot_ms": round(t_rd * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
