"""Does Mosaic support dynamic gather along SUBLANES (axis 0)?  If yes,
the whole Benes chain can run in a fixed layout with zero transposes.

Tests correctness + speed of out[a', q] = x[idx[a', q], q] on (128,128)
tiles, for contiguous tiles and for strided (1,128,1,128) blocks of a
(pre, 128, mid, 128) view.

Run:  python experiments/_r4_subgather.py [log2M]
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


def sub_gather_contig(x, idx, idx_dtype=jnp.uint8, SB=128):
    """x (R,128) viewed as tiles of (128,128); within each tile
    out[a',q] = x[tile, idx[tile, a', q], q]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    R = x.shape[0]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,),
        operand_batching_dims=(1,), start_indices_batching_dims=(1,))

    def kernel(x_ref, i_ref, o_ref):
        ii = i_ref[:]
        if ii.dtype != jnp.int32:
            ii = ii.astype(jnp.int32)
        o_ref[:] = jax.lax.gather(
            x_ref[:], ii[..., None], dn, (1, 1),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    iv = idx.astype(idx_dtype)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=(R // SB,),
            in_specs=[pl.BlockSpec((SB, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((SB, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((SB, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x, iv)


def sub_gather_strided(x, idx, pre, mid, idx_dtype=jnp.uint8):
    """x viewed (pre, 128, mid, 128): block (1,128,1,128); gather along
    the axis-1 sublanes per lane."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,),
        operand_batching_dims=(1,), start_indices_batching_dims=(1,))

    def kernel(x_ref, i_ref, o_ref):
        ii = i_ref[0, :, 0, :]
        if ii.dtype != jnp.int32:
            ii = ii.astype(jnp.int32)
        o_ref[0, :, 0, :] = jax.lax.gather(
            x_ref[0, :, 0, :], ii[..., None], dn, (1, 1),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    xv = x.reshape(pre, 128, mid, 128)
    iv = idx.astype(idx_dtype).reshape(pre, 128, mid, 128)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(pre, mid),
            in_specs=[pl.BlockSpec((1, 128, 1, 128),
                                   lambda p, m: (p, 0, m, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 128, 1, 128),
                                   lambda p, m: (p, 0, m, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128, 1, 128),
                                   lambda p, m: (p, 0, m, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xv.shape, x.dtype),
        )(xv, iv)
    return out.reshape(x.shape)


def main():
    lm = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    M = 1 << lm
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(M).astype(np.float32)).reshape(
        -1, 128)
    R = M // 128
    # per-tile sublane permutations, broadcast over lanes would be
    # boring — use independent per-lane sublane perms
    idx = np.argsort(rng.random((R, 128)), axis=0).astype(np.int32)
    # make idx tile-local: idx within each 128-row tile
    idx = idx % 128
    # correctness wants a real permutation per (tile, lane): build one
    perm = np.empty((R, 128), dtype=np.int32)
    for t0 in range(0, R, 128):
        perm[t0:t0 + 128] = np.argsort(
            rng.random((128, 128)), axis=0).astype(np.int32)
    xn = np.asarray(x)
    want = np.empty_like(xn)
    for t0 in range(0, R, 128):
        want[t0:t0 + 128] = np.take_along_axis(
            xn[t0:t0 + 128], perm[t0:t0 + 128], axis=0)

    try:
        got = np.asarray(sub_gather_contig(x, jnp.asarray(perm)))
        ok = bool(np.array_equal(want, got))
    except Exception as e:
        print(json.dumps({"contig_error": repr(e)[:300]}), flush=True)
        ok = False
    if ok:
        t = timed_apply(lambda a, v: sub_gather_contig(v, a), x,
                        iters_a=5, iters_b=30, data=jnp.asarray(perm))
        print(json.dumps({"contig_ok": ok, "ms": round(t * 1e3, 3),
                          "gbs": round(M * 4 / t / 1e9, 1)}), flush=True)

    pre, mid = M // (128 * 128 * 128), 128
    xs = np.asarray(x).reshape(pre, 128, mid, 128)
    perm4 = np.empty((pre, 128, mid, 128), dtype=np.int32)
    rng2 = np.random.default_rng(1)
    perm4[:] = np.argsort(rng2.random((pre, 128, mid, 128)), axis=1)
    want4 = np.take_along_axis(xs, perm4, axis=1)
    try:
        got4 = np.asarray(sub_gather_strided(
            x.reshape(-1), jnp.asarray(perm4.reshape(-1, 128)), pre,
            mid)).reshape(pre, 128, mid, 128)
        ok4 = bool(np.array_equal(want4, got4))
    except Exception as e:
        print(json.dumps({"strided_error": repr(e)[:300]}), flush=True)
        ok4 = False
    if ok4:
        t4 = timed_apply(
            lambda a, v: sub_gather_strided(v, a, pre, mid),
            x.reshape(-1), iters_a=5, iters_b=30,
            data=jnp.asarray(perm4.reshape(-1, 128)))
        print(json.dumps({"strided_ok": ok4, "ms": round(t4 * 1e3, 3),
                          "gbs": round(M * 4 / t4 / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
