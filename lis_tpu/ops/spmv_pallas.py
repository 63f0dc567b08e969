"""Pallas TPU kernels for the SpMV hot path.

The flagship kernel is DIA (stencil) SpMV: for banded operators every
diagonal contributes value[k,:] * x[i+off_k] — no gathers, pure VPU
multiply-add streaming at HBM speed.

TPU layout: vectors live as (rows, 128) tiles.  A flat shift by s
decomposes as (q, r) = divmod(s, 128): a row shift (free — just a slice)
plus a lane shift, expressed as two lane-rolls with a carry select:
    out[i, l] = x[i+q,   (l+r)%128]   if l <  128-r
              = x[i+q+1, (l+r)%128]   otherwise.
The diagonal block streams through VMEM via the pallas pipeline; the x
window (block + halo rows) is DMA'd manually per block since overlapping
windows cannot be expressed as a BlockSpec.

The XLA-fused jnp path (lis_tpu.matrix.dia) already reaches the HBM
roofline on v5e (measured 810 GB/s = 99% of the 819 GB/s spec at 96^3,
27 diagonals, f32); this kernel is the explicitly-scheduled variant for
comparison and for fusing further work into the block loop.

STATUS: experimental — the manual x-window DMA pattern triggers a Mosaic
"failed to legalize func.return" AOT error (and can crash the worker) on
remote-compile v5e environments; the jnp path is the product path and is
what bench.py measures.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _shifted(win_ref, row0: int, q: int, r: int, rows: int):
    """rows×128 window of win_ref flat-shifted by q·128+r from row0."""
    if r == 0:
        return win_ref[pl.ds(row0 + q, rows), :]
    a = win_ref[pl.ds(row0 + q, rows), :]
    b = win_ref[pl.ds(row0 + q + 1, rows), :]
    # want out[l] = in[(l+r)%128]; pltpu.roll(x, s)[l] = x[(l-s)%128]
    # keep the (static) shift i32: under jax_enable_x64 a python int traces
    # as i64, which tpu.dynamic_rotate rejects
    shift = jnp.int32(LANES - r)
    ra = pltpu.roll(a, shift, axis=1)
    rb = pltpu.roll(b, shift, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return jnp.where(lane < LANES - r, ra, rb)


def _dia_kernel(offsets, halo_rows, rows, x_hbm, val_ref, o_ref,
                x_scratch, sem):
    i = pl.program_id(0)
    # DMA x window rows [i*rows - halo, i*rows + rows + halo) of the padded
    # 2-D x (the caller pre-offsets by halo so the start is never negative)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * rows, rows + 2 * halo_rows), :], x_scratch, sem)
    dma.start()
    dma.wait()
    acc = jnp.zeros((rows, LANES), dtype=o_ref.dtype)
    for k, off in enumerate(offsets):
        q, r = divmod(off + halo_rows * LANES, LANES)
        acc = acc + val_ref[k] * _shifted(x_scratch, 0, q, r, rows)
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "block_rows"))
def matvec_dia_pallas(value, x, offsets: tuple, block_rows: int = 64):
    """y = A x for DIA storage (value (nnd, n), static diagonal offsets)."""
    nnd, n = value.shape
    maxoff = max((abs(o) for o in offsets), default=0)
    halo_rows = -(-maxoff // LANES)
    rows_total = -(-n // LANES)
    nblocks = -(-rows_total // block_rows)
    rows_pad = nblocks * block_rows
    npad = rows_pad * LANES

    vpad = jnp.pad(value, ((0, 0), (0, npad - n)))
    v3 = vpad.reshape(nnd, rows_pad, LANES)
    # x padded with halo rows on both sides
    xp = jnp.pad(x, (halo_rows * LANES, halo_rows * LANES + (npad - n)))
    x2 = xp.reshape(rows_pad + 2 * halo_rows, LANES)

    kernel = functools.partial(_dia_kernel, offsets, halo_rows, block_rows)
    y = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),            # x in HBM
            pl.BlockSpec((nnd, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, LANES), value.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_rows + 2 * halo_rows, LANES), value.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(x2, v3)
    return y.reshape(-1)[:n]


def dia_matvec(A, x):
    """Pallas SpMV for a DIAMatrix pytree."""
    import jax.numpy as _jnp
    v = _jnp.stack(A.value) if isinstance(A.value, tuple) else A.value
    return matvec_dia_pallas(v, x, A.offsets)
