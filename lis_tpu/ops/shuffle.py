"""Fixed-permutation shuffle engine — gather-free data movement on TPU.

TPU has no hardware gather/scatter: XLA moves arbitrary elements at
~0.11-0.14 G elem/s (measured, BENCH.md), ~1000x off roofline.  But the
Mosaic ``tpu.dynamic_gather`` lane shuffle — permuting WITHIN each
128-lane row of a (R, 128) array — runs at ~14.6 G elem/s.  This module
realises an ARBITRARY (build-time-fixed) permutation of M = 2^t elements
as a mixed-radix Benes network whose every stage is such a lane shuffle:

- factor M into digits d_1 ... d_k (powers of two, <= 128);
- a Benes network permutes digit 1, digit 2, ..., digit k, ..., digit 2,
  digit 1 (2k-1 passes); each pass permutes elements only within groups
  that share all other digits;
- routing (which group position each element takes in each pass) is the
  classic recursive edge coloring of d-regular bipartite multigraphs,
  computed at build time by log2(d) Euler-circuit splits per level
  (native C++ ``euler_split``; lis_native.cpp);
- each pass is applied as reshape/transpose (XLA, bandwidth-bound) plus
  ONE pallas lane-shuffle over the (M/128, 128) view.

This is the capability the reference gets from hardware caches: its CSR
SpMV serves any sparsity at memory bandwidth per rank
(src/matvec/lis_matvec_csr.c:53) because x random-access hits L2/L3.
The shuffle engine is the TPU-native replacement for the scatter/gather
half of that story (matrix/css.py routes select-phase products into
row-major order with it, making locality-free SpMV scatter-free).

Wide dtypes (f64/complex) are shuffled as bitcast 32-bit planes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

_XLA_TAKE_MAX = 1 << 14       # below this, one XLA take beats the passes


# ---------------------------------------------------------------------------
# Routing (host, build time)
# ---------------------------------------------------------------------------

def _euler_split_py(u, v, nu, nv):
    """Pure-Python Hierholzer fallback (slow; tests/production use the
    native engine)."""
    m = len(u)
    n = nu + nv
    deg = np.zeros(n + 1, dtype=np.int64)
    np.add.at(deg, u + 1, 1)
    np.add.at(deg, nu + v + 1, 1)
    deg = np.cumsum(deg)
    pos = deg[:-1].copy()
    adj = np.empty(2 * m, dtype=np.int64)
    for i in range(m):
        adj[pos[u[i]]] = i
        pos[u[i]] += 1
        adj[pos[nu + v[i]]] = i
        pos[nu + v[i]] += 1
    cursor = deg[:-1].copy()
    used = np.zeros(m, dtype=bool)
    bit = np.zeros(m, dtype=np.uint8)
    for s in range(n):
        while True:
            while cursor[s] < deg[s + 1] and used[adj[cursor[s]]]:
                cursor[s] += 1
            if cursor[s] == deg[s + 1]:
                break
            node = s
            while True:
                while cursor[node] < deg[node + 1] \
                        and used[adj[cursor[node]]]:
                    cursor[node] += 1
                if cursor[node] == deg[node + 1]:
                    break
                e = adj[cursor[node]]
                used[e] = True
                if node < nu:
                    bit[e] = 1
                    node = nu + v[e]
                else:
                    bit[e] = 0
                    node = u[e]
    return bit


def _euler_split(u, v, nu, nv):
    from lis_tpu import _native
    out = _native.euler_split(u, v, nu, nv)
    if out is None:
        out = _euler_split_py(np.asarray(u, np.int64),
                              np.asarray(v, np.int64), nu, nv)
    return out


def _edge_color_euler(left, right, d):
    """Color edges of a d-regular bipartite multigraph (d = 2^p) with d
    colors so each color class is a perfect matching (Birkhoff/Euler).
    Exact; used when the slot grid has no slack."""
    color = np.zeros(len(left), dtype=np.int64)
    nl = int(left.max()) + 1 if len(left) else 1
    nr = int(right.max()) + 1 if len(right) else 1
    deg = d
    while deg > 1:
        # prefix current colors into node ids: each class splits
        # independently (disjoint components of one multigraph)
        u = color * nl + left
        v = color * nr + right
        ncls = int(color.max()) + 1 if len(color) else 1
        bit = _euler_split(u, v, ncls * nl, ncls * nr)
        color = color * 2 + bit
        deg //= 2
    return color


def _edge_color_greedy(left, right, d, n_nodes, seed=0):
    """Partial edge coloring by randomized rounds (vectorized): an
    uncolored edge samples a color and sticks when the (node, color)
    slot is free on BOTH endpoints and no same-round rival claimed it.
    Three phases trade vector width for hit rate as the free-slot pool
    drains: uniform sampling -> sampling among the left node's free
    colors -> sequential first-free walk.  Returns None if edges remain
    (the caller falls back to the exact Euler decomposition)."""
    rng = np.random.default_rng(seed)
    m = len(left)
    left = left.astype(np.int64)
    right = right.astype(np.int64)
    free_l = np.ones((n_nodes, d), dtype=bool)
    free_r = np.ones((n_nodes, d), dtype=bool)
    color = np.full(m, -1, dtype=np.int64)
    todo = np.arange(m)
    # same-round rival detection by claim-stamping (no O(n*d) bincounts):
    # a slot's last writer survives iff it reads its own unique stamp back
    claim = np.zeros(n_nodes * d, dtype=np.int64)
    stamp = np.int64(1)

    def accept(c):
        nonlocal todo, stamp
        kl = left[todo] * d + c
        kr = right[todo] * d + c
        ok = free_l.reshape(-1)[kl] & free_r.reshape(-1)[kr]
        i = np.flatnonzero(ok)
        claim[kl[i]] = stamp + i
        i = i[claim[kl[i]] == stamp + i]
        claim[kr[i]] = stamp + i
        i = i[claim[kr[i]] == stamp + i]
        stamp += m
        color[todo[i]] = c[i]
        free_l.reshape(-1)[kl[i]] = False
        free_r.reshape(-1)[kr[i]] = False
        keep = np.ones(len(todo), dtype=bool)
        keep[i] = False
        todo = todo[keep]

    # phase 1: uniform colors — cheap rounds while slots are plentiful
    for _ in range(24):
        if len(todo) <= (1 << 18):
            break
        before = len(todo)
        accept(rng.integers(0, d, size=len(todo)))
        if len(todo) > 0.9 * before:
            break                      # occupancy too high for blind luck
    # phase 2: sample among the LEFT node's free colors (d-wide rows)
    for _ in range(96):
        if not len(todo) or len(todo) <= (1 << 13):
            break
        fl = free_l[left[todo]]
        cnt = fl.sum(axis=1, dtype=np.uint8)
        if (cnt == 0).any():
            return None
        r = (rng.random(len(todo)) * cnt).astype(np.uint8)
        c = (fl.cumsum(axis=1, dtype=np.uint8)
             > r[:, None]).argmax(axis=1)
        accept(c)
    # phase 3: sequential first-free walk over the stragglers
    if len(todo) > (1 << 15):
        return None
    for e in todo:
        both = free_l[left[e]] & free_r[right[e]]
        c = int(both.argmax())
        if not both[c]:
            return None
        color[e] = c
        free_l[left[e], c] = False
        free_r[right[e], c] = False
    return color


def factor_digits(M: int):
    """Digits (powers of two <= 128) with the fastest digit 128 so the
    center pass is a plain stride-1 lane shuffle."""
    t = int(M).bit_length() - 1
    assert (1 << t) == M, "shuffle plan needs a power-of-two slot count"
    k = -(-t // 7)
    first = t - 7 * (k - 1)
    return [1 << first] + [128] * (k - 1)


def block_digits(M: int, L: int):
    """Digits whose trailing product is the block length L: a
    block-local permutation (every element stays within its L-aligned
    block) then leaves all leading digits untouched, and _route skips
    those levels entirely — the cheap way to buy Benes depth with data
    layout instead of routing.  L must be a power of 128 so every
    colored level has d = 128 (wide color budgets keep the randomized
    greedy coloring reliable; small digits like 8 starve it)."""
    q = 0
    ll = L
    while ll > 1:
        assert ll % 128 == 0, "block length must be a power of 128"
        ll //= 128
        q += 1
    lead = factor_digits(M // L) if M > L else []
    return lead + [128] * q


def _edge_color(left, right, d, n_nodes):
    """Proper partial edge coloring (distinct colors per node on both
    sides): randomized greedy first (fast, exploits empty-slot slack),
    exact Euler decomposition as fallback (graph completed to d-regular
    with dummy edges)."""
    from lis_tpu import _native
    out = _native.greedy_color(left, right, n_nodes, d)
    if out is not None and out[0] == 0:
        return out[1].astype(np.int64)
    if out is None:
        c = _edge_color_greedy(left, right, d, n_nodes)
        if c is not None:
            return c
    deg_l = np.bincount(left, minlength=n_nodes)
    deg_r = np.bincount(right, minlength=n_nodes)
    dum_l = np.repeat(np.arange(n_nodes, dtype=np.int64), d - deg_l)
    dum_r = np.repeat(np.arange(n_nodes, dtype=np.int64), d - deg_r)
    full = _edge_color_euler(np.concatenate([left, dum_l]),
                             np.concatenate([right, dum_r]), d)
    return full[: len(left)]


def _pass_idx(pos_before, pos_after, d, s, M, exact_holes=False):
    """Lane-shuffle gather indices for one Benes pass.

    The pass permutes digit j (size d, stride s): group
    g = (pos // (d*s)) * s + pos % s is invariant.  Physically the array
    is viewed as (M/(d*s), d, s) -> transposed to (.., s, d) -> rows of
    128 lanes holding 128/d consecutive groups; idx is the within-row
    gather for the pallas lane shuffle.

    Slots not occupied by real elements default to reading their own
    lane (may duplicate a real value): cheap, but the plan's output is
    then only meaningful at real destinations — callers mask or ignore
    the rest (ShufflePlan.apply_masked zeroes them).  ``exact_holes``
    instead routes unread source lanes into unwritten output lanes so
    every row stays a true permutation (exact value-preserving
    shuffle)."""
    from lis_tpu import _native
    out = _native.pass_idx(pos_before, pos_after, int(d), int(s), int(M),
                           exact_holes)
    if out is not None:
        return out
    ls = s.bit_length() - 1                  # all sizes are powers of two:
    ld = d.bit_length() - 1                  # shifts/masks beat int64 //,%
    g = ((pos_after >> (ld + ls)) << ls) + (pos_after & (s - 1))
    a_before = ((pos_before >> ls) & (d - 1)).astype(np.int32)
    a_after = ((pos_after >> ls) & (d - 1)).astype(np.int32)
    gpr = 128 // d
    lg = gpr.bit_length() - 1
    rows = g >> lg
    base = ((g & (gpr - 1)) << ld).astype(np.int32)
    if exact_holes:
        idx = np.full((M // 128, 128), -1, dtype=np.int32)
        idx[rows, base + a_after] = base + a_before
        read = np.zeros((M // 128, 128), dtype=bool)
        read[rows, base + a_before] = True
        # pair the j-th unwritten output with the j-th unread lane PER
        # ROW, all vectorized (two global np.nonzero scans cost ~40% of
        # the whole routing at 4M nnz): stable argsort of the read flag
        # lists unread lanes first in lane order; a row-wise cumsum
        # ranks the holes
        unread = np.argsort(read, axis=1, kind="stable").astype(np.int32)
        hole = idx < 0
        jrank = np.cumsum(hole, axis=1, dtype=np.int32) - 1
        np.copyto(idx, np.take_along_axis(unread, jrank, axis=1),
                  where=hole)
        return idx
    idx = np.broadcast_to(np.arange(128, dtype=np.int32),
                          (M // 128, 128)).copy()
    idx.reshape(-1)[rows * 128 + base + a_after] = base + a_before
    return idx


def _route(src: np.ndarray, dst: np.ndarray, M: int, digits=None,
           exact_holes=False, skip_identity=True):
    """Benes routing: list of (d, s, idx) passes moving the element at
    slot src[i] to slot dst[i] (injective; free slots hole-filled).
    Levels whose digit is already final for every element (e.g. the
    block id of a block-local permutation) are skipped — no coloring,
    no pass."""
    digits = digits or factor_digits(M)
    assert int(np.prod(digits)) == M
    k = len(digits)
    strides = np.cumprod([1] + digits[:0:-1])[::-1]  # s_j = prod d_{>j}
    dst = dst.astype(np.int64)
    cur = src.astype(np.int64)
    passes = []
    # forward half: level-j coloring pins digit j to the sub-network id;
    # batch (= digits 1..j-1, already colors) is part of both node ids
    mirrored = []
    for j in range(k - 1):
        d, s = digits[j], int(strides[j])
        ls, ld = s.bit_length() - 1, d.bit_length() - 1
        if skip_identity and np.array_equal((cur >> ls) & (d - 1),
                                            (dst >> ls) & (d - 1)):
            # digit already final for every element: color = own value,
            # both this pass and its mirror are identities
            continue
        prefix = ((cur >> (ld + ls)) << ls)
        left = (cur & (s - 1)) + prefix            # (colors, suffix_src)
        right = (dst & (s - 1)) + prefix           # (colors, suffix_dst)
        c = _edge_color(left, right, d, M // d)
        nxt = ((cur >> (ld + ls)) << (ld + ls)) + (c << ls) + (cur & (s - 1))
        passes.append((d, s, _pass_idx(cur, nxt, d, s, M, exact_holes)))
        cur = nxt
        mirrored.append(j)
    # center pass: digit k goes to its final value
    d = digits[-1]
    ld = d.bit_length() - 1
    nxt = ((cur >> ld) << ld) + (dst & (d - 1))
    if not (skip_identity and np.array_equal(nxt, cur)):
        passes.append((d, 1, _pass_idx(cur, nxt, d, 1, M, exact_holes)))
    cur = nxt
    # mirrored half: colored digits from color to final, innermost first
    for j in reversed(mirrored):
        d, s = digits[j], int(strides[j])
        ls, ld = s.bit_length() - 1, d.bit_length() - 1
        nxt = (((cur >> (ld + ls)) << ld) + ((dst >> ls) & (d - 1))) * s \
            + (cur & (s - 1))
        if not (skip_identity and np.array_equal(nxt, cur)):
            passes.append((d, s, _pass_idx(cur, nxt, d, s, M, exact_holes)))
        cur = nxt
    assert (cur == dst).all(), "Benes routing failed to realise the perm"
    return passes


# ---------------------------------------------------------------------------
# Device application
# ---------------------------------------------------------------------------

def _lane_shuffle32(x, idx):
    """Permute within each 128-lane row: out[r, l] = x[r, idx[r, l]].
    Pallas (Mosaic tpu.dynamic_gather); CPU/interpret fallback is XLA
    take_along_axis (tests on the virtual CPU mesh)."""
    R = x.shape[0]
    # R < 32 falls below the 8-bit (32, 128) min tile of the uint8 index
    # operand; such rows are trivially cheap anyway — XLA path
    if jax.default_backend() == "cpu" or R < 32:
        return jnp.take_along_axis(x, idx.astype(jnp.int32), axis=1)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    TS = min(R, 512)
    # lax.gather spelled in the exact form Mosaic lowers to
    # tpu.dynamic_gather (int32 indices — take_along_axis would promote
    # to int64 under jax_enable_x64 and fail Mosaic)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))

    def kernel(x_ref, i_ref, o_ref):
        ii = i_ref[:]
        if ii.dtype != jnp.int32:
            ii = ii.astype(jnp.int32)          # uint8 storage, i32 gather
        o_ref[:] = jax.lax.gather(
            x_ref[:], ii[..., None], dn, (1, 1),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    # under jax_enable_x64 the grid/index arithmetic traces as i64,
    # which Mosaic refuses; every operand here is 32-bit by now
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
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x, idx)


def _lane_shuffle(x, idx):
    """Dtype-generic row shuffle.  Complex rides as real/imag planes
    (each itself dtype-generic); f64 on TPU uses the exact XLA gather —
    the 32-bit-plane bitcast lowers through u64, which the TPU X64
    rewriter rejects (caught by experiments/chip_smoke.py), and f64 is
    emulated there anyway.  CPU keeps the exact bitcast planes."""
    if x.dtype.itemsize == 4:
        return _lane_shuffle32(x, idx)
    if x.dtype.itemsize < 4:
        return _lane_shuffle32(x.astype(jnp.float32), idx).astype(x.dtype)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        re = _lane_shuffle(jnp.real(x), idx)
        im = _lane_shuffle(jnp.imag(x), idx)
        return jax.lax.complex(re, im).astype(x.dtype)
    if jax.default_backend() != "cpu":
        return jnp.take_along_axis(x, idx.astype(jnp.int32), axis=1)
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)   # (R, 128, n32)
    planes = [_lane_shuffle32(u[..., p], idx)
              for p in range(u.shape[-1])]
    return jax.lax.bitcast_convert_type(jnp.stack(planes, axis=-1),
                                        x.dtype)


_FUSE_W = 1024    # lane tile of the fused pass (f32 VMEM: ~1.1 MB/buf)


def _fused_pass32(x, idx, d, s, M):
    """One whole Benes pass in ONE pallas kernel: strided (d, W) block
    read, in-register transpose, lane gather, transpose back, strided
    write — replacing the legacy reshape/XLA-transpose/shuffle/XLA-
    transpose chain (24 B/slot of HBM traffic -> 9 B/slot with uint8
    indices; measured 2.3x per pass on v5e, experiments/_r4_pass_micro2).
    Requires d == 128 and a 4-byte dtype; input/output are flat (M,)
    in the UN-transposed (pre, d, s) layout."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    pre = M // (d * s)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))

    def body(xt, ii):
        if ii.dtype != jnp.int32:
            ii = ii.astype(jnp.int32)
        return jax.lax.gather(
            xt, ii[..., None], dn, (1, 1),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    xv = x.reshape(pre, d, s)
    iv = idx.reshape(M // 128, 128)
    with jax.enable_x64(False):
        if s >= _FUSE_W:
            W = _FUSE_W if s % _FUSE_W == 0 else s

            def kernel(x_ref, i_ref, o_ref):
                o_ref[0] = body(x_ref[0].T, i_ref[:]).T

            out = pl.pallas_call(
                kernel,
                grid=(pre, s // W),
                in_specs=[pl.BlockSpec((1, d, W), lambda p, q: (p, 0, q),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((W, 128),
                                       lambda p, q: (p * (s // W) + q, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, d, W), lambda p, q: (p, 0, q),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((pre, d, s), x.dtype),
            )(xv, iv)
        else:
            # short stride: batch B consecutive (d, s) tiles per block
            B = max(min(_FUSE_W // s, pre), 1)
            while pre % B:
                B //= 2

            def kernel(x_ref, i_ref, o_ref):
                g = body(jnp.swapaxes(x_ref[:], 1, 2).reshape(-1, 128),
                         i_ref[:])
                o_ref[:] = jnp.swapaxes(g.reshape(B, s, d), 1, 2)

            out = pl.pallas_call(
                kernel,
                grid=(pre // B,),
                in_specs=[pl.BlockSpec((B, d, s), lambda p: (p, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((B * s, 128), lambda p: (p, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((B, d, s), lambda p: (p, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((pre, d, s), x.dtype),
            )(xv, iv)
    return out.reshape(-1)


_ROWSUM_WMAX = 8192   # max lane tile of the fused rowsum pass (f32 input
                      # block = d*W*4 B; 8192 -> 4 MB, double-buffered 8 MB)


def _rowsum_tile(s, Kp):
    """Lane tile W for ``_fused_pass_rowsum32``'s long-stride branch, or
    None when no Mosaic-legal tile exists (callers fall back to the
    unfused passes).  Legality: the OUTPUT block's minor dim is W//Kp,
    which Mosaic accepts only as a multiple of 128 or as the full dim
    s//Kp.  All sizes here are powers of two."""
    if s < _FUSE_W:
        return s                  # short-stride branch: full-dim blocks
    if s % _FUSE_W == 0 and (_FUSE_W // Kp) % 128 == 0:
        return _FUSE_W            # Kp <= 8
    W = 128 * Kp                  # W//Kp == 128 by construction
    if s % W == 0 and W <= _ROWSUM_WMAX:
        return W
    if s <= _ROWSUM_WMAX:
        return s                  # single tile spans the stride: full dim
    return None


def _fused_pass_rowsum32(x, idx, d, s, M, Kp):
    """Final Benes pass + ELL row reduction in ONE kernel: the routed
    values never hit HBM — each (W, 128) gathered tile is summed over
    Kp-groups in registers and only the (W/Kp, 128) row sums are
    written.  Output flat order IS y row-major: slot F = p*d*s + a*s + w
    has row F//Kp = p*(d*s/Kp) + a*(s/Kp) + w//Kp (Kp | s).  Replaces
    pass-write + mask-mul + (n_pad, Kp) minor-dim reshape-sum (measured
    1.78 ms of the 3.75 ms CST matvec at M=2^24 on v5e).  Requires an
    exact-holes plan (holes carry zeros) so no mask operand is needed."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    pre = M // (d * s)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))

    def body(xt, ii):
        if ii.dtype != jnp.int32:
            ii = ii.astype(jnp.int32)
        return jax.lax.gather(
            xt, ii[..., None], dn, (1, 1),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    xv = x.reshape(pre, d, s)
    iv = idx.reshape(M // 128, 128)
    with jax.enable_x64(False):
        if s >= _FUSE_W:
            W = _rowsum_tile(s, Kp)
            assert W is not None and s % W == 0, \
                "caller must gate fusion on _rowsum_tile"

            def kernel(x_ref, i_ref, o_ref):
                g = body(x_ref[0].T, i_ref[:])          # (W, 128)
                o_ref[0] = g.reshape(W // Kp, Kp, 128).sum(axis=1).T

            out = pl.pallas_call(
                kernel,
                grid=(pre, s // W),
                in_specs=[pl.BlockSpec((1, d, W), lambda p, q: (p, 0, q),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((W, 128),
                                       lambda p, q: (p * (s // W) + q, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, d, W // Kp),
                                       lambda p, q: (p, 0, q),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((pre, d, s // Kp), x.dtype),
            )(xv, iv)
        else:
            B = max(min(_FUSE_W // s, pre), 1)
            while pre % B:
                B //= 2

            def kernel(x_ref, i_ref, o_ref):
                g = body(jnp.swapaxes(x_ref[:], 1, 2).reshape(-1, 128),
                         i_ref[:])                       # (B*s, 128)
                r = g.reshape(B, s // Kp, Kp, 128).sum(axis=2)
                o_ref[:] = jnp.swapaxes(r, 1, 2)

            out = pl.pallas_call(
                kernel,
                grid=(pre // B,),
                in_specs=[pl.BlockSpec((B, d, s), lambda p: (p, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((B * s, 128), lambda p: (p, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((B, d, s // Kp),
                                       lambda p: (p, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((pre, d, s // Kp), x.dtype),
            )(xv, iv)
    return out.reshape(-1)


def _fused_small32(x, idxs, ss, M, Kp=None, interpret=False):
    """Apply a CONSECUTIVE RUN of (d=128, s<=128) Benes passes in ONE
    pallas kernel.  Any such pass permutes elements only within aligned
    16384-slot tiles: viewing the flat array as (M/16384, 128, 128)
    tiles T[b, a, w] (slot = b*16384 + a*128 + w), a pass with s == 1
    permutes w within each (b, a) row (a plain lane gather) and a pass
    with s == 128 permutes a within each (b, w) column (transpose, lane
    gather, transpose back).  The CST plan's three inner passes
    (s=128, s=1, s=128) therefore become one kernel — each fused pass
    saves a full HBM read+write of the array (~8 B/slot).

    ``Kp`` (power of two <= 128) additionally fuses the trailing ELL row
    reduction: after the last pass, slot F = b*16384 + a*128 + w has row
    F//Kp, so rows are w-groups of Kp within each (b, a) row and the
    kernel writes only the (128, 128/Kp) row sums per tile.  Only valid
    for exact-holes plans (hole slots provably carry zeros).

    ``interpret`` runs the kernel in pallas interpret mode (CPU
    validation path used by the test suite)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    MB = M // 16384
    B = max(1, min(MB, 8))
    while MB % B:
        B //= 2
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))

    def gather_rows(t2, ii):
        if ii.dtype != jnp.int32:
            ii = ii.astype(jnp.int32)
        return jax.lax.gather(
            t2, ii[..., None], dn, (1, 1),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    def kernel(*refs):
        x_ref = refs[0]
        o_ref = refs[-1]
        T = x_ref[:]                              # (B, 128, 128) [a, w]
        for s, i_ref in zip(ss, refs[1:-1]):
            ii = i_ref[:].reshape(B * 128, 128)
            if s == 1:
                # row shuffle: idx rows indexed by (b, a)
                T = gather_rows(T.reshape(B * 128, 128), ii)
                T = T.reshape(B, 128, 128)
            else:
                # column shuffle: idx rows indexed by (b, w)
                Tt = jnp.swapaxes(T, 1, 2).reshape(B * 128, 128)
                Tt = gather_rows(Tt, ii)
                T = jnp.swapaxes(Tt.reshape(B, 128, 128), 1, 2)
        if Kp is None:
            o_ref[:] = T
        else:
            # reduce w-groups of Kp: a reshape splitting the LANE dim is
            # an unsupported Mosaic shape cast (chip-smoke catch), so
            # contract against a 0/1 selection matrix on the MXU instead
            S = (jax.lax.broadcasted_iota(jnp.int32, (128, 128 // Kp), 0)
                 // Kp
                 == jax.lax.broadcasted_iota(jnp.int32, (128, 128 // Kp),
                                             1)).astype(T.dtype)
            r = jax.lax.dot_general(
                T.reshape(B * 128, 128), S, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=T.dtype)
            o_ref[:] = r.reshape(B, 128, 128 // Kp)

    W_out = 128 if Kp is None else 128 // Kp
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(MB // B,),
            in_specs=[pl.BlockSpec((B, 128, 128), lambda p: (p, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((B, 128, 128), lambda p: (p, 0, 0),
                            memory_space=pltpu.VMEM)] * len(ss),
            out_specs=pl.BlockSpec((B, 128, W_out), lambda p: (p, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((MB, 128, W_out), x.dtype),
            interpret=interpret,
        )(x.reshape(MB, 128, 128),
          *[ii.reshape(MB, 128, 128) for ii in idxs])
    return out.reshape(-1)


def _small_run(meta):
    """(start, stop) of the first maximal run of consecutive passes with
    d == 128 and s <= 128 (the 16384-tile-local passes _fused_small32
    can fuse), or None."""
    i = 0
    n = len(meta)
    while i < n:
        if meta[i][0] == 128 and meta[i][1] <= 128:
            j = i
            while j < n and meta[j][0] == 128 and meta[j][1] <= 128:
                j += 1
            if j - i >= 2:
                return i, j
            i = j
        else:
            i += 1
    return None


def _apply_pass(v, idx, d, s, M):
    """Apply one Benes pass to the flat (M,) vector ``v``."""
    if (d == 128 and s > 1 and jax.default_backend() != "cpu"
            and (s % 128 == 0 or s >= _FUSE_W)):
        if v.dtype.itemsize == 4:
            return _fused_pass32(v, idx, d, s, M)
        if jnp.issubdtype(v.dtype, jnp.complexfloating):
            # complex as real/imag planes (the 64-bit bitcast route is
            # rejected by the TPU X64 rewriter; chip_smoke catch)
            re = _apply_pass(jnp.real(v), idx, d, s, M)
            im = _apply_pass(jnp.imag(v), idx, d, s, M)
            return jax.lax.complex(re, im).astype(v.dtype)
        # f64: fall through to the legacy path (_lane_shuffle routes it
        # to the exact XLA gather on TPU)
    pre = M // (d * s)
    x = v.reshape(pre, d, s)
    x = jnp.swapaxes(x, 1, 2).reshape(-1, 128)
    x = _lane_shuffle(x, idx)
    return jnp.swapaxes(x.reshape(pre, s, d), 1, 2).reshape(-1)


@dataclass(frozen=True)
class ShufflePlan:
    """A fixed permutation compiled to Benes lane-shuffle passes.

    apply(v) returns w with w[perm[i]] = v[i]."""
    idxs: tuple               # device (M/128, 128) uint8 per pass
    meta: tuple = ()          # ((d, s), ...) static
    M: int = 0
    small: object = None      # tiny fallback: device scatter-order take

    def _run_fusable(self, v):
        """The 16384-tile pass-run fusion applies: 4-byte dtype, TPU
        backend, tile-aligned slot count.  LIS_TPU_NO_FUSED_SMALL=1
        disables it (diagnostic kill-switch)."""
        import os
        return (v.dtype.itemsize == 4 and self.M % 16384 == 0
                and self.M >= 16384 and jax.default_backend() != "cpu"
                and os.environ.get("LIS_TPU_NO_FUSED_SMALL") != "1")

    def apply(self, v):
        if self.small is not None:
            return jnp.take(v, self.small, axis=0)
        out = v
        metas, idxs = self.meta, self.idxs
        run = _small_run(metas) if self._run_fusable(v) else None
        i = 0
        while i < len(metas):
            if run is not None and i == run[0]:
                out = _fused_small32(out, idxs[i: run[1]],
                                     [s for _, s in metas[i: run[1]]],
                                     self.M)
                i = run[1]
                continue
            (d, s), idx = metas[i], idxs[i]
            out = _apply_pass(out, idx, d, s, self.M)
            i += 1
        return out

    def apply_rowsum(self, v, Kp: int):
        """apply(v).reshape(M // Kp, Kp).sum(axis=1), with the final
        pass fused with the row reduction on TPU (the routed array never
        round-trips HBM).  Only meaningful for exact-holes plans, where
        every hole slot provably carries a zero."""
        if self.small is not None:
            out = jnp.take(v, self.small, axis=0)
            return out.reshape(-1, Kp).sum(axis=1)
        out = v
        metas, idxs = self.meta, self.idxs
        run = _small_run(metas) if self._run_fusable(v) else None
        last = len(metas) - 1
        i = 0
        while i < len(metas):
            if run is not None and i == run[0]:
                stop = run[1]
                if (stop == len(metas) and Kp <= 128 and 128 % Kp == 0):
                    # the fused run IS the tail: absorb the row sums too
                    return _fused_small32(out, idxs[i: stop],
                                          [s for _, s in metas[i: stop]],
                                          self.M, Kp=Kp)
                out = _fused_small32(out, idxs[i: stop],
                                     [s for _, s in metas[i: stop]],
                                     self.M)
                i = stop
                continue
            (d, s), idx = metas[i], idxs[i]
            if (i == last and d == 128 and s > 1 and s % Kp == 0
                    and out.dtype.itemsize == 4
                    and jax.default_backend() != "cpu"
                    and _rowsum_tile(s, Kp) is not None):
                return _fused_pass_rowsum32(out, idx, d, s, self.M, Kp)
            out = _apply_pass(out, idx, d, s, self.M)
            i += 1
        return out.reshape(-1, Kp).sum(axis=1)

jax.tree_util.register_pytree_node(
    ShufflePlan,
    lambda p: ((p.idxs, p.small), (p.meta, p.M)),
    lambda aux, c: ShufflePlan(idxs=c[0], small=c[1], meta=aux[0],
                               M=aux[1]))


def apply_host(passes, v, M):
    """Numpy reference application of a pass list (build-time validation
    and the test oracle)."""
    out = np.asarray(v)
    for d, s, idx in passes:
        pre = M // (d * s)
        x = np.swapaxes(out.reshape(pre, d, s), 1, 2).reshape(-1, 128)
        x = np.take_along_axis(x, idx, axis=1)
        out = np.swapaxes(x.reshape(pre, s, d), 1, 2).reshape(-1)
    return out


_PLAN_CACHE: "dict[bytes, ShufflePlan]" = {}
_PLAN_CACHE_MAX = 16


def plan_shuffle(perm: np.ndarray, M: int | None = None,
                 validate: bool = True, digits=None,
                 exact_holes: bool = False,
                 skip_identity: bool = True) -> ShufflePlan:
    """Compile a permutation into a ShufflePlan.

    ``perm`` maps src slot -> dst slot; -1 entries are free (unfilled src
    slots), and dst slots not hit are free — both are completed into a
    full bijection internally.  ``M`` (power of two >= len(perm)) pads
    the slot count.

    Plans are memoised on a content hash of (perm, M, digits, flags):
    re-assembling a matrix with an unchanged sparsity pattern (new
    values, same structure — the dominant production pattern, e.g.
    time-stepping re-solves) skips the whole host routing phase, the
    analogue of the reference reusing its commtable across solves
    (src/matrix/lis_matrix_mpi.c:594: built once at assemble)."""
    import hashlib
    perm = np.asarray(perm, dtype=np.int64)
    h = hashlib.blake2b(perm.tobytes(), digest_size=16)
    h.update(repr((M, tuple(digits) if digits else None, exact_holes,
                   skip_identity)).encode())
    key = h.digest()
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit
    M = M or len(perm)
    assert M >= len(perm)
    real = np.flatnonzero(perm >= 0)
    src = real.astype(np.int64)
    dst = perm[real]
    if len(np.unique(dst)) != len(dst):
        raise ValueError("perm has duplicate destinations")
    if M <= _XLA_TAKE_MAX:
        # tiny: one XLA take; unfilled outputs read unread (empty) slots
        inv = np.full(M, -1, dtype=np.int64)
        inv[dst] = src
        unread = np.setdiff1d(np.arange(M, dtype=np.int64), src,
                              assume_unique=False)
        inv[inv < 0] = unread[: int((inv < 0).sum())]
        return _plan_cache_put(key, ShufflePlan(
            idxs=(), meta=(), M=M,
            small=jnp.asarray(inv.astype(np.int32))))
    passes = _route(src, dst, M, digits=digits,
                    exact_holes=exact_holes, skip_identity=skip_identity)
    if validate:
        got = apply_host(passes, np.arange(M, dtype=np.int64), M)
        if not np.array_equal(got[dst], src):
            raise AssertionError("shuffle routing produced a wrong plan")
    return _plan_cache_put(key, ShufflePlan(
        # lane indices are < 128: uint8 storage quarters the index
        # traffic of every pass (kernels upcast to i32 in registers)
        idxs=tuple(jnp.asarray(idx.astype(np.uint8)) for (_, _, idx)
                   in passes),
        meta=tuple((d, s) for (d, s, _) in passes), M=M))


def _plan_cache_put(key: bytes, plan: ShufflePlan) -> ShufflePlan:
    if len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
        _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))    # FIFO eviction
    _PLAN_CACHE[key] = plan
    return plan
