"""Pallas windowed gather-GEMM sparse convolution (the hot kernel).

XLA's HBM row-gather runs at ~30-100 GB/s on TPU and dominates the sparse
conv (27 gathers per stencil).  This kernel exploits the spatial lex-sort of
the voxel rows (data/batch.py): measured neighbor row distances decompose as

  dz offsets:   |d| <= 1          (z-runs are adjacent rows)
  dy offsets:   |d| <= ~128       (within an x-plane)
  dx offsets:   within the previous/next x-plane (a bounded window per tile)

so for each 128-row output tile, ALL stencil inputs live in three small row
windows (dx = -1 / 0 / +1).  Per tile the kernel:

1. DMAs the three (WIN, C) row slabs HBM -> VMEM (16-row-aligned dynamic
   starts), transposes to (C, WIN) and converts to f32 (the TPU lane-crossbar
   gather is 32-bit only);
2. gathers each offset's (C, TILE) columns with the 128-lane crossbar
   (4 gathers + selects per offset across WIN/128 groups), masking missing
   neighbors, building a (K*C, TILE) stacked operand in VMEM;
3. runs ONE MXU GEMM per tile: (K*C, TILE) x (Cout, K*C) -> (TILE, Cout).

The same local-index plan drives the backward pass: with G_k = g[fwd[k]],
dx = sum_k G_k @ W[flip k]^T and dW[flip k] = x^T @ G_k (see sparse/ops.py),
so one fused backward kernel gathers g once per offset and produces both
cotangents.

Coverage is data-dependent: the host/device plan builder verifies every tile
fits its windows and returns None otherwise, and callers fall back to the
XLA gather path (sparse/ops.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .types import stencil_offsets

TILE = 128
MTILE = 4  # max output tiles per GEMM: N = MTILE*TILE spreads the matmul
# over all MXUs (one TILE-wide GEMM is a single chained 128x128 output
# block); wide-channel kernels drop to 2/1 to fit the 16MB scoped VMEM
# (see _pick_mtile). Caps are 512-granular so any of 4/2/1 divides ntiles.


def _pick_mtile(K: int, Cn: int, Coutp: int, backward: bool) -> int:
    """Largest MTILE whose kernel fits the scoped-VMEM budget."""
    for mt in (MTILE, 2, 1):
        stack = K * Cn * mt * TILE * 2
        weights = K * Cn * Coutp * 2
        blocks = mt * TILE * Coutp * 4 * 2          # out (or dx+x) dbl-buf
        acc = K * Cn * Coutp * 4 if backward else 0
        if stack + weights + blocks + acc + 3 * 1024 * 1024 < 14_500_000:
            return mt
    return 1
# WIN=384 was tried (25% fewer crossbar passes; spills 2.5-6.4% vs 2-2.9%,
# scripts/dev_window_stats.py) and measured NET WORSE in the full train
# step: 2510ms vs 2201ms at bench scale — the larger spill buckets the
# extra spills force (every conv pays gather+GEMM+scatter over the whole
# static bucket) exceed the gather savings, and the core itself gained
# nothing measurable. Keep 512.
WIN = 512
NCLASS = 3  # dx = -1 / 0 / +1 window classes
INVALID = WIN  # any local index >= WIN means "missing neighbor"


INVALID2 = 256  # sentinel for per-offset rebased indices (2-group gather)


class WindowPlan(NamedTuple):
    win_start: np.ndarray   # (ntiles, NCLASS) int32, 16-aligned window starts
    lidx: np.ndarray        # (ntiles, K, TILE) int32 per-offset-rebased local
    # indices in [0, 256) (INVALID2 = missing)
    g0pack: np.ndarray      # (ntiles, NCLASS) int32: 2-bit per-offset 128-lane
    # group bases within the class window, packed 9 offsets per class
    k_class: np.ndarray     # (K,) int32 static dx-class of each offset
    # spills are per (tile, dx-class) ENTRY — a tile whose dy/dz span
    # overflows one class window keeps its other 18 offsets in-kernel
    # (measured: ~7.7 of 27 offsets bad per spilled tile = ~1 class), and
    # XLA row-gathers are INDEX-bound (~12ns/row at any width <= 128
    # lanes), so correction cost scales with entries * KC, not tiles * K
    spill_ent: np.ndarray   # (SE,) int32 tile*NCLASS+class (-1 pad)
    spill_fwd: np.ndarray   # (SE, KC, TILE) int32 global gather rows


def _bucket64(n: int, lo: int = 16) -> int:
    """64-granular spill bucket (replaced power-of-two rounding: the pow2
    jump doubled the L0 correction volume at 8716 tiles)."""
    return max(lo, -(-n // 64) * 64)


def build_window_plan(fwd: np.ndarray, num: int, cap: int,
                      kernel_size: int = 3,
                      max_spill_frac: float = 0.1) -> Optional[WindowPlan]:
    """Derive per-tile window starts + local indices from the global gather
    plan.

    A (tile, dx-class) pair whose stencil inputs don't fit the class's
    WIN-row window (~1-3% of tiles on real scenes: plane-size outliers,
    scene boundaries — and typically just ONE of the three class windows)
    contributes ZERO for that class's offsets in the kernel (INVALID lidx)
    and is listed in ``spill_ent`` for an exact recompute through the XLA
    gather path — forward, dx and dW all consume the same
    (k, row, fwd[k,row]) pair set, so the correction is additive in every
    direction.  Returns None only when the spill fraction exceeds
    ``max_spill_frac`` (fall back entirely).
    """
    K = fwd.shape[0]
    if cap < WIN or cap % (MTILE * TILE) != 0:
        return None
    offsets = stencil_offsets(kernel_size)
    k_class = (offsets[:, 0] - offsets[:, 0].min()).astype(np.int32)
    if k_class.max() >= NCLASS:
        return None
    if (K // NCLASS) * 2 > 32:
        return None  # g0pack holds 2 bits per offset of a class in one int32
    KC = K // NCLASS
    ntiles = cap // TILE
    f = fwd.reshape(K, ntiles, TILE)
    valid = f < num  # real neighbors only; nulls can point anywhere
    big = np.where(valid, f, np.iinfo(np.int32).max)
    win_start = np.zeros((ntiles, NCLASS), dtype=np.int64)
    g0pack = np.zeros((ntiles, NCLASS), dtype=np.int64)
    lidx = np.full((ntiles, K, TILE), INVALID, dtype=np.int32)
    bad_c = np.zeros((ntiles, NCLASS), dtype=bool)
    for c in range(NCLASS):
        ks = np.flatnonzero(k_class == c)
        mn = big[ks].min(axis=(0, 2))          # (ntiles,)
        mn = np.where(mn == np.iinfo(np.int32).max, 0, mn)
        # 64-aligned so packed slab starts (start*C/128) stay
        # 16-row aligned for every supported channel width
        start = np.minimum((mn // 64) * 64, cap - WIN)
        win_start[:, c] = start
        mx = np.where(valid[ks], f[ks], -1).max(axis=(0, 2))
        bad_c[:, c] = (mx - start) >= WIN
        loc = f[ks] - start[None, :, None]     # class-window-relative
        loc = np.where(valid[ks], loc, INVALID)
        loc = np.where(bad_c[:, c][None, :, None], INVALID, loc)
        lidx[:, ks, :] = np.transpose(loc, (1, 0, 2))
        # g0pack kept for API stability; the in-kernel dynamic-base variant it
        # fed was measured slower than the static group loop (see
        # _gather_stack) so it is currently unused (zeros)

    ent_ids = np.flatnonzero(bad_c.reshape(-1))  # tile*NCLASS + class
    if len(ent_ids) > max_spill_frac * ntiles * NCLASS:
        return None
    SE = _bucket64(max(len(ent_ids), 1))
    spill_ent = np.full(SE, -1, dtype=np.int32)
    spill_ent[:len(ent_ids)] = ent_ids
    spill_fwd = np.zeros((SE, KC, TILE), dtype=np.int32)
    for i, e in enumerate(ent_ids):
        t, c = divmod(int(e), NCLASS)
        spill_fwd[i] = f[c * KC:(c + 1) * KC, t, :]
    return WindowPlan(win_start=win_start.astype(np.int32),
                      lidx=lidx.astype(np.int32),
                      g0pack=g0pack.astype(np.int32), k_class=k_class,
                      spill_ent=spill_ent, spill_fwd=spill_fwd)


def _gather_stack(t, g0_ref, lidx_blk, winT_ref, k_class, K, C, stack_ref,
                  P: int = 1, out_dtype=jnp.bfloat16, paired: bool = False,
                  col: int = 0):
    """Crossbar-gather every offset's (C, TILE) columns into stack_ref.

    Missing-neighbor validity is folded into the group selects (the sentinel
    maps hi outside every group).  Two dynamic-base variants (per-offset
    2-group spans, packed scalar bases) were measured SLOWER than this static
    loop on v5e Mosaic — dynamic lane-slices of the per-tile-written winT
    scratch defeat the scheduler even though they win in isolation.

    ``paired``: the window holds channel PAIRS bitpacked into f32 lanes
    (caller bitcasts x (cap, C) bf16 -> (cap, C/2) f32), so the crossbar
    moves HALF the sublanes; the pair is split after the gather with two
    shift+bitcasts, and stack rows go [even channels | odd channels] per
    offset (the caller permutes weight columns to match)."""
    G = WIN // 128
    Cw = C // 2 if paired else C             # window sublane count
    P2 = 2 if (paired and Cw % 128 != 0) else 1   # paired phase count
    for k in range(K):
        ik = lidx_blk[k]                     # (TILE,) int32
        val = ik < INVALID
        ikc = jnp.where(val, ik, 0)
        if P > 1:
            # phase-packed window layout for C < 128 (see _load_windows):
            # window row r lives at packed position (r%P)*(WIN/P) + r//P
            ikc = (ikc % P) * (WIN // P) + ikc // P
        elif P2 > 1:
            ikc = (ikc % P2) * (WIN // P2) + ikc // P2
        lo = jnp.broadcast_to((ikc % 128).reshape(1, TILE), (Cw, TILE))
        hi = jnp.where(val, ikc // 128, G)   # invalid -> no group matches
        cls = k_class[k]
        acc = jnp.zeros((Cw, TILE), jnp.float32)
        for g in range(G):
            part = jnp.take_along_axis(winT_ref[cls, :, g*128:(g+1)*128],
                                       lo, axis=1)
            sel = jnp.broadcast_to((hi == g).reshape(1, TILE), (Cw, TILE))
            acc = jnp.where(sel, part, acc)
        c0, c1 = col * TILE, (col + 1) * TILE
        if paired:
            # even channel = low 16 bits (little-endian pair), odd = high;
            # a bf16's f32 value is its bits in the f32 top half
            u = jax.lax.bitcast_convert_type(acc, jnp.uint32)
            v_even = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
            v_odd = jax.lax.bitcast_convert_type(
                u & jnp.uint32(0xFFFF0000), jnp.float32)
            stack_ref[k*C:k*C + Cw, c0:c1] = v_even.astype(out_dtype)
            stack_ref[k*C + Cw:(k+1)*C, c0:c1] = v_odd.astype(out_dtype)
        else:
            stack_ref[k*C:(k+1)*C, c0:c1] = acc.astype(out_dtype)


def _load_windows(ws_ref, t, x_hbm, win_scratch, winT_ref, sems, C, P=1,
                  classes=tuple(range(NCLASS)), paired: bool = False):
    """Start + wait the window DMAs for tile t; write f32 transposed
    windows into the winT scratch ref (refs support the dynamic group-base
    slicing the fast-path gather needs).

    For C < 128 (P = 128/C phases) the caller passes x RESHAPED to
    (cap*C/128, 128) — Mosaic requires 128-lane DMA slabs — and the window
    lands phase-packed: winT[c, p*(WIN/P) + q] = x[start + P*q + p, c]
    (_gather_stack translates indices accordingly). For C >= 128 the slab is
    the raw (WIN, C) row range.

    ``classes`` selects which dx-class windows to load (a class-split
    backward call loads only its own); winT slot i holds classes[i].

    ws_ref is flattened (ntiles*NCLASS,): 2-D scalar-prefetch operands are
    lane-padded to 128 in SMEM and blow the 1MB budget."""
    Cw = C // 2 if paired else C
    P2 = 2 if (paired and Cw % 128 != 0) else 1
    cps = []
    for i, c in enumerate(classes):
        if P > 1:
            start = pl.multiple_of(ws_ref[t * NCLASS + c] // P, 16)
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, WIN // P)], win_scratch.at[i],
                sems.at[i])
        elif P2 > 1:
            # paired + 64 packed lanes: x is reshaped (cap/2, 128) f32;
            # window row r lives in packed row (start+r)//2, half (r%2)
            start = pl.multiple_of(ws_ref[t * NCLASS + c] // P2, 8)
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, WIN // P2)], win_scratch.at[i],
                sems.at[i])
        else:
            start = pl.multiple_of(ws_ref[t * NCLASS + c], 16)
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, WIN)], win_scratch.at[i], sems.at[i])
        cp.start()
        cps.append(cp)
    for i in range(len(classes)):
        cps[i].wait()
        if P > 1:
            T = win_scratch[i].T.astype(jnp.float32)  # (128, WIN/P)
            for p in range(P):
                winT_ref[i, :, p * (WIN // P):(p + 1) * (WIN // P)] = \
                    T[p * C:(p + 1) * C, :]
        elif P2 > 1:
            T = win_scratch[i].T  # (128, WIN/2) f32 packed pairs
            for p in range(P2):
                winT_ref[i, :, p * (WIN // P2):(p + 1) * (WIN // P2)] = \
                    T[p * Cw:(p + 1) * Cw, :]
        elif paired:
            winT_ref[i] = win_scratch[i].T  # already 32-bit (packed pairs)
        else:
            winT_ref[i] = win_scratch[i].T.astype(jnp.float32)


def make_fwd_kernel(K: int, C: int, Cout: int, k_class: Tuple[int, ...],
                    P: int = 1, paired: bool = False):
    k_class = tuple(int(v) for v in k_class)
    mt = _pick_mtile(K, C, Cout, backward=False)

    def kernel(ws_ref, g0_ref, lidx_ref, x_hbm, wT_ref, out_ref, win, winT,
               stack, sems):
        t = pl.program_id(0)
        # gather mt output tiles into one (K*C, mt*TILE) stack: a
        # TILE-wide GEMM is ONE 128x128 output block = one MXU chained over
        # K*C/128 MACs; 4 N-blocks keep all MXUs busy (measured: the GEMM
        # was ~50% of the forward at M=N=128)
        for j in range(mt):
            st = t * mt + j
            _load_windows(ws_ref, st, x_hbm, win, winT, sems, C, P,
                          paired=paired)
            _gather_stack(st, g0_ref, lidx_ref[j], winT, k_class, K, C,
                          stack, P, paired=paired, col=j)
        # canonical (M,K)@(K,N) orientation — contracting the LHS sublane dim
        # makes Mosaic relayout the whole stack per tile (~10x slower GEMM);
        # one (Cout, MTILE*TILE) output transpose is cheap
        o = jax.lax.dot_general(
            wT_ref[...], stack[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[...] = o.T.astype(jnp.bfloat16)

    def call(x, wT, win_start, g0pack, lidx):
        ntiles = lidx.shape[0]
        cap = ntiles * TILE
        assert ntiles % mt == 0, (ntiles, mt)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(ntiles // mt,),
                in_specs=[
                    pl.BlockSpec((mt, K, TILE),
                                 lambda t, ws, g0: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((mt * TILE, Cout),
                                       lambda t, ws, g0: (t, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    (pltpu.VMEM((NCLASS, WIN // (2 if C == 128 else 1),
                                 128 if C == 128 else C // 2), jnp.float32)
                     if paired else
                     pltpu.VMEM((NCLASS, WIN // P, 128 if P > 1 else C),
                                jnp.bfloat16)),
                    pltpu.VMEM((NCLASS, C // 2 if paired else C, WIN),
                               jnp.float32),
                    pltpu.VMEM((K * C, mt * TILE), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((NCLASS,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((cap, Cout), jnp.bfloat16),
        )(win_start.reshape(-1), g0pack.reshape(-1), lidx, x, wT)

    return call


def make_bwd_kernel(K: int, C: int, Cout: int, k_class: Tuple[int, ...],
                    P: int = 1, classes: Optional[Tuple[int, ...]] = None,
                    paired: bool = False):
    """Fused backward: gathers G_k = g[fwd[k]] once per offset and emits
    dx tiles (TILE, C) plus the accumulated dW_flat (C, K*Cout).
    P phases pack the cotangent windows when Cout < 128.

    ``classes``: restrict the call to offsets of these dx classes (the
    caller slices lidx/wflipT to the matching offset subset and K is the
    subset size). Only that many windows are DMA'd and the dW accumulator
    shrinks by the same factor — this is how the 256x256 level-4 convs fit
    the scoped-VMEM budget (one call per class, partial dx summed)."""
    k_class = tuple(int(v) for v in k_class)
    if classes is None:
        classes = tuple(range(NCLASS))
    nwin = len(classes)
    # winT slot of each offset in this call
    slot = {c: i for i, c in enumerate(classes)}
    local_class = tuple(slot[c] for c in k_class)
    mt = _pick_mtile(K, Cout, C, backward=True)

    def kernel(ws_ref, g0_ref, lidx_ref, x_blk, g_hbm, wflipT_ref, dx_ref,
               dw_ref, win, winT, stack, acc, sems):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        for j in range(mt):
            st = t * mt + j
            _load_windows(ws_ref, st, g_hbm, win, winT, sems, Cout, P,
                          classes=classes, paired=paired)
            _gather_stack(st, g0_ref, lidx_ref[j], winT, local_class, K,
                          Cout, stack, P, paired=paired, col=j)
        # canonical orientations (see fwd kernel note)
        dxT = jax.lax.dot_general(
            wflipT_ref[...], stack[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx_ref[...] = dxT.T.astype(jnp.bfloat16)
        # dW acc (K*Cout, C) += stack (K*Cout, N) @ x_blk (N, C)
        acc[...] += jax.lax.dot_general(
            stack[...], x_blk[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            dw_ref[...] = acc[...]

    def call(x, g, wflipT, win_start, g0pack, lidx):
        cap = x.shape[0]  # x stays (cap, Cp); only g may be phase-reshaped
        ntiles = cap // TILE
        assert ntiles % mt == 0, (ntiles, mt)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(ntiles // mt,),
                in_specs=[
                    pl.BlockSpec((mt, K, TILE),
                                 lambda t, ws, g0: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((mt * TILE, C),
                                 lambda t, ws, g0: (t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((mt * TILE, C),
                                 lambda t, ws, g0: (t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    (pltpu.VMEM((nwin, WIN // (2 if Cout == 128 else 1),
                                 128 if Cout == 128 else Cout // 2),
                                jnp.float32)
                     if paired else
                     pltpu.VMEM((nwin, WIN // P, 128 if P > 1 else Cout),
                                jnp.bfloat16)),
                    pltpu.VMEM((nwin, Cout // 2 if paired else Cout, WIN),
                               jnp.float32),
                    pltpu.VMEM((K * Cout, mt * TILE), jnp.bfloat16),
                    pltpu.VMEM((K * Cout, C), jnp.float32),
                    pltpu.SemaphoreType.DMA((nwin,)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((cap, C), jnp.bfloat16),
                jax.ShapeDtypeStruct((K * Cout, C), jnp.float32),
            ],
        )(win_start.reshape(-1), g0pack.reshape(-1), lidx, x, g, wflipT)

    return call


@functools.lru_cache(maxsize=None)
def _fwd_cached(K, C, Cout, k_class, P=1, paired=False):
    return make_fwd_kernel(K, C, Cout, k_class, P, paired)


@functools.lru_cache(maxsize=None)
def _bwd_cached(K, C, Cout, k_class, P=1, classes=None, paired=False):
    return make_bwd_kernel(K, C, Cout, k_class, P, classes, paired)


def _pair_pack(a):
    """(n, C) bf16 -> (n, C/2) f32 bitpacked channel pairs (little-endian:
    even channel in the low 16 bits)."""
    n, C = a.shape
    return jax.lax.bitcast_convert_type(
        a.reshape(n, C // 2, 2), jnp.float32)


def _pair_perm(C: int) -> np.ndarray:
    """Channel order the paired stack emits: evens then odds."""
    return np.concatenate([np.arange(0, C, 2), np.arange(1, C, 2)])


def _spill_rows(spill_ent):
    tiles = jnp.maximum(spill_ent, 0) // NCLASS
    rows = tiles[:, None] * TILE + jnp.arange(TILE)[None, :]
    return rows.reshape(-1)  # (SE*TILE,)


def _spill_im2col(src, spill_fwd):
    """ONE row-gather of every (entry, offset) pair -> (SE*TILE, KC*C)
    im2col rows.  XLA row-gathers are INDEX-bound (~12ns/row), so one
    gather of SE*KC*TILE indices beats both the former 27-iteration scan
    (dispatch overhead) and tile-granular spills (3x the indices)."""
    SE, KC, _ = spill_fwd.shape
    C = src.shape[1]
    G = jnp.take(src, spill_fwd.reshape(-1), axis=0)
    return (G.reshape(SE, KC, TILE, C).transpose(0, 2, 1, 3)
            .reshape(SE * TILE, KC * C))


def _spill_class_select(spill_ent):
    """(NCLASS, SE*TILE, 1) one-hot of each entry row's dx class."""
    cls = jnp.maximum(spill_ent, 0) % NCLASS
    sel = cls[None, :] == jnp.arange(NCLASS)[:, None]     # (NCLASS, SE)
    return jnp.repeat(sel, TILE, axis=1)[:, :, None]


def _spill_gather_matmul(src, w_blocks, spill_ent, spill_fwd, valid_rows):
    """Entry-row correction sum_{k in class(e)} src[fwd[k]] @ w[k]:
    one im2col gather + one GEMM per class (static weights) + select.
    w_blocks: (NCLASS, KC*C, Cout) fp32."""
    Gf = _spill_im2col(src, spill_fwd)                    # (SE*T, KC*C)
    outs = jnp.einsum("nk,ckd->cnd", Gf, w_blocks.astype(src.dtype),
                      preferred_element_type=jnp.float32)
    out = jnp.sum(outs * _spill_class_select(spill_ent), axis=0)
    return out * valid_rows[:, None]


def _pad128(n: int) -> int:
    return max(128, -(-n // 128) * 128)


def _static_k_class(K: int):
    kernel_size = round(K ** (1 / 3))
    assert kernel_size ** 3 == K, K
    off = stencil_offsets(kernel_size)
    return tuple(int(v) for v in (off[:, 0] - off[:, 0].min()))


@jax.custom_vjp
def windowed_sparse_conv(x, w, flip_perm, win_start, g0pack, lidx,
                         spill_ent, spill_fwd):
    """Drop-in stride-1 stencil conv using the windowed Pallas kernels.

    x: (cap, C) bf16; w: (K, C, Cout) fp32; plan arrays from
    build_window_plan. Semantics identical to sparse/ops.py:sparse_conv.
    Spilled (tile, class) entries (zeroed in-kernel) are recomputed via the
    XLA gather path and added in.  Channel dims are zero-padded to
    multiples of 128 at the kernel boundary (Mosaic requires 128-lane VMEM
    buffers).
    """
    K, C, Cout = w.shape
    Coutp = _pad128(Cout)
    if C in (32, 64):
        # native narrow channels: phase-packed windows (P = 128/C), no
        # padding waste on the gather side — the level-1/2 convs
        P = 128 // C
        Cn = C
        xn = x.astype(jnp.bfloat16).reshape(-1, 128)
    else:
        # wide channels: pair-pack two bf16 channels per f32 window lane —
        # the crossbar gathers HALF the sublanes; weight columns are
        # permuted to the [evens | odds] order the paired stack emits.
        # Cn=128 packs to 64 lanes (reshaped to (cap/2, 128) with 2 phases
        # along the window axis — Mosaic slabs need 128-multiple lanes);
        # other widths pad to a 256 multiple so the packed lanes are
        # 128-aligned
        P = 1
        Cn = _pad128(C)
        if Cn != 128 and (Cn // 2) % 128 != 0:
            Cn = -(-Cn // 256) * 256
        xn = _pair_pack(jnp.pad(x.astype(jnp.bfloat16),
                                ((0, 0), (0, Cn - C))))
        if Cn == 128:
            xn = xn.reshape(-1, 128)
    wp = jnp.pad(w, ((0, 0), (0, Cn - C), (0, Coutp - Cout)))
    if P == 1:
        wp = wp[:, _pair_perm(Cn), :]
    wT = jnp.transpose(wp, (2, 0, 1)).reshape(Coutp, K * Cn).astype(jnp.bfloat16)
    call = _fwd_cached(K, Cn, Coutp, _static_k_class(K), P, paired=(P == 1))
    out = call(xn, wT, win_start, g0pack, lidx)[:, :Cout]
    rows = _spill_rows(spill_ent)
    valid = jnp.repeat((spill_ent >= 0).astype(jnp.float32), TILE)
    KC = K // NCLASS
    w_blocks = w.reshape(NCLASS, KC * C, Cout)
    sp = _spill_gather_matmul(x.astype(jnp.bfloat16), w_blocks, spill_ent,
                              spill_fwd, valid)
    return out.at[rows].add(sp.astype(out.dtype))


def _wconv_fwd(x, w, flip_perm, win_start, g0pack, lidx, spill_ent,
               spill_fwd):
    out = windowed_sparse_conv(x, w, flip_perm, win_start, g0pack, lidx,
                               spill_ent, spill_fwd)
    return out, (x, w, flip_perm, win_start, g0pack, lidx, spill_ent,
                 spill_fwd)


def _wconv_bwd(res, g):
    x, w, flip_perm, win_start, g0pack, lidx, spill_ent, spill_fwd = res
    K, C, Cout = w.shape
    Cp = _pad128(C)  # x-side stays padded (x_blk block input, dx out)
    gb = g.astype(jnp.bfloat16)
    if Cout in (32, 64):
        P = 128 // Cout
        Con = Cout
        gn = gb.reshape(-1, 128)  # phase-packed cotangent windows
    else:
        # pair-packed cotangent windows (see windowed_sparse_conv): gather
        # half the sublanes; wflipT columns + dW rows follow the
        # [evens | odds] order the paired stack emits
        P = 1
        Con = _pad128(Cout)
        if Con != 128 and (Con // 2) % 128 != 0:
            Con = -(-Con // 256) * 256
        gn = _pair_pack(jnp.pad(gb, ((0, 0), (0, Con - Cout))))
        if Con == 128:
            gn = gn.reshape(-1, 128)
    w_flip = jnp.take(w, flip_perm, axis=0)
    # w_flip_t (Cp, K*Con): row c, col k*Con+o = W[flip(k), c, o]
    w_flip_p = jnp.pad(w_flip, ((0, 0), (0, Cp - C), (0, Con - Cout)))
    if P == 1:
        o_perm = _pair_perm(Con)
        w_flip_p = w_flip_p[:, :, o_perm]
    xb = x.astype(jnp.bfloat16)
    xpad = jnp.pad(xb, ((0, 0), (0, Cp - C)))
    k_class = _static_k_class(K)
    if P == 1 and Cp * Con > 128 * 256:
        # wide channels (the 256x256 level-4 convs): one call per dx class
        # — each loads only its own window and carries a K/3-sized dW
        # accumulator, fitting the scoped-VMEM budget (module docstring)
        dx_p = None
        dw_parts = []
        for cls in range(NCLASS):
            ks = [k for k in range(K) if k_class[k] == cls]
            assert ks == list(range(ks[0], ks[0] + len(ks))), ks
            sub = slice(ks[0], ks[0] + len(ks))
            wflipT_c = jnp.transpose(w_flip_p[sub], (1, 0, 2)).reshape(
                Cp, len(ks) * Con)
            call = _bwd_cached(len(ks), Cp, Con,
                               tuple(k_class[k] for k in ks), P, (cls,),
                               paired=True)
            dxc, dwc = call(xpad, gn, wflipT_c.astype(jnp.bfloat16),
                            win_start, g0pack, lidx[:, sub, :])
            dx_p = dxc if dx_p is None else dx_p + dxc
            dw_parts.append(dwc.reshape(len(ks), Con, Cp))
        dw_acc = jnp.concatenate(dw_parts, axis=0)
    else:
        wflipT = jnp.transpose(w_flip_p, (1, 0, 2)).reshape(Cp, K * Con)
        call = _bwd_cached(K, Cp, Con, k_class, P, paired=(P == 1))
        dx_p, dw_acc = call(xpad, gn, wflipT.astype(jnp.bfloat16), win_start,
                            g0pack, lidx)
        dw_acc = dw_acc.reshape(K, Con, Cp)
    if P == 1:
        dw_acc = dw_acc[:, np.argsort(o_perm), :]  # back to channel order
    dx = dx_p[:, :C]
    # dw_acc[k, o, c] = (G_k^T x)[o, c] = dW[flip(k)][c, o]^T
    dw_flip = jnp.transpose(dw_acc, (0, 2, 1))[:, :C, :Cout]

    # --- spill corrections (additive; kernel contributed zero there) ---
    # dx and dW share ONE gather of the cotangent at the entry pair rows;
    # each (tile, class) entry corrects only its own class's 9 offsets
    rows = _spill_rows(spill_ent)
    valid = jnp.repeat((spill_ent >= 0).astype(jnp.float32), TILE)
    KC = K // NCLASS
    Gf = _spill_im2col(gb, spill_fwd)                  # (SE*T, KC*Cout)
    sel = _spill_class_select(spill_ent)               # (NCLASS, SE*T, 1)
    wflipT_blocks = jnp.transpose(w_flip, (0, 2, 1)).reshape(
        NCLASS, KC * Cout, C)
    dx_sps = jnp.einsum("nk,ckd->cnd", Gf, wflipT_blocks.astype(gb.dtype),
                        preferred_element_type=jnp.float32)
    dx_sp = jnp.sum(dx_sps * sel, axis=0) * valid[:, None]
    dx = dx.at[rows].add(dx_sp.astype(dx.dtype))

    x_sp = jnp.take(xb, rows, axis=0) * valid[:, None].astype(jnp.bfloat16)
    xm = x_sp[None] * sel.astype(jnp.bfloat16)         # (NCLASS, SE*T, C)
    Gk = Gf.reshape(-1, KC, Cout)
    dw_sp_flip = jnp.einsum("cnx,njd->cjxd", xm, Gk,
                            preferred_element_type=jnp.float32)
    dw_flip = dw_flip + dw_sp_flip.reshape(K, C, Cout)
    dw = jnp.take(dw_flip, flip_perm, axis=0)
    return (dx.astype(x.dtype), dw.astype(w.dtype), None, None, None, None,
            None, None)


windowed_sparse_conv.defvjp(_wconv_fwd, _wconv_bwd)
