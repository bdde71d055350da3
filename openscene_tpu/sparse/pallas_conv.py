"""Pallas windowed gather-GEMM sparse convolution (the hot kernel).

XLA's HBM row-gather runs at ~30-100 GB/s on TPU and dominates the sparse
conv (27 gathers per stencil).  This kernel exploits the spatial lex-sort of
the voxel rows (data/batch.py): measured neighbor row distances decompose as

  dz offsets:   |d| <= 1          (z-runs are adjacent rows)
  dy offsets:   |d| <= ~128       (within an x-plane)
  dx offsets:   within the previous/next x-plane (a bounded window per tile)

so for each 128-row output tile, ALL stencil inputs live in three small row
windows (dx = -1 / 0 / +1).  The window SOURCE is pre-packed on the XLA side
into gather-ready form: (cap//128, C/2, 128) f32, i.e. channel-PAIRED
(two bf16 channels bitcast into one f32 lane — the TPU lane crossbar is
32-bit only) and transposed so rows live on the LANE axis.  Per tile the
kernel then:

1. DMAs the three class windows as G=WIN/128 row-groups each
   (HBM -> VMEM, a dim-0 dynamic slice of the packed array — no in-kernel
   transpose, no phase packing, no channel padding: each input row is
   transposed ONCE on the XLA side instead of ~12x inside the kernel,
   3 x WIN window rows per 128 output rows);
2. gathers each offset's (C/2, TILE) paired columns with the 128-lane
   crossbar (one gather + select per 128-row group), splits the pairs with
   two shift+bitcasts, building a (K*C, TILE) bf16 stacked operand;
3. runs ONE MXU GEMM per MTILE output tiles:
   (Coutp, K*C) x (K*C, MTILE*TILE) -> transpose -> (MTILE*TILE, Coutp).

The same local-index plan drives the backward pass: with G_k = g[fwd[k]],
dx = sum_k G_k @ W[flip k]^T and dW[flip k] = x^T @ G_k (see sparse/ops.py),
so one fused backward kernel gathers g once per offset and produces both
cotangents.

Coverage is data-dependent: the host/device plan builder verifies every
(tile, dx-class) pair fits its window and records the exceptions in a spill
list recomputed via the XLA gather path; it returns None when the spill
fraction is pathological and callers fall back entirely (sparse/ops.py).
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
# Interpret mode: run the kernels through the Pallas interpreter (any
# backend, no Mosaic) — lets the CPU test suite validate plan+kernel LOGIC
# bit-for-bit against the XLA gather path without a TPU.  GEMMs upcast to
# f32 (the CPU thunk has no bf16 dot); set f32 tolerances accordingly.
INTERPRET = False
MTILE = 4  # max output tiles per GEMM: N = MTILE*TILE spreads the matmul
# over all MXUs (one TILE-wide GEMM is a single chained 128x128 output
# block); wide-channel kernels drop to 2/1 to fit the 16MB scoped VMEM
# (see _pick_mtile). Caps are 512-granular so any of 4/2/1 divides ntiles.
# WIN=384 for ALL classes was tried (25% fewer crossbar passes; worst-class
# spills 2.5-6.4% vs 2-2.9%, scripts/dev_window_stats.py) and measured NET
# WORSE in the full train step pre-rewrite: the side (dx=+-1) classes'
# extra spills eat the gather saving.  Per-CLASS spans tell a different
# story (scripts/dev_class_window_stats.py, bench batch): the dx=0 class
# has a hard span ceiling — p99 <= 343 rows, 0.00% spill at 384 on every
# level (its 9 offsets' dy/dz neighbors live within the same x-plane) —
# while the side classes need the full 512.  So the center class runs a
# 384-row window (3 groups), cutting 9 of 108 crossbar passes and a third
# of its DMA for free.
# Measured windowed-vs-XLA crossover (scripts/dev_bench_ops.py @ bench
# shapes, r5): the windowed stencil kernels beat the XLA gather path down to
# L3 caps (28k rows) but tie/lose at L4 (7k rows, 256 ch) where the whole
# level fits cache-like reuse; edge kernels (pallas_edge) lose below ~200k
# child rows (E2/E3).  Both builders skip the plans under these caps and the
# ops fall back to the XLA path.
WPLAN_MIN_CAP = 10_000
WIN = 512   # max class window: scratch extent + INVALID sentinel
NCLASS = 3  # dx = -1 / 0 / +1 window classes
WINS = (512, 384, 512)      # per-class window rows (dx = -1 / 0 / +1)
G = WIN // 128  # max 128-row groups per window (one crossbar pass each)
GS = tuple(w // 128 for w in WINS)  # per-class group counts
INVALID = WIN  # any local index >= WIN means "missing neighbor"
# Cap-keyed per-level windows: at L0 scale the side (dx=±1) classes fit a
# 384-row window nearly as often as 512 (measured bench-batch spill 1.4%
# vs 1.3% per side class; total entries 2.8% of ntiles — still inside the
# device builder's fixed 4.2% cap), and the narrow window cuts one
# crossbar pass per side offset (27x4+... -> 27x3 group passes, -18%) and
# a quarter of the window DMA.  Smaller levels keep (512,384,512): their
# side spill at 384 (2.5-3.9% per class) would overflow the fixed device
# spill caps.  Both plan builders and the conv op derive the choice from
# the SAME static level cap, so plans and kernels always agree.
WINS_NARROW = (384, 384, 384)
NARROW_MIN_CAP = 600_000


def wins_for_cap(cap: int) -> Tuple[int, ...]:
    """Per-class window rows for a level of the given (static) cap."""
    return WINS_NARROW if cap >= NARROW_MIN_CAP else WINS


class WindowPlan(NamedTuple):
    win_start: np.ndarray   # (ntiles, NCLASS) int32, 128-aligned window starts
    lidx: np.ndarray        # (ntiles, K, TILE) int32 window-local indices
    # in [0, WIN) (INVALID = missing neighbor)
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

    Starts are 128-aligned so the kernel can DMA whole 128-row groups of the
    packed transposed source (measured spill-entry cost of 128- vs 64-aligned
    starts on the bench batch: 0.80% vs 0.76% at L0 — noise).

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
    wins = wins_for_cap(cap)
    offsets = stencil_offsets(kernel_size)
    k_class = (offsets[:, 0] - offsets[:, 0].min()).astype(np.int32)
    if k_class.max() >= NCLASS:
        return None
    KC = K // NCLASS
    ntiles = cap // TILE
    f = fwd.reshape(K, ntiles, TILE)
    valid = f < num  # real neighbors only; nulls can point anywhere
    big = np.where(valid, f, np.iinfo(np.int32).max)
    win_start = np.zeros((ntiles, NCLASS), dtype=np.int64)
    lidx = np.full((ntiles, K, TILE), INVALID, dtype=np.int32)
    bad_c = np.zeros((ntiles, NCLASS), dtype=bool)
    for c in range(NCLASS):
        ks = np.flatnonzero(k_class == c)
        mn = big[ks].min(axis=(0, 2))          # (ntiles,)
        mn = np.where(mn == np.iinfo(np.int32).max, 0, mn)
        start = np.minimum((mn // 128) * 128, cap - wins[c])
        win_start[:, c] = start
        mx = np.where(valid[ks], f[ks], -1).max(axis=(0, 2))
        bad_c[:, c] = (mx - start) >= wins[c]
        loc = f[ks] - start[None, :, None]     # class-window-relative
        loc = np.where(valid[ks], loc, INVALID)
        loc = np.where(bad_c[:, c][None, :, None], INVALID, loc)
        lidx[:, ks, :] = np.transpose(loc, (1, 0, 2))

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
                      lidx=lidx.astype(np.int32), k_class=k_class,
                      spill_ent=spill_ent, spill_fwd=spill_fwd)


def _pick_mtile(K: int, Cg: int, Cl: int, backward: bool,
                classes: Optional[Tuple[int, ...]] = None) -> int:
    """Largest MTILE whose kernel fits the scoped-VMEM budget.

    Cg: gather-side channels (C fwd / Cout bwd, unpadded even widths);
    Cl: lane-side channels (Coutp fwd / Cp bwd, 128-padded).

    The window term deliberately stays at the conservative NCLASS*G groups
    (not the smaller per-class/per-call sum the kernel actually allocates):
    the budget's margin terms calibrate Mosaic's opaque scoped-vmem
    accounting against the committed, chip-validated mt choices, and
    tightening the window term alone was measured to flip the class-split
    (384,384) backward call from mt=1 to mt=2 — which overflows scoped
    VMEM by 48K on v5e.  Keep the mt decisions pinned; the per-class
    savings are in DMA bytes and crossbar passes, not in mt."""
    del classes  # see docstring: budget stays call-shape independent
    win = NCLASS * G * (Cg // 2) * 128 * 4
    for mt in (MTILE, 2, 1):
        stack = K * Cg * mt * TILE * 2
        weights = K * Cg * Cl * 2
        blocks = mt * TILE * Cl * 2 * 2 * (2 if backward else 1)
        acc = K * Cg * Cl * 4 if backward else 0
        if (win + stack + weights + blocks + acc
                + 3 * 1024 * 1024 < 14_500_000):
            return mt
    return 0


def _db_fits(K: int, Cg: int, Cl: int, backward: bool, mt: int) -> bool:
    """True when the DOUBLE-buffered window scratch also fits the budget at
    the already-chosen mt (same margin terms as _pick_mtile; db never
    changes mt — it only doubles the window term)."""
    win = NCLASS * G * (Cg // 2) * 128 * 4
    stack = K * Cg * mt * TILE * 2
    weights = K * Cg * Cl * 2
    blocks = mt * TILE * Cl * 2 * 2 * (2 if backward else 1)
    acc = K * Cg * Cl * 4 if backward else 0
    return (2 * win + stack + weights + blocks + acc
            + 3 * 1024 * 1024 < 14_500_000)


def _start_windows(ws_ref, st, src_hbm, win, sems,
                   classes=tuple(range(NCLASS)), groups=GS):
    """Start (without waiting) the class-window DMAs for sub-tile st into
    the (already buffer-sliced) win/sems refs."""
    off = 0
    for i, c in enumerate(classes):
        gstart = ws_ref[st * NCLASS + c] // 128
        gc = groups[c]
        pltpu.make_async_copy(src_hbm.at[pl.ds(gstart, gc)],
                              win.at[off:off + gc], sems.at[i]).start()
        off += gc


def _wait_windows(ws_ref, st, src_hbm, win, sems,
                  classes=tuple(range(NCLASS)), groups=GS):
    """Wait for the DMAs started by the matching _start_windows call (the
    copy descriptors are reconstructed from the same scalar-prefetch
    reads)."""
    off = 0
    for i, c in enumerate(classes):
        gstart = ws_ref[st * NCLASS + c] // 128
        gc = groups[c]
        pltpu.make_async_copy(src_hbm.at[pl.ds(gstart, gc)],
                              win.at[off:off + gc], sems.at[i]).wait()
        off += gc


def _load_windows(ws_ref, t, src_hbm, win, sems,
                  classes=tuple(range(NCLASS)), groups=GS):
    """Start + wait the window DMAs for tile t: class c's window is GS[c]
    128-row groups of the packed (cap//128, Cg/2, 128) source — a dim-0
    dynamic slice (no alignment constraint; starts are 128-aligned rows).
    ``classes`` selects which dx-class windows to load (a class-split
    backward call loads only its own); the flat (sum GS, Cg/2, 128) win
    scratch packs class slots back-to-back (slot i at offset
    sum(GS[classes[:i]])) — per-class window lengths without padding every
    slot to the max G.

    ws_ref is flattened (ntiles*NCLASS,): 2-D scalar-prefetch operands are
    lane-padded to 128 in SMEM and blow the 1MB budget."""
    cps = []
    off = 0
    for i, c in enumerate(classes):
        gstart = ws_ref[t * NCLASS + c] // 128
        gc = groups[c]
        cp = pltpu.make_async_copy(
            src_hbm.at[pl.ds(gstart, gc)], win.at[off:off + gc], sems.at[i])
        cp.start()
        cps.append(cp)
        off += gc
    for cp in cps:
        cp.wait()


def _dot(a, b):
    if INTERPRET:
        a, b = a.astype(jnp.float32), b.astype(jnp.float32)
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _windows_pipeline(ws_ref, t, src_hbm, win, sems, classes, mt: int,
                      db: bool, gather_j, groups=GS):
    """Per-sub-tile window DMA + crossbar gathers.

    db=False: the committed serial pattern (load j, gather j).
    db=True (mt even, scratch doubled): sub-tile j+1's window DMA is
    started BEFORE waiting on j's, overlapping HBM traffic with j's
    crossbar gathers; the next grid step's first DMA is started before the
    last gather so it also overlaps the tile's closing GEMM.  Buffer
    parity is j%2 (static: mt is even, so t*mt+j keeps j's parity), and a
    slot is always re-written only after its previous gather completed in
    program order."""
    if not db:
        for j in range(mt):
            _load_windows(ws_ref, t * mt + j, src_hbm, win, sems,
                          classes=classes, groups=groups)
            gather_j(j, win)
        return

    @pl.when(t == 0)
    def _():
        _start_windows(ws_ref, 0, src_hbm, win.at[0], sems.at[0], classes,
                       groups)

    for j in range(mt):
        st = t * mt + j
        buf = j % 2
        if j + 1 < mt:
            _start_windows(ws_ref, st + 1, src_hbm, win.at[(j + 1) % 2],
                           sems.at[(j + 1) % 2], classes, groups)
        else:
            @pl.when(t + 1 < pl.num_programs(0))
            def _():
                _start_windows(ws_ref, (t + 1) * mt, src_hbm, win.at[0],
                               sems.at[0], classes, groups)
        _wait_windows(ws_ref, st, src_hbm, win.at[buf], sems.at[buf],
                      classes, groups)
        gather_j(j, win.at[buf])


def _gather_stack(lidx_blk, win_ref, k_class, K, C, stack_ref, col: int,
                  slot_groups=GS):
    """Crossbar-gather every offset's paired (C/2, TILE) columns from the
    class windows and unpack them into stack_ref rows (evens | odds per
    offset — the caller permutes weight columns to match).

    Missing-neighbor validity is folded into the group selects (the
    INVALID sentinel maps hi outside every group; slot_groups[cls] bounds
    the loop at each slot's window length; the flat win scratch packs slot
    cls at group offset sum(slot_groups[:cls])).  Two dynamic-base variants
    (per-offset 2-group spans, packed scalar bases) were measured SLOWER
    than this static loop on v5e Mosaic — dynamic lane-slices of
    per-tile-written scratch defeat the scheduler even though they win in
    isolation."""
    Cw = C // 2
    offs = [0]
    for g in slot_groups:
        offs.append(offs[-1] + g)
    for k in range(K):
        ik = lidx_blk[k]                     # (TILE,) int32
        val = ik < INVALID
        ikc = jnp.where(val, ik, 0)
        lo = jnp.broadcast_to((ikc % 128).reshape(1, TILE), (Cw, TILE))
        hi = jnp.where(val, ikc // 128, G)   # invalid -> no group matches
        cls = k_class[k]
        acc = jnp.zeros((Cw, TILE), jnp.float32)
        for g in range(slot_groups[cls]):
            part = jnp.take_along_axis(win_ref[offs[cls] + g], lo, axis=1)
            sel = jnp.broadcast_to((hi == g).reshape(1, TILE), (Cw, TILE))
            acc = jnp.where(sel, part, acc)
        c0, c1 = col * TILE, (col + 1) * TILE
        # even channel = low 16 bits (little-endian pair), odd = high;
        # a bf16's f32 value is its bits in the f32 top half
        u = jax.lax.bitcast_convert_type(acc, jnp.uint32)
        v_even = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
        v_odd = jax.lax.bitcast_convert_type(
            u & jnp.uint32(0xFFFF0000), jnp.float32)
        stack_ref[k*C:k*C + Cw, c0:c1] = v_even.astype(jnp.bfloat16)
        stack_ref[k*C + Cw:(k+1)*C, c0:c1] = v_odd.astype(jnp.bfloat16)


def make_fwd_kernel(K: int, C: int, Coutp: int, k_class: Tuple[int, ...],
                    classes: Optional[Tuple[int, ...]] = None,
                    wins: Tuple[int, ...] = WINS):
    """``classes``: restrict the call to offsets of these dx classes (the
    caller slices lidx/wT to the matching offset subset and K is the subset
    size; partial outputs are summed) — the VMEM escape hatch for channel
    widths whose full-stencil stack/weights exceed the scoped budget (the
    384-wide D-variant archs).

    ``wins``: per-class window rows matching the plan's builder choice
    (wins_for_cap); both sides derive it from the same static level cap."""
    k_class = tuple(int(v) for v in k_class)
    if classes is None:
        classes = tuple(range(NCLASS))
    nwin = len(classes)
    slot = {c: i for i, c in enumerate(classes)}
    local_class = tuple(slot[c] for c in k_class)
    groups = tuple(w // 128 for w in wins)
    slot_groups = tuple(groups[c] for c in classes)
    mt = _pick_mtile(K, C, Coutp, backward=False, classes=classes)
    assert mt > 0, (K, C, Coutp)
    db = mt >= 2 and _db_fits(K, C, Coutp, backward=False, mt=mt)

    def kernel(ws_ref, lidx_ref, xt_hbm, wT_ref, out_ref, win, stack, sems):
        t = pl.program_id(0)

        # gather mt output tiles into one (K*C, mt*TILE) stack: a
        # TILE-wide GEMM is ONE 128x128 output block = one MXU chained over
        # K*C/128 MACs; 4 N-blocks keep all MXUs busy (measured: the GEMM
        # was ~50% of the forward at M=N=128)
        def gather_j(j, wref):
            _gather_stack(lidx_ref[j], wref, local_class, K, C, stack,
                          col=j, slot_groups=slot_groups)

        _windows_pipeline(ws_ref, t, xt_hbm, win, sems, classes, mt, db,
                          gather_j, groups=groups)
        # canonical (M,K)@(K,N) orientation — contracting the LHS sublane dim
        # makes Mosaic relayout the whole stack per tile (~10x slower GEMM);
        # one (Coutp, MTILE*TILE) output transpose is cheap
        o = _dot(wT_ref[...], stack[...])
        out_ref[...] = o.T.astype(jnp.bfloat16)

    def call(xt, wT, win_start, lidx):
        ntiles = lidx.shape[0]
        cap = ntiles * TILE
        assert ntiles % mt == 0, (ntiles, mt)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(ntiles // mt,),
                in_specs=[
                    pl.BlockSpec((mt, K, TILE),
                                 lambda t, ws: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((mt * TILE, Coutp),
                                       lambda t, ws: (t, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, sum(slot_groups), C // 2, 128),
                               jnp.float32) if db else
                    pltpu.VMEM((sum(slot_groups), C // 2, 128), jnp.float32),
                    pltpu.VMEM((K * C, mt * TILE), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((2, nwin) if db else (nwin,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((cap, Coutp), jnp.bfloat16),
            interpret=INTERPRET,
        )(win_start.reshape(-1), lidx, xt, wT)

    return call


def make_bwd_kernel(K: int, Cp: int, Cout: int, k_class: Tuple[int, ...],
                    classes: Optional[Tuple[int, ...]] = None,
                    wins: Tuple[int, ...] = WINS):
    """Fused backward: gathers G_k = g[fwd[k]] once per offset from the
    packed transposed cotangent and emits dx tiles (TILE, Cp) plus the
    accumulated dW_flat (K*Cout, Cp).

    ``classes``: restrict the call to offsets of these dx classes (the
    caller slices lidx/wflipT to the matching offset subset and K is the
    subset size). Only that many windows are DMA'd and the dW accumulator
    shrinks by the same factor — the VMEM escape hatch for channel widths
    beyond the current arch family (the 256x256 level-4 convs fit the
    single-call budget at mt=1 since the packed-window rewrite)."""
    k_class = tuple(int(v) for v in k_class)
    if classes is None:
        classes = tuple(range(NCLASS))
    nwin = len(classes)
    slot = {c: i for i, c in enumerate(classes)}  # winT slot of each offset
    local_class = tuple(slot[c] for c in k_class)
    groups = tuple(w // 128 for w in wins)
    slot_groups = tuple(groups[c] for c in classes)
    mt = _pick_mtile(K, Cout, Cp, backward=True, classes=classes)
    assert mt > 0, (K, Cp, Cout)
    db = mt >= 2 and _db_fits(K, Cout, Cp, backward=True, mt=mt)

    def kernel(ws_ref, lidx_ref, x_blk, gt_hbm, wflipT_ref, dx_ref,
               dw_ref, win, stack, acc, sems):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        def gather_j(j, wref):
            _gather_stack(lidx_ref[j], wref, local_class, K, Cout, stack,
                          col=j, slot_groups=slot_groups)

        _windows_pipeline(ws_ref, t, gt_hbm, win, sems, classes, mt, db,
                          gather_j, groups=groups)
        # canonical orientations (see fwd kernel note)
        dxT = _dot(wflipT_ref[...], stack[...])
        dx_ref[...] = dxT.T.astype(jnp.bfloat16)
        # dW acc (K*Cout, Cp) += stack (K*Cout, N) @ x_blk (N, Cp)
        acc[...] += _dot(stack[...], x_blk[...])

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            dw_ref[...] = acc[...]

    def call(x, gt, wflipT, win_start, lidx):
        cap = x.shape[0]
        ntiles = cap // TILE
        assert ntiles % mt == 0, (ntiles, mt)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(ntiles // mt,),
                in_specs=[
                    pl.BlockSpec((mt, K, TILE),
                                 lambda t, ws: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((mt * TILE, Cp),
                                 lambda t, ws: (t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((mt * TILE, Cp),
                                 lambda t, ws: (t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, sum(slot_groups), Cout // 2, 128),
                               jnp.float32) if db else
                    pltpu.VMEM((sum(slot_groups), Cout // 2, 128),
                               jnp.float32),
                    pltpu.VMEM((K * Cout, mt * TILE), jnp.bfloat16),
                    pltpu.VMEM((K * Cout, Cp), jnp.float32),
                    pltpu.SemaphoreType.DMA((2, nwin) if db else (nwin,)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((cap, Cp), jnp.bfloat16),
                jax.ShapeDtypeStruct((K * Cout, Cp), jnp.float32),
            ],
            interpret=INTERPRET,
        )(win_start.reshape(-1), lidx, x, gt, wflipT)

    return call


@functools.lru_cache(maxsize=None)
def _fwd_cached(K, C, Coutp, k_class, classes=None, wins=WINS):
    return make_fwd_kernel(K, C, Coutp, k_class, classes, wins)


@functools.lru_cache(maxsize=None)
def _bwd_cached(K, Cp, Cout, k_class, classes=None, wins=WINS):
    return make_bwd_kernel(K, Cp, Cout, k_class, classes, wins)


def _pack_t(a):
    """(cap, C) bf16 -> (cap//128, C/2, 128) f32: channel pairs bitpacked
    into f32 lanes (little-endian: even channel in the low 16 bits), rows
    moved to the LANE axis in 128-row groups — the gather-ready window
    source.  One relayout per conv input here replaces ~12x the transpose
    volume inside the kernel (3 WIN-row windows per 128 output rows)."""
    cap, C = a.shape
    # Pairing via u16 strided slices + an explicit u32 combine: XLA lowers
    # the former (cap, C/2, 2) bitcast through a full-width u32 widening +
    # column-major copy; this formulation measures 35-50% faster at the
    # bench shapes (scripts/dev_pack_bench.py, bit-equal on chip).
    x16 = jax.lax.bitcast_convert_type(a, jnp.uint16)
    ev = x16[:, 0::2].astype(jnp.uint32)
    od = x16[:, 1::2].astype(jnp.uint32)
    xp = jax.lax.bitcast_convert_type(ev | (od << 16), jnp.float32)
    return xp.reshape(cap // 128, 128, C // 2).transpose(0, 2, 1)


def _pair_perm(C: int) -> np.ndarray:
    """Channel order the paired stack emits: evens then odds."""
    return np.concatenate([np.arange(0, C, 2), np.arange(1, C, 2)])


def _spill_tiles(spill_ent):
    return jnp.maximum(spill_ent, 0) // NCLASS  # (SE,) tile per entry


def _tile_scatter_add(out, tiles, upd):
    """out[(t*TILE):(t+1)*TILE] += upd[e] for each entry e with tile t.

    Every spill entry corrects ONE whole 128-row tile, and TPU scatter-add
    is INDEX-bound like gather, so one index per tile beats one per row
    ~2.7-100x (scripts/dev_spill_scatter_bench.py; the isolated 2.7x is
    copy-confounded — in situ the scatter aliases in place and the 128x
    index reduction dominates).  Pad entries (tile 0) must carry zeroed
    updates — callers multiply by the valid mask first.  Duplicate tiles
    (several classes of one tile spilling) accumulate correctly.
    """
    C = out.shape[1]
    o3 = out.reshape(-1, TILE, C)
    u3 = upd.astype(out.dtype).reshape(-1, TILE, C)
    return o3.at[tiles].add(u3).reshape(-1, C)


def _tile_take(src, tiles):
    """(SE*TILE, C) rows of src at whole-tile granularity."""
    C = src.shape[1]
    return jnp.take(src.reshape(-1, TILE, C), tiles, axis=0).reshape(-1, C)


def _spill_im2col(src, spill_fwd):
    """ONE row-gather of every (entry, offset) pair -> (SE*TILE, KC*C)
    im2col rows.  XLA row-gathers are INDEX-bound (~12ns/row), so one
    gather of SE*KC*TILE indices beats both the former 27-iteration scan
    (dispatch overhead) and tile-granular spills (3x the indices)."""
    SE, KC, _ = spill_fwd.shape
    C = src.shape[1]
    Gr = jnp.take(src, spill_fwd.reshape(-1), axis=0)
    return (Gr.reshape(SE, KC, TILE, C).transpose(0, 2, 1, 3)
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
def windowed_sparse_conv(x, w, flip_perm, win_start, lidx, spill_ent,
                         spill_fwd):
    """Drop-in stride-1 stencil conv using the windowed Pallas kernels.

    x: (cap, C) bf16, C even; w: (K, C, Cout) fp32, Cout even; plan arrays
    from build_window_plan. Semantics identical to sparse/ops.py:sparse_conv.
    Spilled (tile, class) entries (zeroed in-kernel) are recomputed via the
    XLA gather path and added in.  Gather-side channels run UNPADDED (they
    live on sublane axes); only the block-specced lane dims (conv output,
    backward x/dx) pad to multiples of 128.
    """
    K, C, Cout = w.shape
    Coutp = _pad128(Cout)
    xt = _pack_t(x.astype(jnp.bfloat16))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, Coutp - Cout)))
    wp = wp[:, _pair_perm(C), :]  # [evens | odds] stack row order
    k_class = _static_k_class(K)
    wins = wins_for_cap(x.shape[0])  # same static cap the plan was built at
    if _pick_mtile(K, C, Coutp, backward=False) > 0:
        wT = jnp.transpose(wp, (2, 0, 1)).reshape(
            Coutp, K * C).astype(jnp.bfloat16)
        call = _fwd_cached(K, C, Coutp, k_class, wins=wins)
        out = call(xt, wT, win_start, lidx)
    else:
        # beyond-budget widths: one call per dx class, partial sums added
        out = None
        for cls in range(NCLASS):
            ks = [k for k in range(K) if k_class[k] == cls]
            assert ks == list(range(ks[0], ks[0] + len(ks))), ks
            sub = slice(ks[0], ks[0] + len(ks))
            wT_c = jnp.transpose(wp[sub], (2, 0, 1)).reshape(
                Coutp, len(ks) * C).astype(jnp.bfloat16)
            call = _fwd_cached(len(ks), C, Coutp,
                               tuple(k_class[k] for k in ks), (cls,),
                               wins=wins)
            o = call(xt, wT_c, win_start, lidx[:, sub, :])
            out = o if out is None else out + o
    out = out[:, :Cout]
    valid = jnp.repeat((spill_ent >= 0).astype(jnp.float32), TILE)
    KC = K // NCLASS
    w_blocks = w.reshape(NCLASS, KC * C, Cout)
    sp = _spill_gather_matmul(x.astype(jnp.bfloat16), w_blocks, spill_ent,
                              spill_fwd, valid)
    return _tile_scatter_add(out, _spill_tiles(spill_ent), sp)


def _wconv_fwd(x, w, flip_perm, win_start, lidx, spill_ent, spill_fwd):
    out = windowed_sparse_conv(x, w, flip_perm, win_start, lidx, spill_ent,
                               spill_fwd)
    return out, (x, w, flip_perm, win_start, lidx, spill_ent, spill_fwd)


def _wconv_bwd(res, g):
    x, w, flip_perm, win_start, lidx, spill_ent, spill_fwd = res
    K, C, Cout = w.shape
    Cp = _pad128(C)  # x-side stays padded (x_blk block input, dx out)
    gb = g.astype(jnp.bfloat16)
    gt = _pack_t(gb)
    w_flip = jnp.take(w, flip_perm, axis=0)
    # wflipT (Cp, K*Cout): row c, col k*Cout+o = W[flip(k), c, perm(o)]
    o_perm = _pair_perm(Cout)
    w_flip_p = jnp.pad(w_flip, ((0, 0), (0, Cp - C), (0, 0)))[:, :, o_perm]
    xb = x.astype(jnp.bfloat16)
    xpad = jnp.pad(xb, ((0, 0), (0, Cp - C)))
    k_class = _static_k_class(K)
    wins = wins_for_cap(x.shape[0])  # same static cap the plan was built at
    if _pick_mtile(K, Cout, Cp, backward=True) > 0:
        wflipT = jnp.transpose(w_flip_p, (1, 0, 2)).reshape(Cp, K * Cout)
        call = _bwd_cached(K, Cp, Cout, k_class, wins=wins)
        dx_p, dw_acc = call(xpad, gt, wflipT.astype(jnp.bfloat16), win_start,
                            lidx)
        dw_acc = dw_acc.reshape(K, Cout, Cp)
    else:
        # beyond-budget widths: one call per dx class — each loads only its
        # own window and carries a K/3-sized dW accumulator
        dx_p = None
        dw_parts = []
        for cls in range(NCLASS):
            ks = [k for k in range(K) if k_class[k] == cls]
            assert ks == list(range(ks[0], ks[0] + len(ks))), ks
            sub = slice(ks[0], ks[0] + len(ks))
            wflipT_c = jnp.transpose(w_flip_p[sub], (1, 0, 2)).reshape(
                Cp, len(ks) * Cout)
            call = _bwd_cached(len(ks), Cp, Cout,
                               tuple(k_class[k] for k in ks), (cls,),
                               wins=wins)
            dxc, dwc = call(xpad, gt, wflipT_c.astype(jnp.bfloat16),
                            win_start, lidx[:, sub, :])
            dx_p = dxc if dx_p is None else dx_p + dxc
            dw_parts.append(dwc.reshape(len(ks), Cout, Cp))
        dw_acc = jnp.concatenate(dw_parts, axis=0)
    dw_acc = dw_acc[:, np.argsort(o_perm), :]  # back to channel order
    dx = dx_p[:, :C]
    # dw_acc[k, o, c] = (G_k^T x)[o, c] = dW[flip(k)][c, o]^T
    dw_flip = jnp.transpose(dw_acc, (0, 2, 1))[:, :C, :Cout]

    # --- spill corrections (additive; kernel contributed zero there) ---
    # dx and dW share ONE gather of the cotangent at the entry pair rows;
    # each (tile, class) entry corrects only its own class's 9 offsets
    tiles = _spill_tiles(spill_ent)
    valid = jnp.repeat((spill_ent >= 0).astype(jnp.float32), TILE)
    KC = K // NCLASS
    Gf = _spill_im2col(gb, spill_fwd)                  # (SE*T, KC*Cout)
    sel = _spill_class_select(spill_ent)               # (NCLASS, SE*T, 1)
    wflipT_blocks = jnp.transpose(w_flip, (0, 2, 1)).reshape(
        NCLASS, KC * Cout, C)
    dx_sps = jnp.einsum("nk,ckd->cnd", Gf, wflipT_blocks.astype(gb.dtype),
                        preferred_element_type=jnp.float32)
    dx_sp = jnp.sum(dx_sps * sel, axis=0) * valid[:, None]
    dx = _tile_scatter_add(dx, tiles, dx_sp)

    x_sp = _tile_take(xb, tiles) * valid[:, None].astype(jnp.bfloat16)
    xm = x_sp[None] * sel.astype(jnp.bfloat16)         # (NCLASS, SE*T, C)
    Gk = Gf.reshape(-1, KC, Cout)
    dw_sp_flip = jnp.einsum("cnx,njd->cjxd", xm, Gk,
                            preferred_element_type=jnp.float32)
    dw_flip = dw_flip + dw_sp_flip.reshape(K, C, Cout)
    dw = jnp.take(dw_flip, flip_perm, axis=0)
    return (dx.astype(x.dtype), dw.astype(w.dtype), None, None, None, None,
            None)


windowed_sparse_conv.defvjp(_wconv_fwd, _wconv_bwd)
