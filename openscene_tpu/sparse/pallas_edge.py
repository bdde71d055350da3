"""Pallas windowed kernels for the k=2 s=2 down/up conv edges.

The stride-2 edges were the last XLA row-gather consumers in the train step
(one gather of 8*parent_cap child rows per down conv + its mirror per up
conv; row gathers are INDEX-bound at ~12ns/row, ~35% of the round-2 step).
Both directions have bounded-window structure because each per-offset
child<->parent map is MONOTONE in the lex order (child = 2*parent + offset
preserves ordering):

* DOWN side (gather CHILD rows per 128-parent output tile): each of the 8
  offset streams spans a small window — measured on the bench batch
  (scripts below print via dev tools): per-offset spans p90 460-676 rows,
  WIN=1024 covers 98.2-99.6% of (tile, offset) entries at every edge.
* UP side (gather PARENT rows per 128-child output tile): spans p90
  173-285 rows; WIN=512 covers 98-100% of tiles.

Kernel D ("down-side", grid over parent tiles) DMAs 8 per-offset child
windows and builds a (8*C, TILE) stacked operand -> one MXU GEMM; it
computes the down-conv FORWARD and, fused with the parent-row block, the
up-conv BACKWARD (dx over parents + dW).  Kernel U ("up-side", grid over
child tiles) DMAs ONE parent window, gathers each row's parent column and
fans it into 8 offset-masked stack blocks -> one GEMM; it computes the
up-conv FORWARD and the down-conv BACKWARD (dx over children + dW).

Spilled work (window overflow) is recomputed exactly through the XLA
gather path and added in — per (parent-tile, offset) ENTRY on the down
side, per child TILE on the up side — mirroring pallas_conv's scheme.

Window sources are pre-packed by pallas_conv._pack_t: (cap//128, C/2, 128)
f32 channel pairs with rows on the lane axis (the crossbar is 32-bit).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_conv
from .pallas_conv import (TILE, _bucket64, _dot, _pack_t, _pad128,
                          _pair_perm, _tile_scatter_add, _tile_take)

KD = 8          # offsets of the k=2 s=2 stencil
# Below ~200k child rows the XLA gather path beats the windowed edge
# kernels (measured scripts/dev_bench_ops.py r5: E2 at 137k and E3 at 28k
# children tie or lose); both geometry builders skip edge window plans
# under this cap.
EWPLAN_MIN_CAP = 200_000
DWIN = 1024     # child-row window per (parent tile, offset)
DG = DWIN // 128
INVALID_D = DWIN
UWIN = 512      # parent-row window per child tile
UG = UWIN // 128
INVALID_U = UWIN


class EdgeWindowPlan(NamedTuple):
    """Windowed-kernel plan for one down/up edge (see module docstring)."""
    # down side: per (parent tile, offset) child windows
    dwin_start: np.ndarray   # (ptiles, KD) int32, 128-aligned child rows
    dlidx: np.ndarray        # (ptiles, KD, TILE) int32 in [0, DWIN)
    dspill_ent: np.ndarray   # (SD,) int32 ptile*KD+offset (-1 pad)
    dspill_fwd: np.ndarray   # (SD, TILE) int32 global child rows
    # up side: one parent window per child tile
    uwin_start: np.ndarray   # (ctiles,) int32, 128-aligned parent rows
    ulidx: np.ndarray        # (ctiles, TILE) int32 in [0, UWIN)
    uoff: np.ndarray         # (ctiles, TILE) int32 offset id 0..KD-1
    uspill_tile: np.ndarray  # (SU,) int32 child tile ids (-1 pad)
    uspill_parent: np.ndarray  # (SU, TILE) int32 parent row per spilled row
    uspill_off: np.ndarray   # (SU, TILE) int32 offset id per spilled row


def build_edge_window_plan(fwd: np.ndarray, child_parent: np.ndarray,
                           child_offset: np.ndarray, child_num: int,
                           parent_num: int,
                           max_spill_frac: float = 0.15
                           ) -> Optional[EdgeWindowPlan]:
    """Host plan builder from a DownPlan's arrays.

    Returns None when the caps are too small for the windows or the spill
    fraction is pathological (callers fall back to the XLA path).
    """
    parent_cap = fwd.shape[1]
    child_cap = child_parent.shape[0]
    if (child_cap < DWIN or parent_cap < UWIN
            or parent_cap % (4 * TILE) or child_cap % (4 * TILE)):
        return None
    ptiles = parent_cap // TILE
    ctiles = child_cap // TILE
    imax = np.iinfo(np.int32).max

    # ---- down side: per-offset child windows over parent tiles ----
    f = fwd.reshape(KD, ptiles, TILE)
    fvalid = f < child_num
    big = np.where(fvalid, f, imax)
    mn = big.min(axis=2)                                  # (KD, ptiles)
    mn = np.where(mn == imax, 0, mn)
    start = np.minimum((mn // 128) * 128, child_cap - DWIN)
    mx = np.where(fvalid, f, -1).max(axis=2)
    dbad = (mx - start) >= DWIN                           # (KD, ptiles)
    loc = f - start[:, :, None]
    loc = np.where(fvalid & ~dbad[:, :, None], loc, INVALID_D)
    dwin_start = start.T.astype(np.int32)                 # (ptiles, KD)
    dlidx = np.transpose(loc, (1, 0, 2)).astype(np.int32)
    ent_ids = np.flatnonzero(dbad.T.reshape(-1))          # ptile*KD + k
    if len(ent_ids) > max_spill_frac * ptiles * KD:
        return None
    SD = _bucket64(max(len(ent_ids), 1))
    dspill_ent = np.full(SD, -1, dtype=np.int32)
    dspill_ent[:len(ent_ids)] = ent_ids
    dspill_fwd = np.zeros((SD, TILE), dtype=np.int32)
    for i, e in enumerate(ent_ids):
        t, k = divmod(int(e), KD)
        dspill_fwd[i] = f[k, t]

    # ---- up side: one parent window per child tile ----
    cp = child_parent.reshape(ctiles, TILE)
    rvalid = (np.arange(child_cap) < child_num).reshape(ctiles, TILE)
    bigp = np.where(rvalid, cp, imax)
    mnp = bigp.min(axis=1)
    mnp = np.where(mnp == imax, 0, mnp)
    startp = np.minimum((mnp // 128) * 128, parent_cap - UWIN)
    mxp = np.where(rvalid, cp, -1).max(axis=1)
    ubad = (mxp - startp) >= UWIN                         # (ctiles,)
    ulidx = cp - startp[:, None]
    ulidx = np.where(rvalid & ~ubad[:, None], ulidx, INVALID_U)
    tile_ids = np.flatnonzero(ubad)
    if len(tile_ids) > max_spill_frac * ctiles:
        return None
    SU = _bucket64(max(len(tile_ids), 1), lo=8)
    uspill_tile = np.full(SU, -1, dtype=np.int32)
    uspill_tile[:len(tile_ids)] = tile_ids
    uspill_parent = np.zeros((SU, TILE), dtype=np.int32)
    uspill_off = np.zeros((SU, TILE), dtype=np.int32)
    off = child_offset.reshape(ctiles, TILE)
    for i, t in enumerate(tile_ids):
        # invalid child rows point at the parent NULL row (cap-1): features
        # and cotangents are zero there (padded-row invariant), so the
        # spill correction contributes exact zeros without a mask
        uspill_parent[i] = np.where(rvalid[t], cp[t], parent_cap - 1)
        uspill_off[i] = off[t]
    return EdgeWindowPlan(
        dwin_start=dwin_start, dlidx=dlidx,
        dspill_ent=dspill_ent, dspill_fwd=dspill_fwd,
        uwin_start=startp.astype(np.int32), ulidx=ulidx.astype(np.int32),
        uoff=off.astype(np.int32), uspill_tile=uspill_tile,
        uspill_parent=uspill_parent, uspill_off=uspill_off)


def _pick_mtile_d(nk: int, Cg: int, Cl: int, backward: bool) -> int:
    """MTILE for down-side (D) kernels: nk per-offset DWIN windows."""
    win = nk * DG * (Cg // 2) * 128 * 4
    for mt in (4, 2, 1):
        stack = nk * Cg * mt * TILE * 2
        weights = nk * Cg * Cl * 2
        blocks = mt * TILE * Cl * 2 * 2 * (2 if backward else 1)
        acc = nk * Cg * Cl * 4 if backward else 0
        if (win + stack + weights + blocks + acc
                + 3 * 1024 * 1024 < 14_500_000):
            return mt
    return 0


def _pick_mtile_u(Cg: int, Cl: int, backward: bool) -> int:
    """MTILE for up-side (U) kernels: one UWIN window, KD-masked stack."""
    win = UG * (Cg // 2) * 128 * 4
    for mt in (4, 2, 1):
        stack = KD * Cg * mt * TILE * 2
        weights = KD * Cg * Cl * 2
        blocks = mt * TILE * Cl * 2 * 2 * (2 if backward else 1)
        acc = KD * Cg * Cl * 4 if backward else 0
        if (win + stack + weights + blocks + acc
                + 3 * 1024 * 1024 < 14_500_000):
            return mt
    return 0


def _gather_one(win_ref, idx, invalid, groups, Cw):
    """Crossbar-gather one (Cw, TILE) paired column set from a windowed
    source: win_ref[g] is the g-th 128-row group (Cw, 128) f32."""
    val = idx < invalid
    ikc = jnp.where(val, idx, 0)
    lo = jnp.broadcast_to((ikc % 128).reshape(1, TILE), (Cw, TILE))
    hi = jnp.where(val, ikc // 128, groups)
    acc = jnp.zeros((Cw, TILE), jnp.float32)
    for g in range(groups):
        part = jnp.take_along_axis(win_ref[g], lo, axis=1)
        sel = jnp.broadcast_to((hi == g).reshape(1, TILE), (Cw, TILE))
        acc = jnp.where(sel, part, acc)
    return acc


def _unpack_pairs(acc):
    """(Cw, T) f32 pairs -> (evens, odds) f32 values of the bf16 halves."""
    u = jax.lax.bitcast_convert_type(acc, jnp.uint32)
    v_even = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    v_odd = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000),
                                         jnp.float32)
    return v_even, v_odd


def _db_fits_d(nk: int, Cg: int, Cl: int, backward: bool, mt: int) -> bool:
    """Double-buffered down-window scratch fits the budget at this mt
    (mirrors pallas_conv._db_fits; db never changes mt)."""
    win = nk * DG * (Cg // 2) * 128 * 4
    stack = nk * Cg * mt * TILE * 2
    weights = nk * Cg * Cl * 2
    blocks = mt * TILE * Cl * 2 * 2 * (2 if backward else 1)
    acc = nk * Cg * Cl * 4 if backward else 0
    return (2 * win + stack + weights + blocks + acc
            + 3 * 1024 * 1024 < 14_500_000)


def _db_fits_u(Cg: int, Cl: int, backward: bool, mt: int) -> bool:
    win = UG * (Cg // 2) * 128 * 4
    stack = KD * Cg * mt * TILE * 2
    weights = KD * Cg * Cl * 2
    blocks = mt * TILE * Cl * 2 * 2 * (2 if backward else 1)
    acc = KD * Cg * Cl * 4 if backward else 0
    return (2 * win + stack + weights + blocks + acc
            + 3 * 1024 * 1024 < 14_500_000)


def _start_d(ws_ref, st, src, win, sems, offsets):
    for i, k in enumerate(offsets):
        gstart = ws_ref[st * KD + k] // 128
        pltpu.make_async_copy(src.at[pl.ds(gstart, DG)], win.at[i],
                              sems.at[i]).start()


def _wait_d(ws_ref, st, src, win, sems, offsets):
    for i, k in enumerate(offsets):
        gstart = ws_ref[st * KD + k] // 128
        pltpu.make_async_copy(src.at[pl.ds(gstart, DG)], win.at[i],
                              sems.at[i]).wait()


def _d_pipeline(ws_ref, t, src, win, sems, offsets, mt: int, db: bool,
                gather_j):
    """Down-side per-sub-tile window DMA + gathers; db=True overlaps
    sub-tile j+1's 8 window DMAs with j's gathers and the next grid step's
    first DMA with the closing GEMM (same scheme and safety argument as
    pallas_conv._windows_pipeline; buffer parity j%2 is static for even
    mt)."""
    if not db:
        for j in range(mt):
            st = t * mt + j
            _start_d(ws_ref, st, src, win, sems, offsets)
            _wait_d(ws_ref, st, src, win, sems, offsets)
            gather_j(j, win)
        return

    @pl.when(t == 0)
    def _():
        _start_d(ws_ref, 0, src, win.at[0], sems.at[0], offsets)

    for j in range(mt):
        st = t * mt + j
        buf = j % 2
        if j + 1 < mt:
            _start_d(ws_ref, st + 1, src, win.at[(j + 1) % 2],
                     sems.at[(j + 1) % 2], offsets)
        else:
            @pl.when(t + 1 < pl.num_programs(0))
            def _():
                _start_d(ws_ref, (t + 1) * mt, src, win.at[0], sems.at[0],
                         offsets)
        _wait_d(ws_ref, st, src, win.at[buf], sems.at[buf], offsets)
        gather_j(j, win.at[buf])


def _u_pipeline(ws_ref, t, src, win, sems, mt: int, db: bool, gather_j):
    """Up-side (one UWIN window per sub-tile) variant of _d_pipeline."""
    def start(st, w, s):
        gstart = ws_ref[st] // 128
        pltpu.make_async_copy(src.at[pl.ds(gstart, UG)], w, s).start()

    def wait(st, w, s):
        gstart = ws_ref[st] // 128
        pltpu.make_async_copy(src.at[pl.ds(gstart, UG)], w, s).wait()

    if not db:
        for j in range(mt):
            st = t * mt + j
            start(st, win, sems)
            wait(st, win, sems)
            gather_j(j, win)
        return

    @pl.when(t == 0)
    def _():
        start(0, win.at[0], sems.at[0])

    for j in range(mt):
        st = t * mt + j
        buf = j % 2
        if j + 1 < mt:
            start(st + 1, win.at[(j + 1) % 2], sems.at[(j + 1) % 2])
        else:
            @pl.when(t + 1 < pl.num_programs(0))
            def _():
                start((t + 1) * mt, win.at[0], sems.at[0])
        wait(st, win.at[buf], sems.at[buf])
        gather_j(j, win.at[buf])


def make_down_kernel(C: int, Coutp: int,
                     offsets: Optional[Tuple[int, ...]] = None):
    """Down-side forward: out[p] = sum_k x_child[fwd[k, p]] @ w[k].

    ``offsets`` restricts the call to a subset of the 8 offsets (VMEM
    escape hatch for wide channels; partial outputs are summed)."""
    if offsets is None:
        offsets = tuple(range(KD))
    nk = len(offsets)
    Cw = C // 2
    mt = _pick_mtile_d(nk, C, Coutp, backward=False)
    assert mt > 0, (C, Coutp, offsets)
    db = mt >= 2 and _db_fits_d(nk, C, Coutp, backward=False, mt=mt)

    def kernel(ws_ref, dlidx_ref, xt_hbm, wT_ref, out_ref, win, stack, sems):
        t = pl.program_id(0)

        def gather_j(j, wref):
            for i in range(nk):
                acc = _gather_one(wref[i], dlidx_ref[j, i], INVALID_D, DG,
                                  Cw)
                v_even, v_odd = _unpack_pairs(acc)
                c0, c1 = j * TILE, (j + 1) * TILE
                stack[i*C:i*C + Cw, c0:c1] = v_even.astype(jnp.bfloat16)
                stack[i*C + Cw:(i+1)*C, c0:c1] = v_odd.astype(jnp.bfloat16)

        _d_pipeline(ws_ref, t, xt_hbm, win, sems, offsets, mt, db, gather_j)
        o = _dot(wT_ref[...], stack[...])
        out_ref[...] = o.T.astype(jnp.bfloat16)

    def call(xt, wT, dwin_start, dlidx):
        ptiles = dlidx.shape[0]
        cap = ptiles * TILE
        assert ptiles % mt == 0, (ptiles, mt)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(ptiles // mt,),
                in_specs=[
                    pl.BlockSpec((mt, nk, TILE), lambda t, ws: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((mt * TILE, Coutp),
                                       lambda t, ws: (t, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, nk, DG, Cw, 128), jnp.float32) if db else
                    pltpu.VMEM((nk, DG, Cw, 128), jnp.float32),
                    pltpu.VMEM((nk * C, mt * TILE), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((2, nk) if db else (nk,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((cap, Coutp), jnp.bfloat16),
            interpret=pallas_conv.INTERPRET,
        )(dwin_start.reshape(-1), dlidx, xt, wT)

    return call


def make_down_bwd_kernel(Cp: int, Cout: int,
                         offsets: Optional[Tuple[int, ...]] = None):
    """Up-conv backward over parent tiles (down-side gathers of the CHILD
    cotangent): dx[p] = sum_k g_child[fwd[k, p]] @ w[k]^T and
    dW[k] = x_parent^T @ g_child[fwd[k]] (accumulated)."""
    if offsets is None:
        offsets = tuple(range(KD))
    nk = len(offsets)
    Cow = Cout // 2
    mt = _pick_mtile_d(nk, Cout, Cp, backward=True)
    assert mt > 0, (Cp, Cout, offsets)
    db = mt >= 2 and _db_fits_d(nk, Cout, Cp, backward=True, mt=mt)

    def kernel(ws_ref, dlidx_ref, x_blk, gt_hbm, wT_ref, dx_ref, dw_ref,
               win, stack, acc, sems):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        def gather_j(j, wref):
            for i in range(nk):
                a = _gather_one(wref[i], dlidx_ref[j, i], INVALID_D, DG, Cow)
                v_even, v_odd = _unpack_pairs(a)
                c0, c1 = j * TILE, (j + 1) * TILE
                stack[i*Cout:i*Cout + Cow, c0:c1] = \
                    v_even.astype(jnp.bfloat16)
                stack[i*Cout + Cow:(i+1)*Cout, c0:c1] = \
                    v_odd.astype(jnp.bfloat16)

        _d_pipeline(ws_ref, t, gt_hbm, win, sems, offsets, mt, db, gather_j)
        dxT = _dot(wT_ref[...], stack[...])
        dx_ref[...] = dxT.T.astype(jnp.bfloat16)
        acc[...] += _dot(stack[...], x_blk[...])

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            dw_ref[...] = acc[...]

    def call(x, gt, wT, dwin_start, dlidx):
        cap = x.shape[0]
        ptiles = cap // TILE
        assert ptiles % mt == 0, (ptiles, mt)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(ptiles // mt,),
                in_specs=[
                    pl.BlockSpec((mt, nk, TILE), lambda t, ws: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((mt * TILE, Cp), lambda t, ws: (t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((mt * TILE, Cp), lambda t, ws: (t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, nk, DG, Cow, 128), jnp.float32) if db else
                    pltpu.VMEM((nk, DG, Cow, 128), jnp.float32),
                    pltpu.VMEM((nk * Cout, mt * TILE), jnp.bfloat16),
                    pltpu.VMEM((nk * Cout, Cp), jnp.float32),
                    pltpu.SemaphoreType.DMA((2, nk) if db else (nk,)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((cap, Cp), jnp.bfloat16),
                jax.ShapeDtypeStruct((nk * Cout, Cp), jnp.float32),
            ],
            interpret=pallas_conv.INTERPRET,
        )(dwin_start.reshape(-1), dlidx, x, gt, wT)

    return call


def make_up_kernel(C: int, Coutp: int):
    """Up-side forward over child tiles: out[c] = x_parent[parent(c)] @
    w[offset(c)].  One parent-window gather per tile, fanned into KD
    offset-masked stack blocks -> one GEMM."""
    Cw = C // 2
    mt = _pick_mtile_u(C, Coutp, backward=False)
    assert mt > 0, (C, Coutp)
    db = mt >= 2 and _db_fits_u(C, Coutp, backward=False, mt=mt)

    def kernel(ws_ref, ulidx_ref, uoff_ref, xt_hbm, wT_ref, out_ref,
               win, stack, sems):
        t = pl.program_id(0)

        def gather_j(j, wref):
            a = _gather_one(wref, ulidx_ref[0, j], INVALID_U, UG, Cw)
            v_even, v_odd = _unpack_pairs(a)
            off = uoff_ref[0, j]
            c0, c1 = j * TILE, (j + 1) * TILE
            for k in range(KD):
                sel = jnp.broadcast_to((off == k).reshape(1, TILE),
                                       (Cw, TILE))
                ze = jnp.where(sel, v_even, 0.0)
                zo = jnp.where(sel, v_odd, 0.0)
                stack[k*C:k*C + Cw, c0:c1] = ze.astype(jnp.bfloat16)
                stack[k*C + Cw:(k+1)*C, c0:c1] = zo.astype(jnp.bfloat16)

        _u_pipeline(ws_ref, t, xt_hbm, win, sems, mt, db, gather_j)
        o = _dot(wT_ref[...], stack[...])
        out_ref[...] = o.T.astype(jnp.bfloat16)

    def call(xt, wT, uwin_start, ulidx, uoff):
        ctiles = ulidx.shape[0]
        cap = ctiles * TILE
        assert ctiles % mt == 0, (ctiles, mt)
        # (ctiles, TILE) -> (ctiles//mt, mt, TILE) so the VMEM block
        # (1, mt, TILE) has its last two dims equal to the array dims
        # (Mosaic forbids a sublane block dim not divisible by 8).
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(ctiles // mt,),
                in_specs=[
                    pl.BlockSpec((1, mt, TILE), lambda t, ws: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, mt, TILE), lambda t, ws: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((mt * TILE, Coutp),
                                       lambda t, ws: (t, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, UG, Cw, 128), jnp.float32) if db else
                    pltpu.VMEM((UG, Cw, 128), jnp.float32),
                    pltpu.VMEM((KD * C, mt * TILE), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((2,) if db else ()),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((cap, Coutp), jnp.bfloat16),
            interpret=pallas_conv.INTERPRET,
        )(uwin_start, ulidx.reshape(ctiles // mt, mt, TILE),
          uoff.reshape(ctiles // mt, mt, TILE), xt, wT)

    return call


def make_up_bwd_kernel(Cp: int, Cout: int):
    """Down-conv backward over child tiles (up-side gather of the PARENT
    cotangent): dx[c] = g_parent[parent(c)] @ w[offset(c)]^T and
    dW[k] = sum_c 1[offset(c)=k] x_child[c]^T g_parent[parent(c)]."""
    Cow = Cout // 2
    mt = _pick_mtile_u(Cout, Cp, backward=True)
    assert mt > 0, (Cp, Cout)
    db = mt >= 2 and _db_fits_u(Cout, Cp, backward=True, mt=mt)

    def kernel(ws_ref, ulidx_ref, uoff_ref, x_blk, gt_hbm, wT_ref,
               dx_ref, dw_ref, win, stack, acc, sems):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        def gather_j(j, wref):
            a = _gather_one(wref, ulidx_ref[0, j], INVALID_U, UG, Cow)
            v_even, v_odd = _unpack_pairs(a)
            off = uoff_ref[0, j]
            c0, c1 = j * TILE, (j + 1) * TILE
            for k in range(KD):
                sel = jnp.broadcast_to((off == k).reshape(1, TILE),
                                       (Cow, TILE))
                ze = jnp.where(sel, v_even, 0.0)
                zo = jnp.where(sel, v_odd, 0.0)
                stack[k*Cout:k*Cout + Cow, c0:c1] = ze.astype(jnp.bfloat16)
                stack[k*Cout + Cow:(k+1)*Cout, c0:c1] = \
                    zo.astype(jnp.bfloat16)

        _u_pipeline(ws_ref, t, gt_hbm, win, sems, mt, db, gather_j)
        dxT = _dot(wT_ref[...], stack[...])
        dx_ref[...] = dxT.T.astype(jnp.bfloat16)
        acc[...] += _dot(stack[...], x_blk[...])

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            dw_ref[...] = acc[...]

    def call(x, gt, wT, uwin_start, ulidx, uoff):
        cap = x.shape[0]
        ctiles = cap // TILE
        assert ctiles % mt == 0, (ctiles, mt)
        # ulidx/uoff reshaped to (ctiles//mt, mt, TILE); see make_up_kernel.
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(ctiles // mt,),
                in_specs=[
                    pl.BlockSpec((1, mt, TILE), lambda t, ws: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, mt, TILE), lambda t, ws: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((mt * TILE, Cp), lambda t, ws: (t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((mt * TILE, Cp), lambda t, ws: (t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, UG, Cow, 128), jnp.float32) if db else
                    pltpu.VMEM((UG, Cow, 128), jnp.float32),
                    pltpu.VMEM((KD * Cout, mt * TILE), jnp.bfloat16),
                    pltpu.VMEM((KD * Cout, Cp), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,) if db else ()),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((cap, Cp), jnp.bfloat16),
                jax.ShapeDtypeStruct((KD * Cout, Cp), jnp.float32),
            ],
            interpret=pallas_conv.INTERPRET,
        )(uwin_start, ulidx.reshape(ctiles // mt, mt, TILE),
          uoff.reshape(ctiles // mt, mt, TILE), x, gt, wT)

    return call


@functools.lru_cache(maxsize=None)
def _down_cached(C, Coutp, offsets=None):
    return make_down_kernel(C, Coutp, offsets)


@functools.lru_cache(maxsize=None)
def _down_bwd_cached(Cp, Cout, offsets=None):
    return make_down_bwd_kernel(Cp, Cout, offsets)


@functools.lru_cache(maxsize=None)
def _up_cached(C, Coutp):
    return make_up_kernel(C, Coutp)


@functools.lru_cache(maxsize=None)
def _up_bwd_cached(Cp, Cout):
    return make_up_bwd_kernel(Cp, Cout)


# ---------------------------------------------------------------------------
# XLA spill corrections + drop-in conv wrappers
# ---------------------------------------------------------------------------

def _d_spill_tiles(dspill_ent):
    return jnp.maximum(dspill_ent, 0) // KD  # (SD,) parent tile per entry


def _d_spill_apply(src, w_stack, dspill_ent, dspill_fwd, valid):
    """Per-entry correction src[dspill_fwd[e]] @ w_stack[offset(e)]:
    one row-gather + one GEMM per offset (static weights) + select.
    w_stack: (KD, Cin, Cout) fp32; src rows at nulls are zero."""
    G = jnp.take(src, dspill_fwd.reshape(-1), axis=0)       # (SD*T, Cin)
    outs = jnp.einsum("nc,kcd->knd", G, w_stack.astype(src.dtype),
                      preferred_element_type=jnp.float32)
    k_of = jnp.maximum(dspill_ent, 0) % KD
    sel = (k_of[None, :] == jnp.arange(KD)[:, None])
    sel = jnp.repeat(sel, TILE, axis=1)[:, :, None]
    return jnp.sum(outs * sel, axis=0) * valid[:, None]


def _u_spill_tiles(uspill_tile):
    return jnp.maximum(uspill_tile, 0)  # (SU,) child tile per entry


def _u_spill_apply(src, w_stack, uspill_parent, uspill_off, valid):
    """Per-spilled-child-tile rows: src[uspill_parent] @ w_stack[off]."""
    G = jnp.take(src, uspill_parent.reshape(-1), axis=0)    # (SU*T, Cin)
    outs = jnp.einsum("nc,kcd->knd", G, w_stack.astype(src.dtype),
                      preferred_element_type=jnp.float32)
    sel = (uspill_off.reshape(-1)[None, :]
           == jnp.arange(KD)[:, None])[:, :, None]
    return jnp.sum(outs * sel, axis=0) * valid[:, None]


def _down_weight_T(w, C, Coutp, offsets=None):
    """(Coutp, nk*C) GEMM weights for a down-side stack ([evens|odds] per
    offset)."""
    KDw, _, Cout = w.shape
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, Coutp - Cout)))
    wp = wp[:, _pair_perm(C), :]
    if offsets is not None:
        wp = wp[list(offsets)]
    return jnp.transpose(wp, (2, 0, 1)).reshape(
        Coutp, wp.shape[0] * C).astype(jnp.bfloat16)


def _bwd_weight_T(w, Cp, offsets=None):
    """(Cp, nk*Cout) GEMM weights for a cotangent-side stack: column
    k*Cout+o holds w[k][c, perm(o)] (dx = stack contra w)."""
    KDw, C, Cout = w.shape
    o_perm = _pair_perm(Cout)
    w_p = jnp.pad(w, ((0, 0), (0, Cp - C), (0, 0)))[:, :, o_perm]
    if offsets is not None:
        w_p = w_p[list(offsets)]
    return jnp.transpose(w_p, (1, 0, 2)).reshape(
        Cp, w_p.shape[0] * Cout).astype(jnp.bfloat16)


def _unperm_dw(acc, nk, C, Cout, Cp):
    """(nk*Cout, Cp) accumulator -> (nk, C, Cout) in channel order."""
    o_perm = _pair_perm(Cout)
    dw = acc.reshape(nk, Cout, Cp)[:, np.argsort(o_perm), :C]
    return jnp.transpose(dw, (0, 2, 1))


@jax.custom_vjp
def windowed_down_conv(x, w, dwin_start, dlidx, dspill_ent, dspill_fwd,
                       uwin_start, ulidx, uoff, uspill_tile, uspill_parent,
                       uspill_off):
    """Drop-in k=2 s=2 down conv on an EdgeWindowPlan.

    x: (child_cap, C) bf16; w: (KD, C, Cout) fp32, C/Cout even.  Semantics
    identical to sparse/ops.py:sparse_down_conv.  Forward runs kernel D
    over parent tiles (offset-split when the 8 DWIN windows exceed the
    VMEM budget); backward runs kernel U over child tiles; spilled work is
    recomputed via the XLA gather path and added in."""
    K, C, Cout = w.shape
    Coutp = _pad128(Cout)
    xt = _pack_t(x.astype(jnp.bfloat16))
    if _pick_mtile_d(KD, C, Coutp, backward=False) > 0:
        wT = _down_weight_T(w, C, Coutp)
        out = _down_cached(C, Coutp)(xt, wT, dwin_start, dlidx)
    else:
        out = None
        for half in ((0, 1, 2, 3), (4, 5, 6, 7)):
            wT_h = _down_weight_T(w, C, Coutp, half)
            o = _down_cached(C, Coutp, half)(
                xt, wT_h, dwin_start, dlidx[:, list(half), :])
            out = o if out is None else out + o
    out = out[:, :Cout]
    valid = jnp.repeat((dspill_ent >= 0).astype(jnp.float32), TILE)
    sp = _d_spill_apply(x.astype(jnp.bfloat16), w, dspill_ent, dspill_fwd,
                        valid)
    return _tile_scatter_add(out, _d_spill_tiles(dspill_ent), sp)


def _down_conv_fwd(x, w, *plan):
    return windowed_down_conv(x, w, *plan), (x, w) + plan


def _down_conv_bwd(res, g):
    (x, w, dwin_start, dlidx, dspill_ent, dspill_fwd, uwin_start, ulidx,
     uoff, uspill_tile, uspill_parent, uspill_off) = res
    K, C, Cout = w.shape
    Cp = _pad128(C)
    gb = g.astype(jnp.bfloat16)
    gt = _pack_t(gb)
    xb = x.astype(jnp.bfloat16)
    xpad = jnp.pad(xb, ((0, 0), (0, Cp - C)))
    wT = _bwd_weight_T(w, Cp)
    call = _up_bwd_cached(Cp, Cout)
    dx_p, acc = call(xpad, gt, wT, uwin_start, ulidx, uoff)
    dx = dx_p[:, :C]
    dw = _unperm_dw(acc, KD, C, Cout, Cp)

    # spilled child tiles: dx rows + their dW contributions
    tiles = _u_spill_tiles(uspill_tile)
    valid = jnp.repeat((uspill_tile >= 0).astype(jnp.float32), TILE)
    w_t = jnp.transpose(w, (0, 2, 1))                       # (KD, Cout, C)
    dx_sp = _u_spill_apply(gb, w_t, uspill_parent, uspill_off, valid)
    dx = _tile_scatter_add(dx, tiles, dx_sp)
    G = jnp.take(gb, uspill_parent.reshape(-1), axis=0)     # (SU*T, Cout)
    xr = _tile_take(xb, tiles) * valid[:, None].astype(jnp.bfloat16)
    sel = (uspill_off.reshape(-1)[None, :]
           == jnp.arange(KD)[:, None])[:, :, None]
    xm = xr[None] * sel.astype(jnp.bfloat16)                # (KD, SU*T, C)
    dw_sp = jnp.einsum("knc,nd->kcd", xm, G,
                       preferred_element_type=jnp.float32)
    dw = dw + dw_sp
    return (dx.astype(x.dtype), dw.astype(w.dtype)) + (None,) * 10


windowed_down_conv.defvjp(_down_conv_fwd, _down_conv_bwd)


@jax.custom_vjp
def windowed_up_conv(x, w, dwin_start, dlidx, dspill_ent, dspill_fwd,
                     uwin_start, ulidx, uoff, uspill_tile, uspill_parent,
                     uspill_off):
    """Drop-in k=2 s=2 transposed (up) conv on an EdgeWindowPlan.

    x: (parent_cap, C) bf16; w: (KD, C, Cout) fp32.  Semantics identical
    to sparse/ops.py:sparse_up_conv: out[c] = x[parent(c)] @ w[offset(c)].
    Forward runs kernel U over child tiles; backward runs kernel D over
    parent tiles."""
    K, C, Cout = w.shape
    Coutp = _pad128(Cout)
    xt = _pack_t(x.astype(jnp.bfloat16))
    wT = _down_weight_T(w, C, Coutp)  # same [evens|odds] stack layout
    out = _up_cached(C, Coutp)(xt, wT, uwin_start, ulidx, uoff)[:, :Cout]
    valid = jnp.repeat((uspill_tile >= 0).astype(jnp.float32), TILE)
    sp = _u_spill_apply(x.astype(jnp.bfloat16), w, uspill_parent,
                        uspill_off, valid)
    return _tile_scatter_add(out, _u_spill_tiles(uspill_tile), sp)


def _up_conv_fwd(x, w, *plan):
    return windowed_up_conv(x, w, *plan), (x, w) + plan


def _up_conv_bwd(res, g):
    (x, w, dwin_start, dlidx, dspill_ent, dspill_fwd, uwin_start, ulidx,
     uoff, uspill_tile, uspill_parent, uspill_off) = res
    dx, dw = _up_bwd_core(x, w, g, dwin_start, dlidx, dspill_ent,
                          dspill_fwd)
    return (dx, dw) + (None,) * 10


def _up_bwd_core(x, w, g, dwin_start, dlidx, dspill_ent, dspill_fwd):
    K, C, Cout = w.shape
    Cp = _pad128(C)
    gb = g.astype(jnp.bfloat16)                              # (child, Cout)
    gt = _pack_t(gb)
    xb = x.astype(jnp.bfloat16)
    xpad = jnp.pad(xb, ((0, 0), (0, Cp - C)))
    if _pick_mtile_d(KD, Cout, Cp, backward=True) > 0:
        wT = _bwd_weight_T(w, Cp)
        dx_p, acc = _down_bwd_cached(Cp, Cout)(xpad, gt, wT, dwin_start,
                                               dlidx)
        dw = _unperm_dw(acc, KD, C, Cout, Cp)
    else:
        dx_p = None
        dw_parts = []
        for half in ((0, 1, 2, 3), (4, 5, 6, 7)):
            wT_h = _bwd_weight_T(w, Cp, half)
            dxc, acc = _down_bwd_cached(Cp, Cout, half)(
                xpad, gt, wT_h, dwin_start, dlidx[:, list(half), :])
            dx_p = dxc if dx_p is None else dx_p + dxc
            dw_parts.append(_unperm_dw(acc, len(half), C, Cout, Cp))
        dw = jnp.concatenate(dw_parts, axis=0)
    dx = dx_p[:, :C]

    # spilled (parent tile, offset) entries: dx rows + dW contributions
    tiles = _d_spill_tiles(dspill_ent)
    valid = jnp.repeat((dspill_ent >= 0).astype(jnp.float32), TILE)
    w_t = jnp.transpose(w, (0, 2, 1))                        # (KD, Cout, C)
    dx_sp = _d_spill_apply(gb, w_t, dspill_ent, dspill_fwd, valid)
    dx = _tile_scatter_add(dx, tiles, dx_sp)
    G = jnp.take(gb, dspill_fwd.reshape(-1), axis=0)         # (SD*T, Cout)
    xr = _tile_take(xb, tiles) * valid[:, None].astype(jnp.bfloat16)
    k_of = jnp.maximum(dspill_ent, 0) % KD
    sel = jnp.repeat(k_of[None, :] == jnp.arange(KD)[:, None],
                     TILE, axis=1)[:, :, None]
    xm = xr[None] * sel.astype(jnp.bfloat16)                 # (KD, SD*T, C)
    dw_sp = jnp.einsum("knc,nd->kcd", xm, G,
                       preferred_element_type=jnp.float32)
    dw = dw + dw_sp
    return dx.astype(x.dtype), dw.astype(w.dtype)


windowed_up_conv.defvjp(_up_conv_fwd, _up_conv_bwd)


@jax.custom_vjp
def mixed_up_conv(x, w, child_parent, child_offset, dwin_start, dlidx,
                  dspill_ent, dspill_fwd):
    """k=2 s=2 transposed (up) conv with a MIXED path: XLA forward +
    windowed backward.

    Forward = dense per-offset GEMMs on the (small) parent level + ONE
    placement gather (sparse/ops.py:sparse_up_conv formulation) — measured
    faster than the masked-stack windowed up kernel at every bench edge
    (E0: 11.6ms vs 23.3ms, scripts/dev_bench_ops.py r5; each child row uses
    exactly one of the 8 offset weights, so the windowed kernel's
    offset-masked stack wastes 8x GEMM volume and VPU writes).
    Backward = the parent-grid windowed kernel (make_down_bwd_kernel: dx +
    dW from one child-cotangent gather) — measured up to 4.8x faster than
    the XLA scatter backward at E0.  Semantics identical to
    sparse/ops.py:sparse_up_conv."""
    from .ops import _take_rows
    cdtype = x.dtype
    y = jnp.einsum("pc,kcd->kpd", x, w.astype(cdtype),
                   preferred_element_type=jnp.float32).astype(cdtype)
    parent_cap = x.shape[0]
    flat_idx = child_offset * parent_cap + child_parent
    return _take_rows(y.reshape(-1, w.shape[-1]), flat_idx)


def _mixed_up_fwd(x, w, *rest):
    return mixed_up_conv(x, w, *rest), (x, w) + rest


def _mixed_up_bwd(res, g):
    (x, w, child_parent, child_offset, dwin_start, dlidx, dspill_ent,
     dspill_fwd) = res
    # identical math to _up_conv_bwd (the up-plan operands there are unused
    # by the backward); kept in one place:
    dx, dw = _up_bwd_core(x, w, g, dwin_start, dlidx, dspill_ent, dspill_fwd)
    return (dx, dw) + (None,) * 6


mixed_up_conv.defvjp(_mixed_up_fwd, _mixed_up_bwd)
