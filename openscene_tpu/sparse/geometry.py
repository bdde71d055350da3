"""Host-side geometry-plan builder (NumPy reference implementation).

Builds the full :class:`UNetGeometry` for a batch of voxelized scenes:
the coordinate hierarchy over strides (1, 2, 4, 8, 16) and every kernel map
the UNet needs, padded to static capacities so the jitted device program
compiles for a small number of shapes.

This is the functional replacement of MinkowskiEngine's CoordinateManager
(kernel-map construction, strided coordinate generation, transpose-conv
coordinate reuse — see SURVEY.md §2.2).  Two faster backends exist:

* :mod:`openscene_tpu.sparse.native` — C++ open-addressing hash builder
  (ctypes), same outputs, used by the training data pipeline.
* :mod:`openscene_tpu.sparse.geometry_device` — jit-compiled on-device
  builder (sort/searchsorted based) for the zero-host-work fast path.

Capacity policy: ``cap0`` is the geometric bucket covering the stride-1 voxel
count; lower-level caps are fixed ratios of ``cap0`` so the whole pipeline has
ONE compiled shape per cap0 bucket.  Each cap includes one reserved null row
(index cap-1) that stays zero in every feature buffer.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .types import (ConvPlan, DownPlan, LevelGeometry, UNetGeometry,
                    flip_permutation, stencil_offsets)

# Packed-key layout: (batch | x | y | z) in 16-bit fields of an int64.
# Key packing is linear in the coordinates, so a stencil offset is a constant
# key delta — neighbor probes become one vectorized add + searchsorted.
_SHIFT = np.int64(1) << np.int64(14)  # headroom so fields never underflow
_FIELD = 16


def pack_coords(coords: np.ndarray) -> np.ndarray:
    """(N, 4) int coords -> int64 keys. Coords must fit in +-2^14 per axis."""
    c = coords.astype(np.int64)
    if c.size and (c[:, 1:].min() < -_SHIFT or c[:, 1:].max() >= _SHIFT):
        raise ValueError(
            f"coordinate outside the +-2^14 packed-key field (got range "
            f"[{c[:, 1:].min()}, {c[:, 1:].max()}]); at 2cm voxels that is a "
            f">327m scene — re-center or coarsen the voxel grid")
    k = c[:, 0]
    for d in range(1, 4):
        k = (k << np.int64(_FIELD)) | (c[:, d] + _SHIFT)
    return k


def level_counts(coords: np.ndarray, num_levels: int = 5) -> List[int]:
    """Unique-voxel count at every stride level, without building any kernel
    maps (cheap capacity calibration for fixed-cap sharded batches)."""
    c = np.asarray(coords).astype(np.int64)
    counts: List[int] = []
    for l in range(num_levels):
        _, idx = np.unique(pack_coords(c), return_index=True)
        counts.append(len(idx))
        if l < num_levels - 1:
            c = c[idx]
            c = np.concatenate([c[:, :1], np.floor_divide(c[:, 1:], 2)],
                               axis=1)
    return counts


def offset_key_delta(offsets: np.ndarray) -> np.ndarray:
    """Key delta of each stencil offset (K,) int64 (batch field untouched).

    Arithmetic (not bitwise) since offsets may be negative; correct as long as
    no coordinate field under/overflows its 16-bit slot (guaranteed by the
    +-2^14 headroom in pack_coords).
    """
    o = offsets.astype(np.int64)
    base = np.int64(1) << np.int64(_FIELD)
    return (o[:, 0] * base + o[:, 1]) * base + o[:, 2]


def _bucket(n: int, growth: float = 1.3, min_bucket: int = 4096) -> int:
    """Smallest geometric-series capacity holding n valid rows + 1 null row.

    Capacities are multiples of 512 (4 x TILE: the windowed kernels batch
    their per-tile GEMMs over 4 output tiles to engage all MXUs) from a
    fixed geometric ladder, so the number of distinct compiled program
    shapes stays small.
    """
    cap = min_bucket
    while cap - 1 < n:
        cap = int(-(-cap * growth // 256) * 256)
    # final rounding to 4*TILE so the windowed kernels' GEMM batching
    # divides the tile count (wastes <= 384 rows vs a 512-granular ladder's
    # up-to-10% bucket inflation)
    return int(-(-cap // 512) * 512)


@dataclass(frozen=True)
class GeometryCaps:
    """Static capacity schedule for the 5-level hierarchy.

    ``ratios=None`` (default) buckets every level's actual count
    independently — robust for any sparsity pattern, with shape variety
    bounded by the bucket ladder.  Fixed ratios of cap0 give ONE program
    shape per cap0 bucket (use after calibrating on a dataset).
    """
    cap0: int
    level_ratios: Optional[Tuple[float, ...]] = None
    fixed: Optional[Tuple[int, ...]] = None  # exact per-level caps (for
    # stacking per-device batches into one sharded program shape)

    def cap_for(self, level: int, count: int) -> int:
        if self.fixed is not None:
            return self.fixed[level]
        if level == 0:
            return self.cap0
        if self.level_ratios is None:
            return _bucket(count)
        def rup(x):  # 512-granular: keeps ratio caps windowed-kernel eligible
            return int(-(-x // 512) * 512)
        return rup(self.cap0 * self.level_ratios[level - 1])

    @property
    def caps(self) -> Tuple[int, ...]:
        assert self.level_ratios is not None, "caps undefined without ratios"
        def rup(x):
            return int(-(-x // 512) * 512)
        return (self.cap0,) + tuple(rup(self.cap0 * r) for r in self.level_ratios)

    @staticmethod
    def for_count(n: int, growth: float = 1.3, min_bucket: int = 4096) -> "GeometryCaps":
        return GeometryCaps(cap0=_bucket(n, growth, min_bucket))


def _spread_nulls(shape, num: int, cap: int) -> np.ndarray:
    """Null gather targets spread across the (all-zero) padding region
    [num, cap). Pointing every missing neighbor at one row serializes the
    gather on that hot row (~1.7x measured slowdown); any padded row is an
    equally valid zero source."""
    pad = np.uint32(max(cap - num, 1))
    flat = np.arange(int(np.prod(shape)), dtype=np.uint32)
    flat *= np.uint32(2654435761)  # wrapping multiply: cheap pseudo-shuffle
    return (num + (flat % pad).astype(np.int32)).reshape(shape)


def _lookup(sorted_keys: np.ndarray, order: np.ndarray, probes: np.ndarray,
            null_rows: np.ndarray) -> np.ndarray:
    """Row index of each probe key, or the given per-slot null row when
    absent."""
    pos = np.searchsorted(sorted_keys, probes)
    pos_c = np.minimum(pos, len(sorted_keys) - 1)
    found = (len(sorted_keys) > 0) & (sorted_keys[pos_c] == probes)
    return np.where(found, order[pos_c], null_rows).astype(np.int32)


def _pad_level(coords: np.ndarray, cap: int) -> LevelGeometry:
    n = coords.shape[0]
    if n > cap - 1:
        raise OverflowError(
            f"level needs {n} rows but cap={cap} (one row reserved); "
            "re-bucket with a larger cap0")
    out = np.full((cap, 4), 2 ** 20, dtype=np.int32)  # sentinel coords
    out[:n] = coords.astype(np.int32)
    return LevelGeometry(coords=out, num=np.int32(n))


def build_self_plan(level: LevelGeometry, kernel_size: int,
                    sorted_keys: Optional[np.ndarray] = None,
                    order: Optional[np.ndarray] = None) -> ConvPlan:
    """Stride-1 stencil plan: fwd[k, r] = row of (coord_r + offset_k)."""
    cap = level.cap
    n = int(level.num)
    offsets = stencil_offsets(kernel_size)
    K = len(offsets)
    fwd = _spread_nulls((K, cap), n, cap)

    from . import native
    if native.available():
        native.build_self_plan_native(level.coords, n, cap, offsets, fwd)
        return ConvPlan(fwd=fwd, flip_perm=flip_permutation(offsets))

    valid = level.coords[:n]
    keys = pack_coords(valid)
    if sorted_keys is None:
        order = np.argsort(keys).astype(np.int32)
        sorted_keys = keys[order]
    deltas = offset_key_delta(offsets)
    center = K // 2  # odd stencils: center offset is the identity map
    for k in range(K):
        if k == center:
            fwd[k, :n] = np.arange(n, dtype=np.int32)
            continue
        fwd[k, :n] = _lookup(sorted_keys, order, keys + deltas[k], fwd[k, :n])
    return ConvPlan(fwd=fwd, flip_perm=flip_permutation(offsets))


def build_down_edge(fine: LevelGeometry, coarse_cap: Optional[int] = None,
                    cap_fn=None) -> Tuple[LevelGeometry, DownPlan]:
    """Parent level (coords = unique floor(child/2)) + the k=2 s=2 plan.

    No probing needed: each child belongs to exactly one (parent, offset), so
    the fwd map is a host-side scatter of child rows.  ``cap_fn(count)`` may
    be passed instead of a fixed cap to size the level after counting.
    """
    n = int(fine.num)
    from . import native
    if native.available():
        # native builds in first-appearance order; remap to lex order so the
        # coarser level keeps the sortedness the windowed kernels rely on
        cap_guess = coarse_cap if coarse_cap is not None else fine.cap
        fwd_tmp = np.zeros((8, cap_guess), dtype=np.int32)
        pc, cp, off_id = native.build_down_edge_native(
            fine.coords, n, cap_guess, fwd_tmp)
        n_parent = len(pc)
        if coarse_cap is None:
            coarse_cap = cap_fn(n_parent)
        order = np.lexsort((pc[:, 3], pc[:, 2], pc[:, 1], pc[:, 0]))
        inv = np.empty_like(order)
        inv[order] = np.arange(n_parent)
        coarse = _pad_level(pc[order], coarse_cap)
        child_parent = _spread_nulls((fine.cap,), n_parent, coarse_cap)
        child_parent[:n] = inv[cp].astype(np.int32)
        child_offset = np.zeros(fine.cap, dtype=np.int32)
        child_offset[:n] = off_id
        fwd = _spread_nulls((8, coarse_cap), n, fine.cap)
        fwd[child_offset[:n], child_parent[:n]] = np.arange(n, dtype=np.int32)
        return coarse, DownPlan(fwd=fwd, child_parent=child_parent,
                                child_offset=child_offset)

    child = fine.coords[:n].astype(np.int64)
    parent_coords = child.copy()
    parent_coords[:, 1:] = np.floor_divide(child[:, 1:], 2)
    pkeys = pack_coords(parent_coords)
    uniq_keys, first_idx, inverse = np.unique(
        pkeys, return_index=True, return_inverse=True)
    inverse = inverse.reshape(-1)
    if coarse_cap is None:
        coarse_cap = cap_fn(len(first_idx))
    coarse = _pad_level(parent_coords[first_idx], coarse_cap)
    n_parent = len(first_idx)

    # offset id in x-major order over (0,1)^3: (dx*2 + dy)*2 + dz
    rem = (child[:, 1:] - parent_coords[:, 1:] * 2).astype(np.int32)
    off_id = (rem[:, 0] * 2 + rem[:, 1]) * 2 + rem[:, 2]

    child_parent = _spread_nulls((fine.cap,), n_parent, coarse_cap)
    child_parent[:n] = inverse.astype(np.int32)
    child_offset = np.zeros(fine.cap, dtype=np.int32)
    child_offset[:n] = off_id

    fwd = _spread_nulls((8, coarse_cap), n, fine.cap)
    fwd[off_id, inverse] = np.arange(n, dtype=np.int32)
    return coarse, DownPlan(fwd=fwd, child_parent=child_parent,
                            child_offset=child_offset)


def build_unet_geometry(coords: np.ndarray, caps: Optional[GeometryCaps] = None,
                        stem_kernel: int = 5, num_levels: int = 5,
                        build_windows: Optional[bool] = None) -> UNetGeometry:
    """Full geometry for a 4-down/4-up UNet from batched voxel coords.

    coords: (N, 4) int — (batch, x, y, z) at stride 1 (deduplicated); MUST be
    lex-sorted by (batch, x, y, z) for the windowed Pallas kernels to engage
    (data/batch.py sorts; unsorted input still works via the XLA fallback).
    """
    coords = np.asarray(coords)
    if caps is None:
        caps = GeometryCaps.for_count(coords.shape[0])

    levels: List[LevelGeometry] = [_pad_level(coords, caps.cap_for(0, coords.shape[0]))]
    downs: List[DownPlan] = []
    for l in range(num_levels - 1):
        coarse, plan = build_down_edge(
            levels[l], cap_fn=lambda n, lvl=l + 1: caps.cap_for(lvl, n))
        levels.append(coarse)
        downs.append(plan)

    stem = build_self_plan(levels[0], stem_kernel)
    self3 = tuple(build_self_plan(lv, 3) for lv in levels)
    if build_windows is None:
        # Mosaic kernels only exist on real TPU backends
        import jax
        build_windows = jax.default_backend() == "tpu"
    wplans: Tuple = (None,) * num_levels
    ewplans: Tuple = (None,) * (num_levels - 1)
    if build_windows:
        from .pallas_conv import WPLAN_MIN_CAP, build_window_plan
        from .pallas_edge import EWPLAN_MIN_CAP, build_edge_window_plan
        wplans = tuple(
            build_window_plan(self3[l].fwd, int(levels[l].num), levels[l].cap)
            if levels[l].cap >= WPLAN_MIN_CAP else None
            for l in range(num_levels))
        ewplans = tuple(
            build_edge_window_plan(downs[e].fwd, downs[e].child_parent,
                                   downs[e].child_offset,
                                   int(levels[e].num), int(levels[e + 1].num))
            if levels[e].cap >= EWPLAN_MIN_CAP else None
            for e in range(num_levels - 1))
    return UNetGeometry(levels=tuple(levels), stem=stem, self3=self3,
                        down=tuple(downs), wplans=wplans, ewplans=ewplans)
