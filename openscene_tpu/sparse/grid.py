"""Dense occupancy-grid stencil probing for the on-device geometry builder.

The r3 geometry build spent ~1.1s of its 1.4s in `geometry_device`'s
24-column searchsorted pass at cap0 (measured, scripts/dev_profile_geo.py:
347ms of pivot-tree searches + ~700ms of anchor gathers/zmask hit logic).
This module replaces the per-column searches with a dense bitmask grid +
rank (popcount-prefix) structure, the classic succinct-set trade:

* **Build** (per level): scatter one bit per voxel into a static flat
  word array (z packed 32/word, per-scene bbox offsets so scenes share one
  static shape), one exclusive cumsum of per-word popcounts, then repack
  words+ranks into a ``(R, 128)`` row table.  Because the grid's
  (b, x, y, z) traversal order IS the batch's lex sort order
  (data/batch.py), the rank of a set bit is exactly its voxel's global row
  index — no sorting, no searching.
* **Query**: one table row packs a whole (b, x, y-block) probe line:
  ``YB`` y-values x ``LPY`` z-words in lanes [0, 64) and their exclusive
  bit-ranks in lanes [64, 128).  A (2r+1)-wide y-window spans at most two
  blocks for ``YB >= 2r``, so ONE dx-plane of a k<=5 stencil needs exactly
  2 aligned 128-lane row gathers; every (dy, dz) offset is then a cheap
  one-hot lane extract + bit test, and ``row = rank[word] +
  popcount(bits below)``.

Why this exact shape (all measured on-chip, scripts/dev_grid_gather.py /
dev_grid_rowgather.py, cap0 = 1.1M):

* aligned full-128-lane row gathers (`jnp.take(table, idx, axis=0)`) cost
  1.9-5.5ms per cap-sized fetch even from a 367MB table — XLA's fast
  gather path;
* unaligned narrow lane slices degrade to ~20-50ms PER LANE (the first
  slab-gather cut measured 2.3s per dx-plane);
* scalar (cap,) gathers cost ~8ms each below ~60MB tables (the search
  path's anchor reads), so even a perfect scalar-probe design would pay
  ~300ms where the row table pays ~40ms of gathers + ~70ms of extracts;
* a 128-lane one-hot extract of a data-dependent lane costs ~1.1ms and
  fuses with the gather consumer.

Exactness: plans are bit-identical to the NumPy builder
(:mod:`openscene_tpu.sparse.geometry`) — same offset order, same
spread-null formula (tested in tests/test_grid_geometry.py).  Scenes whose
bbox exceeds the static grid dims raise the builder's ``overflow`` flag and
the trainer re-runs the batch via the host path (runtime/distill.py), the
same contract as window-plan spill overflow.

Replaces the reference's MinkowskiEngine GPU coordinate-map hashing
(SURVEY.md §2.2; reference models/mink_unet.py:25-26 delegates to ME).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .types import ConvPlan, flip_permutation, stencil_offsets

PAD = 2  # grid border so |dx|,|dy| <= 2 probes never leave the array

# Default per-level grid extents (voxels): L0 sized for ~15m ScanNet scans
# at 2cm (768*0.02 = 15.4m) and 5.1m ceilings; halved per stride level.
DEFAULT_DIMS0 = (768, 768, 256)


def dims_for_level(level: int,
                   dims0: Tuple[int, int, int] = DEFAULT_DIMS0
                   ) -> Tuple[int, int, int]:
    """Grid extents for a stride level.

    A coarse extent is floor(max/2^l) - floor(min/2^l) + 1, which can exceed
    dims0>>l (e.g. min=1, max=dims0 at level 1): the exact bound is
    ceil((dims0-1)/2^l) + 1, so a scene that fits L0 NEVER spuriously
    overflows a coarser level."""
    if level == 0:
        return dims0
    q = 1 << level
    d = tuple(-(-(v - 1) // q) + 1 for v in dims0)
    return (max(d[0], 8), max(d[1], 8), max(d[2], 32))


class LevelGrid(NamedTuple):
    """Occupancy+rank row table of one level plus per-row query coords."""
    table: jnp.ndarray   # (R, 128) int32: lanes [0,64) words, [64,128) cum
    rowbase: jnp.ndarray  # (cap,) int32 = (b*nx_p + xs) * nyb
    ys: jnp.ndarray      # (cap,) int32 bbox-shifted y (>= PAD for valid)
    zs: jnp.ndarray      # (cap,) int32 bbox-shifted z (>= PAD for valid)
    valid: jnp.ndarray   # (cap,) bool
    overflow: jnp.ndarray  # () bool: some valid voxel outside the grid
    nzw: int             # z words per y
    lpy: int             # lanes per y = nzw + 1 (guard word, always 0)
    yb: int              # y values per table row
    nyb: int             # y blocks per (b, x) stripe


def build_level_grid(coords, num, n_scenes: int,
                     dims: Tuple[int, int, int]) -> LevelGrid:
    """Scatter one level's voxels into its bitmask row table (module doc)."""
    nx, ny, nz = dims
    nzw = (nz + 2 * PAD + 31) // 32
    lpy = nzw + 1                       # +1 zero guard word: the hi-word
    yb = 64 // lpy                      # extract at z top never wraps into
    assert yb >= 4, dims                # the next y's lane (yb>=4: k=5 ok)
    nx_p, ny_p = nx + 2 * PAD, ny + 2 * PAD
    nyb = -(-ny_p // yb)
    B = n_scenes
    c = coords.astype(jnp.int32)
    cap = c.shape[0]
    valid = jnp.arange(cap, dtype=jnp.int32) < num

    # per-scene bbox minima (big sentinel where a scene is empty), applied
    # with B-way selects — a (cap, B) one-hot matmul would lane-pad B to 128
    big = jnp.int32(1 << 20)
    b_col = c[:, 0]
    sx = jnp.zeros((cap,), jnp.int32)
    sy = jnp.zeros((cap,), jnp.int32)
    sz = jnp.zeros((cap,), jnp.int32)
    for i in range(B):
        in_i = valid & (b_col == i)
        mx = jnp.where(in_i, c[:, 1], big).min()
        my = jnp.where(in_i, c[:, 2], big).min()
        mz = jnp.where(in_i, c[:, 3], big).min()
        sx = jnp.where(in_i, mx, sx)
        sy = jnp.where(in_i, my, sy)
        sz = jnp.where(in_i, mz, sz)

    xs = jnp.where(valid, c[:, 1] - sx + PAD, PAD)
    ys = jnp.where(valid, c[:, 2] - sy + PAD, PAD)
    zs = jnp.where(valid, c[:, 3] - sz + PAD, PAD)
    b = jnp.where(valid, b_col, 0)
    over = valid & ((b_col < 0) | (b_col >= B) | (xs >= nx + PAD)
                    | (ys >= ny + PAD) | (zs >= nz + PAD))
    overflow = over.any()

    nwords = B * nx_p * ny_p * nzw
    flat = ((b * nx_p + xs) * ny_p + ys) * nzw + (zs >> 5)
    flat = jnp.where(valid & ~over, flat, nwords)     # dropped by the scatter
    # voxels are unique so each bit is added exactly once (add == or)
    words = jnp.zeros((nwords,), jnp.int32).at[flat].add(
        jnp.int32(1) << (zs & 31), mode="drop")
    pc = jax.lax.population_count(words)
    cum = jnp.cumsum(pc) - pc                                    # exclusive

    # repack into the (R, 128) row table: per (b, x, y-block) row, yb
    # y-values of lpy lanes each (z words + zero guard), words in lanes
    # [0, 64), matching exclusive ranks in [64, 128)
    def pack(a):
        a = a.reshape(B * nx_p, ny_p, nzw)
        a = jnp.pad(a, ((0, 0), (0, nyb * yb - ny_p), (0, 1)))
        a = a.reshape(B * nx_p * nyb, yb * lpy)
        return jnp.pad(a, ((0, 0), (0, 64 - yb * lpy)))

    table = jnp.concatenate([pack(words), pack(cum)], axis=1)
    return LevelGrid(table=table, rowbase=(b * nx_p + xs) * nyb,
                     ys=ys, zs=zs, valid=valid, overflow=overflow,
                     nzw=nzw, lpy=lpy, yb=yb, nyb=nyb)


def _extract(slab0, slab1, which, lane):
    """Data-dependent lane extract from two gathered row slabs.

    slab0/slab1: (cap, 128); which: (cap,) in {0,1} picks the slab; lane:
    (cap,) int32.  One-hot compare + masked row-sum (~1.1ms at cap0,
    measured dev_grid_rowgather) — never materializes a lane-padded
    (cap, small) array."""
    sel = jnp.arange(128, dtype=jnp.int32)[None, :] == lane[:, None]
    v0 = jnp.sum(jnp.where(sel, slab0, 0), axis=1)
    v1 = jnp.sum(jnp.where(sel, slab1, 0), axis=1)
    return jnp.where(which == 0, v0, v1)


def _dx_plane_hits(g: LevelGrid, dx: int, r: int, want_rows: bool):
    """All (dy, dz) in [-r, r]^2 hits of one dx-plane.

    Returns {(dy, dz): (exists bool (cap,), row int32 (cap,) or None)}.
    Exactly two aligned 128-lane row gathers per plane (a (2r+1)-wide
    y-window spans <= 2 y-blocks for yb >= 2r)."""
    assert g.yb >= 2 * r, (g.yb, r)
    blk0 = (g.ys - r) // g.yb
    row0 = g.rowbase + dx * g.nyb + blk0
    nrow = g.table.shape[0]
    s0 = jnp.take(g.table, jnp.clip(row0, 0, nrow - 1), axis=0)
    s1 = jnp.take(g.table, jnp.clip(row0 + 1, 0, nrow - 1), axis=0)
    w0 = (g.zs - r) >> 5
    out = {}
    for dy in range(-r, r + 1):
        yq = g.ys + dy
        blk = yq // g.yb
        li = (yq - blk * g.yb) * g.lpy + w0
        which = blk - blk0
        lo = _extract(s0, s1, which, li)
        hi = _extract(s0, s1, which, li + 1)     # guard lane: 0 at z top
        pclo = jax.lax.population_count(lo)
        cum0 = _extract(s0, s1, which, li + 64) if want_rows else None
        for dz in range(-r, r + 1):
            zq = g.zs + dz
            in0 = (zq >> 5) == w0
            bq = zq & 31
            word_q = jnp.where(in0, lo, hi)
            exists = ((word_q >> bq) & 1) == 1
            if want_rows:
                below = word_q & ((jnp.int32(1) << bq) - 1)
                row = (jnp.where(in0, cum0, cum0 + pclo)
                       + jax.lax.population_count(below))
                out[(dy, dz)] = (exists, row)
            else:
                out[(dy, dz)] = (exists, None)
    return out


def _null_rows(shape, num, cap: int):
    """geometry._spread_nulls, traced (same formula as geometry_device)."""
    pad = jnp.maximum(jnp.uint32(cap) - num.astype(jnp.uint32),
                      jnp.uint32(1))
    flat = jnp.arange(int(np.prod(shape)), dtype=jnp.uint32)
    flat = flat * jnp.uint32(2654435761)
    return (num.astype(jnp.int32)
            + (flat % pad).astype(jnp.int32)).reshape(shape)


def self_plan_from_grid(g: LevelGrid, num, kernel_size: int) -> ConvPlan:
    """Stride-1 stencil plan from the grid; bit-identical to
    geometry.build_self_plan / geometry_device.build_self_plan_device."""
    offsets = stencil_offsets(kernel_size)
    K = len(offsets)
    r = kernel_size // 2
    assert r <= PAD, kernel_size
    cap = g.rowbase.shape[0]
    nulls = _null_rows((K, cap), num, cap)
    rows_i = jnp.arange(cap, dtype=jnp.int32)
    fwd = [None] * K
    for dx in range(-r, r + 1):
        hits = _dx_plane_hits(g, dx, r, want_rows=True)
        for dy in range(-r, r + 1):
            for dz in range(-r, r + 1):
                k = ((dx + r) * (2 * r + 1) + (dy + r)) * (2 * r + 1) \
                    + (dz + r)
                if dx == 0 and dy == 0 and dz == 0:
                    fwd[k] = jnp.where(g.valid, rows_i, nulls[k])
                    continue
                exists, row = hits[(dy, dz)]
                fwd[k] = jnp.where(g.valid & exists,
                                   jnp.minimum(row, cap - 1), nulls[k])
    return ConvPlan(fwd=jnp.stack(fwd), flip_perm=flip_permutation(offsets))


def stem_and_self3_from_grid(g: LevelGrid, num, stem_kernel: int = 5
                             ) -> Tuple[jnp.ndarray, ConvPlan]:
    """(stem occupancy (K5, cap) bf16, k=3 ConvPlan) in one pass: the k=3
    plan's offsets are the interior of the stem's dx-planes, so its rows
    come from the same 2-per-plane row gathers (rank extracts only for
    |dx| <= 1)."""
    assert stem_kernel == 5, stem_kernel
    r5, r3 = 2, 1
    cap = g.rowbase.shape[0]
    K5 = (2 * r5 + 1) ** 3
    K3 = (2 * r3 + 1) ** 3
    nulls3 = _null_rows((K3, cap), num, cap)
    rows_i = jnp.arange(cap, dtype=jnp.int32)
    occ = [None] * K5
    fwd3 = [None] * K3
    for dx in range(-r5, r5 + 1):
        inner = abs(dx) <= r3
        hits = _dx_plane_hits(g, dx, r5, want_rows=inner)
        for dy in range(-r5, r5 + 1):
            for dz in range(-r5, r5 + 1):
                k5 = ((dx + r5) * 5 + (dy + r5)) * 5 + (dz + r5)
                exists, row = hits[(dy, dz)]
                occ[k5] = (g.valid & exists).astype(jnp.bfloat16) \
                    if not (dx == 0 and dy == 0 and dz == 0) \
                    else g.valid.astype(jnp.bfloat16)
                if inner and abs(dy) <= r3 and abs(dz) <= r3:
                    k3 = ((dx + r3) * 3 + (dy + r3)) * 3 + (dz + r3)
                    if dx == 0 and dy == 0 and dz == 0:
                        fwd3[k3] = jnp.where(g.valid, rows_i, nulls3[k3])
                    else:
                        fwd3[k3] = jnp.where(
                            g.valid & exists, jnp.minimum(row, cap - 1),
                            nulls3[k3])
    plan3 = ConvPlan(fwd=jnp.stack(fwd3),
                     flip_perm=flip_permutation(stencil_offsets(3)))
    return jnp.stack(occ), plan3


def stem_plan_and_self3_from_grid(g: LevelGrid, num, stem_kernel: int = 5
                                  ) -> Tuple[ConvPlan, ConvPlan]:
    """(k=5 ConvPlan, k=3 ConvPlan) in one pass, for the colored-input stem
    (input_color=True, where the stem is a real gather conv rather than the
    occupancy GEMM): the k=3 offsets are the interior of the stem's
    dx-planes, so both plans share the same 2-per-plane row gathers.
    Bit-identical to two separate self_plan_from_grid calls (the null rows
    depend only on (shape, num, cap))."""
    assert stem_kernel == 5, stem_kernel
    r5, r3 = 2, 1
    cap = g.rowbase.shape[0]
    K5 = (2 * r5 + 1) ** 3
    K3 = (2 * r3 + 1) ** 3
    nulls5 = _null_rows((K5, cap), num, cap)
    nulls3 = _null_rows((K3, cap), num, cap)
    rows_i = jnp.arange(cap, dtype=jnp.int32)
    fwd5 = [None] * K5
    fwd3 = [None] * K3
    for dx in range(-r5, r5 + 1):
        inner = abs(dx) <= r3
        hits = _dx_plane_hits(g, dx, r5, want_rows=True)
        for dy in range(-r5, r5 + 1):
            for dz in range(-r5, r5 + 1):
                k5 = ((dx + r5) * 5 + (dy + r5)) * 5 + (dz + r5)
                exists, row = hits[(dy, dz)]
                if dx == 0 and dy == 0 and dz == 0:
                    fwd5[k5] = jnp.where(g.valid, rows_i, nulls5[k5])
                else:
                    fwd5[k5] = jnp.where(g.valid & exists,
                                         jnp.minimum(row, cap - 1),
                                         nulls5[k5])
                if inner and abs(dy) <= r3 and abs(dz) <= r3:
                    k3 = ((dx + r3) * 3 + (dy + r3)) * 3 + (dz + r3)
                    if dx == 0 and dy == 0 and dz == 0:
                        fwd3[k3] = jnp.where(g.valid, rows_i, nulls3[k3])
                    else:
                        fwd3[k3] = jnp.where(
                            g.valid & exists, jnp.minimum(row, cap - 1),
                            nulls3[k3])
    plan5 = ConvPlan(fwd=jnp.stack(fwd5),
                     flip_perm=flip_permutation(stencil_offsets(5)))
    plan3 = ConvPlan(fwd=jnp.stack(fwd3),
                     flip_perm=flip_permutation(stencil_offsets(3)))
    return plan5, plan3
