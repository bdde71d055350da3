"""Dense occupancy-grid stencil probing for the on-device geometry builder.

The r3 geometry build spent ~1.1s of its 1.4s in `geometry_device`'s
24-column searchsorted pass at cap0 (measured, scripts/dev_profile_geo.py):
every (row, stencil-column) query costs ~4 irregular HBM reads through the
128-ary pivot tree plus anchor gathers, and XLA prices every irregular read
at ~12ns regardless of width.

This module replaces the per-column searches with a dense bitmask grid +
rank (popcount-prefix) structure, the classic succinct-set trade:

* **Build** (per level): scatter one bit per voxel into a static
  ``(B, nx_p, ny_p, nzw)`` uint32 grid (z packed 32/word, per-scene bbox
  offsets so scenes share one static shape), then one exclusive cumsum of
  per-word popcounts.  Because the grid's (b, x, y, z) traversal order IS
  the batch's lex sort order (data/batch.py), the rank of a set bit is
  exactly its voxel's global row index — no sorting, no searching.
* **Query**: for an output row and stencil offset (dx, dy, dz):
  ``exists`` = bit test at the target cell, ``row`` = cum[word] +
  popcount(bits below).  One gathered (2r+1, nzw, 2) slab per (row, dx)
  serves ALL (dy, dz) offsets of that dx-plane — 5 slab gathers per row
  answer the whole k=5 stem (124 neighbor offsets) AND the k=3 self plan,
  vs 24 tree searches + 24 anchor gathers before.

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

from typing import NamedTuple, Optional, Tuple

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
    return (max(dims0[0] >> level, 8), max(dims0[1] >> level, 8),
            max(dims0[2] >> level, 32))


class LevelGrid(NamedTuple):
    """Occupancy+rank grid of one level plus per-row query coordinates."""
    A2: jnp.ndarray      # (B*nx_p*ny_p, nzw*2) int32 [word, cum] interleave
    qrow: jnp.ndarray    # (cap,) int32 row of (b, xs, ys) in A2
    zs: jnp.ndarray      # (cap,) int32 bbox-shifted z (>= PAD for valid)
    valid: jnp.ndarray   # (cap,) bool
    overflow: jnp.ndarray  # () bool: some valid voxel outside the grid
    ny_p: int
    nzw: int


def build_level_grid(coords, num, n_scenes: int,
                     dims: Tuple[int, int, int]) -> LevelGrid:
    """Scatter one level's voxels into its bitmask grid (see module doc)."""
    nx, ny, nz = dims
    nzw = (nz + 2 * PAD + 31) // 32
    nx_p, ny_p = nx + 2 * PAD, ny + 2 * PAD
    B = n_scenes
    c = coords.astype(jnp.int32)
    cap = c.shape[0]
    valid = jnp.arange(cap, dtype=jnp.int32) < num

    # per-scene bbox minima (big sentinel where a scene is empty)
    big = jnp.int32(1 << 20)
    onehot = (c[:, 0][None, :] == jnp.arange(B, dtype=jnp.int32)[:, None]
              ) & valid[None, :]                                  # (B, cap)
    masked = jnp.where(onehot[:, None, :], c[:, 1:].T[None], big)
    mins = masked.min(axis=2)                                     # (B, 3)
    sel = onehot.T.astype(jnp.int32)                              # (cap, B)
    shift = sel @ mins                                            # (cap, 3)

    xs = jnp.where(valid, c[:, 1] - shift[:, 0] + PAD, PAD)
    ys = jnp.where(valid, c[:, 2] - shift[:, 1] + PAD, PAD)
    zs = jnp.where(valid, c[:, 3] - shift[:, 2] + PAD, PAD)
    b = jnp.where(valid, c[:, 0], 0)
    over = valid & ((c[:, 0] < 0) | (c[:, 0] >= B) | (xs >= nx + PAD)
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
    A2 = jnp.stack([words, cum], axis=-1).reshape(B * nx_p * ny_p, nzw * 2)
    qrow = (b * nx_p + xs) * ny_p + ys
    return LevelGrid(A2=A2, qrow=qrow, zs=zs, valid=valid,
                     overflow=overflow, ny_p=ny_p, nzw=nzw)


def _gather_slabs(A2, rows0, nrows: int):
    """(cap,) start rows -> (cap, nrows, nzw*2) contiguous-row slabs.

    One multi-row gather per probe: XLA prices a gather by its index count
    (~12ns each), so fetching all 2r+1 dy rows of a dx-plane in one slab is
    ~(2r+1)x cheaper than per-(dx,dy) row gathers.  CLIP keeps padded rows'
    garbage indices in-bounds (their results are masked by ``valid``)."""
    return jax.lax.gather(
        A2, rows0[:, None].astype(jnp.int32),
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,)),
        slice_sizes=(nrows, A2.shape[1]),
        mode=jax.lax.GatherScatterMode.CLIP)


def _dx_plane_hits(g: LevelGrid, dx: int, r: int, want_rows: bool,
                   slab=None, srows: Optional[int] = None):
    """All (dy, dz) in [-r, r]^2 hits of one dx-plane.

    Returns {(dy, dz): (exists bool (cap,), row int32 (cap,) or None)}.
    ``slab``/``srows``: reuse a wider already-gathered slab (the k=5 stem's
    5-row slab contains the k=3 plan's 3 rows)."""
    nzw = g.nzw
    if slab is None:
        srows = 2 * r + 1
        slab = _gather_slabs(g.A2, g.qrow + dx * g.ny_p - r, srows)
    slab = slab.reshape(slab.shape[0], srows, nzw, 2)
    pad = (srows - (2 * r + 1)) // 2
    words, cums = slab[..., 0], slab[..., 1]
    out = {}
    for j in range(2 * r + 1):
        wj, cj = words[:, j + pad, :], cums[:, j + pad, :]
        # the dz in [-r, r] targets live in words w0 / w0+1 (2r+1 <= 32)
        w0 = (g.zs - r) >> 5
        lanes = jnp.arange(nzw, dtype=jnp.int32)[None, :]
        sel0 = lanes == w0[:, None]
        sel1 = lanes == (w0 + 1)[:, None]
        lo = jnp.sum(jnp.where(sel0, wj, 0), axis=1)
        hi = jnp.sum(jnp.where(sel1, wj, 0), axis=1)
        cum0 = jnp.sum(jnp.where(sel0, cj, 0), axis=1)
        pclo = jax.lax.population_count(lo)
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
                out[(j - r, dz)] = (exists, row)
            else:
                out[(j - r, dz)] = (exists, None)
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
    cap = g.qrow.shape[0]
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
    """(stem occupancy (K5, cap) bf16, k=3 ConvPlan) sharing one set of
    5-row slab gathers: the k=3 plan's (dx, dy) in [-1,1]^2 windows are
    interior rows of the stem's 5-row dx-plane slabs."""
    assert stem_kernel == 5, stem_kernel
    r5, r3 = 2, 1
    cap = g.qrow.shape[0]
    K5 = (2 * r5 + 1) ** 3
    K3 = (2 * r3 + 1) ** 3
    nulls3 = _null_rows((K3, cap), num, cap)
    rows_i = jnp.arange(cap, dtype=jnp.int32)
    occ = [None] * K5
    fwd3 = [None] * K3
    for dx in range(-r5, r5 + 1):
        srows = 2 * r5 + 1
        slab = _gather_slabs(g.A2, g.qrow + dx * g.ny_p - r5, srows)
        inner = abs(dx) <= r3
        hits = _dx_plane_hits(g, dx, r5, want_rows=inner, slab=slab,
                              srows=srows)
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
