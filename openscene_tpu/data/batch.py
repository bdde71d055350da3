"""Batch assembly: scenes -> static-shape device-ready buffers + geometry.

This is the collation layer (reference ``collation_fn[_eval_all]``,
dataset/feature_loader.py:191-233) redesigned for TPU:

* scenes are concatenated with a batch column, then **spatially lex-sorted**
  (batch, x, y, z) so every conv gather has monotonic, local indices — the
  property the Pallas windowed-gather kernel exploits;
* everything is padded to geometric capacity buckets (static shapes);
* fused features are scattered into a (cap0, D) buffer at their voxel rows so
  the distill loss is a masked elementwise reduction;
* for eval, per-point reconstruction indices are remapped through the sort
  permutation and padded to their own bucket.

The train-time per-batch random global coordinate shift
(``coords[:,1:4] += rand(3)*100``, run/distill.py:315) is applied here.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from ..sparse.geometry import GeometryCaps, _bucket, build_unet_geometry
from ..sparse.types import UNetGeometry
from .loaders import SceneSample


class DistillBatch(NamedTuple):
    geo: UNetGeometry
    feats: np.ndarray      # (cap0, 3) float32 input features
    feat_3d: np.ndarray    # (cap0, D) float16 fused target features (storage
    # dtype, fusion_util.py:87; cast to compute dtype on device)
    mask: np.ndarray       # (cap0,) float32 1.0 where a fused target exists
    labels: np.ndarray     # (cap0,) int32 voxel labels (for debug/val viz)
    num_voxels: int


class RawDistillBatch(NamedTuple):
    """Host-light batch: geometry is built ON DEVICE inside the train step
    (sparse/geometry_device.py), so the host ships only the level-0 buffers
    (~25MB for a 1.3M-voxel batch instead of ~1GB of prebuilt plans)."""
    coords: np.ndarray     # (cap0, 4) int32 lex-sorted, sentinel-padded
    num: np.ndarray        # () int32 valid voxels
    feats: np.ndarray      # (cap0, 3)
    feat_3d: np.ndarray    # (cap0, D)
    mask: np.ndarray       # (cap0,)
    labels: np.ndarray     # (cap0,) int32


class EvalBatch(NamedTuple):
    geo: UNetGeometry
    feats: np.ndarray       # (cap0, 3)
    feat_3d: np.ndarray     # (cap0, D) fused features at voxels
    mask: np.ndarray        # (cap0,) voxel has fused feature
    labels: np.ndarray      # (ocap,) ORIGINAL per-point labels (255-padded)
    inds_reconstruct: np.ndarray  # (ocap,) voxel row per original point
    num_points: int
    num_voxels: int


class SegBatch(NamedTuple):
    """Supervised segmentation batch (train_mink path)."""
    geo: UNetGeometry
    feats: np.ndarray
    labels: np.ndarray      # (cap0,) int32, 255 at padding
    num_voxels: int
    inds_reconstruct: Optional[np.ndarray] = None
    point_labels: Optional[np.ndarray] = None
    num_points: int = 0


def _concat_sort(samples: Sequence[SceneSample], shift: Optional[np.ndarray]):
    """Concat scenes with batch ids, apply global shift, lex-sort spatially.

    Returns (sorted coords (N,4), perm, inv_perm, scene voxel offsets)."""
    coords_list = []
    offsets = [0]
    for b, s in enumerate(samples):
        c = np.concatenate(
            [np.full((len(s.coords), 1), b, dtype=np.int64),
             s.coords.astype(np.int64)], axis=1)
        coords_list.append(c)
        offsets.append(offsets[-1] + len(c))
    coords = np.concatenate(coords_list)
    if shift is not None:
        coords[:, 1:] += shift.astype(np.int64)
    perm = np.lexsort((coords[:, 3], coords[:, 2], coords[:, 1], coords[:, 0]))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return coords[perm], perm, inv, np.asarray(offsets)


def assemble_distill_batch(samples: Sequence[SceneSample], dim: int,
                           caps: Optional[GeometryCaps] = None,
                           rng: Optional[np.random.Generator] = None,
                           shift: bool = True,
                           windows: Optional[bool] = None) -> DistillBatch:
    """``windows=False`` skips Pallas window plans — REQUIRED when batches
    from different scene sets are stacked along a device axis (sharded
    host-geometry paths): spill-bucket sizes are measured per batch, so
    stacked plans would be ragged."""
    rng = rng if rng is not None else np.random.default_rng()
    sh = np.floor(rng.random(3) * 100).astype(np.int64) if shift else None
    coords, perm, inv, offs = _concat_sort(samples, sh)
    n = len(coords)
    geo = build_unet_geometry(coords, caps=caps or GeometryCaps.for_count(n),
                              build_windows=windows)
    cap0 = geo.levels[0].cap

    feats = np.zeros((cap0, 3), dtype=np.float32)
    # fp16 end to end: fused features are STORED fp16 (reference
    # fusion_util.py:87) and this host lacks fast fp16 conversion (software
    # astype measured ~10MB/s) — never widen on the host, cast on device
    feat_3d = np.zeros((cap0, dim), dtype=np.float16)
    mask = np.zeros(cap0, dtype=np.float32)
    labels = np.full(cap0, 255, dtype=np.int32)
    feats[:n] = np.concatenate([s.feats for s in samples])[perm]
    labels[:n] = np.concatenate([s.labels for s in samples])[perm]
    for b, s in enumerate(samples):
        rows = inv[offs[b] + np.flatnonzero(s.feat_mask)]
        feat_3d[rows] = s.feat_3d
        mask[rows] = 1.0
    return DistillBatch(geo=geo, feats=feats, feat_3d=feat_3d, mask=mask,
                        labels=labels, num_voxels=n)


def assemble_raw_distill_batch(samples: Sequence[SceneSample], dim: int,
                               caps: Optional[GeometryCaps] = None,
                               rng: Optional[np.random.Generator] = None,
                               shift: bool = True):
    """Concat/sort/pad/scatter ONLY — no kernel maps (the device builds
    them inside the train step). Returns (RawDistillBatch, level_caps).

    With ``caps=None`` a fixed schedule is derived from this batch's actual
    level counts (cheap: 5 np.unique passes) with shift-drift headroom;
    the bucket ladder keeps the number of distinct compiled signatures
    small."""
    from ..sparse.geometry import _pad_level, level_counts

    rng = rng if rng is not None else np.random.default_rng()
    sh = np.floor(rng.random(3) * 100).astype(np.int64) if shift else None
    coords, perm, inv, offs = _concat_sort(samples, sh)
    n = len(coords)
    # exact post-shift level counts (5 np.unique passes, ~0.5s/1M voxels)
    # merged into the running schedule: caps only ever grow, so the device
    # builder can never overflow a level cap
    counts = level_counts(coords)
    prev = caps.fixed if caps is not None else (0,) * len(counts)
    # grow only the levels whose count no longer fits (one row reserved for
    # the null target): tight externally-calibrated schedules (e.g. the
    # multichip dryrun's 256-granular caps) must pass through untouched
    fixed = tuple(p if c < p else max(p, _bucket(c))
                  for p, c in zip(prev, counts))
    caps = GeometryCaps(cap0=fixed[0], fixed=fixed)
    cap0 = caps.cap_for(0, n)
    level0 = _pad_level(coords, cap0)

    feats = np.zeros((cap0, 3), dtype=np.float32)
    feat_3d = np.zeros((cap0, dim), dtype=np.float16)  # fp16 end to end
    mask = np.zeros(cap0, dtype=np.float32)
    labels = np.full(cap0, 255, dtype=np.int32)
    feats[:n] = np.concatenate([s.feats for s in samples])[perm]
    labels[:n] = np.concatenate([s.labels for s in samples])[perm]
    for b, s in enumerate(samples):
        rows = inv[offs[b] + np.flatnonzero(s.feat_mask)]
        feat_3d[rows] = s.feat_3d
        mask[rows] = 1.0
    return RawDistillBatch(coords=level0.coords, num=np.int32(n),
                           feats=feats, feat_3d=feat_3d, mask=mask,
                           labels=labels), caps


def assemble_eval_batch(samples: Sequence[SceneSample], dim: int,
                        caps: Optional[GeometryCaps] = None,
                        point_cap: Optional[int] = None,
                        need_model: bool = True,
                        windows: Optional[bool] = None) -> EvalBatch:
    """``need_model=False`` (fusion-mode eval) skips kernel-map construction
    entirely — only the level-0 padding/reconstruction is needed.
    ``windows=False`` skips Pallas window plans (required when batches are
    stacked along a device axis — measured spill buckets are ragged)."""
    from ..sparse.geometry import _pad_level
    from ..sparse.types import UNetGeometry

    coords, perm, inv, offs = _concat_sort(samples, None)
    n = len(coords)
    if need_model:
        geo = build_unet_geometry(coords,
                                  caps=caps or GeometryCaps.for_count(n),
                                  build_windows=windows)
    else:
        caps = caps or GeometryCaps.for_count(n)
        level0 = _pad_level(coords, caps.cap_for(0, n))
        geo = UNetGeometry(levels=(level0,), stem=None, self3=(),
                           down=(), wplans=())
    cap0 = geo.levels[0].cap

    feats = np.zeros((cap0, 3), dtype=np.float32)
    feats[:n] = np.concatenate([s.feats for s in samples])[perm]
    feat_3d = np.zeros((cap0, dim), dtype=np.float16)  # fp16 end to end
    mask = np.zeros(cap0, dtype=np.float32)
    if samples[0].feat_3d is not None:
        feat_3d[:n] = np.concatenate(
            [np.asarray(s.feat_3d, dtype=np.float16) for s in samples])[perm]
        mask[:n] = np.concatenate([s.feat_mask for s in samples])[perm]

    pts = np.concatenate([s.labels for s in samples])
    n_pts = len(pts)
    ocap = point_cap or _bucket(n_pts)
    labels = np.full(ocap, 255, dtype=np.int32)
    labels[:n_pts] = pts
    inds = np.full(ocap, cap0 - 1, dtype=np.int32)  # padding -> null voxel
    inds[:n_pts] = np.concatenate(
        [inv[offs[b] + s.inds_reconstruct] for b, s in enumerate(samples)])
    return EvalBatch(geo=geo, feats=feats, feat_3d=feat_3d, mask=mask,
                     labels=labels, inds_reconstruct=inds, num_points=n_pts,
                     num_voxels=n)


def assemble_seg_batch(samples: Sequence[SceneSample],
                       caps: Optional[GeometryCaps] = None,
                       rng: Optional[np.random.Generator] = None,
                       shift: bool = False, eval_all: bool = False,
                       point_cap: Optional[int] = None,
                       windows: Optional[bool] = None) -> SegBatch:
    rng = rng if rng is not None else np.random.default_rng()
    sh = np.floor(rng.random(3) * 100).astype(np.int64) if shift else None
    coords, perm, inv, offs = _concat_sort(samples, sh)
    n = len(coords)
    geo = build_unet_geometry(coords, caps=caps or GeometryCaps.for_count(n),
                              build_windows=windows)
    cap0 = geo.levels[0].cap
    feats = np.zeros((cap0, 3), dtype=np.float32)
    feats[:n] = np.concatenate([s.feats for s in samples])[perm]
    labels = np.full(cap0, 255, dtype=np.int32)
    if not eval_all:
        labels[:n] = np.concatenate([s.labels for s in samples])[perm]
        return SegBatch(geo=geo, feats=feats, labels=labels, num_voxels=n)
    vox_labels = np.full(cap0, 255, dtype=np.int32)
    pts = np.concatenate([s.labels for s in samples])
    n_pts = len(pts)
    ocap = point_cap or _bucket(n_pts)
    plabels = np.full(ocap, 255, dtype=np.int32)
    plabels[:n_pts] = pts
    inds = np.full(ocap, cap0 - 1, dtype=np.int32)
    inds[:n_pts] = np.concatenate(
        [inv[offs[b] + s.inds_reconstruct] for b, s in enumerate(samples)])
    return SegBatch(geo=geo, feats=feats, labels=vox_labels, num_voxels=n,
                    inds_reconstruct=inds, point_labels=plabels,
                    num_points=n_pts)
