"""Multi-device batch assembly: one padded scene-batch per device, stacked on
a leading axis and sharded over the mesh's ``data`` axis.

All per-device batches must share identical capacities (one compiled program);
we build each device's batch, take the max bucket per level, and rebuild with
fixed caps.  Production training would calibrate a fixed schedule once per
dataset instead of the rebuild.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import numpy as np

from ..sparse.geometry import GeometryCaps, _bucket
from .batch import DistillBatch, assemble_distill_batch
from .loaders import SceneSample


def stack_batches(batches: Sequence):
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)


def fixed_caps_from_counts(counts_per_level: Sequence[int],
                           margin: float = 0.06,
                           extra: int = 32) -> GeometryCaps:
    """Bucketed per-level caps with headroom over observed counts.

    The margin covers count drift the calibration pass cannot see — the
    per-batch random global coordinate shift changes coarse-level voxel
    counts (floor(c/2) grouping depends on shift parity), typically by a
    few percent."""
    fixed = tuple(_bucket(int(n * (1.0 + margin)) + extra)
                  for n in counts_per_level)
    return GeometryCaps(cap0=fixed[0], fixed=fixed)


def merge_caps(a: GeometryCaps, b: GeometryCaps) -> GeometryCaps:
    """Elementwise max of two fixed-cap schedules (caps only ever grow)."""
    fixed = tuple(max(x, y) for x, y in zip(a.fixed, b.fixed))
    return GeometryCaps(cap0=fixed[0], fixed=fixed)


def _grow_raw(raw, cap0: int):
    """Re-pad a RawDistillBatch's level-0 arrays to a larger shared cap0
    (coords keep the sentinel fill; features/mask zero; labels 255)."""
    pad = cap0 - raw.coords.shape[0]
    if pad == 0:
        return raw
    assert pad > 0, (cap0, raw.coords.shape)

    def grow(a, fill):
        width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, width, constant_values=fill)

    return raw._replace(coords=grow(raw.coords, 2 ** 20),
                        feats=grow(raw.feats, 0),
                        feat_3d=grow(raw.feat_3d, 0),
                        mask=grow(raw.mask, 0),
                        labels=grow(raw.labels, 255))


def assemble_sharded_raw_batches(
        per_device_samples: Sequence[Sequence[SceneSample]], dim: int,
        rng: Optional[np.random.Generator] = None,
        caps: Optional[GeometryCaps] = None):
    """-> (stacked RawDistillBatch with leading device axis, shared caps).

    Each device's batch is assembled independently (its own random shift,
    like per-rank dataloaders under DDP); the per-device cap schedules are
    merged to one shared schedule (caps only ever grow) so a single
    device-geometry program shape serves every shard, and the level-0
    arrays are re-padded to the shared cap0."""
    from .batch import assemble_raw_distill_batch

    rng = rng if rng is not None else np.random.default_rng()
    raws, merged = [], caps
    for s in per_device_samples:
        raw, merged = assemble_raw_distill_batch(s, dim, caps=merged, rng=rng)
        raws.append(raw)
    raws = [_grow_raw(r, merged.fixed[0]) for r in raws]
    return stack_batches(raws), merged


def assemble_sharded_distill_batches(
        per_device_samples: Sequence[Sequence[SceneSample]], dim: int,
        rng: Optional[np.random.Generator] = None,
        caps: Optional[GeometryCaps] = None):
    """-> stacked DistillBatch with leading device axis."""
    rng = rng if rng is not None else np.random.default_rng()
    if caps is None:
        trial = [assemble_distill_batch(s, dim, rng=np.random.default_rng(0),
                                        shift=False, windows=False)
                 for s in per_device_samples]
        caps = fixed_caps_from_counts(tuple(
            max(int(t.geo.levels[l].num) for t in trial) for l in range(5)))
    # windows=False: per-batch measured spill buckets would be RAGGED
    # across the device axis (the device-geometry path — the mesh default —
    # builds uniform static plans in-jit instead)
    batches = [assemble_distill_batch(s, dim, caps=caps, rng=rng,
                                      windows=False)
               for s in per_device_samples]
    return stack_batches(batches), caps


def assemble_sharded_seg_batches(
        per_device_samples: Sequence[Sequence[SceneSample]],
        rng: Optional[np.random.Generator] = None,
        caps: Optional[GeometryCaps] = None):
    """-> stacked SegBatch with leading device axis (supervised trainer's
    DDP equivalent; windows=False — see assemble_sharded_distill_batches)."""
    from .batch import assemble_seg_batch

    rng = rng if rng is not None else np.random.default_rng()
    if caps is None:
        trial = [assemble_seg_batch(s, rng=np.random.default_rng(0),
                                    shift=False, windows=False)
                 for s in per_device_samples]
        caps = fixed_caps_from_counts(tuple(
            max(int(t.geo.levels[l].num) for t in trial) for l in range(5)))
    batches = [assemble_seg_batch(s, caps=caps, rng=rng, shift=True,
                                  windows=False)
               for s in per_device_samples]
    return stack_batches(batches), caps
