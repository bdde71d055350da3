#!/usr/bin/env python
"""One-command ME region-order decision for reference checkpoints.

The published OpenScene checkpoints store MinkowskiEngine conv kernels as a
(K, C_in, C_out) stack whose K axis follows ME's kernel-region iteration
order, which cannot be verified offline (no ME install / no network here —
see openscene_tpu/utils/convert_checkpoint.py docstring). The day a real
checkpoint + one real scene are available, this is the whole procedure:

    python scripts/decide_region_order.py ckpt.pth.tar scene.npz feats.npz

It converts the checkpoint under BOTH candidate orders, runs the model on
the scene, and reports the distill cosine alignment per order. A trained
model only aligns with its fused-2D targets under the physically correct
order (the wrong one spatially scrambles every 27-tap kernel), so the
decision is a large-margin argmax; the script exits nonzero if the margin
is under --min-margin (default 0.05) so an ambiguous probe can't silently
pick a side.

The permutation algebra itself is pinned offline by
tests/fixtures/region_order_golden.npz + tests/test_convert_checkpoint.py
(dense torch-conv3d goldens for both orders), so the only open question a
real checkpoint answers is which order ME used — one command, no judgment
calls.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="reference *.pth.tar")
    ap.add_argument("scene", help="preprocessed scene .npz (coords/colors/labels)")
    ap.add_argument("features", help="fused 2D-feature .npz for the scene")
    ap.add_argument("--arch", default="MinkUNet18A")
    ap.add_argument("--voxel-size", type=float, default=0.02)
    ap.add_argument("--min-margin", type=float, default=0.05,
                    help="required |cos(best) - cos(other)| to decide")
    args = ap.parse_args(argv)

    import numpy as np

    from openscene_tpu.data.scene_io import load_fused_features, load_scene
    from openscene_tpu.utils.convert_checkpoint import (
        load_torch_checkpoint, probe_region_order)

    sd = load_torch_checkpoint(args.checkpoint)
    coords, _, _ = load_scene(args.scene)
    feat, mask_full = load_fused_features(args.features)
    full = np.zeros((len(coords), feat.shape[1]), np.float32)
    full[mask_full] = feat.astype(np.float32)
    best, scores = probe_region_order(sd, args.arch, coords, full, mask_full,
                                      voxel_size=args.voxel_size)
    ranked = sorted(scores.values(), reverse=True)
    margin = ranked[0] - ranked[1]
    print(f"scores: {scores}")
    print(f"decision: region_order={best} (margin {margin:.4f})")
    if margin < args.min_margin:
        print(f"AMBIGUOUS: margin {margin:.4f} < {args.min_margin}; "
              "probe another scene or a different checkpoint", file=sys.stderr)
        return 1
    print("convert with:\n  python -m openscene_tpu.utils.convert_checkpoint "
          f"{args.checkpoint} out/model.ckpt --arch {args.arch} "
          f"--region_order {best}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
