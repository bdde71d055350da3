#!/usr/bin/env python
"""ONE command from a published reference checkpoint to an mIoU table.

The day the published artifacts are reachable
(/root/reference/config/scannet/ours_openseg_pretrained.yaml ``model_path``
+ fused features), this runs the whole parity drill offline-validated here:

    python scripts/eval_reference_checkpoint.py ckpt.pth.tar \
        --config configs/scannet/eval_openseg.yaml \
        --modes distill,ensemble,fusion [key value overrides...]

Steps (each previously validated on synthetic ME-format fixtures):
1. **Region-order probe** (utils/convert_checkpoint.probe_region_order):
   converts the checkpoint under both candidate ME kernel-region orders and
   keeps the one whose distill outputs cosine-align with the fused 2D
   features on a probe scene (the first val scene by default).  The wrong
   order spatially scrambles every 27-tap kernel, so the decision is a
   large-margin argmax; aborts if the margin is under --min-margin.
   Skipped when --region-order / cfg.region_order pins it.
2. **Conversion** (runtime/evaluate.load_model_for_eval): torch/ME state
   dict -> functional pytree, ``module.`` prefixes stripped.
3. **Zero-shot eval** per requested mode (runtime/evaluate.ZeroShotEvaluator
   — sharded across available devices when data_parallel is set): the
   reference protocol incl. repeats, ensemble rule and metric sentinels.
4. Prints the mIoU table to freeze as the parity anchor (north star: match
   the reference within 0.5 mIoU, BASELINE.md).
"""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _probe_inputs(cfg):
    """First val scene + its fused blob from the config's data roots."""
    import numpy as np

    from openscene_tpu.data.scene_io import (list_scenes,
                                             load_fused_features,
                                             load_scene, scene_name)
    paths = list_scenes(cfg.data_root, cfg.split or "val")
    if not paths:
        paths = list_scenes(cfg.data_root, "")
    assert paths, f"no scenes under {cfg.data_root}"
    scene = paths[0]
    name = scene_name(scene, cfg.data_root)
    blobs = sorted(glob(join(cfg.data_root_2d_fused_feature, name + "*")))
    assert blobs, (f"no fused blob for probe scene {name} under "
                   f"{cfg.data_root_2d_fused_feature}")
    coords, _, _ = load_scene(scene)
    blob = load_fused_features(blobs[0])
    feat, mask_full = blob["feat"], blob["mask_full"].astype(bool)
    full = np.zeros((len(coords), feat.shape[1]), np.float32)
    full[mask_full] = feat.astype(np.float32)
    return coords, full, mask_full


def run_drill(ckpt: str, cfg, modes, region_order: str = "",
              min_margin: float = 0.05, text_features=None,
              allow_pseudo_text: bool = False):
    """Probe -> convert -> eval each mode; returns {mode: results dict}."""
    import openscene_tpu.runtime.evaluate as E
    from openscene_tpu.utils.convert_checkpoint import (load_torch_checkpoint,
                                                        probe_region_order)

    cfg = cfg.copy(model_path=ckpt)
    order = region_order or cfg.region_order
    if not order:
        sd = load_torch_checkpoint(ckpt)
        coords, full, mask_full = _probe_inputs(cfg)
        order, scores = probe_region_order(sd, cfg.arch_3d, coords, full,
                                           mask_full,
                                           voxel_size=cfg.voxel_size)
        ranked = sorted(scores.values(), reverse=True)
        margin = ranked[0] - ranked[1]
        print(f"# region-order probe: {scores} -> {order} "
              f"(margin {margin:.4f})")
        if margin < min_margin:
            raise SystemExit(
                f"region-order probe margin {margin:.4f} < {min_margin}: "
                "refusing to pick a side; pass --region-order explicitly")
    cfg = cfg.copy(region_order=order)

    table = {}
    params = state = None
    for mode in modes:
        mcfg = cfg.copy(feature_type=mode)
        if mode != "fusion" and params is None:
            params, state = E.load_model_for_eval(mcfg)
        ev = E.ZeroShotEvaluator(mcfg,
                                 None if mode == "fusion" else params,
                                 None if mode == "fusion" else state,
                                 text_features=text_features,
                                 allow_pseudo_text=allow_pseudo_text)
        table[mode] = ev.run()
    return order, table


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="reference *.pth(.tar)")
    ap.add_argument("--config", required=True)
    ap.add_argument("--modes", default="distill,ensemble,fusion")
    ap.add_argument("--region-order", default="",
                    help="skip the probe and pin x_fastest / z_fastest")
    ap.add_argument("--min-margin", type=float, default=0.05)
    ap.add_argument("overrides", nargs="*", help="cfg 'key value' pairs")
    args = ap.parse_args(argv)

    from openscene_tpu.config import load_config
    cfg = load_config(args.config, tuple(args.overrides))
    order, table = run_drill(args.checkpoint, cfg,
                             [m.strip() for m in args.modes.split(",")],
                             region_order=args.region_order,
                             min_margin=args.min_margin)
    print(f"\n# parity table ({args.checkpoint}, region_order={order})")
    print(f"{'mode':<10} {'mIoU':>8}")
    for mode, res in table.items():
        print(f"{mode:<10} {res['miou']:>8.4f}")


if __name__ == "__main__":
    main()
