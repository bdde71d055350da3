#!/usr/bin/env python
"""Open-vocabulary scene query tool.

Replaces the reference demo's GAPS `osview` + clip_server pair
(demo/run_demo, demo/clip_server.py): given saved per-point OpenScene
features (the `.npy` files written by the evaluator with
``save_feature_as_numpy``) and a free-text query, computes per-point cosine
similarity to the query's CLIP text embedding and writes a heat-colored
`.ply` (and optional similarity `.npy`).

    python demo/query.py --features out/saved_feature/scene0_feat.npy \
        --points scene0.npz --query "a sofa in a scene" --out sofa.ply
"""

import argparse
import sys
from os.path import dirname, join

sys.path.insert(0, join(dirname(__file__), ".."))

import numpy as np


def heat_colors(sim: np.ndarray) -> np.ndarray:
    """Similarity -> blue..red heat colormap in [0,1]."""
    s = (sim - sim.min()) / (np.ptp(sim) + 1e-9)
    return np.stack([s, 0.2 + 0.3 * s * (1 - s), 1.0 - s], axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--features", required=True,
                    help=".npy per-point feature matrix (N, D)")
    ap.add_argument("--points", required=True,
                    help="scene file (.npz/.pth) with matching point coords")
    ap.add_argument("--query", required=True, help="free-text query")
    ap.add_argument("--out", default="query_heat.ply")
    ap.add_argument("--save_sim", default="")
    ap.add_argument("--extractor", default="openseg")
    ap.add_argument("--threshold", type=float, default=None,
                    help="only color points with similarity above this")
    ap.add_argument("--allow_pseudo_text", action="store_true")
    args = ap.parse_args()

    from openscene_tpu.data.scene_io import load_scene
    from openscene_tpu.text import extract_text_features
    from openscene_tpu.utils.ply import write_ply_points

    feats = np.load(args.features).astype(np.float32)
    coords, colors, _ = load_scene(args.points)
    assert len(coords) == len(feats), (len(coords), len(feats))

    emb = extract_text_features([args.query], extractor=args.extractor,
                                prompt_eng=False, cache_dir="",
                                allow_pseudo=args.allow_pseudo_text)[0]
    fn = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-9)
    sim = fn @ emb

    if args.save_sim:
        np.save(args.save_sim, sim)
    heat = heat_colors(sim)
    if args.threshold is not None:
        base = (colors + 1) / 2 * 0.4
        mask = sim >= args.threshold
        heat = np.where(mask[:, None], heat, base)
        print(f"{mask.sum()}/{len(sim)} points above threshold")
    write_ply_points(args.out, coords, heat)
    print(f"query '{args.query}': similarity [{sim.min():.3f}, "
          f"{sim.max():.3f}], wrote {args.out}")


if __name__ == "__main__":
    main()
