#!/usr/bin/env python
"""Regenerate the synthetic smoke-test dataset tree (data/synthetic by
default) consumed by configs/synthetic/smoke.yaml.

The tree is NOT committed (it is ~400 MB of fabricated scenes); run this
once per checkout before using the smoke config:

    python scripts/make_synthetic_data.py

Layout produced (loader-compatible, see openscene_tpu/data/loaders.py):
    <root>/scannet_3d/{train,val}/scene*.npz
    <root>/scannet_multiview/scene*_{k}.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from openscene_tpu.data.synthetic import build_synthetic_dataset  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/synthetic")
    ap.add_argument("--n_train", type=int, default=2)
    ap.add_argument("--n_val", type=int, default=2)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--density", type=float, default=3000.0,
                    help="points per m^2 of surface (~150k pts/scene at 3000)")
    ap.add_argument("--chunks", type=int, default=2,
                    help="random-chunk feature files per train scene")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    d3, dfeat = build_synthetic_dataset(
        args.root, n_train=args.n_train, n_val=args.n_val, dim=args.dim,
        density=args.density, num_rand_file_per_scene=args.chunks,
        seed=args.seed)
    print(f"wrote {d3} and {dfeat}")


if __name__ == "__main__":
    main()
