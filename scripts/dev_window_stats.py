"""Dev analysis: window-span statistics of the bench geometry.

Answers two design questions from the round-2 perf push:
1. Could the stride-1 windowed kernels use WIN=256 instead of 512 (halving
   crossbar passes)? -> per-tile, per-dx-class span distribution + spill
   fraction at WIN=256/384/512.
2. Could the k=2 s=2 down/up convs use a windowed kernel? -> for each
   128-parent output tile, the span of child rows feeding it.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openscene_tpu.sparse.geometry import (GeometryCaps, _bucket,
                                           build_unet_geometry, level_counts)
from openscene_tpu.sparse.types import stencil_offsets

TILE = 128


def span_stats(fwd, num, cap, kernel_size=3):
    K = fwd.shape[0]
    offsets = stencil_offsets(kernel_size)
    k_class = (offsets[:, 0] - offsets[:, 0].min()).astype(np.int32)
    ntiles = cap // TILE
    f = fwd.reshape(K, ntiles, TILE)
    valid = f < num
    spans = []
    for c in range(int(k_class.max()) + 1):
        ks = np.flatnonzero(k_class == c)
        big = np.where(valid[ks], f[ks], np.iinfo(np.int32).max)
        mn = big.min(axis=(0, 2))
        mn = np.where(mn == np.iinfo(np.int32).max, 0, mn)
        start = (mn // 128) * 128
        mx = np.where(valid[ks], f[ks], -1).max(axis=(0, 2))
        spans.append(np.where(mx >= 0, mx - start + 1, 0))
    return np.stack(spans)  # (NCLASS, ntiles)


def main():
    d = np.load("/tmp/bench_coords.npz")
    coords, num = d["coords"], int(d["num"])
    counts = level_counts(coords)
    caps = tuple(_bucket(c) for c in counts)
    geo = build_unet_geometry(coords, caps=GeometryCaps(cap0=caps[0],
                                                        fixed=caps),
                              build_windows=False)
    for l in range(5):
        fwd = geo.self3[l].fwd
        n = int(geo.levels[l].num)
        cap = geo.levels[l].cap
        s = span_stats(fwd, n, cap)
        smax = s.max(axis=0)  # worst class per tile
        q = np.percentile(smax, [50, 90, 99, 99.9])
        print(f"L{l}: span p50/p90/p99/p99.9 = {q.astype(int)}; "
              f"spill@256 {100*(smax > 256).mean():.2f}% "
              f"spill@384 {100*(smax > 384).mean():.2f}% "
              f"spill@512 {100*(smax > 512).mean():.2f}%", flush=True)

    # down-conv child-window spans per parent tile
    for e in range(4):
        plan = geo.down[e]
        parent_cap = geo.levels[e + 1].cap
        n_parent = int(geo.levels[e + 1].num)
        child_num = int(geo.levels[e].num)
        ntiles = parent_cap // TILE
        f = plan.fwd.reshape(8, ntiles, TILE)
        valid = f < child_num
        big = np.where(valid, f, np.iinfo(np.int32).max)
        mn = big.min(axis=(0, 2))
        mn = np.where(mn == np.iinfo(np.int32).max, 0, mn)
        mx = np.where(valid, f, -1).max(axis=(0, 2))
        span = np.where(mx >= 0, mx - (mn // 128) * 128 + 1, 0)
        q = np.percentile(span, [50, 90, 99])
        print(f"E{e} down: child-span p50/p90/p99 = {q.astype(int)}; "
              f">2048: {100*(span > 2048).mean():.2f}% "
              f">4096: {100*(span > 4096).mean():.2f}%", flush=True)


if __name__ == "__main__":
    main()
