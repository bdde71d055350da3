"""Dev analysis: PER-CLASS window-span statistics of the bench geometry.

The windowed stencil kernel pays one crossbar pass per (offset, 128-row
group); the dx=0 class's row spans are much tighter than the dx=+-1 classes
(dy/dz neighbors live within the same x-plane).  This measures, per level
and per dx class, the spill fraction at window sizes 128/256/384/512 to
decide a per-class static window length (center class G=2 halves 9 of 27
offsets' gather passes).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openscene_tpu.sparse.geometry import (GeometryCaps, _bucket,
                                           build_unet_geometry, level_counts)
from openscene_tpu.sparse.types import stencil_offsets

TILE = 128


def per_class_spans(fwd, num, cap, kernel_size=3):
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
        s = per_class_spans(fwd, n, cap)
        live = int(np.ceil(n / TILE))
        for c, name in enumerate(("dx=-1", "dx= 0", "dx=+1")):
            sc = s[c][:live]
            q = np.percentile(sc, [50, 90, 99]).astype(int)
            print(f"L{l} {name}: p50/p90/p99 = {q}; spill "
                  f"@128 {100*(sc > 128).mean():5.2f}% "
                  f"@256 {100*(sc > 256).mean():5.2f}% "
                  f"@384 {100*(sc > 384).mean():5.2f}% "
                  f"@512 {100*(sc > 512).mean():5.2f}%", flush=True)


if __name__ == "__main__":
    main()
