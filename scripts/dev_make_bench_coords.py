"""Dev tool: materialize the bench batch's coords to /tmp/bench_coords.npz
(the input of dev_bench_ops.py / dev_window_stats.py).

Prefers the committed bench cache (out/bench_cache/raw_v*.npz) — the same
deterministic 8-scene batch the official bench measures — and falls back to
rebuilding it from the synthetic generators (slow: ~170s host assembly on
this box)."""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/bench_coords.npz"


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    caches = sorted(glob.glob(os.path.join(repo, "out", "bench_cache",
                                           "raw_v*.npz")))
    if caches:
        z = np.load(caches[-1])
        num = int(z["num"])
        coords = z["coords"][:num]
        print(f"# from {caches[-1]}: {num} voxels")
    else:
        import bench
        raw, _ = bench.build_raw_cached()
        num = int(raw.num)
        coords = raw.coords[:num]
        print(f"# rebuilt: {num} voxels")
    np.savez(OUT, coords=coords, num=np.int64(num))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
