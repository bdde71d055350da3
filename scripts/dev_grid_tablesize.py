"""Dev tool: scalar-gather cost vs grid-table size (sparse/grid.py design).

dev_grid_gather measured ~20ms per (cap,)-scalar gather into the 171MB L0
grid, while the search path's reads into its 9MB key array look ~3-7ms.
Hypothesis: small tables get VMEM-staged.  Times the 25-scalar-gather probe
against grids built at shrinking dims, and prints the bench scenes' actual
bbox extents to pick the smallest safe static dims.

Usage: python scripts/dev_grid_tablesize.py [--iters 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    import bench
    from openscene_tpu.sparse import grid as gridmod

    raw, caps = bench.build_raw_cached()
    coords = jax.device_put(raw.coords)
    num = jax.device_put(raw.num.astype(np.int32))

    # actual per-scene extents (host side)
    c = np.asarray(raw.coords)[: int(raw.num)]
    for b in range(8):
        sc = c[c[:, 0] == b]
        if len(sc):
            ext = sc[:, 1:].max(0) - sc[:, 1:].min(0) + 1
            print(f"# scene {b}: extent {tuple(int(e) for e in ext)} "
                  f"({len(sc)} voxels)", flush=True)

    probe = jax.jit(lambda a: a * 1.0)
    small = jnp.ones((8, 8))
    _ = float(np.asarray(probe(small)).sum())
    t = time.time()
    for _ in range(5):
        _ = float(np.asarray(probe(small)).sum())
    rtt = (time.time() - t) / 5

    def timeit(name, fn, *a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf.reshape(-1)[:1])
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf.reshape(-1)[:1])
        dt = (time.time() - t0 - rtt) / args.iters
        print(f"{dt*1000:9.1f}ms  {name}", flush=True)
        return out

    nzw_cache = {}

    def run_dims(dims):
        g = jax.jit(lambda c_, n_: gridmod.build_level_grid(c_, n_, 8, dims)
                    )(coords, num)
        nzw = g.nzw
        mb = g.words.size * 4 / 1e6
        ov = bool(np.asarray(g.overflow))

        def s_gather25(words, qrow, ys):
            flat = words.reshape(-1)
            lanes = words.shape[1]
            acc = jnp.zeros_like(qrow)
            for dx in range(-2, 3):
                for dy in range(-2, 3):
                    idx = (qrow + dx) * lanes + (ys + dy) * nzw
                    acc = acc + flat[jnp.clip(idx, 0, flat.shape[0] - 1)]
            return acc.sum()

        f = jax.jit(s_gather25)
        timeit(f"s-gather25 dims={dims} table={mb:.0f}MB overflow={ov}",
               f, g.words, g.qrow, g.ys)

    for dims in [(768, 768, 256), (512, 512, 192), (384, 384, 128),
                 (256, 256, 96), (128, 128, 64)]:
        run_dims(dims)


if __name__ == "__main__":
    main()
