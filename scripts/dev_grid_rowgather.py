"""Dev tool: aligned 128-lane row-gather cost vs table size, plus the
dynamic-lane extract pattern the rowpack grid design needs.

geometry_device._lower_bound's `jnp.take(a3, idx, axis=0)` row gathers from
its 4.4MB (nb, 128) key table look ~7ms per cap-sized gather; dev_grid_gather
showed unaligned narrow slices cost ~20ms per LANE.  If aligned full-row
gathers stay fast at 78-350MB tables, the grid can pack a whole (b, x,
y-block) probe row into 128 lanes and answer a k=5 dx-plane with 2 gathers.

Measures, for (N, 128) i32 tables of several sizes:
  row-gather       out = table[idx] for (cap,) random idx
  row-gather+ex15  same + 15 dynamic-lane one-hot extracts (the per-plane
                   consume pattern: 5 dy x (lo, hi, cum) lanes)

Usage: python scripts/dev_grid_rowgather.py [--iters 4]
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

    cap = 1115648
    rng = np.random.default_rng(0)

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

    def row_gather(table, idx):
        return jnp.take(table, idx, axis=0).sum()

    def row_gather_ex15(table, idx, lanes):
        slab = jnp.take(table, idx, axis=0)          # (cap, 128)
        onehot_base = jnp.arange(128, dtype=jnp.int32)[None, :]
        acc = jnp.zeros((cap,), jnp.int32)
        for e in range(15):
            lane = (lanes + e * 7) % 128             # data-dependent lane
            sel = onehot_base == lane[:, None]
            acc = acc + jnp.sum(jnp.where(sel, slab, 0), axis=1)
        return acc.sum()

    for n_rows in [8704, 40960, 159744, 716800]:
        mb = n_rows * 128 * 4 / 1e6
        table = jnp.asarray(
            rng.integers(0, 1 << 30, (n_rows, 128), dtype=np.int32))
        idx = jnp.asarray(
            rng.integers(0, n_rows, (cap,), dtype=np.int32))
        lanes = jnp.asarray(rng.integers(0, 128, (cap,), dtype=np.int32))
        f1 = jax.jit(row_gather)
        timeit(f"row-gather       ({mb:6.0f}MB table)", f1, table, idx)
        f2 = jax.jit(row_gather_ex15)
        timeit(f"row-gather+ex15  ({mb:6.0f}MB table)", f2, table, idx,
               lanes)


if __name__ == "__main__":
    main()
