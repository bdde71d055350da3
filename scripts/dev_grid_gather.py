"""Dev tool: on-chip A/B of grid slab-gather orientations (sparse/grid.py).

The grid prober's L0 query measured 14s vs the search path's 1.1s
(dev_profile_geo geo_prof6); the suspect is the TRANSPOSED gather
(`offset_dims=(0,1)` maps the 1.1M-index batch dim to the minor output
axis).  This times the candidate layouts in isolation on the cached bench
coords:

  t-gather     current: output (width, cap), batch dim minor
  n-gather     natural: output (cap, width), then explicit transpose
  f-gather     natural from FLAT 1-D operand (row*lanes+lane0 start)
  n-notr       natural, consumed column-wise without any transpose

Usage: python scripts/dev_grid_gather.py [--iters 4]
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
    print(f"# cap0 {caps.fixed[0]}, num={int(raw.num)}", flush=True)

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

    dims = gridmod.dims_for_level(0)
    build = jax.jit(lambda c, n: gridmod.build_level_grid(c, n, 8, dims))
    g = build(coords, num)
    nzw = g.nzw
    width = 5 * nzw
    print(f"# grid words {g.words.shape}, nzw={nzw}, width={width}",
          flush=True)

    # --- variant kernels: one dx-plane word-slab gather, reduced to force
    # materialization (sum over the slab -> (cap,) -> scalar)
    def t_gather(words, qrow, ys):
        s = gridmod._gather_slab_t(words, qrow, (ys - 2) * nzw, width)
        return s.sum()

    def n_gather(words, qrow, ys):
        idx = jnp.stack([qrow, (ys - 2) * nzw], axis=1).astype(jnp.int32)
        out = jax.lax.gather(
            words, idx,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(1, width),
            mode=jax.lax.GatherScatterMode.CLIP)      # (cap, 1, width)
        return out[:, 0].T.sum()

    def f_gather(words, qrow, ys):
        flat = words.reshape(-1)
        lanes = words.shape[1]
        start = qrow * lanes + (ys - 2) * nzw
        out = jax.lax.gather(
            flat, start[:, None].astype(jnp.int32),
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(width,),
            mode=jax.lax.GatherScatterMode.CLIP)      # (cap, width)
        return out.T.sum()

    def n_notr(words, qrow, ys):
        flat = words.reshape(-1)
        lanes = words.shape[1]
        start = qrow * lanes + (ys - 2) * nzw
        out = jax.lax.gather(
            flat, start[:, None].astype(jnp.int32),
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(width,),
            mode=jax.lax.GatherScatterMode.CLIP)
        # column-wise consume without transpose: emulate the select loop
        acc = jnp.zeros_like(qrow)
        for k in range(width):
            acc = acc + out[:, k]
        return acc.sum()

    def s_gather25(words, qrow, ys):
        # 25 separate scalar (cap,) gathers (one per (dx,dy) pair)
        flat = words.reshape(-1)
        lanes = words.shape[1]
        acc = jnp.zeros_like(qrow)
        for dx in range(-2, 3):
            for dy in range(-2, 3):
                idx = (qrow + dx) * lanes + (ys + dy) * nzw
                acc = acc + flat[jnp.clip(idx, 0, flat.shape[0] - 1)]
        return acc.sum()

    def b_gather25(words, qrow, ys):
        # one batched gather of 25*cap scalar indices
        flat = words.reshape(-1)
        lanes = words.shape[1]
        idxs = []
        for dx in range(-2, 3):
            for dy in range(-2, 3):
                idxs.append((qrow + dx) * lanes + (ys + dy) * nzw)
        idx = jnp.clip(jnp.stack(idxs), 0, flat.shape[0] - 1)
        return flat[idx].sum()

    def w2_gather(words, qrow, ys):
        # one (cap,) gather of 2-lane slices (w0, w0+1), one dx-plane row
        flat = words.reshape(-1)
        lanes = words.shape[1]
        start = qrow * lanes + ys * nzw
        out = jax.lax.gather(
            flat, start[:, None].astype(jnp.int32),
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(2,),
            mode=jax.lax.GatherScatterMode.CLIP)
        return out[:, 0].sum() + out[:, 1].sum()

    for name, fn in [("t-gather (current, batch-minor)", t_gather),
                     ("n-gather (natural + transpose)", n_gather),
                     ("f-gather (flat natural + transpose)", f_gather),
                     ("n-notr (flat natural, column reads)", n_notr),
                     ("s-gather25 (25x scalar (cap,))", s_gather25),
                     ("b-gather25 (one (25,cap) batched)", b_gather25),
                     ("w2-gather (2-lane slices, 1 plane)", w2_gather)]:
        f = jax.jit(fn)
        timeit(name, f, g.words, g.qrow, g.ys)


if __name__ == "__main__":
    main()
