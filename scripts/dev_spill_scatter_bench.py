"""Dev tool: row- vs tile-granular spill scatter/gather + BN sweep variants.

Motivates the r5 spill-machinery change: every spill entry covers ONE whole
128-row tile, so the correction scatter-add (pallas_conv.py:666/732,
pallas_edge.py:724/751/785/829) and the xr tile gather can index at tile
granularity — 128x fewer scatter/gather indices on an index-bound op.
Also times masked BN moments two-pass (mean, then centered^2) vs one-sweep
(sum, sum of squares fused into one read of x).

Timing protocol per CLAUDE.md: chain dispatches, sync via a tiny host read,
subtract tunnel RTT.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    TILE = 128
    CAP = 1_118_208 // (4 * TILE) * (4 * TILE)  # L0-ish, MTILE*TILE granular
    C = 96
    SE = 384
    KC = 9
    rng = np.random.default_rng(0)

    probe = jax.jit(lambda a: a * 1.0)
    small = jnp.ones((8, 8))
    _ = float(np.asarray(probe(small)).sum())
    t = time.time()
    for _ in range(5):
        _ = float(np.asarray(probe(small)).sum())
    rtt = (time.time() - t) / 5
    print(f"rtt {rtt*1e3:.1f}ms  cap {CAP}  C {C}  SE {SE}")

    def timeit(name, fn, args, iters=10):
        out = fn(*args)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]))
        t = time.time()
        for _ in range(iters):
            out = fn(*args)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]))
        dt = (time.time() - t - rtt) / iters
        print(f"{name:34s} {dt*1e3:8.2f} ms")
        return dt

    ntiles = CAP // TILE
    tiles_np = rng.choice(ntiles, size=SE, replace=False).astype(np.int32)
    out = jnp.asarray(rng.standard_normal((CAP, C)), dtype=jnp.float32)
    sp = jnp.asarray(rng.standard_normal((SE * TILE, C)), dtype=jnp.float32)
    tiles = jnp.asarray(tiles_np)
    rows = jnp.asarray(
        (tiles_np[:, None] * TILE + np.arange(TILE)[None, :]).reshape(-1))
    fwd = jnp.asarray(rng.integers(0, CAP, size=(SE, KC, TILE)),
                      dtype=jnp.int32)
    xb = out.astype(jnp.bfloat16)

    @jax.jit
    def row_scatter(o, r, s):
        return o.at[r].add(s)

    @jax.jit
    def tile_scatter(o, tl, s):
        o3 = o.reshape(-1, TILE, C)
        return o3.at[tl].add(s.reshape(-1, TILE, C)).reshape(-1, C)

    @jax.jit
    def row_take(x, r):
        return jnp.take(x, r, axis=0).sum()

    @jax.jit
    def tile_take(x, tl):
        return jnp.take(x.reshape(-1, TILE, C), tl, axis=0).sum()

    @jax.jit
    def im2col_take(x, f):
        return jnp.take(x, f.reshape(-1), axis=0).sum()

    a = timeit("scatter-add rows (SE*128 idx)", row_scatter, (out, rows, sp))
    b = timeit("scatter-add tiles (SE idx)", tile_scatter, (out, tiles, sp))
    timeit("take rows (SE*128 idx)", row_take, (xb, rows))
    timeit("take tiles (SE idx)", tile_take, (xb, tiles))
    timeit("im2col take (SE*KC*128 idx)", im2col_take, (xb, fwd))
    print(f"scatter speedup {a/b:.1f}x")

    # BN moment sweeps at L0 scale
    mask = jnp.asarray((rng.random((CAP, 1)) < 0.97).astype(np.float32))
    xbn = xb
    n = jnp.float32(CAP * 0.97)

    @jax.jit
    def bn_two_pass(x, m):
        xf = x.astype(jnp.float32)
        mean = (xf * m).sum(0) / n
        c = (xf - mean) * m
        var = (c * c).sum(0) / n
        return mean, var

    @jax.jit
    def bn_one_sweep(x, m):
        xf = x.astype(jnp.float32)
        xm = xf * m
        s1 = xm.sum(0)
        s2 = (xm * xf).sum(0)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        return mean, var

    t2 = timeit("BN moments two-pass", bn_two_pass, (xbn, mask))
    t1 = timeit("BN moments one-sweep", bn_one_sweep, (xbn, mask))
    m2, v2 = [np.asarray(v) for v in bn_two_pass(xbn, mask)]
    m1, v1 = [np.asarray(v) for v in bn_one_sweep(xbn, mask)]
    print(f"BN speedup {t2/t1:.2f}x  |dmean| {np.abs(m1-m2).max():.3e} "
          f"|dvar| {np.abs(v1-v2).max():.3e}")


if __name__ == "__main__":
    main()
