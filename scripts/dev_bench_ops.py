"""Dev tool: per-op timing breakdown of the distill train step on TPU.

Builds (or loads from cache) the official bench batch, then times forward
and forward+backward of each sparse op at its real shapes:
  - stem occupancy GEMM (K=125, constant input)
  - per-level k=3 stencil convs (windowed Pallas vs XLA gather path)
  - per-edge k=2 s=2 down / up convs (XLA path today)
Timing protocol per CLAUDE.md: chain N dispatches, sync with a small host
read, subtract RTT (block_until_ready is a no-op through the axon tunnel).

Usage: python scripts/dev_bench_ops.py [--cache /tmp/bench_batch.pkl]
"""

import argparse
import pickle
import sys
import time
from os.path import exists

import numpy as np


def get_batch(cache):
    if exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)
    sys.path.insert(0, ".")
    import bench
    t0 = time.time()
    batch = bench.build_batch()
    print(f"# built bench batch in {time.time()-t0:.1f}s", file=sys.stderr)
    with open(cache, "wb") as f:
        pickle.dump(batch, f)
    return batch


def make_timer():
    import jax
    import jax.numpy as jnp
    probe = jax.jit(lambda a: a * 1.0)
    small = jnp.ones((8, 8))
    _ = float(np.asarray(probe(small)).sum())
    t = time.time()
    for _ in range(5):
        _ = float(np.asarray(probe(small)).sum())
    rtt = (time.time() - t) / 5

    def timeit(fn, args, iters=10):
        out = fn(*args)  # compile
        _sync(out)
        t = time.time()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        return (time.time() - t - rtt) / iters

    def _sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(np.asarray(leaf.reshape(-1)[0]))

    return timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="/tmp/bench_batch.pkl")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    batch = get_batch(args.cache)

    import jax
    import jax.numpy as jnp
    from openscene_tpu.sparse.ops import (sparse_conv, sparse_down_conv,
                                          sparse_up_conv)
    from openscene_tpu.sparse.pallas_conv import windowed_sparse_conv
    from openscene_tpu.models.sparse_unet import ARCHS

    geo = jax.tree_util.tree_map(jax.device_put, batch.geo)
    timeit = make_timer()
    a = ARCHS["MinkUNet18A"]

    caps = [l.cap for l in geo.levels]
    nums = [int(l.num) for l in geo.levels]
    print(f"# caps={caps} nums={nums}")

    key = jax.random.PRNGKey(0)

    def rand(shape, dtype=jnp.bfloat16):
        return jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)

    # channel shapes actually used per level (encoder block + decoder block)
    # encoder blocks: level i (1..4) convs are (planes[i-1], planes[i-1])
    # decoder blocks at level lvl: conv1 (up_out+skip, planes), conv2 (p, p)
    level_shapes = {0: [(96 + 32, 96), (96, 96)],
                    1: [(96 + 64, 96), (96, 96), (32, 32), (32, 32)],
                    2: [(128 + 128, 128), (128, 128), (64, 64), (64, 64)],
                    3: [(128 + 256, 128), (128, 128), (128, 128)],
                    4: [(256, 256), (256, 256)]}

    results = []
    for lvl in range(5):
        cap = caps[lvl]
        plan = geo.self3[lvl]
        wplan = geo.wplans[lvl] if len(geo.wplans) > lvl else None
        for (C, Cout) in level_shapes[lvl]:
            x = rand((cap, C))
            w = rand((27, C, Cout), jnp.float32)
            g = rand((cap, Cout))

            def xla_f(x, w):
                return sparse_conv(x, w, plan.fwd, plan.flip_perm)

            def xla_fb(x, w):
                def loss(x, w):
                    return (sparse_conv(x, w, plan.fwd, plan.flip_perm)
                            .astype(jnp.float32) * g.astype(jnp.float32)).sum()
                return jax.grad(loss, argnums=(0, 1))(x, w)

            t_f = timeit(jax.jit(xla_f), (x, w), args.iters)
            t_fb = timeit(jax.jit(xla_fb), (x, w), args.iters)
            row = f"L{lvl} conv {C:3d}x{Cout:3d} xla: f {t_f*1e3:7.2f}ms  f+b {t_fb*1e3:7.2f}ms"
            if wplan is not None:
                def win_f(x, w):
                    return windowed_sparse_conv(
                        x, w, plan.flip_perm, wplan.win_start, wplan.g0pack,
                        wplan.lidx, wplan.spill_tiles, wplan.spill_fwd)

                def win_fb(x, w):
                    def loss(x, w):
                        return (win_f(x, w).astype(jnp.float32)
                                * g.astype(jnp.float32)).sum()
                    return jax.grad(loss, argnums=(0, 1))(x, w)
                try:
                    t_wf = timeit(jax.jit(win_f), (x, w), args.iters)
                    t_wfb = timeit(jax.jit(win_fb), (x, w), args.iters)
                    row += f" | win: f {t_wf*1e3:7.2f}ms  f+b {t_wfb*1e3:7.2f}ms"
                except Exception as e:
                    row += f" | win: FAIL {type(e).__name__}: {str(e)[:80]}"
            print(row, flush=True)
            results.append(row)

    # down/up convs per edge
    enc_ch = [32, 32, 64, 128, 256]  # input channels of conv{i} at edge i-1
    dec_ch = [(256, 128), (128, 128), (128, 96), (96, 96)]
    for e in range(4):
        plan = geo.down[e]
        C = enc_ch[e + 1] if e < 4 else None
        Cin = enc_ch[e]
        x = rand((caps[e], enc_ch[e + 1] if False else enc_ch[e]))
        # conv{i}: inplanes -> inplanes at edge e: channels
        Cc = [32, 32, 64, 128][e]
        x = rand((caps[e], Cc))
        w = rand((8, Cc, Cc), jnp.float32)
        g = rand((caps[e + 1], Cc))

        def down_f(x, w):
            return sparse_down_conv(x, w, plan)

        def down_fb(x, w):
            def loss(x, w):
                return (sparse_down_conv(x, w, plan).astype(jnp.float32)
                        * g.astype(jnp.float32)).sum()
            return jax.grad(loss, argnums=(0, 1))(x, w)

        t_f = timeit(jax.jit(down_f), (x, w), args.iters)
        t_fb = timeit(jax.jit(down_fb), (x, w), args.iters)
        print(f"E{e} down {Cc:3d}x{Cc:3d}: f {t_f*1e3:7.2f}ms  f+b {t_fb*1e3:7.2f}ms",
              flush=True)

        # up conv at same edge (decoder): convtr{4+(3-e)}: (in, out)
        Cu_in, Cu_out = dec_ch[3 - e]
        xu = rand((caps[e + 1], Cu_in))
        wu = rand((8, Cu_in, Cu_out), jnp.float32)
        gu = rand((caps[e], Cu_out))

        def up_f(xu, wu):
            return sparse_up_conv(xu, wu, plan)

        def up_fb(xu, wu):
            def loss(xu, wu):
                return (sparse_up_conv(xu, wu, plan).astype(jnp.float32)
                        * gu.astype(jnp.float32)).sum()
            return jax.grad(loss, argnums=(0, 1))(xu, wu)

        t_f = timeit(jax.jit(up_f), (xu, wu), args.iters)
        t_fb = timeit(jax.jit(up_fb), (xu, wu), args.iters)
        print(f"E{e} up   {Cu_in:3d}x{Cu_out:3d}: f {t_f*1e3:7.2f}ms  f+b {t_fb*1e3:7.2f}ms",
              flush=True)

    # stem occupancy GEMM
    occ_plan = geo.stem
    w = rand((125, 3, 32), jnp.float32)
    num0 = geo.levels[0].num

    def stem_f(w):
        occ = (occ_plan.fwd < num0).astype(jnp.bfloat16)
        wsum = w.sum(axis=1)
        return jax.lax.dot_general(occ, wsum.astype(jnp.bfloat16),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    t_f = timeit(jax.jit(stem_f), (w,), args.iters)
    print(f"stem occupancy GEMM 125x3x32: f {t_f*1e3:7.2f}ms", flush=True)


if __name__ == "__main__":
    main()
