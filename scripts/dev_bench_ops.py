"""Dev tool: per-op timing breakdown of the distill train step on TPU.

Loads the cached bench coords (/tmp/bench_coords.npz; rebuild with
scripts/dev_make_bench_coords.py), builds the FULL geometry on device via
sparse/geometry_device.py (uploads ~21MB instead of ~2.5GB of host plans),
then times forward and forward+backward of each sparse op at its real
shapes:
  - per-level k=3 stencil convs (windowed Pallas vs XLA gather path)
  - per-edge k=2 s=2 down / up convs (XLA path today)
  - stem occupancy GEMM; the on-device geometry build itself
Timing protocol per CLAUDE.md: chain N dispatches, sync with a small host
read, subtract RTT (block_until_ready is a no-op through the axon tunnel).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    def _sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(np.asarray(leaf.reshape(-1)[0]))

    def timeit(fn, args, iters=10):
        out = fn(*args)  # compile
        _sync(out)
        t = time.time()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        return (time.time() - t - rtt) / iters

    return timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coords", default="/tmp/bench_coords.npz")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--levels", default="0,1,2,3,4")
    ap.add_argument("--skip_xla", action="store_true")
    ap.add_argument("--skip_edges", action="store_true")
    ap.add_argument("--skip_build_timing", action="store_true")
    args = ap.parse_args()

    d = np.load(args.coords)
    coords_h, num = d["coords"], int(d["num"])

    import jax
    import jax.numpy as jnp
    from openscene_tpu.sparse.geometry import (GeometryCaps, _bucket,
                                               _pad_level, level_counts)
    from openscene_tpu.sparse.geometry_device import build_geometry_parts
    from openscene_tpu.sparse.ops import (sparse_conv, sparse_down_conv,
                                          sparse_up_conv)
    from openscene_tpu.sparse.pallas_conv import windowed_sparse_conv

    counts = level_counts(coords_h)
    caps_t = tuple(_bucket(c) for c in counts)
    level0 = _pad_level(coords_h, caps_t[0])
    print(f"# caps={caps_t} counts={counts}", flush=True)

    coords_d = jax.device_put(level0.coords)
    num_d = jax.device_put(np.int32(num))
    timeit = make_timer()

    @jax.jit
    def build(coords, n):
        geo, ov = build_geometry_parts(coords, n, caps_t, windows=True,
                                       stem_occupancy=True, n_scenes=8)
        return geo, ov

    t0 = time.time()
    geo, ov = build(coords_d, num_d)
    jax.tree_util.tree_leaves(geo)[0].block_until_ready()
    print(f"# geometry build compile+first: {time.time()-t0:.1f}s "
          f"overflow={bool(ov)}", flush=True)
    if not args.skip_build_timing:
        t_build = timeit(build, (coords_d, num_d), args.iters)
        print(f"on-device geometry build (windows+occ): {t_build*1e3:7.1f}ms",
              flush=True)

    key = jax.random.PRNGKey(0)

    def rand(shape, dtype=jnp.bfloat16):
        return jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)

    level_shapes = {0: [(96 + 32, 96), (96, 96)],
                    1: [(96 + 64, 96), (96, 96), (32, 32)],
                    2: [(128 + 128, 128), (128, 128), (64, 64)],
                    3: [(128 + 256, 128), (128, 128)],
                    4: [(256, 256)]}

    levels = [int(v) for v in args.levels.split(",")]
    for lvl in levels:
        cap = caps_t[lvl]
        plan = geo.self3[lvl]
        wplan = geo.wplans[lvl]
        for (C, Cout) in level_shapes[lvl]:
            x = rand((cap, C))
            w = rand((27, C, Cout), jnp.float32)
            g = rand((cap, Cout))

            # closures over device arrays bake them into the HLO as
            # constants and blow the remote-compile body limit at L0 —
            # everything big goes in as an argument
            fp = plan.flip_perm

            def xla_f(x, w, fwd):
                return sparse_conv(x, w, fwd, fp)

            def xla_fb(x, w, fwd, g):
                def loss(x, w):
                    return (sparse_conv(x, w, fwd, fp)
                            .astype(jnp.float32)
                            * g.astype(jnp.float32)).sum()
                return jax.grad(loss, argnums=(0, 1))(x, w)

            if args.skip_xla:
                row = f"L{lvl} conv {C:3d}x{Cout:3d}"
            else:
                t_f = timeit(jax.jit(xla_f), (x, w, plan.fwd), args.iters)
                t_fb = timeit(jax.jit(xla_fb), (x, w, plan.fwd, g),
                              args.iters)
                row = (f"L{lvl} conv {C:3d}x{Cout:3d} xla: f {t_f*1e3:7.2f}ms  "
                       f"f+b {t_fb*1e3:7.2f}ms")
            if wplan is not None:
                wargs = (wplan.win_start, wplan.lidx,
                         wplan.spill_ent, wplan.spill_fwd)

                def win_f(x, w, *wa):
                    return windowed_sparse_conv(x, w, fp, *wa)

                def win_fb(x, w, g, *wa):
                    def loss(x, w):
                        return (windowed_sparse_conv(x, w, fp, *wa)
                                .astype(jnp.float32)
                                * g.astype(jnp.float32)).sum()
                    return jax.grad(loss, argnums=(0, 1))(x, w)
                try:
                    t_wf = timeit(jax.jit(win_f), (x, w) + wargs, args.iters)
                    t_wfb = timeit(jax.jit(win_fb), (x, w, g) + wargs,
                                   args.iters)
                    row += (f" | win: f {t_wf*1e3:7.2f}ms  "
                            f"f+b {t_wfb*1e3:7.2f}ms")
                except Exception as e:
                    row += f" | win FAIL {type(e).__name__}: {str(e)[:70]}"
            print(row, flush=True)

    # down/up convs per edge (channels of MinkUNet18A)
    if args.skip_edges:
        return
    down_ch = [32, 32, 64, 128]           # conv{i} in=out channels at edge
    up_ch = [(128, 128), (128, 128), (128, 96), (96, 96)]
    # decoder convtr(7-e) maps level e+1 -> e with (in, out):
    up_ch = {3: (256, 128), 2: (128, 128), 1: (128, 96), 0: (96, 96)}
    for e in range(4):
        plan = geo.down[e]
        Cc = down_ch[e]
        x = rand((caps_t[e], Cc))
        w = rand((8, Cc, Cc), jnp.float32)
        g = rand((caps_t[e + 1], Cc))

        def down_f(x, w, plan):
            return sparse_down_conv(x, w, plan)

        def down_fb(x, w, plan, g):
            def loss(x, w):
                return (sparse_down_conv(x, w, plan).astype(jnp.float32)
                        * g.astype(jnp.float32)).sum()
            return jax.grad(loss, argnums=(0, 1))(x, w)

        t_f = timeit(jax.jit(down_f), (x, w, plan), args.iters)
        t_fb = timeit(jax.jit(down_fb), (x, w, plan, g), args.iters)
        row = (f"E{e} down {Cc:3d}x{Cc:3d}: f {t_f*1e3:7.2f}ms  "
               f"f+b {t_fb*1e3:7.2f}ms")
        ewp = geo.ewplans[e] if len(geo.ewplans) > e else None
        if ewp is not None:
            from openscene_tpu.sparse.pallas_edge import windowed_down_conv

            def wdown_f(x, w, *pa):
                return windowed_down_conv(x, w, *pa)

            def wdown_fb(x, w, g, *pa):
                def loss(x, w):
                    return (windowed_down_conv(x, w, *pa)
                            .astype(jnp.float32)
                            * g.astype(jnp.float32)).sum()
                return jax.grad(loss, argnums=(0, 1))(x, w)
            try:
                t_wf = timeit(jax.jit(wdown_f), (x, w) + tuple(ewp),
                              args.iters)
                t_wfb = timeit(jax.jit(wdown_fb), (x, w, g) + tuple(ewp),
                               args.iters)
                row += (f" | win: f {t_wf*1e3:7.2f}ms  "
                        f"f+b {t_wfb*1e3:7.2f}ms")
            except Exception as ex:
                row += f" | win FAIL {type(ex).__name__}: {str(ex)[:70]}"
        print(row, flush=True)

        Cu_in, Cu_out = up_ch[e]
        xu = rand((caps_t[e + 1], Cu_in))
        wu = rand((8, Cu_in, Cu_out), jnp.float32)
        gu = rand((caps_t[e], Cu_out))

        def up_f(xu, wu, plan):
            return sparse_up_conv(xu, wu, plan)

        def up_fb(xu, wu, plan, gu):
            def loss(xu, wu):
                return (sparse_up_conv(xu, wu, plan).astype(jnp.float32)
                        * gu.astype(jnp.float32)).sum()
            return jax.grad(loss, argnums=(0, 1))(xu, wu)

        t_f = timeit(jax.jit(up_f), (xu, wu, plan), args.iters)
        t_fb = timeit(jax.jit(up_fb), (xu, wu, plan, gu), args.iters)
        row = (f"E{e} up   {Cu_in:3d}x{Cu_out:3d}: f {t_f*1e3:7.2f}ms  "
               f"f+b {t_fb*1e3:7.2f}ms")
        if ewp is not None:
            from openscene_tpu.sparse.pallas_edge import windowed_up_conv

            def wup_f(xu, wu, *pa):
                return windowed_up_conv(xu, wu, *pa)

            def wup_fb(xu, wu, gu, *pa):
                def loss(xu, wu):
                    return (windowed_up_conv(xu, wu, *pa)
                            .astype(jnp.float32)
                            * gu.astype(jnp.float32)).sum()
                return jax.grad(loss, argnums=(0, 1))(xu, wu)
            try:
                t_wf = timeit(jax.jit(wup_f), (xu, wu) + tuple(ewp),
                              args.iters)
                t_wfb = timeit(jax.jit(wup_fb), (xu, wu, gu) + tuple(ewp),
                               args.iters)
                row += (f" | win: f {t_wf*1e3:7.2f}ms  "
                        f"f+b {t_wfb*1e3:7.2f}ms")
            except Exception as ex:
                row += f" | win FAIL {type(ex).__name__}: {str(ex)[:70]}"
        print(row, flush=True)

    # stem occupancy GEMM from device-built occupancy
    w = rand((125, 3, 32), jnp.float32)
    occ = geo.stem_occ

    def stem_f(w, occ):
        wsum = w.sum(axis=1)
        return jax.lax.dot_general(occ.astype(jnp.bfloat16),
                                   wsum.astype(jnp.bfloat16),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    t_f = timeit(jax.jit(stem_f), (w, occ), args.iters)
    print(f"stem occupancy GEMM 125x3x32: f {t_f*1e3:7.2f}ms", flush=True)


if __name__ == "__main__":
    main()
