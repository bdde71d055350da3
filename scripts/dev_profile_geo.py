"""Dev tool: phase-level time breakdown of the ON-DEVICE geometry build.

The trainer's host-light step builds the whole UNet geometry inside its jit
(sparse/geometry_device.py); at bench scale that build costs ~1.7s against a
~1.2s train step.  This tool times each phase as its own jit on the cached
bench coords so optimization effort lands where the milliseconds are:

  hierarchy   4x build_down_edge_device (lax.sort-dominated)
  stem_occ    k=5 stem occupancy + column probes (24-column _lower_bound)
  self3       5x build_self_plan_device (L0 reuses the stem probes)
  wplans      per-level window plans (scatter/cumsum heavy)
  ewplans     per-edge window plans
  full        build_geometry_parts (the real fused program)

Timing uses the N-dispatch + final host sync trick (block_until_ready is a
no-op through the axon tunnel); RTT is measured and subtracted.

Usage: python scripts/dev_profile_geo.py [--iters 4]
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
    from openscene_tpu.sparse import geometry_device as gd

    raw, caps = bench.build_raw_cached()
    coords = jax.device_put(raw.coords)
    num = jax.device_put(raw.num.astype(np.int32))
    capst = caps.fixed
    print(f"# caps {capst}, num={int(raw.num)}", flush=True)

    # RTT probe
    probe = jax.jit(lambda a: a * 1.0)
    small = jnp.ones((8, 8))
    _ = float(np.asarray(probe(small)).sum())
    t = time.time()
    for _ in range(5):
        _ = float(np.asarray(probe(small)).sum())
    rtt = (time.time() - t) / 5

    def timeit(name, fn, *a):
        out = fn(*a)                      # compile + warm
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

    # ---- hierarchy: chained down edges ----
    @jax.jit
    def hierarchy(coords, num):
        levels = [(coords, num)]
        downs = []
        for l in range(4):
            coarse, plan = gd.build_down_edge_device(
                levels[l][0], levels[l][1], capst[l + 1])
            levels.append((coarse.coords, coarse.num))
            downs.append(plan)
        return tuple(levels), tuple(downs)

    levels, downs = timeit("hierarchy (4x down edge)", hierarchy, coords, num)
    levels = jax.tree_util.tree_map(lambda x: x, levels)

    # per-level down edge
    for l in range(4):
        f = jax.jit(lambda c, n, cap=capst[l + 1]:
                    gd.build_down_edge_device(c, n, cap))
        timeit(f"  down edge L{l} (cap {capst[l]})", f, levels[l][0],
               levels[l][1])

    # ---- stem occupancy + probes (cols list is static: compute it here) ----
    from openscene_tpu.sparse.types import stencil_offsets
    cols = sorted({(int(dx), int(dy))
                   for dx, dy, _ in stencil_offsets(5).tolist()
                   if (dx, dy) != (0, 0)})

    @jax.jit
    def stem(coords, num):
        occ, (_, parr) = gd.build_stem_occupancy_device(coords, num, 5,
                                                        return_probes=True)
        return occ, parr

    occ_probes = timeit("stem occupancy (k=5 + probes)", stem, coords, num)
    _, l0_parr = occ_probes

    # stem sub-phases
    @jax.jit
    def stem_zmask(coords, num):
        kh, kl, _ = gd._keys_of(coords, num)
        return gd._zmask(kh, kl, num)

    timeit("  stem: zmask only", stem_zmask, coords, num)

    @jax.jit
    def stem_search(coords, num):
        kh, kl, _ = gd._keys_of(coords, num)
        dhi = np.array([c[0] for c in cols], np.int32)
        dlo = np.array([c[1] * (1 << 16) - 2 for c in cols], np.int32)
        ph = kh[None, :] + jnp.asarray(dhi)[:, None]
        pl = kl[None, :] + jnp.asarray(dlo)[:, None]
        return gd._lower_bound(kh, kl, ph.reshape(-1), pl.reshape(-1))

    timeit("  stem: 24-col _lower_bound only", stem_search, coords, num)

    @jax.jit
    def stem_probes(coords, num):
        kh, kl, _ = gd._keys_of(coords, num)
        return gd._column_probes(kh, kl, num, cols, 2)

    timeit("  stem: _column_probes (search+anchors+zmask)", stem_probes,
           coords, num)

    # ---- self3 plans ----
    @jax.jit
    def self3_l0(coords, num, parr):
        return gd.build_self_plan_device(coords, num, 3,
                                         shared_probes=(cols, parr))

    s3 = [timeit("self3 L0 (shared probes)", self3_l0, coords, num,
                 l0_parr)]
    for l in range(1, 5):
        f = jax.jit(lambda c, n: gd.build_self_plan_device(c, n, 3))
        s3.append(timeit(f"self3 L{l} (cap {capst[l]})", f, levels[l][0],
                         levels[l][1]))

    # ---- window plans ----
    from openscene_tpu.sparse.pallas_conv import MTILE, TILE, WIN
    for l in range(5):
        cap = capst[l]
        if cap >= WIN and cap % (MTILE * TILE) == 0:
            f = jax.jit(lambda fwd, n, cap=cap:
                        gd.build_window_plan_device(fwd, n, cap))
            timeit(f"wplan L{l} (cap {cap})", f, s3[l].fwd, levels[l][1])

    # ---- edge window plans ----
    from openscene_tpu.sparse.pallas_edge import DWIN, UWIN
    for e in range(4):
        if (capst[e] >= DWIN and capst[e + 1] >= UWIN
                and capst[e] % (4 * TILE) == 0
                and capst[e + 1] % (4 * TILE) == 0):
            f = jax.jit(lambda fwd, cp, co, n:
                        gd.build_edge_window_plan_device(fwd, cp, co, n))
            timeit(f"ewplan E{e}", f, downs[e].fwd, downs[e].child_parent,
                   downs[e].child_offset, levels[e][1])

    # ---- grid-prober phases ----
    from openscene_tpu.sparse import grid as gridmod

    @jax.jit
    def grid_build(coords, num):
        g = gridmod.build_level_grid(coords, num, 8,
                                     gridmod.dims_for_level(0))
        return g.table[0, 0], g.overflow

    timeit("grid: L0 build_level_grid", grid_build, coords, num)

    @jax.jit
    def grid_stem(coords, num):
        g = gridmod.build_level_grid(coords, num, 8,
                                     gridmod.dims_for_level(0))
        occ, plan3 = gridmod.stem_and_self3_from_grid(g, num)
        return occ.sum(), plan3.fwd[0, 0]

    timeit("grid: L0 build+stem_occ+self3", grid_stem, coords, num)

    # ---- the real fused programs ----
    @jax.jit
    def full(coords, num):
        geo, ov = gd.build_geometry_parts(coords, num, capst, windows=True,
                                          stem_occupancy=True)
        return geo.levels[-1].num, ov

    timeit("FULL build_geometry_parts(windows=True) [search path]", full,
           coords, num)

    @jax.jit
    def full_grid(coords, num):
        geo, ov = gd.build_geometry_parts(coords, num, capst, windows=True,
                                          stem_occupancy=True, n_scenes=8)
        return geo.levels[-1].num, ov

    timeit("FULL build_geometry_parts(windows=True) [grid path]", full_grid,
           coords, num)


if __name__ == "__main__":
    main()
