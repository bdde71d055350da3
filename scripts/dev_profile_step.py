"""Dev tool: op-level time breakdown of the bench train step on TPU.

Runs the official bench step under jax.profiler.trace and aggregates the
device-side chrome-trace events by op name over N steps, printing the
per-step cost of each bucket (the 'jvp/transpose_jvp/fusion/...' tables in
the round notes).  Uses the cached bench batch + persistent compile cache,
so a warm run costs ~RTT + N steps.

Usage: python scripts/dev_profile_step.py [--steps 4] [--top 18]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate(trace_dir, steps, top):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace under {trace_dir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    # device-side complete events: pid of the TPU device rows
    dev_pids = {p["pid"] for p in trace["traceEvents"]
                if p.get("ph") == "M" and p.get("name") == "process_name"
                and "TPU" in str(p.get("args", {}).get("name", ""))}
    buckets = defaultdict(float)
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        # strip trailing .N / digits so fusions group
        base = name.rstrip("0123456789.")
        buckets[base] += e.get("dur", 0.0)
    rows = sorted(buckets.items(), key=lambda kv: -kv[1])[:top]
    total = sum(buckets.values())
    print(f"# device total {total/1e3/steps:8.2f}ms/step over {steps} steps")
    for name, us in rows:
        print(f"{us/1e3/steps:9.2f}ms  {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--top", type=int, default=18)
    ap.add_argument("--trace_dir", default="/tmp/openscene_trace")
    args = ap.parse_args()

    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    import bench
    from openscene_tpu.config import Config
    from openscene_tpu.data.batch import DistillBatch
    from openscene_tpu.models import init_unet
    from openscene_tpu.runtime.distill import make_optimizer, make_train_step
    from openscene_tpu.sparse.geometry_device import build_geometry_parts

    cfg = Config(arch_3d="MinkUNet18A", loss_type="cosine")
    raw, caps = bench.build_raw_cached()
    n_vox = int(raw.num)
    raw = jax.tree_util.tree_map(jax.device_put, raw)
    raw = raw._replace(feat_3d=raw.feat_3d.astype(jnp.bfloat16))

    @jax.jit
    def build_geo(coords, num):
        geo, ov = build_geometry_parts(
            coords, num, caps.fixed,
            windows=jax.default_backend() == "tpu", stem_occupancy=True,
            n_scenes=8)  # match bench.py exactly -> persistent-cache hit
        return geo, ov

    t0 = time.time()
    geo, ov = build_geo(raw.coords, raw.num)
    assert not bool(ov)
    print(f"# geo compile+first {time.time()-t0:.1f}s", flush=True)
    batch = DistillBatch(geo=geo, feats=raw.feats, feat_3d=raw.feat_3d,
                         mask=raw.mask, labels=raw.labels, num_voxels=n_vox)
    params, state = init_unet(jax.random.PRNGKey(0), 3, 768,
                              arch="MinkUNet18A")
    opt, _ = make_optimizer(cfg, max_iter=10000)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)
    t0 = time.time()
    params, state, opt_state, loss = step(params, state, opt_state, batch)
    print(f"# step compile+first {time.time()-t0:.1f}s loss {float(loss):.4f}",
          flush=True)

    t0 = time.time()
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            params, state, opt_state, loss = step(params, state, opt_state,
                                                  batch)
        _ = float(loss)
    wall = (time.time() - t0) / args.steps
    print(f"# step {wall*1e3:.1f}ms -> {n_vox/wall:,.0f} voxels/s",
          flush=True)
    aggregate(args.trace_dir, args.steps, args.top)


if __name__ == "__main__":
    main()
