"""Dev tool: compare the train step with host-built geometry (device-resident
prebuilt plans) vs the host-light step that builds geometry on device
(sparse/geometry_device.py) inside the same jit.

Prints per-variant step time, the loss delta (must be ~0), and the isolated
on-device geometry-build time.
"""

import pickle
import sys
import time
from os.path import exists

import numpy as np


def main():
    sys.path.insert(0, ".")
    import bench
    import jax
    import jax.numpy as jnp
    from openscene_tpu.config import Config
    from openscene_tpu.data.batch import assemble_raw_distill_batch
    from openscene_tpu.data.loaders import SceneSample, align_fused_features
    from openscene_tpu.data.synthetic import make_fused_features, make_scene
    from openscene_tpu.data.voxelizer import Voxelizer
    from openscene_tpu.models import init_unet
    from openscene_tpu.runtime.distill import make_optimizer, make_train_step
    from openscene_tpu.sparse.geometry import GeometryCaps, level_counts

    cache = "/tmp/bench_batch.pkl"
    if exists(cache):
        with open(cache, "rb") as f:
            batch = pickle.load(f)
    else:
        batch = bench.build_batch()
        with open(cache, "wb") as f:
            pickle.dump(batch, f)
    n_vox = batch.num_voxels
    caps_t = tuple(l.cap for l in batch.geo.levels)
    print(f"# caps {caps_t}, {n_vox} voxels", flush=True)

    # rebuild the same scene set as a raw batch with the same caps
    rng = np.random.default_rng(0)
    samples = []
    for s in range(8):
        coords, colors, labels = make_scene(s, density=2200.0)
        feat, mask_full = make_fused_features(labels, 20, 768, s)
        vox = Voxelizer(voxel_size=0.02, use_augmentation=False, rng=rng)
        locs, feats, labs, _, vox_ind = vox.voxelize(
            coords, (colors + 1) * 127.5, labels, return_ind=True)
        fmask, frows = align_fused_features(mask_full, vox_ind)
        samples.append(SceneSample(
            coords=locs.astype(np.int32),
            feats=np.ones((len(locs), 3), dtype=np.float32),
            labels=labs.astype(np.int64), inds_reconstruct=None,
            feat_3d=feat[frows], feat_mask=fmask))
    caps = GeometryCaps(cap0=caps_t[0], fixed=caps_t)
    t0 = time.time()
    raw, _ = assemble_raw_distill_batch(samples, 768,
                                        caps=caps,
                                        rng=np.random.default_rng(0),
                                        shift=False)
    print(f"# raw host assembly {time.time()-t0:.2f}s", flush=True)

    cfg = Config(arch_3d="MinkUNet18A", loss_type="cosine")
    params, state = init_unet(jax.random.PRNGKey(0), 3, 768,
                              arch="MinkUNet18A")
    opt, _ = make_optimizer(cfg, max_iter=10000)
    opt_state = opt.init(params)

    # RTT probe
    probe = jax.jit(lambda a: a * 1.0)
    small = jnp.ones((8, 8))
    _ = float(np.asarray(probe(small)).sum())
    t = time.time()
    for _ in range(5):
        _ = float(np.asarray(probe(small)).sum())
    rtt = (time.time() - t) / 5

    # --- isolated device geometry build ---
    from openscene_tpu.sparse.geometry_device import build_geometry_parts

    @jax.jit
    def build_only(coords, num):
        geo, ov = build_geometry_parts(coords, num, caps_t, windows=True,
                                       stem_occupancy=True)
        # return something small that depends on everything
        s = sum(jnp.sum(p.fwd[0].astype(jnp.int32)) for p in geo.self3)
        s += jnp.sum(geo.stem_occ[0].astype(jnp.float32)).astype(jnp.int32)
        for w in geo.wplans:
            if w is not None:
                s += jnp.sum(w.win_start[:, 0])
        return s, ov

    coords_d = jax.device_put(raw.coords)
    num_d = jax.device_put(raw.num)
    t0 = time.time()
    s, ov = build_only(coords_d, num_d)
    print(f"# geometry build compile+run {time.time()-t0:.1f}s "
          f"(overflow={bool(ov)})", flush=True)
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        s, ov = build_only(coords_d, num_d)
    _ = int(s)
    t_build = (time.time() - t0 - rtt) / iters
    print(f"# on-device geometry build: {t_build*1e3:.1f}ms", flush=True)

    # --- host-geometry step (current bench path) ---
    batch_d = jax.tree_util.tree_map(jax.device_put, batch)
    batch_d = batch_d._replace(feat_3d=batch_d.feat_3d.astype(jnp.bfloat16))
    step = make_train_step(cfg, opt)
    p1, s1, o1, loss = step(params, state, opt_state, batch_d)
    l_host = float(loss)
    t0 = time.time()
    p, s_, o, loss = p1, s1, o1, None
    for _ in range(iters):
        p, s_, o, loss = step(p, s_, o, batch_d)
    _ = float(loss)
    t_host = (time.time() - t0 - rtt) / iters
    print(f"host-geometry step:   {t_host*1e3:7.1f}ms "
          f"({n_vox/t_host:,.0f} voxels/s) loss={l_host:.4f}", flush=True)

    # --- device-geometry step ---
    raw_d = jax.tree_util.tree_map(jax.device_put, raw)
    raw_d = raw_d._replace(feat_3d=raw_d.feat_3d.astype(jnp.bfloat16))
    step2 = make_train_step(cfg, opt, geo_caps=caps_t)
    p2, s2, o2, loss2, ov = step2(params, state, opt_state, raw_d)
    l_dev = float(loss2)
    print(f"# overflow={bool(ov)} loss_dev={l_dev:.4f} "
          f"loss_host={l_host:.4f}", flush=True)
    t0 = time.time()
    p, s_, o = p2, s2, o2
    for _ in range(iters):
        p, s_, o, loss2, ov = step2(p, s_, o, raw_d)
    _ = float(loss2)
    t_dev = (time.time() - t0 - rtt) / iters
    print(f"device-geometry step: {t_dev*1e3:7.1f}ms "
          f"({n_vox/t_dev:,.0f} voxels/s)", flush=True)


if __name__ == "__main__":
    main()
