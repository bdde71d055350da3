"""Data-parallel training: the shard_map step must match single-device math.

With the same global batch split across 2 devices and pmean'd gradients, the
sharded step's loss must equal the mean of per-device losses, and parameters
must stay replica-identical."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openscene_tpu.config import Config
from openscene_tpu.data.sharded import assemble_sharded_distill_batches
from openscene_tpu.models import init_unet
from openscene_tpu.parallel.mesh import get_mesh, replicate, shard_batch
from openscene_tpu.runtime.distill import make_optimizer, make_train_step

from __graft_entry__ import _synthetic_batch


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >= 2 devices")
def test_sharded_step_matches_per_device_mean():
    n_dev = 2
    dim = 32
    cfg = Config(arch_3d="MinkUNet14A", loss_type="cosine")
    rng = np.random.default_rng(0)
    per_dev = [_synthetic_batch(n_points=3000, dim=dim, seed=5 + d,
                                voxel=0.1, rng=np.random.default_rng(d))
               for d in range(n_dev)]
    batches, caps = assemble_sharded_distill_batches(
        per_dev, dim, rng=np.random.default_rng(1))

    params, state = init_unet(jax.random.PRNGKey(0), 3, dim,
                              arch="MinkUNet14A")
    opt, _ = make_optimizer(cfg, max_iter=100)
    opt_state = opt.init(params)

    # single-device losses on each sub-batch (pre-update params)
    single = make_train_step(cfg, opt)
    losses = []
    for d in range(n_dev):
        sub = jax.tree_util.tree_map(lambda x: x[d], batches)
        # fresh leaf copies: the jitted step donates its params/state args
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        _, _, _, l = single(copy(params), copy(state), opt.init(params), sub)
        losses.append(float(l))

    mesh = get_mesh(data=n_dev, model=1, devices=jax.devices()[:n_dev])
    sharded = make_train_step(cfg, opt, mesh=mesh)
    p = replicate(mesh, params)
    s = replicate(mesh, state)
    o = replicate(mesh, opt_state)
    b = shard_batch(mesh, batches)
    new_p, new_s, new_o, loss = sharded(p, s, o, b)

    assert float(loss) == pytest.approx(np.mean(losses), rel=1e-5)
    # params remain replica-consistent (fully replicated output sharding)
    leaf = jax.tree_util.tree_leaves(new_p)[0]
    assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >= 2 devices")
def test_sharded_device_geometry_step_matches_single():
    """Device-geometry (in-jit per-shard kernel maps) under shard_map:
    loss == mean of single-device device-geometry losses, no overflow."""
    from openscene_tpu.data.sharded import assemble_sharded_raw_batches

    n_dev = 2
    dim = 32
    cfg = Config(arch_3d="MinkUNet14A", loss_type="cosine")
    per_dev = [_synthetic_batch(n_points=3000, dim=dim, seed=5 + d,
                                voxel=0.1, rng=np.random.default_rng(d))
               for d in range(n_dev)]
    batches, caps = assemble_sharded_raw_batches(
        per_dev, dim, rng=np.random.default_rng(1))

    params, state = init_unet(jax.random.PRNGKey(0), 3, dim,
                              arch="MinkUNet14A")
    opt, _ = make_optimizer(cfg, max_iter=100)
    opt_state = opt.init(params)

    single = make_train_step(cfg, opt, geo_caps=caps.fixed)
    losses = []
    for d in range(n_dev):
        sub = jax.tree_util.tree_map(lambda x: x[d], batches)
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        _, _, _, l, ov = single(copy(params), copy(state), opt.init(params),
                                sub)
        assert not bool(ov)
        losses.append(float(l))

    mesh = get_mesh(data=n_dev, model=1, devices=jax.devices()[:n_dev])
    sharded = make_train_step(cfg, opt, mesh=mesh, geo_caps=caps.fixed)
    p = replicate(mesh, params)
    s = replicate(mesh, state)
    o = replicate(mesh, opt_state)
    b = shard_batch(mesh, batches)
    new_p, new_s, new_o, loss, overflow = sharded(p, s, o, b)

    assert not bool(overflow)
    assert float(loss) == pytest.approx(np.mean(losses), rel=1e-5)
    leaf = jax.tree_util.tree_leaves(new_p)[0]
    assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_model_axis_head_sharding_matches_single():
    """data=2 x model=2 mesh with the distill head D-sharded over 'model':
    loss and updated head must match the per-device single-step mean."""
    from openscene_tpu.parallel.mesh import head_sharded_specs

    n_data, n_model = 2, 2
    dim = 32
    # f32 compute: this test asserts MATH equality of the two mesh shapes;
    # under bf16 the D-split (2-way psum'd) reductions round differently
    # enough that near-cancelling gradient sums (BN betas) differ at the
    # scale of the leaf's own max gradient
    cfg = Config(arch_3d="MinkUNet14A", loss_type="cosine",
                 compute_dtype="float32")
    per_dev = [_synthetic_batch(n_points=3000, dim=dim, seed=5 + d,
                                voxel=0.1, rng=np.random.default_rng(d))
               for d in range(n_data)]
    batches, caps = assemble_sharded_distill_batches(
        per_dev, dim, rng=np.random.default_rng(1))

    params, state = init_unet(jax.random.PRNGKey(0), 3, dim,
                              arch="MinkUNet14A")
    opt, _ = make_optimizer(cfg, max_iter=100)

    single = make_train_step(cfg, opt)
    losses, finals = [], []
    for d in range(n_data):
        sub = jax.tree_util.tree_map(lambda x: x[d], batches)
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        p1, _, _, l = single(copy(params), copy(state), opt.init(params), sub)
        losses.append(float(l))
        finals.append(np.asarray(p1["final"], np.float64))

    mesh = get_mesh(data=n_data, model=n_model,
                    devices=jax.devices()[:n_data * n_model])
    sharded = make_train_step(cfg, opt, mesh=mesh)
    # replicate from fresh copies: device_put may ALIAS the source buffer
    # for the shard on the hosting device, and the donating sharded step
    # would then delete the original params/state reused below
    p = replicate(mesh, copy(params), head_sharded=True)
    s = replicate(mesh, copy(state))
    o = replicate(mesh, opt.init(params), head_sharded=True)
    b = shard_batch(mesh, batches)
    # head leaves really are D-sharded
    spec = head_sharded_specs(p)["final"]
    assert spec == jax.sharding.PartitionSpec(None, None, "model")
    new_p, new_s, new_o, loss = sharded(p, s, o, b)

    assert float(loss) == pytest.approx(np.mean(losses), rel=1e-5)
    # Full-tree gradient parity model=2 vs model=1, via SGD updates: Adam's
    # first step lr*g/(|g|+eps) ~ ±lr*sign(g) SATURATES, so reduction-order
    # noise on near-cancelling psum'd gradients flips elements by ±2lr and
    # elementwise Adam-update comparison is ill-conditioned.  SGD updates
    # are LINEAR in the gradient: -lr*pmean(g) compares strictly.
    import optax
    sgd = optax.sgd(1e-2)
    sh_sgd = make_train_step(cfg, sgd, mesh=mesh)
    p_s, _, _, loss_s = sh_sgd(replicate(mesh, copy(params),
                                         head_sharded=True),
                               replicate(mesh, copy(state)),
                               replicate(mesh, sgd.init(params),
                                         head_sharded=True),
                               shard_batch(mesh, batches))
    mesh_dp = get_mesh(data=n_data, model=1, devices=jax.devices()[:n_data])
    dp_sgd = make_train_step(cfg, sgd, mesh=mesh_dp)
    p2, _, _, loss2 = dp_sgd(replicate(mesh_dp, copy(params)),
                             replicate(mesh_dp, copy(state)),
                             replicate(mesh_dp, sgd.init(params)),
                             shard_batch(mesh_dp, batches))
    assert float(loss_s) == pytest.approx(float(loss2), rel=1e-5)
    flat0 = jax.tree_util.tree_leaves(params)
    for a, c, p0 in zip(jax.tree_util.tree_leaves(p_s),
                        jax.tree_util.tree_leaves(p2), flat0):
        u1 = np.asarray(a, np.float32) - np.asarray(p0, np.float32)
        u2 = np.asarray(c, np.float32) - np.asarray(p0, np.float32)
        scale = max(np.abs(u2).max(), 1e-12)
        # 1.5e-8 abs floor: f32 param-update quantization (~2^-27)
        assert np.abs(u1 - u2).max() <= 1e-3 * scale + 1.5e-8, (
            np.abs(u1 - u2).max(), scale)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_cli_data_parallel_training(tmp_path):
    """CLI-launched data-parallel training: cfg.data_parallel engages the
    mesh from the entry point (reference DDP, run/distill.py:105-150), runs
    sharded train steps AND the psum'd sharded validation, checkpoints."""
    import os
    import yaml
    from openscene_tpu.data.synthetic import build_synthetic_dataset
    from openscene_tpu.runtime import distill

    d3, dfeat = build_synthetic_dataset(str(tmp_path / "synth"), n_train=2,
                                        n_val=2, dim=768, density=80.0,
                                        num_rand_file_per_scene=1)
    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(yaml.safe_dump({
        "DATA": {"data_root": d3, "data_root_2d_fused_feature": dfeat,
                 "feature_2d_extractor": "openseg", "voxel_size": 0.05},
        "DISTILL": {"arch_3d": "MinkUNet14A", "batch_size": 8, "loop": 4,
                    "epochs": 1, "workers": 1, "evaluate": True,
                    "eval_freq": 1, "save_freq": 1, "print_freq": 1,
                    "manual_seed": 0},
        "Mesh": {"data_parallel": 8},
    }))
    best = distill.main([
        "--config", str(cfg_file), "save_path", str(tmp_path / "exp"),
        "allow_pseudo_text", "True"])
    assert np.isfinite(best) and 0.0 <= best <= 1.0
    assert os.path.exists(tmp_path / "exp" / "model" / "model_last.ckpt")


def test_mesh_shapes():
    mesh = get_mesh(data=4, model=2, devices=jax.devices()[:8])
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
