"""Supervised segmentation baseline: loss decreases, eval protocol runs."""

import numpy as np
import pytest

from openscene_tpu.config import Config
from openscene_tpu.data.synthetic import build_synthetic_dataset
from openscene_tpu.runtime.eval_seg import evaluate_seg
from openscene_tpu.runtime.train_seg import SegTrainer


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("seg_synth")
    d3, _ = build_synthetic_dataset(str(root), n_train=2, n_val=1,
                                    dim=16, density=300.0)
    return d3, root


def test_seg_train_and_eval(synth, tmp_path):
    d3, root = synth
    cfg = Config(data_root=d3, voxel_size=0.05, arch_3d="MinkUNet14A",
                 classes=20, batch_size=2, loop=2, epochs=2, base_lr=0.05,
                 aug=True, manual_seed=0, evaluate=False, print_freq=1,
                 save_path=str(tmp_path), use_shm=True, test_repeats=2,
                 split="val")
    tr = SegTrainer(cfg)
    l0, _ = tr.train_epoch(0)
    l1, _ = tr.train_epoch(1)
    assert np.isfinite(l1)
    assert l1 < l0, (l0, l1)

    results = evaluate_seg(cfg, tr.params, tr.state)
    assert 0.0 <= results["miou"] <= 1.0
    assert "repeat_1" in results


@pytest.mark.skipif(
    __import__("jax").device_count() < 2, reason="needs >= 2 devices")
def test_seg_sharded_training_matches_losses(synth, tmp_path):
    """data_parallel>1 (reference train_mink DDP): sharded per-step loss is
    the mean of the device losses and training still converges."""
    import jax
    from openscene_tpu.data.batch import assemble_seg_batch
    from openscene_tpu.data.sharded import assemble_sharded_seg_batches
    from openscene_tpu.parallel.mesh import get_mesh, replicate, shard_batch
    from openscene_tpu.runtime.train_seg import (make_seg_optimizer,
                                                 make_seg_train_step)
    from openscene_tpu.models import init_unet
    import jax.numpy as jnp

    d3, root = synth
    cfg = Config(data_root=d3, voxel_size=0.05, arch_3d="MinkUNet14A",
                 classes=20, batch_size=2, loop=2, epochs=1, base_lr=0.05,
                 manual_seed=0, evaluate=False, print_freq=1,
                 save_path=str(tmp_path), use_shm=True, data_parallel=2)
    tr = SegTrainer(cfg)
    assert tr.mesh is not None and tr.n_dp == 2
    l0, _ = tr.train_epoch(0)
    assert np.isfinite(l0)

    # step-level parity: sharded loss == mean of per-device losses
    params, state = init_unet(jax.random.PRNGKey(0), 3, 20,
                              arch="MinkUNet14A")
    opt, _ = make_seg_optimizer(cfg, max_iter=10)
    samples = [tr.train_data.get(i) for i in range(2)]
    batches, caps = assemble_sharded_seg_batches(
        [[samples[0]], [samples[1]]], rng=np.random.default_rng(1))
    single = make_seg_train_step(cfg, opt)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    losses = []
    for d in range(2):
        sub = jax.tree_util.tree_map(lambda x: x[d], batches)
        out = single(copy(params), copy(state), opt.init(params), sub)
        losses.append(float(out[3]))
    mesh = get_mesh(data=2, model=1, devices=jax.devices()[:2])
    sharded = make_seg_train_step(cfg, opt, mesh=mesh)
    out = sharded(replicate(mesh, copy(params)), replicate(mesh, copy(state)),
                  replicate(mesh, opt.init(params)),
                  shard_batch(mesh, batches))
    assert float(out[3]) == pytest.approx(np.mean(losses), rel=1e-5)


@pytest.mark.skipif(
    __import__("jax").device_count() < 2, reason="needs >= 2 devices")
def test_seg_sharded_eval_matches_single(synth, tmp_path):
    """data_parallel eval (reference eval_mink multi-GPU scaffold): same
    protocol results as the single-device path (same derived per-scene
    voxelization; only cap padding differs)."""
    d3, root = synth
    base = dict(data_root=d3, voxel_size=0.05, arch_3d="MinkUNet14A",
                classes=20, batch_size=2, loop=1, epochs=1, manual_seed=0,
                evaluate=False, save_path=str(tmp_path), use_shm=True,
                test_repeats=2, split="val")
    single = evaluate_seg(Config(**base))
    sharded = evaluate_seg(Config(**base, data_parallel=2))
    assert sharded["miou"] == pytest.approx(single["miou"], abs=2e-2)
    assert "repeat_1" in sharded
