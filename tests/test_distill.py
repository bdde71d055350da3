"""Distillation training smoke tests: loss decreases, validation and
checkpoint last/best semantics work, resume restores."""

import os
from os.path import join

import numpy as np
import pytest

from openscene_tpu.config import Config
from openscene_tpu.data.synthetic import (build_synthetic_dataset,
                                          class_prototypes)
from openscene_tpu.runtime.distill import DistillTrainer


@pytest.fixture(scope="module")
def synth_small(tmp_path_factory):
    root = tmp_path_factory.mktemp("distill_synth")
    d3, dfeat = build_synthetic_dataset(str(root), n_train=2, n_val=1,
                                        dim=32, density=300.0,
                                        num_rand_file_per_scene=1)
    return d3, dfeat


def make_cfg(d3, dfeat, tmp, **kw):
    cfg = Config(
        data_root=d3, data_root_2d_fused_feature=dfeat,
        feature_2d_extractor="openseg", voxel_size=0.05,
        arch_3d="MinkUNet14A", batch_size=2, loop=2, epochs=2,
        base_lr=1e-3, loss_type="cosine", aug=True, manual_seed=0,
        evaluate=True, eval_freq=1, save_freq=1, print_freq=1,
        save_path=str(tmp), use_shm=True)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


class TinyTrainer(DistillTrainer):
    """DistillTrainer with a 32-d head to match the synthetic features."""

    def __init__(self, cfg):
        import jax
        from openscene_tpu.models import init_unet
        self._dim_override = 32
        # monkeypatch output_dim via attribute after base init would re-init;
        # instead replicate base init with dim=32
        import openscene_tpu.runtime.distill as D
        orig = D.output_dim
        D.output_dim = lambda _: 32
        try:
            super().__init__(cfg, allow_pseudo_text=False)
        finally:
            D.output_dim = orig


def test_distill_loss_decreases_and_checkpoints(synth_small, tmp_path):
    d3, dfeat = synth_small
    cfg = make_cfg(d3, dfeat, tmp_path)
    text = class_prototypes(20, 32)

    tr = TinyTrainer.__new__(TinyTrainer)
    import openscene_tpu.runtime.distill as D
    orig = D.output_dim
    D.output_dim = lambda _: 32
    try:
        DistillTrainer.__init__(tr, cfg, allow_pseudo_text=True)
    finally:
        D.output_dim = orig
    tr.text = text

    losses = []
    for epoch in range(2):
        losses.append(tr.train_epoch(epoch))
    assert losses[-1] < losses[0], losses

    loss_val, miou, macc, allacc = tr.validate()
    assert np.isfinite(loss_val) and 0.0 <= miou <= 1.0

    # epoch-end qualitative dump (run/distill.py:372-398): fused vs pred vs GT
    result_dir = join(str(tmp_path), "result", "last")
    assert os.path.exists(join(result_dir, "pred_2.ply"))
    assert os.path.exists(join(result_dir, "gt_2.ply"))
    assert os.path.exists(join(result_dir, "openseg_2.ply"))

    from openscene_tpu.utils.train_utils import save_checkpoint, load_checkpoint
    path = save_checkpoint({"epoch": 2, "params": tr.params,
                            "state": tr.state, "opt_state": tr.opt_state,
                            "best_iou": miou}, True,
                           join(str(tmp_path), "model"))
    assert os.path.exists(path)
    assert os.path.exists(join(str(tmp_path), "model", "model_best.ckpt"))

    payload = load_checkpoint(path, {"params": tr.params, "state": tr.state,
                                     "opt_state": tr.opt_state})
    import jax
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        tr.params, payload["params"]))
    assert bool(same)
    assert payload["epoch"] == 2
