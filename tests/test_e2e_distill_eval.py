"""Full-protocol integration: short distill training -> all three eval modes.

Covers the complete reference pipeline (run/distill.py + run/evaluate.py)
end-to-end: a brief training run must reduce the cosine loss, and the
distill / fusion / ensemble eval paths must all execute the full protocol
(voxelize -> geometry -> model -> text matching -> reconstruction -> metric)
and produce sane numbers. Absolute distill mIoU is not asserted: with tiny
synthetic data and minutes of CPU training the model carries little signal —
quality regression tracking happens on the benchmark side."""

import numpy as np
import pytest

import openscene_tpu.runtime.distill as D
from openscene_tpu.config import Config
from openscene_tpu.data.synthetic import (build_synthetic_dataset,
                                          class_prototypes)
from openscene_tpu.runtime.evaluate import ZeroShotEvaluator


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    d3, dfeat = build_synthetic_dataset(str(root), n_train=2, n_val=1,
                                        dim=32, density=250.0,
                                        all_classes=True,
                                        num_rand_file_per_scene=1)
    cfg = Config(data_root=d3, data_root_2d_fused_feature=dfeat,
                 voxel_size=0.05, arch_3d="MinkUNet14A", batch_size=2,
                 loop=3, epochs=2, base_lr=2e-3, loss_type="cosine",
                 aug=False, manual_seed=0, evaluate=False, print_freq=100,
                 save_path=str(root / "out"), use_shm=True, workers=2,
                 split="val", test_repeats=1, feature_type="distill",
                 mark_no_feature_to_unknown=True)
    orig = D.output_dim
    D.output_dim = lambda _: 32
    try:
        tr = D.DistillTrainer(cfg, allow_pseudo_text=True)
    finally:
        D.output_dim = orig
    text = class_prototypes(20, 32)
    tr.text = text
    losses = [tr.train_epoch(e) for e in range(cfg.epochs)]
    assert losses[-1] < losses[0], losses
    return cfg, tr, text


def _run(cfg, tr, text, mode):
    c = cfg.copy(feature_type=mode)
    ev = ZeroShotEvaluator(c, tr.params, tr.state, text_features=text)
    return ev.run()["miou"]


def test_all_eval_modes_run(trained):
    cfg, tr, text = trained
    fusion = _run(cfg, tr, text, "fusion")
    dist = _run(cfg, tr, text, "distill")
    ens = _run(cfg, tr, text, "ensemble")
    for name, v in (("fusion", fusion), ("distill", dist), ("ensemble", ens)):
        assert 0.0 <= v <= 1.0 and np.isfinite(v), (name, v)
    # fusion features are clean prototypes: near the visibility ceiling
    assert fusion > 0.6, fusion
    # the confidence ensemble cannot collapse far below its best member
    assert ens >= 0.5 * max(fusion, dist), (fusion, dist, ens)