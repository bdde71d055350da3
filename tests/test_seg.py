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
