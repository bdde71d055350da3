"""End-to-end zero-shot evaluation on a synthetic dataset.

The minimum end-to-end slice (SURVEY.md §7 step 3): fused features + text
embeddings -> cosine argmax -> repeats protocol -> mIoU, with no model.
With clean class-prototype features and prototype 'text' embeddings the
fusion-mode mIoU must be near-perfect — a full-pipeline correctness probe
covering loaders, voxelizer, batch assembly, reconstruction indices and the
metric."""

import numpy as np
import pytest

from openscene_tpu.config import Config
from openscene_tpu.data.synthetic import (build_synthetic_dataset,
                                          class_prototypes)
from openscene_tpu.runtime.evaluate import ZeroShotEvaluator


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    d3, dfeat = build_synthetic_dataset(str(root), n_train=2, n_val=2,
                                        dim=96, density=800.0,
                                        all_classes=True)
    return d3, dfeat


def make_cfg(d3, dfeat, **kw):
    cfg = Config(
        data_root=d3, data_root_2d_fused_feature=dfeat,
        feature_2d_extractor="openseg", voxel_size=0.05,
        split="val", feature_type="fusion", test_repeats=1,
        mark_no_feature_to_unknown=True, manual_seed=0)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_fusion_eval_near_perfect(synth_root):
    d3, dfeat = synth_root
    cfg = make_cfg(d3, dfeat)
    # synthetic features live in a 96-d prototype space; use the same
    # prototypes as "text" embeddings.  ~15% of points carry no fused feature
    # (visible_frac=0.85) and are marked NO_FEATURE -> count as wrong, like
    # the reference; the ceiling is therefore ~0.82 mIoU, not 1.0.
    text = class_prototypes(20, 96)
    ev = ZeroShotEvaluator(cfg, text_features=text)
    results = ev.run()
    assert results["miou"] > 0.75, results


def test_fusion_eval_repeats_protocol(synth_root):
    d3, dfeat = synth_root
    cfg = make_cfg(d3, dfeat, test_repeats=2)
    text = class_prototypes(20, 96)
    ev = ZeroShotEvaluator(cfg, text_features=text)
    results = ev.run()
    assert "accumulated" in results
    assert results["accumulated"] > 0.75


def test_fusion_eval_marks_no_feature_points(synth_root):
    d3, dfeat = synth_root
    cfg = make_cfg(d3, dfeat)
    # orthogonal "text" embeddings: predictions are garbage, but the metric
    # must still run and no-feature points must not count as correct
    text = class_prototypes(20, 96, seed=99)
    ev = ZeroShotEvaluator(cfg, text_features=text)
    results = ev.run()
    assert 0.0 <= results["miou"] < 0.5
