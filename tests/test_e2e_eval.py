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


def test_feature_dump_feeds_demo_query(tmp_path, monkeypatch):
    """save_feature_as_numpy must save per-point FEATURES (not text logits)
    under {scene_name}_openscene_feat_{type}.npy (run/evaluate.py:302-331),
    and demo/query.py must run off the dump end to end."""
    import os
    import runpy
    import sys
    from os.path import dirname, join

    d3, dfeat = build_synthetic_dataset(
        str(tmp_path / "synth768"), n_train=1, n_val=1, dim=768,
        density=300.0)
    cfg = make_cfg(d3, dfeat)
    text = class_prototypes(20, 768)
    ev = ZeroShotEvaluator(cfg, text_features=text)
    out_dir = str(tmp_path / "feat")
    ev.run(save_features_to=out_dir)

    dumps = sorted(os.listdir(out_dir))
    assert dumps == ["scene0001_00_openscene_feat_fusion.npy"], dumps
    feats = np.load(join(out_dir, dumps[0]))
    scene_file = join(d3, "val", "scene0001_00.npz")
    n_points = len(np.load(scene_file)["coords"])
    assert feats.shape == (n_points, 768), feats.shape  # features, not logits
    assert feats.dtype == np.float16

    out_ply = str(tmp_path / "heat.ply")
    sim_file = str(tmp_path / "sim.npy")
    monkeypatch.setattr(sys, "argv", [
        "query.py", "--features", join(out_dir, dumps[0]),
        "--points", scene_file, "--query", "a sofa in a scene",
        "--out", out_ply, "--save_sim", sim_file, "--allow_pseudo_text"])
    repo = dirname(dirname(os.path.abspath(__file__)))
    runpy.run_path(join(repo, "demo", "query.py"), run_name="__main__")
    assert os.path.exists(out_ply)
    sim = np.load(sim_file)
    assert sim.shape == (n_points,) and np.isfinite(sim).all()


def test_eval_viz_exports(synth_root, tmp_path):
    """vis_input/vis_pred/vis_gt write palette-colored PLYs + legends
    (run/evaluate.py:343-376)."""
    import os
    d3, dfeat = synth_root
    cfg = make_cfg(d3, dfeat, vis_input=True, vis_pred=True, vis_gt=True,
                   save_folder=str(tmp_path / "vis"))
    ev = ZeroShotEvaluator(cfg, text_features=class_prototypes(20, 96))
    ev.run()
    files = set(os.listdir(tmp_path / "vis"))
    for i in range(2):  # two val scenes
        assert {f"{i}_input.ply", f"{i}_fusion.ply", f"{i}_gt.ply",
                f"{i}_labels_fusion.jpg.txt",
                f"{i}_labels_gt.jpg.txt"} <= files, files


def test_fusion_eval_marks_no_feature_points(synth_root):
    d3, dfeat = synth_root
    cfg = make_cfg(d3, dfeat)
    # orthogonal "text" embeddings: predictions are garbage, but the metric
    # must still run and no-feature points must not count as correct
    text = class_prototypes(20, 96, seed=99)
    ev = ZeroShotEvaluator(cfg, text_features=text)
    results = ev.run()
    assert 0.0 <= results["miou"] < 0.5


def test_fusion_eval_sharded_matches_single(synth_root):
    """data_parallel>1: one scene per device, identical results to the
    single-device protocol (reference's scaffolded multi-GPU eval)."""
    d3, dfeat = synth_root
    text = class_prototypes(20, 96)
    single = ZeroShotEvaluator(make_cfg(d3, dfeat), text_features=text).run()
    cfg = make_cfg(d3, dfeat, data_parallel=2)
    sharded = ZeroShotEvaluator(cfg, text_features=text).run()
    assert sharded["miou"] == pytest.approx(single["miou"], abs=1e-6)
