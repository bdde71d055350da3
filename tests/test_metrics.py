"""Metric parity: confusion-matrix mIoU with 255/256 sentinels
(reference util/metric.py) and the streaming histograms (util/util.py)."""

import numpy as np

from openscene_tpu import metrics
from openscene_tpu.labels import NO_FEATURE_ID, UNKNOWN_ID


def test_confusion_ignores_unknown_gt():
    pred = np.array([0, 1, 1, 0])
    gt = np.array([0, 1, UNKNOWN_ID, 1])
    conf = metrics.confusion_matrix(pred, gt, 2)
    assert conf.sum() == 3  # the 255-GT point is dropped
    assert conf[0, 0] == 1 and conf[1, 1] == 1 and conf[0, 1] == 1


def test_no_feature_pred_goes_to_extra_row():
    pred = np.array([NO_FEATURE_ID, 0])
    gt = np.array([0, 0])
    conf = metrics.confusion_matrix(pred, gt, 2)
    # the NO_FEATURE point counts as a false negative for class 0 (its row is
    # dropped) but stays in the column sum
    assert conf[0, 0] == 1
    assert conf.shape == (2, 2)


def test_mean_iou_divides_by_all_classes():
    # one perfectly predicted class out of 20 -> mIoU = 1/20
    pred = np.zeros(10, dtype=np.int64)
    gt = np.zeros(10, dtype=np.int64)
    miou = metrics.evaluate(pred, gt, dataset="scannet_3d")
    assert abs(miou - 1.0 / 20) < 1e-9


def test_evaluate_with_details():
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 20, 1000)
    pred = gt.copy()
    pred[:100] = (pred[:100] + 1) % 20
    miou, macc, ious, accs = metrics.evaluate(pred, gt, dataset="scannet_3d",
                                              return_details=True)
    assert 0 < miou < 1 and 0 < macc <= 1
    assert len(ious) == 20


def test_intersection_and_union_matches_numpy():
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    out = rng.integers(0, 5, 300)
    tgt = rng.integers(0, 5, 300)
    tgt[:30] = 255
    inter, union, target = metrics.intersection_and_union(out, tgt, 5)
    inter, union, target = map(np.asarray, (inter, union, target))
    # reference numpy histogram semantics (util/util.py:117-129)
    o = out.copy()
    o[tgt == 255] = 255
    ai, _ = np.histogram(o[o == tgt], bins=np.arange(6))
    ao, _ = np.histogram(o, bins=np.arange(6))
    at, _ = np.histogram(tgt, bins=np.arange(6))
    assert np.array_equal(inter, ai)
    assert np.array_equal(union, ao + at - ai)
    assert np.array_equal(target, at)
    miou, macc, allacc = metrics.miou_from_histograms(inter, union, target)
    assert 0 <= miou <= 1


def test_histogram_binning_edge_semantics():
    # np.histogram bins=[0..K] puts value K-1 in the last bin inclusively;
    # our one-hot version must agree on boundary values
    out = np.array([4, 4, 0])
    tgt = np.array([4, 0, 0])
    inter, union, target = map(np.asarray,
                               metrics.intersection_and_union(out, tgt, 5))
    assert inter[4] == 1 and target[4] == 1 and union[4] == 2
