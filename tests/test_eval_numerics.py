"""Bound the fp16 -> fp32 eval dot-product numerics delta.

The reference computes feature-vs-text logits in torch fp16 on GPU
(``run/evaluate.py:291,296``: ``pred = cuda_half(feat) @ text_features.t()``);
this repo computes them in fp32 (``runtime/evaluate.py`` precision note).
This test pins the size of that documented delta on a synthetic CLIP-like
scene: fusion-mode logits computed with reference semantics (fp16 storage in,
fp16 rounding out) vs the repo's jitted fp32 eval step must agree on >=99.9%
of argmaxes, and the resulting mIoU delta must be far inside the 0.5-point
BASELINE.md tolerance.
"""

import numpy as np

from openscene_tpu import metrics
from openscene_tpu.data.batch import EvalBatch
from openscene_tpu.runtime.evaluate import make_eval_step

D = 768          # openseg feature width
NCLS = 20        # scannet-20 style labelset
V = 4096         # voxels (== points here; identity reconstruction)


def _synthetic_scene(rng):
    """Unit-norm text embeddings + noisy per-class fused features.

    Noise is large enough that a few percent of points sit near a decision
    boundary (where fp16 rounding could flip the argmax) — the regime the
    test is about; totally clean features would pass vacuously.
    """
    text = rng.standard_normal((NCLS, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    labels = rng.integers(0, NCLS, size=V).astype(np.int32)
    feats = text[labels] + 0.9 * rng.standard_normal((V, D)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    # fp16 is the reference's *storage* dtype too (fusion_util.py:87) — both
    # paths start from identically-rounded features, like the real pipeline.
    return text, feats.astype(np.float16), labels


def test_fp16_vs_fp32_fusion_logits_delta():
    rng = np.random.default_rng(0)
    text, feats16, labels = _synthetic_scene(rng)

    # Reference semantics: fp16 operands, fp16 result rounding (tensor-core
    # halves accumulate fp32 internally; the visible quantization is on the
    # inputs and the stored logits).
    ref_logits = (feats16.astype(np.float32) @ text.T).astype(np.float16)
    ref_pred = ref_logits.argmax(axis=1)

    # Repo path: the actual jitted fusion-mode eval step (fp32 dot).  geo is
    # untouched in fusion mode (the 3D model never runs).
    step = make_eval_step("fusion", arch="MinkUNet18A")
    batch = EvalBatch(
        geo=None,
        feats=np.ones((V, 3), np.float32),
        feat_3d=feats16,
        mask=np.ones((V,), np.float32),
        labels=labels,
        inds_reconstruct=np.arange(V, dtype=np.int32),
        num_points=V,
        num_voxels=V,
    )
    logits, pmask = step(None, None, text, batch)
    logits = np.asarray(logits, np.float32)
    assert np.asarray(pmask).all()
    repo_pred = logits.argmax(axis=1)

    agree = float((repo_pred == ref_pred).mean())
    assert agree >= 0.999, f"fp16 vs fp32 argmax agreement {agree:.5f}"

    # mIoU under each precision vs the true labels: the delta is what the
    # docstring in runtime/evaluate.py promises is "well inside tolerance".
    def miou(pred):
        inter, union, tgt = metrics.intersection_and_union(pred, labels, NCLS)
        return metrics.miou_from_histograms(inter, union, tgt)[0]

    delta = abs(miou(repo_pred) - miou(ref_pred))
    assert delta < 5e-3, f"fp16->fp32 mIoU delta {delta:.5f} exceeds bound"
