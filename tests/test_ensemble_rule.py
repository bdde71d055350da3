"""Ensemble feature-selection rule parity.

Oracle: a literal NumPy transcription of the reference semantics
(run/evaluate.py:302-324): normalize both feature sets, compare each point's
best text logit, keep the UNNORMALIZED feature of whichever side is more
confident, classify with that feature."""

import numpy as np

from openscene_tpu.data.batch import EvalBatch
from openscene_tpu.runtime.evaluate import make_eval_step
from openscene_tpu.sparse.geometry import _pad_level
from openscene_tpu.sparse.types import UNetGeometry


def reference_ensemble(pred_distill_feats, feat_fuse, text):
    def nrm(f):
        return f / (np.linalg.norm(f, axis=-1, keepdims=True) + 1e-5)
    logit_d = nrm(pred_distill_feats) @ text.T
    logit_f = nrm(feat_fuse) @ text.T
    feat_ens = pred_distill_feats.copy()
    mask = logit_d.max(-1) < logit_f.max(-1)
    feat_ens[mask] = feat_fuse[mask]
    return feat_ens @ text.T


def test_ensemble_rule_matches_reference_oracle():
    rng = np.random.default_rng(0)
    n, d, L = 300, 16, 5
    distill_feats = rng.standard_normal((n, d)).astype(np.float32) * 3
    fused = rng.standard_normal((n, d)).astype(np.float32)
    text = rng.standard_normal((L, d)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)

    ref_logits = reference_ensemble(distill_feats, fused, text)

    # exercise the evaluator's jitted ensemble via a stub model: patch
    # apply_unet to return our distill features
    import openscene_tpu.runtime.evaluate as E
    orig = E.apply_unet
    cap = 512
    feats_pad = np.zeros((cap, d), np.float32)
    feats_pad[:n] = distill_feats

    def stub_apply(params, state, x, geo, **kw):
        import jax.numpy as jnp
        return jnp.asarray(feats_pad), state

    E.apply_unet = stub_apply
    try:
        step = E.make_eval_step("ensemble", "MinkUNet14A")
        fused_pad = np.zeros((cap, d), np.float32)
        fused_pad[:n] = fused
        coords = np.zeros((n, 4), np.int64)
        coords[:, 1] = np.arange(n)
        level0 = _pad_level(coords.astype(np.int32), cap)
        geo = UNetGeometry(levels=(level0,), stem=None, self3=(), down=(),
                           wplans=())
        batch = EvalBatch(
            geo=geo, feats=np.ones((cap, 3), np.float32),
            feat_3d=fused_pad, mask=np.ones(cap, np.float32),
            labels=np.zeros(n, np.int32),
            inds_reconstruct=np.arange(n, dtype=np.int32),
            num_points=n, num_voxels=n)
        logits, _ = step(None, None, text, batch)
        logits = np.asarray(logits, np.float32)[:n]
    finally:
        E.apply_unet = orig

    np.testing.assert_allclose(logits, ref_logits, rtol=2e-3, atol=2e-3)
    # the argmax decisions must agree exactly
    np.testing.assert_array_equal(logits.argmax(1), ref_logits.argmax(1))
