"""Device-geometry train step (RawDistillBatch, in-jit geometry) must match
the host-geometry step: same loss, same updated params."""

import numpy as np
import pytest

from openscene_tpu.config import Config
from openscene_tpu.data.batch import (assemble_distill_batch,
                                      assemble_raw_distill_batch)
from openscene_tpu.data.loaders import SceneSample
from openscene_tpu.sparse.geometry import GeometryCaps


def _samples(n_scenes=2, n=1500, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for s in range(n_scenes):
        coords = np.unique(rng.integers(0, 24, size=(n, 3)), axis=0)
        feat_mask = rng.random(len(coords)) < 0.8
        out.append(SceneSample(
            coords=coords.astype(np.int32),
            feats=np.ones((len(coords), 3), np.float32),
            labels=rng.integers(0, 5, len(coords)).astype(np.int64),
            inds_reconstruct=None,
            feat_3d=rng.standard_normal(
                (int(feat_mask.sum()), dim)).astype(np.float32),
            feat_mask=feat_mask))
    return out


def test_device_geometry_step_matches_host():
    import jax

    from openscene_tpu.models import init_unet
    from openscene_tpu.runtime.distill import make_optimizer, make_train_step

    dim = 32
    samples = _samples(dim=dim)
    raw, caps = assemble_raw_distill_batch(samples, dim, caps=None,
                                           rng=np.random.default_rng(3),
                                           shift=True)
    # host batch with the SAME caps + shift (reproduce via same rng state)
    host = assemble_distill_batch(samples, dim, caps=caps,
                                  rng=np.random.default_rng(3), shift=True)
    np.testing.assert_array_equal(raw.coords, host.geo.levels[0].coords)

    cfg = Config(arch_3d="MinkUNet14A", loss_type="cosine")
    params, state = init_unet(jax.random.PRNGKey(0), 3, dim,
                              arch="MinkUNet14A")
    opt, _ = make_optimizer(cfg, max_iter=100)
    opt_state = opt.init(params)

    # the step donates (params, state, opt_state): give each call its own
    params_b, state_b = init_unet(jax.random.PRNGKey(0), 3, dim,
                                  arch="MinkUNet14A")
    opt_state_b = opt.init(params_b)

    host_step = make_train_step(cfg, opt)
    p1, s1, o1, loss1 = host_step(params, state, opt_state, host)

    dev_step = make_train_step(cfg, opt, geo_caps=caps.fixed)
    p2, s2, o2, loss2, overflow = dev_step(params_b, state_b, opt_state_b,
                                           raw)

    assert not bool(overflow)
    assert float(loss1) == pytest.approx(float(loss2), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-6, atol=2e-7)


def test_overflow_keeps_state_and_host_fallback_matches():
    """An overflowing cap schedule must (a) flag overflow, (b) leave
    params/state/opt_state untouched, and (c) the trainer's host-geometry
    fallback (host_batch_from_raw) must produce the same update as a pure
    host-geometry step on the same samples."""
    import jax
    import jax.numpy as jnp

    from openscene_tpu.models import init_unet
    from openscene_tpu.runtime.distill import (host_batch_from_raw,
                                               make_optimizer,
                                               make_train_step)

    dim = 32
    samples = _samples(dim=dim)
    raw, caps = assemble_raw_distill_batch(samples, dim, caps=None,
                                           rng=np.random.default_rng(3),
                                           shift=False)

    cfg = Config(arch_3d="MinkUNet14A", loss_type="cosine")
    params, state = init_unet(jax.random.PRNGKey(0), 3, dim,
                              arch="MinkUNet14A")
    opt, _ = make_optimizer(cfg, max_iter=100)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    params_np = jax.tree_util.tree_map(np.asarray, params)

    # (a)+(b): starve level 1 so the down edge overflows its static cap
    bad_caps = (caps.fixed[0], 256) + caps.fixed[2:]
    bad_step = make_train_step(cfg, opt, geo_caps=bad_caps)
    p, s, o, loss, overflow = bad_step(copy(params), copy(state),
                                       opt.init(params), raw)
    assert bool(overflow)
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(params_np)):
        np.testing.assert_array_equal(np.asarray(a), b)

    # (c): host fallback == a host-geometry step assembled from scratch
    host_step = make_train_step(cfg, opt)
    hb = host_batch_from_raw(raw)
    p1, s1, o1, loss1 = host_step(copy(params), copy(state),
                                  opt.init(params), hb)
    from openscene_tpu.data.batch import assemble_distill_batch
    ref = assemble_distill_batch(samples, dim, caps=caps,
                                 rng=np.random.default_rng(3), shift=False)
    p2, s2, o2, loss2 = host_step(copy(params), copy(state),
                                  opt.init(params), ref)
    assert float(loss1) == pytest.approx(float(loss2), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-6, atol=2e-7)


def test_raw_caps_merge_and_reuse():
    dim = 16
    s1 = _samples(n_scenes=1, n=800, dim=dim, seed=1)
    s2 = _samples(n_scenes=1, n=3000, dim=dim, seed=2)
    rng = np.random.default_rng(0)
    b1, caps1 = assemble_raw_distill_batch(s1, dim, caps=None, rng=rng)
    b2, caps2 = assemble_raw_distill_batch(s2, dim, caps=caps1, rng=rng)
    # caps only grow
    assert all(c2 >= c1 for c1, c2 in zip(caps1.fixed, caps2.fixed))
    # a smaller batch under the grown schedule keeps the same shapes
    b3, caps3 = assemble_raw_distill_batch(s1, dim, caps=caps2, rng=rng)
    assert caps3.fixed == caps2.fixed
    assert b3.coords.shape == b2.coords.shape
