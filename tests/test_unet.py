"""UNet model tests: shapes, state threading, overfit on a tiny task."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openscene_tpu.models import apply_unet, init_unet
from openscene_tpu.sparse.geometry import GeometryCaps, build_unet_geometry
from openscene_tpu.sparse.ops import valid_mask

from tests.test_geometry import random_coords


def surface_coords(rng, n=600, span=24, batches=2):
    """Synthetic surface-ish coordinates (z = f(x, y)) so downsampling merges."""
    pts = set()
    while len(pts) < n:
        b = int(rng.integers(0, batches))
        x, y = (int(v) for v in rng.integers(0, span, 2))
        z = int(3 + 2 * np.sin(x / 4.0) + 2 * np.cos(y / 5.0))
        pts.add((b, x, y, z))
    return np.array(sorted(pts), dtype=np.int32)


@pytest.fixture(scope="module")
def small_geo():
    rng = np.random.default_rng(3)
    coords = surface_coords(rng)
    return coords, build_unet_geometry(coords)


def test_unet_shapes_and_padding(small_geo):
    coords, geo = small_geo
    n = len(coords)
    cap = geo.levels[0].cap
    key = jax.random.PRNGKey(0)
    params, state = init_unet(key, 3, 16, arch="MinkUNet14A")
    x = jnp.zeros((cap, 3), dtype=jnp.float32).at[:n].set(1.0)
    out, new_state = apply_unet(params, state, x, geo, arch="MinkUNet14A",
                                train=True)
    assert out.shape == (cap, 16)
    out = np.asarray(out)
    assert np.isfinite(out[:n]).all()
    assert np.abs(out[n:]).max() == 0.0  # padded rows stay zero end-to-end
    # BN state was updated everywhere
    assert not np.allclose(np.asarray(new_state["bn0"]["mean"]),
                           np.asarray(state["bn0"]["mean"]))
    jax.tree_util.tree_structure(new_state)  # same pytree-able structure


def test_unet_eval_mode_keeps_state(small_geo):
    coords, geo = small_geo
    cap = geo.levels[0].cap
    params, state = init_unet(jax.random.PRNGKey(0), 3, 8, arch="MinkUNet14A")
    x = jnp.ones((cap, 3), dtype=jnp.float32)
    x = x * valid_mask(geo.levels[0].num, cap)
    _, new_state = apply_unet(params, state, x, geo, arch="MinkUNet14A",
                              train=False)
    # eval must not touch running stats
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.allclose(a, b), state, new_state))
    assert bool(same)


def test_bottleneck_arch_runs(small_geo):
    coords, geo = small_geo
    cap = geo.levels[0].cap
    params, state = init_unet(jax.random.PRNGKey(1), 3, 8, arch="MinkUNet50")
    x = jnp.ones((cap, 3), dtype=jnp.float32) * valid_mask(
        geo.levels[0].num, cap)
    out, _ = apply_unet(params, state, x, geo, arch="MinkUNet50", train=True)
    assert out.shape == (cap, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_overfits_tiny_regression(small_geo):
    """The full model + custom VJPs can fit a small target — end-to-end
    gradient flow through all 4 down/up levels."""
    import optax

    coords, geo = small_geo
    n = len(coords)
    cap = geo.levels[0].cap
    params, state = init_unet(jax.random.PRNGKey(0), 3, 4, arch="MinkUNet14A")
    rng = np.random.default_rng(0)
    x = jnp.zeros((cap, 3), dtype=jnp.float32).at[:n].set(
        jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32)))
    target = np.zeros((cap, 4), dtype=np.float32)
    target[:n] = rng.standard_normal((n, 4)).astype(np.float32)
    target = jnp.asarray(target)
    mask = valid_mask(geo.levels[0].num, cap)

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, state, opt_state):
        def loss_fn(p):
            out, ns = apply_unet(p, state, x, geo, arch="MinkUNet14A",
                                 train=True)
            l = jnp.sum(((out - target) * mask) ** 2) / jnp.sum(mask)
            return l, ns
        (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), ns, opt_state, l

    losses = []
    for _ in range(60):
        params, state, opt_state, l = step(params, state, opt_state)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
