"""Windowed edge (down/up) convs vs the XLA gather path — real TPU only.

Run manually on a TPU host:
    OPENSCENE_TPU_TESTS=1 python -m pytest tests/test_pallas_edge_tpu.py -q
"""

import numpy as np
import pytest

import jax

if jax.default_backend() != "tpu":
    pytest.skip("Pallas edge kernels require a real TPU backend",
                allow_module_level=True)

import jax.numpy as jnp

from openscene_tpu.sparse.geometry import build_unet_geometry
from openscene_tpu.sparse.ops import sparse_down_conv, sparse_up_conv
from openscene_tpu.sparse.pallas_edge import (build_edge_window_plan,
                                              windowed_down_conv,
                                              windowed_up_conv)


@pytest.fixture(scope="module")
def edge_fixture():
    rng = np.random.default_rng(1)
    n = 60_000
    xy = rng.integers(0, 300, (n, 2))
    z = (50 + 25 * np.sin(xy[:, 0] / 40) + 25 * np.cos(xy[:, 1] / 50)
         ).astype(int) + rng.integers(0, 3, n)
    coords = np.unique(np.concatenate(
        [np.zeros((n, 1), int), xy, z[:, None]], 1), axis=0).astype(np.int32)
    geo = build_unet_geometry(coords, build_windows=False)
    plan = geo.down[0]
    child_cap, child_num = geo.levels[0].cap, int(geo.levels[0].num)
    parent_cap, parent_num = geo.levels[1].cap, int(geo.levels[1].num)
    ewp = build_edge_window_plan(
        np.asarray(plan.fwd), np.asarray(plan.child_parent),
        np.asarray(plan.child_offset), child_num, parent_num)
    assert ewp is not None
    return plan, ewp, child_cap, child_num, parent_cap, parent_num


def _args(ewp):
    return tuple(jnp.asarray(a) for a in ewp)


@pytest.mark.parametrize("C,Cout", [(32, 32), (96, 96), (256, 128)])
def test_windowed_down_conv_tpu(edge_fixture, C, Cout):
    plan, ewp, child_cap, child_num, parent_cap, parent_num = edge_fixture
    rng = np.random.default_rng(0)
    x = np.zeros((child_cap, C), np.float32)
    x[:child_num] = rng.standard_normal((child_num, C))
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((8, C, Cout)) * 0.2
                     ).astype(np.float32))
    args = _args(ewp)
    plan_j = jax.tree_util.tree_map(jnp.asarray, plan)

    out = np.asarray(windowed_down_conv(xb, w, *args), np.float32)
    ref = np.asarray(sparse_down_conv(xb, w, plan_j), np.float32)
    d = np.abs(out[:parent_num] - ref[:parent_num])
    rowscale = np.abs(ref[:parent_num]).max(axis=1, keepdims=True) + 1e-3
    assert (d > rowscale * 2.0 ** -6).sum() == 0
    assert not out[parent_num:].any()

    tgt = jnp.asarray(rng.standard_normal((parent_cap, Cout)).astype(
        np.float32) * (np.arange(parent_cap) < parent_num)[:, None])
    gx1, gw1 = jax.grad(
        lambda x_, w_: jnp.sum(
            (windowed_down_conv(x_, w_, *args).astype(jnp.float32)
             - tgt) ** 2), (0, 1))(xb, w)
    gx0, gw0 = jax.grad(
        lambda x_, w_: jnp.sum(
            (sparse_down_conv(x_, w_, plan_j).astype(jnp.float32)
             - tgt) ** 2), (0, 1))(xb, w)
    gx1, gx0 = np.asarray(gx1, np.float32), np.asarray(gx0, np.float32)
    assert np.abs(gx1 - gx0).max() / np.abs(gx0).max() < 1e-2
    gw1, gw0 = np.asarray(gw1), np.asarray(gw0)
    assert np.abs(gw1 - gw0).max() / np.abs(gw0).max() < 1e-3


@pytest.mark.parametrize("C,Cout", [(32, 32), (96, 96), (128, 256)])
def test_windowed_up_conv_tpu(edge_fixture, C, Cout):
    plan, ewp, child_cap, child_num, parent_cap, parent_num = edge_fixture
    rng = np.random.default_rng(1)
    x = np.zeros((parent_cap, C), np.float32)
    x[:parent_num] = rng.standard_normal((parent_num, C))
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((8, C, Cout)) * 0.2
                     ).astype(np.float32))
    args = _args(ewp)
    plan_j = jax.tree_util.tree_map(jnp.asarray, plan)

    out = np.asarray(windowed_up_conv(xb, w, *args), np.float32)
    ref = np.asarray(sparse_up_conv(xb, w, plan_j), np.float32)
    d = np.abs(out[:child_num] - ref[:child_num])
    rowscale = np.abs(ref[:child_num]).max(axis=1, keepdims=True) + 1e-3
    assert (d > rowscale * 2.0 ** -6).sum() == 0
    assert not out[child_num:].any()

    tgt = jnp.asarray(rng.standard_normal((child_cap, Cout)).astype(
        np.float32) * (np.arange(child_cap) < child_num)[:, None])
    gx1, gw1 = jax.grad(
        lambda x_, w_: jnp.sum(
            (windowed_up_conv(x_, w_, *args).astype(jnp.float32)
             - tgt) ** 2), (0, 1))(xb, w)
    gx0, gw0 = jax.grad(
        lambda x_, w_: jnp.sum(
            (sparse_up_conv(x_, w_, plan_j).astype(jnp.float32) - tgt) ** 2),
        (0, 1))(xb, w)
    gx1, gx0 = np.asarray(gx1, np.float32), np.asarray(gx0, np.float32)
    assert np.abs(gx1 - gx0).max() / np.abs(gx0).max() < 1e-2
    gw1, gw0 = np.asarray(gw1), np.asarray(gw0)
    assert np.abs(gw1 - gw0).max() / np.abs(gw0).max() < 1e-3


@pytest.mark.parametrize("C,Cout", [(32, 32), (96, 96)])
def test_mixed_up_conv_tpu(edge_fixture, C, Cout):
    """mixed_up_conv (XLA fwd + windowed parent-grid bwd — the model's
    production up-conv path) vs sparse_up_conv on chip."""
    from openscene_tpu.sparse.pallas_edge import mixed_up_conv
    plan, ewp, child_cap, child_num, parent_cap, parent_num = edge_fixture
    rng = np.random.default_rng(3)
    x = np.zeros((parent_cap, C), np.float32)
    x[:parent_num] = rng.standard_normal((parent_num, C))
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((8, C, Cout)) * 0.2
                     ).astype(np.float32))
    plan_j = jax.tree_util.tree_map(jnp.asarray, plan)
    margs = (plan_j.child_parent, plan_j.child_offset,
             jnp.asarray(ewp.dwin_start), jnp.asarray(ewp.dlidx),
             jnp.asarray(ewp.dspill_ent), jnp.asarray(ewp.dspill_fwd))

    out = np.asarray(mixed_up_conv(xb, w, *margs), np.float32)
    ref = np.asarray(sparse_up_conv(xb, w, plan_j), np.float32)
    np.testing.assert_array_equal(out, ref)  # identical fwd formulation

    tgt = jnp.asarray(rng.standard_normal((child_cap, Cout)).astype(
        np.float32) * (np.arange(child_cap) < child_num)[:, None])
    gx1, gw1 = jax.grad(
        lambda x_, w_: jnp.sum(
            (mixed_up_conv(x_, w_, *margs).astype(jnp.float32)
             - tgt) ** 2), (0, 1))(xb, w)
    gx0, gw0 = jax.grad(
        lambda x_, w_: jnp.sum(
            (sparse_up_conv(x_, w_, plan_j).astype(jnp.float32) - tgt) ** 2),
        (0, 1))(xb, w)
    gx1, gx0 = np.asarray(gx1, np.float32), np.asarray(gx0, np.float32)
    assert np.abs(gx1 - gx0).max() / np.abs(gx0).max() < 1e-2
    assert not gx1[parent_num:].any()
    gw1, gw0 = np.asarray(gw1), np.asarray(gw0)
    assert np.abs(gw1 - gw0).max() / np.abs(gw0).max() < 1e-3
