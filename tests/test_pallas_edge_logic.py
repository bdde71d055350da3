"""Edge-kernel (k=2 s=2 down/up conv) LOGIC tests on the Pallas interpreter.

Same scheme as test_pallas_conv_logic: the interpreter executes the exact
kernel bodies with GEMMs upcast to f32, pinning plan+kernel semantics
against the brute-force-verified XLA gather path on every CPU run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openscene_tpu.sparse import pallas_conv, pallas_edge
from openscene_tpu.sparse.geometry import build_unet_geometry
from openscene_tpu.sparse.ops import sparse_down_conv, sparse_up_conv
from openscene_tpu.sparse.pallas_edge import (build_edge_window_plan,
                                              windowed_down_conv,
                                              windowed_up_conv)


@pytest.fixture(scope="module", autouse=True)
def _interpret_mode():
    pallas_conv.INTERPRET = True
    for c in (pallas_edge._down_cached, pallas_edge._down_bwd_cached,
              pallas_edge._up_cached, pallas_edge._up_bwd_cached):
        c.cache_clear()
    yield
    pallas_conv.INTERPRET = False
    for c in (pallas_edge._down_cached, pallas_edge._down_bwd_cached,
              pallas_edge._up_cached, pallas_edge._up_bwd_cached):
        c.cache_clear()


@pytest.fixture(scope="module")
def edge_fixture():
    rng = np.random.default_rng(2)
    n = 9000
    xy = rng.integers(0, 110, (n, 2))
    z = (20 + 10 * np.sin(xy[:, 0] / 14) + 10 * np.cos(xy[:, 1] / 17)
         ).astype(int) + rng.integers(0, 3, n)
    coords = np.unique(np.concatenate(
        [np.zeros((n, 1), int), xy, z[:, None]], 1), axis=0).astype(np.int32)
    geo = build_unet_geometry(coords, build_windows=False)
    plan = geo.down[0]
    child_cap = geo.levels[0].cap
    child_num = int(geo.levels[0].num)
    parent_cap = geo.levels[1].cap
    parent_num = int(geo.levels[1].num)

    # Inject CONSISTENT long-range child<->parent reassignments so both
    # spill kinds (down (tile, offset) entries and up child-tiles) are
    # exercised: move a child to a far parent's empty offset slot, keeping
    # fwd and (child_parent, child_offset) exact transposes.
    fwd = np.asarray(plan.fwd).copy()
    cp = np.asarray(plan.child_parent).copy()
    co = np.asarray(plan.child_offset).copy()
    moved = 0
    for c0, p0 in ((5, parent_num - 3), (child_num - 7, 2),
                   (child_num // 2, parent_num - 5)):
        k_old, p_old = int(co[c0]), int(cp[c0])
        for k0 in range(8):
            if fwd[k0, p0] >= child_num:      # empty slot at the far parent
                fwd[k_old, p_old] = child_cap - 1   # null (padded row)
                fwd[k0, p0] = c0
                cp[c0] = p0
                co[c0] = k0
                moved += 1
                break
    assert moved >= 2
    ewp = build_edge_window_plan(fwd, cp, co, child_num, parent_num)
    assert ewp is not None
    assert (np.asarray(ewp.dspill_ent) >= 0).any()
    assert (np.asarray(ewp.uspill_tile) >= 0).any()
    dplan = plan._replace(fwd=fwd, child_parent=cp, child_offset=co)
    return (dplan, ewp, child_cap, child_num, parent_cap, parent_num)


def _plan_args(ewp):
    return tuple(jnp.asarray(a) for a in ewp)


@pytest.mark.parametrize("C,Cout", [(32, 32), (64, 96)])
def test_windowed_down_conv_logic(edge_fixture, C, Cout):
    dplan, ewp, child_cap, child_num, parent_cap, parent_num = edge_fixture
    rng = np.random.default_rng(0)
    x = np.zeros((child_cap, C), np.float32)
    x[:child_num] = rng.standard_normal((child_num, C))
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((8, C, Cout)) * 0.2
                     ).astype(np.float32))
    args = _plan_args(ewp)
    dplan_j = jax.tree_util.tree_map(jnp.asarray, dplan)

    out = np.asarray(windowed_down_conv(xb, w, *args), np.float32)
    ref = np.asarray(sparse_down_conv(xb, w, dplan_j), np.float32)
    np.testing.assert_allclose(out[:parent_num], ref[:parent_num],
                               rtol=5e-2, atol=6e-2)
    assert not out[parent_num:].any()

    tgt = jnp.asarray(rng.standard_normal((parent_cap, Cout)).astype(
        np.float32) * (np.arange(parent_cap) < parent_num)[:, None])
    gx1, gw1 = jax.grad(
        lambda x_, w_: jnp.sum(
            (windowed_down_conv(x_, w_, *args).astype(jnp.float32)
             - tgt) ** 2), (0, 1))(xb, w)
    gx0, gw0 = jax.grad(
        lambda x_, w_: jnp.sum(
            (sparse_down_conv(x_, w_, dplan_j).astype(jnp.float32)
             - tgt) ** 2), (0, 1))(xb, w)
    gx1, gx0 = np.asarray(gx1, np.float32), np.asarray(gx0, np.float32)
    assert np.abs(gx1 - gx0).max() / np.abs(gx0).max() < 2e-2
    assert not gx1[child_num:].any()
    gw1, gw0 = np.asarray(gw1), np.asarray(gw0)
    assert np.abs(gw1 - gw0).max() / np.abs(gw0).max() < 5e-3


@pytest.mark.parametrize("C,Cout", [(32, 32), (96, 64)])
def test_windowed_up_conv_logic(edge_fixture, C, Cout):
    dplan, ewp, child_cap, child_num, parent_cap, parent_num = edge_fixture
    rng = np.random.default_rng(1)
    x = np.zeros((parent_cap, C), np.float32)
    x[:parent_num] = rng.standard_normal((parent_num, C))
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((8, C, Cout)) * 0.2
                     ).astype(np.float32))
    args = _plan_args(ewp)
    dplan_j = jax.tree_util.tree_map(jnp.asarray, dplan)

    out = np.asarray(windowed_up_conv(xb, w, *args), np.float32)
    ref = np.asarray(sparse_up_conv(xb, w, dplan_j), np.float32)
    np.testing.assert_allclose(out[:child_num], ref[:child_num],
                               rtol=5e-2, atol=6e-2)
    assert not out[child_num:].any()

    tgt = jnp.asarray(rng.standard_normal((child_cap, Cout)).astype(
        np.float32) * (np.arange(child_cap) < child_num)[:, None])
    gx1, gw1 = jax.grad(
        lambda x_, w_: jnp.sum(
            (windowed_up_conv(x_, w_, *args).astype(jnp.float32)
             - tgt) ** 2), (0, 1))(xb, w)
    gx0, gw0 = jax.grad(
        lambda x_, w_: jnp.sum(
            (sparse_up_conv(x_, w_, dplan_j).astype(jnp.float32)
             - tgt) ** 2), (0, 1))(xb, w)
    gx1, gx0 = np.asarray(gx1, np.float32), np.asarray(gx0, np.float32)
    assert np.abs(gx1 - gx0).max() / np.abs(gx0).max() < 2e-2
    assert not gx1[parent_num:].any()
    gw1, gw0 = np.asarray(gw1), np.asarray(gw0)
    assert np.abs(gw1 - gw0).max() / np.abs(gw0).max() < 5e-3


@pytest.mark.parametrize("C,Cout", [(32, 32), (96, 64)])
def test_mixed_up_conv_logic(edge_fixture, C, Cout):
    """mixed_up_conv (XLA fwd + windowed parent-grid bwd) == sparse_up_conv
    in both directions."""
    from openscene_tpu.sparse.pallas_edge import mixed_up_conv
    dplan, ewp, child_cap, child_num, parent_cap, parent_num = edge_fixture
    rng = np.random.default_rng(4)
    x = np.zeros((parent_cap, C), np.float32)
    x[:parent_num] = rng.standard_normal((parent_num, C))
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((8, C, Cout)) * 0.2
                     ).astype(np.float32))
    dplan_j = jax.tree_util.tree_map(jnp.asarray, dplan)
    margs = (dplan_j.child_parent, dplan_j.child_offset,
             jnp.asarray(ewp.dwin_start), jnp.asarray(ewp.dlidx),
             jnp.asarray(ewp.dspill_ent), jnp.asarray(ewp.dspill_fwd))

    out = np.asarray(mixed_up_conv(xb, w, *margs), np.float32)
    ref = np.asarray(sparse_up_conv(xb, w, dplan_j), np.float32)
    # identical forward formulation -> bit-equal
    np.testing.assert_array_equal(out, ref)

    tgt = jnp.asarray(rng.standard_normal((child_cap, Cout)).astype(
        np.float32) * (np.arange(child_cap) < child_num)[:, None])
    gx1, gw1 = jax.grad(
        lambda x_, w_: jnp.sum(
            (mixed_up_conv(x_, w_, *margs).astype(jnp.float32)
             - tgt) ** 2), (0, 1))(xb, w)
    gx0, gw0 = jax.grad(
        lambda x_, w_: jnp.sum(
            (sparse_up_conv(x_, w_, dplan_j).astype(jnp.float32)
             - tgt) ** 2), (0, 1))(xb, w)
    gx1, gx0 = np.asarray(gx1, np.float32), np.asarray(gx0, np.float32)
    assert np.abs(gx1 - gx0).max() / np.abs(gx0).max() < 2e-2
    assert not gx1[parent_num:].any()
    gw1, gw0 = np.asarray(gw1), np.asarray(gw0)
    assert np.abs(gw1 - gw0).max() / np.abs(gw0).max() < 5e-3
