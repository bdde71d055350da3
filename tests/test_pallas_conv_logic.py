"""Windowed-kernel LOGIC tests on the Pallas interpreter (no TPU needed).

The interpreter executes the exact kernel body (DMAs, crossbar gathers,
pair unpacking, spill corrections) with GEMMs upcast to f32
(pallas_conv.INTERPRET), so these tests pin the plan+kernel semantics
against the brute-force-verified XLA gather path on every CPU run of the
suite.  Mosaic-specific lowering (layouts, DMA alignment) is still only
covered by tests/test_pallas_conv_tpu.py on a real chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openscene_tpu.sparse import pallas_conv
from openscene_tpu.sparse.geometry import build_unet_geometry
from openscene_tpu.sparse.ops import sparse_conv
from openscene_tpu.sparse.pallas_conv import (build_window_plan,
                                              windowed_sparse_conv)


@pytest.fixture(scope="module", autouse=True)
def _interpret_mode():
    pallas_conv.INTERPRET = True
    pallas_conv._fwd_cached.cache_clear()
    pallas_conv._bwd_cached.cache_clear()
    yield
    pallas_conv.INTERPRET = False
    pallas_conv._fwd_cached.cache_clear()
    pallas_conv._bwd_cached.cache_clear()


@pytest.fixture(scope="module")
def real_plan():
    rng = np.random.default_rng(1)
    n = 6000
    xy = rng.integers(0, 95, (n, 2))
    z = (18 + 9 * np.sin(xy[:, 0] / 12) + 9 * np.cos(xy[:, 1] / 15)
         ).astype(int) + rng.integers(0, 3, n)
    coords = np.unique(np.concatenate(
        [np.zeros((n, 1), int), xy, z[:, None]], 1), axis=0).astype(np.int32)
    geo = build_unet_geometry(coords, build_windows=False)
    plan = geo.self3[0]
    cap, num = geo.levels[0].cap, int(geo.levels[0].num)
    # inject long-range neighbors into two tiles so the spill-correction
    # path is exercised (the windowed and XLA paths consume the SAME plan,
    # so the comparison stays exact regardless of geometric plausibility)
    fwd = np.asarray(plan.fwd).copy()
    t2 = num // 128 - 2  # stay within real (non-padded) output rows
    fwd[4, 3 * 128:3 * 128 + 5] = num - 1
    fwd[22, t2 * 128:t2 * 128 + 5] = 0
    plan = plan._replace(fwd=fwd)
    wp = build_window_plan(fwd, num, cap)
    assert wp is not None
    assert (np.asarray(wp.spill_ent) >= 0).any()
    return plan, wp, cap, num


@pytest.mark.parametrize("C,Cout", [(32, 64), (96, 96), (256, 256)])
def test_windowed_logic_fwd_and_grads(real_plan, C, Cout):
    # (256, 256) is the production L4 combination: single-call forward,
    # class-split backward (bwd VMEM budget exceeded, fwd not)
    plan, wp, cap, num = real_plan
    rng = np.random.default_rng(0)
    x = np.zeros((cap, C), np.float32)
    x[:num] = rng.standard_normal((num, C))
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((27, C, Cout)) * 0.1
                     ).astype(np.float32))
    fp = jnp.asarray(plan.flip_perm)
    fwd = jnp.asarray(plan.fwd)
    args = (jnp.asarray(wp.win_start), jnp.asarray(wp.lidx),
            jnp.asarray(wp.spill_ent), jnp.asarray(wp.spill_fwd))

    out = np.asarray(windowed_sparse_conv(xb, w, fp, *args), np.float32)
    ref = np.asarray(sparse_conv(xb, w, fwd, fp), np.float32)
    # identical (k, row) pair sets; f32-vs-bf16 GEMM + accumulation-order
    # differences only
    np.testing.assert_allclose(out[:num], ref[:num], rtol=5e-2, atol=5e-2)
    # padded rows must stay exactly zero (load-bearing invariant, see
    # sparse/ops.py)
    assert not out[num:].any()

    tgt = jnp.asarray(rng.standard_normal((cap, Cout)).astype(np.float32)
                      * (np.arange(cap) < num)[:, None])

    def loss_w(x_, w_):
        o = windowed_sparse_conv(x_, w_, fp, *args)
        return jnp.sum((o.astype(jnp.float32) - tgt) ** 2)

    def loss_x(x_, w_):
        o = sparse_conv(x_, w_, fwd, fp)
        return jnp.sum((o.astype(jnp.float32) - tgt) ** 2)

    gx1, gw1 = jax.grad(loss_w, (0, 1))(xb, w)
    gx0, gw0 = jax.grad(loss_x, (0, 1))(xb, w)
    gx1np = np.asarray(gx1, np.float32)
    gx0np = np.asarray(gx0, np.float32)
    denom_x = np.abs(gx0np).max()
    assert np.abs(gx1np - gx0np).max() / denom_x < 2e-2
    assert not gx1np[num:].any()
    gw1, gw0 = np.asarray(gw1), np.asarray(gw0)
    denom = np.abs(gw0).max()
    assert np.abs(gw1 - gw0).max() / denom < 5e-3


def test_windowed_logic_narrow_wins(real_plan, monkeypatch):
    """Cap-keyed narrow windows (the L0 (384,384,384) configuration):
    force wins_for_cap to the narrow choice at the fixture's small cap and
    pin plan+kernel agreement with the XLA path, including the (larger)
    spill set the narrow side windows produce."""
    plan, _, cap, num = real_plan
    monkeypatch.setattr(pallas_conv, "NARROW_MIN_CAP", 0)
    assert pallas_conv.wins_for_cap(cap) == pallas_conv.WINS_NARROW
    wp = build_window_plan(np.asarray(plan.fwd), num, cap)
    assert wp is not None
    C, Cout = 96, 96
    rng = np.random.default_rng(3)
    x = np.zeros((cap, C), np.float32)
    x[:num] = rng.standard_normal((num, C))
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((27, C, Cout)) * 0.1
                     ).astype(np.float32))
    fp = jnp.asarray(plan.flip_perm)
    fwd = jnp.asarray(plan.fwd)
    args = (jnp.asarray(wp.win_start), jnp.asarray(wp.lidx),
            jnp.asarray(wp.spill_ent), jnp.asarray(wp.spill_fwd))
    out = np.asarray(windowed_sparse_conv(xb, w, fp, *args), np.float32)
    ref = np.asarray(sparse_conv(xb, w, fwd, fp), np.float32)
    np.testing.assert_allclose(out[:num], ref[:num], rtol=5e-2, atol=5e-2)
    assert not out[num:].any()

    tgt = jnp.asarray(rng.standard_normal((cap, Cout)).astype(np.float32)
                      * (np.arange(cap) < num)[:, None])
    gx1, gw1 = jax.grad(
        lambda x_, w_: jnp.sum(
            (windowed_sparse_conv(x_, w_, fp, *args).astype(jnp.float32)
             - tgt) ** 2), (0, 1))(xb, w)
    gx0, gw0 = jax.grad(
        lambda x_, w_: jnp.sum(
            (sparse_conv(x_, w_, fwd, fp).astype(jnp.float32) - tgt) ** 2),
        (0, 1))(xb, w)
    assert (np.abs(np.asarray(gx1) - np.asarray(gx0)).max()
            / np.abs(np.asarray(gx0)).max() < 2e-2)
    assert (np.abs(np.asarray(gw1) - np.asarray(gw0)).max()
            / np.abs(np.asarray(gw0)).max() < 5e-3)
    assert not np.asarray(gx1)[num:].any()


def test_windowed_logic_class_split(real_plan):
    """384-wide channels exceed the single-call VMEM budget: the fwd and
    bwd both split into one kernel call per dx class."""
    plan, wp, cap, num = real_plan
    C = Cout = 384
    assert pallas_conv._pick_mtile(27, C, 384, backward=False) == 0
    rng = np.random.default_rng(0)
    x = np.zeros((cap, C), np.float32)
    x[:num] = rng.standard_normal((num, C))
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((27, C, Cout)) * 0.1
                     ).astype(np.float32))
    fp = jnp.asarray(plan.flip_perm)
    fwd = jnp.asarray(plan.fwd)
    args = (jnp.asarray(wp.win_start), jnp.asarray(wp.lidx),
            jnp.asarray(wp.spill_ent), jnp.asarray(wp.spill_fwd))
    out = np.asarray(windowed_sparse_conv(xb, w, fp, *args), np.float32)
    ref = np.asarray(sparse_conv(xb, w, fwd, fp), np.float32)
    np.testing.assert_allclose(out[:num], ref[:num], rtol=5e-2, atol=8e-2)

    tgt = jnp.asarray(rng.standard_normal((cap, Cout)).astype(np.float32)
                      * (np.arange(cap) < num)[:, None])
    gx1, gw1 = jax.grad(
        lambda x_, w_: jnp.sum(
            (windowed_sparse_conv(x_, w_, fp, *args).astype(jnp.float32)
             - tgt) ** 2), (0, 1))(xb, w)
    gx0, gw0 = jax.grad(
        lambda x_, w_: jnp.sum(
            (sparse_conv(x_, w_, fwd, fp).astype(jnp.float32) - tgt) ** 2),
        (0, 1))(xb, w)
    assert (np.abs(np.asarray(gx1) - np.asarray(gx0)).max()
            / np.abs(np.asarray(gx0)).max() < 2e-2)
    assert (np.abs(np.asarray(gw1) - np.asarray(gw0)).max()
            / np.abs(np.asarray(gw0)).max() < 5e-3)
