"""Windowed Pallas conv vs the XLA gather path — runs on real TPU only
(the rest of the suite forces CPU where Mosaic kernels cannot lower).

Run manually on a TPU host:
    OPENSCENE_TPU_TESTS=1 python -m pytest tests/test_pallas_conv_tpu.py -q
"""

import numpy as np
import pytest

import jax

if jax.default_backend() != "tpu":
    pytest.skip("Pallas windowed kernels require a real TPU backend",
                allow_module_level=True)

import jax.numpy as jnp

from openscene_tpu.sparse.geometry import build_unet_geometry
from openscene_tpu.sparse.ops import sparse_conv
from openscene_tpu.sparse.pallas_conv import (build_window_plan,
                                              windowed_sparse_conv)


@pytest.fixture(scope="module")
def real_plan():
    rng = np.random.default_rng(1)
    n = 60_000
    xy = rng.integers(0, 300, (n, 2))
    z = (50 + 25 * np.sin(xy[:, 0] / 40) + 25 * np.cos(xy[:, 1] / 50)
         ).astype(int) + rng.integers(0, 3, n)
    coords = np.unique(np.concatenate(
        [np.zeros((n, 1), int), xy, z[:, None]], 1), axis=0).astype(np.int32)
    geo = build_unet_geometry(coords, build_windows=False)
    plan = geo.self3[0]
    cap, num = geo.levels[0].cap, int(geo.levels[0].num)
    wp = build_window_plan(np.asarray(plan.fwd), num, cap)
    assert wp is not None
    return plan, wp, cap, num


@pytest.mark.parametrize("C,Cout", [(128, 96), (32, 32), (96, 64),
                                    (256, 256)])
def test_windowed_conv_bitexact_fwd_and_grads(real_plan, C, Cout):
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
    if C >= 128:
        # the paired-gather kernel contracts the K*C GEMM in [evens|odds]
        # channel order and the XLA path scans 27 offsets — different f32
        # accumulation orders, so rare outputs land one bf16 ulp apart at
        # the scale of the ROW's accumulation (near-cancellation sums see
        # that as a large relative error on a tiny value). Bound: every
        # element within 2^-7 of its row's max |ref|, <0.1% differ at all.
        d = np.abs(out[:num] - ref[:num])
        rowscale = np.abs(ref[:num]).max(axis=1, keepdims=True)
        assert (d > rowscale * 2.0 ** -7).sum() == 0
        assert (d > 0).mean() < 1e-3
    else:
        # phase-packed narrow channels accumulate the K*C contraction in a
        # different f32 order than the XLA 27-step scan: tiny reordering
        # noise, verified against plan-level brute force elsewhere
        np.testing.assert_allclose(out[:num], ref[:num], rtol=5e-3, atol=5e-2)

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
    gx1np = np.asarray(gx1, np.float32)[:num]
    gx0np = np.asarray(gx0, np.float32)[:num]
    # paired gathers / class splits / phase packing: different f32
    # accumulation order, same (k, row, fwd) pair set
    denom_x = np.abs(gx0np).max()
    assert np.abs(gx1np - gx0np).max() / denom_x < 1e-2
    # dW differs only by f32 summation order (per-tile kernel accumulator vs
    # one full-cap dot); values are O(1e3) sums of ~1e5 bf16 products
    gw1, gw0 = np.asarray(gw1), np.asarray(gw0)
    denom = np.abs(gw0).max()
    assert np.abs(gw1 - gw0).max() / denom < 1e-3
