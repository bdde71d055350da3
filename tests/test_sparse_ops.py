"""Sparse conv engine vs brute-force dense reference + gradient checks."""

import jax
import jax.numpy as jnp
import jax.test_util
import numpy as np
import pytest

from openscene_tpu.sparse.geometry import (GeometryCaps, build_down_edge,
                                           build_self_plan, _pad_level)
from openscene_tpu.sparse.ops import (masked_batch_norm, sparse_conv,
                                      sparse_down_conv, sparse_up_conv,
                                      valid_mask)
from openscene_tpu.sparse.types import stencil_offsets

from tests.test_geometry import random_coords


def brute_conv(coords, feats, w, offsets):
    """Dense reference: out[u] = sum_k feat[u + delta_k] @ w[k]."""
    table = {tuple(c): i for i, c in enumerate(coords.tolist())}
    out = np.zeros((len(coords), w.shape[-1]), dtype=np.float64)
    for k, d in enumerate(offsets.tolist()):
        for r, c in enumerate(coords.tolist()):
            src = table.get((c[0], c[1] + d[0], c[2] + d[1], c[3] + d[2]))
            if src is not None:
                out[r] += feats[src] @ w[k]
    return out


def test_sparse_conv_matches_bruteforce(rng):
    coords = random_coords(rng, n=150, span=8)
    n, cap = len(coords), 256
    level = _pad_level(coords, cap)
    plan = build_self_plan(level, 3)
    cin, cout = 5, 7
    feats = np.zeros((cap, cin), dtype=np.float32)
    feats[:n] = rng.standard_normal((n, cin)).astype(np.float32)
    w = rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2

    out = np.asarray(sparse_conv(jnp.asarray(feats), jnp.asarray(w),
                                 jnp.asarray(plan.fwd),
                                 jnp.asarray(plan.flip_perm)))
    ref = brute_conv(coords, feats[:n], w, stencil_offsets(3))
    np.testing.assert_allclose(out[:n], ref, rtol=2e-4, atol=2e-4)
    # padded rows stay exactly zero
    assert np.abs(out[n:]).max() == 0


def test_sparse_conv_grads(rng):
    """Custom-VJP grads vs plain autodiff of the same gather formulation.

    The custom VJP discards the gradient flowing into the reserved null row
    (that row is structurally zero), so gradients are compared on valid rows
    only; dW must match exactly everywhere.
    """
    coords = random_coords(rng, n=40, span=5)
    n, cap = len(coords), 64
    level = _pad_level(coords, cap)
    plan = build_self_plan(level, 3)
    cin, cout = 3, 4
    feats = np.zeros((cap, cin), dtype=np.float32)
    feats[:n] = rng.standard_normal((n, cin)).astype(np.float32)
    w = rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.3
    fwd = jnp.asarray(plan.fwd)
    perm = jnp.asarray(plan.flip_perm)
    tgt = rng.standard_normal((cap, cout)).astype(np.float32)
    tgt[n:] = 0.0

    def loss_custom(x, w):
        return jnp.sum((sparse_conv(x, w, fwd, perm) - tgt) ** 2)

    def loss_plain(x, w):
        out = sum(jnp.take(x, fwd[k], axis=0) @ w[k] for k in range(27))
        return jnp.sum((out - tgt) ** 2)

    gx_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(w))
    gx_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx_c)[:n], np.asarray(gx_p)[:n],
                               rtol=1e-4, atol=1e-4)
    # padded (non-null) rows carry no gradient in either formulation
    np.testing.assert_allclose(np.asarray(gx_c)[n:-1], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_p),
                               rtol=1e-4, atol=1e-4)


def test_down_up_conv_match_bruteforce(rng):
    coords = random_coords(rng, n=120, span=8)
    n, cap = len(coords), 256
    fine = _pad_level(coords, cap)
    coarse, plan = build_down_edge(fine, 128)
    nc = int(coarse.num)
    cin, cout = 4, 6
    feats = np.zeros((cap, cin), dtype=np.float32)
    feats[:n] = rng.standard_normal((n, cin)).astype(np.float32)
    w = rng.standard_normal((8, cin, cout)).astype(np.float32) * 0.3

    out = np.asarray(sparse_down_conv(jnp.asarray(feats), jnp.asarray(w), plan))
    # brute force: out[p] = sum over children at 2p + delta
    table = {tuple(c): i for i, c in enumerate(coords.tolist())}
    offs = stencil_offsets(2)
    ref = np.zeros((nc, cout))
    for p, c in enumerate(coarse.coords[:nc].tolist()):
        for k, d in enumerate(offs.tolist()):
            src = table.get((c[0], 2 * c[1] + d[0], 2 * c[2] + d[1],
                             2 * c[3] + d[2]))
            if src is not None:
                ref[p] += feats[src] @ w[k]
    np.testing.assert_allclose(out[:nc], ref, rtol=2e-4, atol=2e-4)
    assert np.abs(out[nc:]).max() == 0

    # transpose: up[child] = coarse_feat[parent(child)] @ w[offset(child)]
    cfeats = np.zeros((128, cin), dtype=np.float32)
    cfeats[:nc] = rng.standard_normal((nc, cin)).astype(np.float32)
    up = np.asarray(sparse_up_conv(jnp.asarray(cfeats), jnp.asarray(w), plan))
    for i, c in enumerate(coords.tolist()):
        p = int(plan.child_parent[i])
        k = int(plan.child_offset[i])
        np.testing.assert_allclose(up[i], cfeats[p] @ w[k], rtol=2e-4,
                                   atol=2e-4)
    assert np.abs(up[n:]).max() == 0


def test_down_up_grads(rng):
    coords = random_coords(rng, n=30, span=5)
    n, cap = len(coords), 64
    fine = _pad_level(coords, cap)
    coarse, plan = build_down_edge(fine, 64)
    cin, cout = 3, 4
    feats = np.zeros((cap, cin), dtype=np.float32)
    feats[:n] = rng.standard_normal((n, cin)).astype(np.float32)
    w = rng.standard_normal((8, cin, cout)).astype(np.float32) * 0.3

    fwd = jnp.asarray(plan.fwd)

    def down_plain(x, w):
        return sum(jnp.take(x, fwd[k], axis=0) @ w[k] for k in range(8))

    def loss_down(x, w):
        return jnp.sum(sparse_down_conv(x, w, plan) ** 2)

    def loss_down_plain(x, w):
        return jnp.sum(down_plain(x, w) ** 2)

    gx_c, gw_c = jax.grad(loss_down, (0, 1))(jnp.asarray(feats), jnp.asarray(w))
    gx_p, gw_p = jax.grad(loss_down_plain, (0, 1))(jnp.asarray(feats),
                                                   jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx_c)[:n], np.asarray(gx_p)[:n],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_p), rtol=1e-4,
                               atol=1e-4)

    nc = int(coarse.num)
    cfeats = np.zeros((64, cin), dtype=np.float32)
    cfeats[:nc] = rng.standard_normal((nc, cin)).astype(np.float32)

    flat_idx = jnp.asarray(plan.child_offset * 64 + plan.child_parent)

    def up_plain(x, w):
        y = jnp.einsum("pc,kcd->kpd", x, w)
        return jnp.take(y.reshape(-1, w.shape[-1]), flat_idx, axis=0)

    def loss_up(x, w):
        return jnp.sum(sparse_up_conv(x, w, plan) ** 2)

    def loss_up_plain(x, w):
        return jnp.sum(up_plain(x, w) ** 2)

    gx_c, gw_c = jax.grad(loss_up, (0, 1))(jnp.asarray(cfeats), jnp.asarray(w))
    gx_p, gw_p = jax.grad(loss_up_plain, (0, 1))(jnp.asarray(cfeats),
                                                 jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx_c)[:nc], np.asarray(gx_p)[:nc],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_p), rtol=1e-4,
                               atol=1e-4)


def test_masked_batch_norm(rng):
    cap, c, n = 32, 4, 20
    x = np.zeros((cap, c), dtype=np.float32)
    x[:n] = rng.standard_normal((n, c)).astype(np.float32)
    num = jnp.int32(n)
    mask = valid_mask(num, cap)
    gamma, beta = jnp.ones(c), jnp.zeros(c) + 0.5
    rm, rv = jnp.zeros(c), jnp.ones(c)
    out, nm, nv = masked_batch_norm(jnp.asarray(x), mask, num, gamma, beta,
                                    rm, rv, train=True)
    out = np.asarray(out)
    # valid rows are normalized
    np.testing.assert_allclose(out[:n].mean(0), 0.5, atol=1e-4)
    np.testing.assert_allclose(out[:n].std(0), 1.0, atol=1e-2)
    # padded rows stay zero despite beta
    assert np.abs(out[n:]).max() == 0
    # running stats moved toward batch stats
    np.testing.assert_allclose(np.asarray(nm), 0.1 * x[:n].mean(0), atol=1e-5)

    # eval mode uses running stats and does not change them
    out_e, nm2, nv2 = masked_batch_norm(jnp.asarray(x), mask, num, gamma,
                                        beta, nm, nv, train=False)
    np.testing.assert_allclose(np.asarray(nm2), np.asarray(nm))


def test_conv_bf16_path(rng):
    coords = random_coords(rng, n=100, span=8)
    n, cap = len(coords), 256
    level = _pad_level(coords, cap)
    plan = build_self_plan(level, 3)
    feats = np.zeros((cap, 8), dtype=np.float32)
    feats[:n] = rng.standard_normal((n, 8)).astype(np.float32)
    w = rng.standard_normal((27, 8, 8)).astype(np.float32) * 0.2
    out32 = np.asarray(sparse_conv(jnp.asarray(feats), jnp.asarray(w),
                                   jnp.asarray(plan.fwd),
                                   jnp.asarray(plan.flip_perm)))
    out16 = np.asarray(sparse_conv(jnp.asarray(feats, dtype=jnp.bfloat16),
                                   jnp.asarray(w), jnp.asarray(plan.fwd),
                                   jnp.asarray(plan.flip_perm))).astype(np.float32)
    np.testing.assert_allclose(out16[:n], out32[:n], rtol=0.1, atol=0.15)
