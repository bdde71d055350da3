"""Device-side sparse tensor ops: scatter-free convolutions + masked norms.

The compute path of the engine (replaces MinkowskiEngine's CUDA
gather-GEMM-scatter conv, MinkowskiBatchNorm/ReLU, ME.cat — reference
``models/mink_unet.py:25-26``).  All ops run on padded static-shape buffers
where rows ``[0, num)`` are valid and row ``cap-1`` is the reserved null row.

Invariants (see sparse/types.py):
* activations are exactly zero at every padded row (incl. the null row);
* cotangents are zero at padded rows — ops that would break this (BatchNorm's
  beta shift) re-apply the row mask, and every gather that can miss points at
  the null row, so convolution backward needs no masking and no scatter.

Precision: weights are stored fp32; gathers and MXU matmuls run in
``compute_dtype`` (bfloat16 by default) with fp32 accumulation
(``preferred_element_type``), and activations are carried in compute dtype to
halve HBM traffic.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .types import ConvPlan, DownPlan


def valid_mask(num, cap: int, dtype=jnp.float32):
    """(cap, 1) mask of valid rows."""
    return (jnp.arange(cap)[:, None] < num).astype(dtype)


# Above this many gathered elements (K * rows * C) the one-shot im2col
# buffer would rival the activations themselves in HBM; scan instead.
# 2^28 elems = 512MB bf16: admits every down/up edge and spill bucket at
# bench scale while keeping the full-cap 27-tap XLA conv on the scan path.
_IM2COL_MAX_ELEMS = 1 << 28


def _take_rows(x, idx):
    """Row gather.  TPU row-gathers are INDEX-bound (~12ns/row for any
    width <= 128 lanes), but narrow bf16 rows still gain ~1.8x measured
    when gathered as bitcast f32 channel pairs (half the lanes); wide
    widths regress through the bitcast reshape, keep them raw."""
    C = x.shape[1]
    if x.dtype == jnp.bfloat16 and C in (32, 64):
        xp = jax.lax.bitcast_convert_type(
            x.reshape(-1, C // 2, 2), jnp.float32)
        g = jnp.take(xp, idx, axis=0)
        return jax.lax.bitcast_convert_type(g, jnp.bfloat16).reshape(-1, C)
    return jnp.take(x, idx, axis=0)


def _gather_matmul_sum(x, w, fwd, out_rows: int):
    """sum_k x[fwd[k]] @ w[k] with fp32 accumulation.

    Fast path: ONE row-gather of all K index planes + ONE (rows, K*C) @
    (K*C, Cout) im2col GEMM — a K-iteration lax.scan of gather+GEMM pays
    K dispatch/loop overheads and K small-M GEMMs, measured ~4x slower at
    down/up-edge shapes (profile: the edge scans + spill scans were ~35%
    of the round-2 train step).  Falls back to the scan when the im2col
    buffer would be oversized (the full-cap 27-tap stencil path)."""
    cdtype = x.dtype
    K, C = w.shape[0], x.shape[1]

    if fwd.size * C <= _IM2COL_MAX_ELEMS:
        g = _take_rows(x, fwd.reshape(-1))                # (K*rows, C)
        g = g.reshape(K, -1, C).transpose(1, 0, 2).reshape(-1, K * C)
        return jnp.dot(g, w.reshape(K * C, -1).astype(cdtype),
                       preferred_element_type=jnp.float32)

    def step(acc, kslice):
        idx, wk = kslice
        gk = jnp.take(x, idx, axis=0)
        acc = acc + jnp.dot(gk, wk.astype(cdtype),
                            preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((out_rows, w.shape[-1]), dtype=jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (fwd, w))
    return acc


@jax.custom_vjp
def sparse_conv(x, w, fwd, flip_perm):
    """Stride-1 stencil convolution on one level.

    x: (cap, Cin) activations (compute dtype), zeros at padded rows.
    w: (K, Cin, Cout) fp32 weights.
    fwd: (K, cap) int32 gather plan; flip_perm: (K,) mirrored-offset perm.
    Returns (cap, Cout) in x.dtype.
    """
    out = _gather_matmul_sum(x, w, fwd, x.shape[0])
    return out.astype(x.dtype)


def _sparse_conv_fwd(x, w, fwd, flip_perm):
    return sparse_conv(x, w, fwd, flip_perm), (x, w, fwd, flip_perm)


def _sparse_conv_bwd(res, g):
    """One gather of g per offset serves BOTH input and weight grads:

    with G_k = g[fwd[k]] (the transpose map of the mirrored offset),
      dx      = sum_k G_k @ w[flip(k)].T
      dW[f(k)] = x.T @ G_k
    (substituting v = fwd[k][r] in dW[k] = sum_r x[fwd[k][r]] g[r]^T turns the
    x-gather into the g-gather already needed for dx) — halves the backward's
    gather traffic, which is the dominant cost on TPU.
    """
    x, w, fwd, flip_perm = res
    cdtype = x.dtype
    w_flip_t = jnp.transpose(jnp.take(w, flip_perm, axis=0), (0, 2, 1))

    def step(acc, kslice):
        idx, wk_t = kslice
        gk = jnp.take(g, idx, axis=0)
        acc = acc + jnp.dot(gk, wk_t.astype(cdtype),
                            preferred_element_type=jnp.float32)
        dwk = jnp.dot(x.T, gk.astype(cdtype),
                      preferred_element_type=jnp.float32)
        return acc, dwk

    acc0 = jnp.zeros((g.shape[0], x.shape[1]), dtype=jnp.float32)
    dx, dw_flip = jax.lax.scan(step, acc0, (fwd, w_flip_t))
    dw = jnp.take(dw_flip, flip_perm, axis=0)  # un-permute: row k holds dW[k]
    return dx.astype(cdtype), dw.astype(w.dtype), None, None


sparse_conv.defvjp(_sparse_conv_fwd, _sparse_conv_bwd)


@jax.custom_vjp
def sparse_down_conv(x, w, plan):
    """kernel=2, stride=2 down conv: fine level -> coarse level.

    x: (child_cap, Cin); w: (8, Cin, Cout); returns (parent_cap, Cout).
    Each child feeds exactly one (parent, offset) pair, so the 8 gathers read
    each input row at most once — information-optimal traffic.
    """
    out = _gather_matmul_sum(x, w, plan.fwd, plan.fwd.shape[1])
    return out.astype(x.dtype)


def _down_fwd(x, w, plan):
    return sparse_down_conv(x, w, plan), (x, w, plan)


def _down_bwd(res, g):
    x, w, plan = res
    cdtype = x.dtype
    K, C = w.shape[0], x.shape[1]
    # dx[c] = g[parent(c)] @ w[offset(c)].T : transform-then-gather (one
    # gather for the whole backward input).
    y = jnp.einsum("pd,kdc->kpc", g, jnp.transpose(w, (0, 2, 1)).astype(cdtype),
                   preferred_element_type=jnp.float32).astype(cdtype)
    parent_cap = g.shape[0]
    flat_idx = plan.child_offset * parent_cap + plan.child_parent
    dx = _take_rows(y.reshape(-1, x.shape[1]), flat_idx)

    if plan.fwd.size * C <= _IM2COL_MAX_ELEMS:
        # dW via one im2col: X_g (rows, K*C); dW[k] = X_g[:, kC:(k+1)C]^T @ g
        gx = _take_rows(x, plan.fwd.reshape(-1)).reshape(K, -1, C)
        dw = jnp.einsum("kpc,pd->kcd", gx, g.astype(cdtype),
                        preferred_element_type=jnp.float32)
    else:
        def step(_, idx):
            gxk = jnp.take(x, idx, axis=0)
            return None, jnp.dot(gxk.T, g.astype(cdtype),
                                 preferred_element_type=jnp.float32)

        _, dw = jax.lax.scan(step, None, plan.fwd)
    return dx, dw.astype(w.dtype), None


sparse_down_conv.defvjp(_down_fwd, _down_bwd)


@jax.custom_vjp
def sparse_up_conv(x, w, plan):
    """kernel=2, stride=2 transposed conv: coarse level -> fine level.

    x: (parent_cap, Cin); w: (8, Cin, Cout); returns (child_cap, Cout).
    Dense per-offset GEMMs on the (small) coarse level, then ONE gather to
    place each child's value — the exact inverse of the down conv on the
    cached finer coordinates (ME transpose-conv semantics).
    """
    cdtype = x.dtype
    y = jnp.einsum("pc,kcd->kpd", x, w.astype(cdtype),
                   preferred_element_type=jnp.float32).astype(cdtype)
    parent_cap = x.shape[0]
    flat_idx = plan.child_offset * parent_cap + plan.child_parent
    return _take_rows(y.reshape(-1, w.shape[-1]), flat_idx)


def _up_fwd(x, w, plan):
    return sparse_up_conv(x, w, plan), (x, w, plan)


def _up_bwd(res, g):
    x, w, plan = res
    cdtype = x.dtype
    K, Cout = w.shape[0], w.shape[2]
    w_t = jnp.transpose(w, (0, 2, 1))

    # dx and dW share ONE gather of g per offset chunk: G (kc, rows, Cout);
    # dx += G_flat @ stack_k(w[k].T), dW[k] = x^T @ G_k.  Chunking bounds
    # the im2col buffer (the E0 edge at bench scale is 780MB unchunked).
    rows = plan.fwd.shape[1]
    kc = max(1, min(K, _IM2COL_MAX_ELEMS // max(rows * Cout, 1)))
    dx = jnp.zeros((rows, x.shape[1]), jnp.float32)
    dws = []
    for k0 in range(0, K, kc):
        ks = slice(k0, min(k0 + kc, K))
        n_k = ks.stop - k0
        G = _take_rows(g, plan.fwd[ks].reshape(-1)).reshape(n_k, -1, Cout)
        Gf = G.transpose(1, 0, 2).reshape(-1, n_k * Cout)
        dx = dx + jnp.dot(Gf, w_t[ks].reshape(n_k * Cout, -1).astype(cdtype),
                          preferred_element_type=jnp.float32)
        dws.append(jnp.einsum("pc,kpd->kcd", x, G.astype(cdtype),
                              preferred_element_type=jnp.float32))
    dw = jnp.concatenate(dws, axis=0) if len(dws) > 1 else dws[0]
    return dx.astype(cdtype), dw.astype(w.dtype), None


sparse_up_conv.defvjp(_up_fwd, _up_bwd)


def masked_batch_norm(x, mask, num, gamma, beta, running_mean, running_var,
                      *, train: bool, momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm over valid rows only (MinkowskiBatchNorm semantics).

    x: (cap, C) compute dtype; mask: (cap, 1); num: () valid-row count.
    Returns (out, new_running_mean, new_running_var); out is re-masked so
    padded rows stay exactly zero despite beta.
    """
    xf = x.astype(jnp.float32)
    n = jnp.maximum(num.astype(jnp.float32), 1.0)
    if train:
        mean = (xf * mask).sum(0) / n
        centered = (xf - mean) * mask
        var = (centered * centered).sum(0) / n  # biased, like torch BN
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new_mean = (1 - momentum) * running_mean + momentum * mean
        new_var = (1 - momentum) * running_var + momentum * unbiased
    else:
        mean, var = running_mean, running_var
        new_mean, new_var = running_mean, running_var
    inv = jax.lax.rsqrt(var + eps)
    out = ((xf - mean) * inv * gamma + beta) * mask
    return out.astype(x.dtype), new_mean, new_var


def relu(x):
    return jnp.maximum(x, 0)


def masked_global_avg_pool(x, mask, num, batch_ids, num_batches: int):
    """Per-scene average over valid rows (MinkowskiGlobalPooling equivalent).

    batch_ids: (cap,) int32 scene id per row (padded rows may hold any id —
    they are masked). Returns (num_batches, C).
    """
    xm = x.astype(jnp.float32) * mask
    one_hot = (batch_ids[:, None] == jnp.arange(num_batches)[None, :])
    one_hot = one_hot.astype(jnp.float32) * mask
    sums = one_hot.T @ xm
    counts = one_hot.sum(0)[:, None]
    return sums / jnp.maximum(counts, 1.0)
