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


def _gather_matmul_sum(x, w, fwd, out_rows: int):
    """sum_k x[fwd[k]] @ w[k] with fp32 accumulation, via lax.scan over K."""
    cdtype = x.dtype

    def step(acc, kslice):
        idx, wk = kslice
        g = jnp.take(x, idx, axis=0)
        acc = acc + jnp.dot(g, wk.astype(cdtype),
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
    # dx[c] = g[parent(c)] @ w[offset(c)].T : transform-then-gather (one
    # gather for the whole backward input).
    y = jnp.einsum("pd,kdc->kpc", g, jnp.transpose(w, (0, 2, 1)).astype(cdtype),
                   preferred_element_type=jnp.float32).astype(cdtype)
    parent_cap = g.shape[0]
    flat_idx = plan.child_offset * parent_cap + plan.child_parent
    dx = jnp.take(y.reshape(-1, x.shape[1]), flat_idx, axis=0)

    def step(_, idx):
        gx = jnp.take(x, idx, axis=0)
        return None, jnp.dot(gx.T, g.astype(cdtype),
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
    return jnp.take(y.reshape(-1, w.shape[-1]), flat_idx, axis=0)


def _up_fwd(x, w, plan):
    return sparse_up_conv(x, w, plan), (x, w, plan)


def _up_bwd(res, g):
    x, w, plan = res
    cdtype = x.dtype
    w_t = jnp.transpose(w, (0, 2, 1))
    dx = _gather_matmul_sum(g, w_t, plan.fwd, x.shape[0]).astype(cdtype)

    def step(_, idx):
        gg = jnp.take(g, idx, axis=0)  # (parent_cap, Cout) per offset
        return None, jnp.dot(x.T, gg.astype(cdtype),
                             preferred_element_type=jnp.float32)

    _, dw = jax.lax.scan(step, None, plan.fwd)
    return dx, dw.astype(w.dtype), None


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
