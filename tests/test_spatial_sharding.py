"""Cross-chip spatial sharding of one scene (halo exchange) vs the
single-device engine.

Validates the SURVEY §2.3/§7 context-parallel analogue: a k=3 stencil conv
over one scene's voxels split across the virtual 8-device CPU mesh must
reproduce the single-device gather-GEMM conv (sparse/ops.py) exactly —
forward values AND gradients (the all_gather transpose must route halo
cotangents back to their owner shards).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax.sharding import Mesh

from openscene_tpu.parallel.spatial import (
    build_spatial_shards, make_spatial_conv, shard_rows, unshard_rows)
from openscene_tpu.sparse.geometry import _pad_level, build_self_plan
from openscene_tpu.sparse.ops import sparse_conv


def _scene(nx=64, ny=64, layers=2, seed=0):
    """Surface-like scan (a ~2-voxel-thick height field): real scenes are
    surfaces, which is what gives the sorted-range split its locality."""
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    z0 = (6 + 4 * np.sin(xs / 7.0) + 3 * np.cos(ys / 5.0)).astype(np.int64)
    pts = [np.stack([np.zeros_like(xs), xs, ys, z0 + dz], -1).reshape(-1, 4)
           for dz in range(layers)]
    coords = np.unique(np.concatenate(pts), axis=0)
    return coords[rng.permutation(len(coords))].astype(np.int32)


def _reference(coords, x, w):
    cap = len(coords) + 64
    level = _pad_level(coords, cap)
    plan = build_self_plan(level, kernel_size=3)
    xp = np.zeros((cap, x.shape[1]), x.dtype)
    xp[:len(coords)] = x
    out = sparse_conv(jnp.asarray(xp), jnp.asarray(w),
                      jnp.asarray(plan.fwd), jnp.asarray(plan.flip_perm))
    return np.asarray(out)[:len(coords)]


@pytest.mark.parametrize("n_shards", [2, 8])
def test_spatial_conv_matches_single_device(n_shards):
    coords = _scene()
    n = len(coords)
    rng = np.random.default_rng(1)
    cin, cout, K = 16, 24, 27
    x = rng.standard_normal((n, cin)).astype(np.float32)
    w = rng.standard_normal((K, cin, cout)).astype(np.float32) * 0.1

    ref = _reference(coords, x, w)

    shards = build_spatial_shards(coords, n_shards, kernel_size=3)
    # the halo is a boundary effect: far smaller than a shard on
    # surface-like geometry
    assert shards.halo_cap < shards.cap_d
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("space",))
    f = make_spatial_conv(mesh, shards, axis="space")
    y = f(shard_rows(x, shards), jnp.asarray(w))
    got = unshard_rows(y, shards)

    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_spatial_conv_gradients_match_single_device():
    coords = _scene(nx=32, ny=32, seed=3)
    n = len(coords)
    rng = np.random.default_rng(4)
    cin, cout, K = 8, 8, 27
    x = rng.standard_normal((n, cin)).astype(np.float32)
    w = rng.standard_normal((K, cin, cout)).astype(np.float32) * 0.1
    g = rng.standard_normal((n, cout)).astype(np.float32)

    cap = n + 64
    level = _pad_level(coords, cap)
    plan = build_self_plan(level, kernel_size=3)
    xp = np.zeros((cap, cin), np.float32)
    xp[:n] = x
    gp = jnp.asarray(np.concatenate(
        [g, np.zeros((cap - n, cout), np.float32)]))

    def ref_loss(xv, wv):
        return jnp.vdot(sparse_conv(xv, wv, jnp.asarray(plan.fwd),
                                    jnp.asarray(plan.flip_perm)), gp)

    rx, rw = jax.grad(ref_loss, argnums=(0, 1))(jnp.asarray(xp),
                                                jnp.asarray(w))

    n_shards = 4
    shards = build_spatial_shards(coords, n_shards, kernel_size=3)
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("space",))
    f = make_spatial_conv(mesh, shards, axis="space")
    gs = jnp.asarray(shard_rows(g, shards))

    def sh_loss(xv, wv):
        return jnp.vdot(f(xv, wv), gs)

    sx, sw = jax.grad(sh_loss, argnums=(0, 1))(
        jnp.asarray(shard_rows(x, shards)), jnp.asarray(w))

    # dW sums ~n products per entry; shard-then-psum regroups the fp32
    # accumulation vs the single 0..n GEMM — bound relative, not bitwise
    np.testing.assert_allclose(np.asarray(sw), np.asarray(rw),
                               rtol=1e-4, atol=1e-3)
    # per-row x-grads sum <= 27 terms: tight
    np.testing.assert_allclose(unshard_rows(sx, shards),
                               np.asarray(rx)[:n], rtol=0, atol=1e-4)
