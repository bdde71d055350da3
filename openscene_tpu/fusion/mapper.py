"""Point-cloud -> image projection with depth-occlusion visibility.

Re-implements the reference's ``PointCloudToImageMapper.compute_mapping``
(scripts/feature_fusion/fusion_util.py:93-139) semantics:

* world -> camera via inv(camera_to_world), pinhole projection, ROUNDED pixel
  coordinates, in-bounds test with a ``cut_bound`` margin;
* occlusion: |depth[pix] - z_cam| <= vis_thres * depth[pix];
* without a depth map: front-facing test (z > 0) only.

Provided both as a NumPy reference and as a jit/vmap JAX batch kernel that
processes all views of a scene at once (the TPU-native replacement for the
reference's per-view Python loop).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class PointCloudToImageMapper:
    def __init__(self, image_dim: Tuple[int, int],
                 visibility_threshold: float = 0.25, cut_bound: int = 0,
                 intrinsics: Optional[np.ndarray] = None):
        self.image_dim = image_dim
        self.vis_thres = visibility_threshold
        self.cut_bound = cut_bound
        self.intrinsics = intrinsics

    def compute_mapping(self, camera_to_world: np.ndarray, coords: np.ndarray,
                        depth: Optional[np.ndarray] = None,
                        intrinsic: Optional[np.ndarray] = None) -> np.ndarray:
        """(N, 3) int mapping rows (v, u, visible) — NumPy reference."""
        if self.intrinsics is not None:
            intrinsic = self.intrinsics
        n = coords.shape[0]
        mapping = np.zeros((3, n), dtype=np.int64)
        homo = np.concatenate([coords, np.ones((n, 1))], axis=1).T
        p = np.linalg.inv(camera_to_world) @ homo
        p[0] = (p[0] * intrinsic[0][0]) / p[2] + intrinsic[0][2]
        p[1] = (p[1] * intrinsic[1][1]) / p[2] + intrinsic[1][2]
        pi = np.round(p).astype(np.int64)
        W, H = self.image_dim
        cb = self.cut_bound
        inside = ((pi[0] >= cb) & (pi[1] >= cb) & (pi[0] < W - cb)
                  & (pi[1] < H - cb))
        if depth is not None:
            d = depth[pi[1][inside], pi[0][inside]]
            occ = np.abs(d - p[2][inside]) <= self.vis_thres * d
            inside[inside] = occ
        else:
            inside = inside & (p[2] > 0)
        mapping[0][inside] = pi[1][inside]
        mapping[1][inside] = pi[0][inside]
        mapping[2][inside] = 1
        return mapping.T


def compute_mapping_jax(camera_to_world, intrinsic, coords, depth,
                        image_dim: Tuple[int, int], vis_thres: float,
                        cut_bound: int, use_depth: bool = True):
    """Jit/vmap-ready single-view mapping.

    camera_to_world: (4,4); intrinsic: (>=3,>=3); coords: (N,3);
    depth: (H,W) (pass zeros with use_depth=False for the lidar/no-depth
    front-facing path). Returns (v (N,), u (N,), visible (N,) bool).
    """
    import jax.numpy as jnp

    n = coords.shape[0]
    homo = jnp.concatenate([coords, jnp.ones((n, 1), coords.dtype)], axis=1)
    world_to_cam = jnp.linalg.inv(camera_to_world)
    p = homo @ world_to_cam.T  # (N, 4)
    z = p[:, 2]
    u = jnp.round(p[:, 0] * intrinsic[0, 0] / z + intrinsic[0, 2]).astype(jnp.int32)
    v = jnp.round(p[:, 1] * intrinsic[1, 1] / z + intrinsic[1, 2]).astype(jnp.int32)
    W, H = image_dim
    cb = cut_bound
    inside = (u >= cb) & (v >= cb) & (u < W - cb) & (v < H - cb)
    if use_depth:
        uc = jnp.clip(u, 0, W - 1)
        vc = jnp.clip(v, 0, H - 1)
        d = depth[vc, uc]
        visible = inside & (jnp.abs(d - z) <= vis_thres * d)
    else:
        visible = inside & (z > 0)
    return (jnp.where(visible, v, 0), jnp.where(visible, u, 0), visible)


def make_intrinsic(fx: float, fy: float, mx: float, my: float) -> np.ndarray:
    intrinsic = np.eye(4)
    intrinsic[0, 0], intrinsic[1, 1] = fx, fy
    intrinsic[0, 2], intrinsic[1, 2] = mx, my
    return intrinsic


def adjust_intrinsic(intrinsic: np.ndarray,
                     intrinsic_image_dim: Tuple[int, int],
                     image_dim: Tuple[int, int]) -> np.ndarray:
    """Rescale intrinsics to a resized image (fusion_util.py:27-39)."""
    import math
    if intrinsic_image_dim == image_dim:
        return intrinsic
    intrinsic = intrinsic.copy()
    resize_width = int(math.floor(
        image_dim[1] * float(intrinsic_image_dim[0])
        / float(intrinsic_image_dim[1])))
    intrinsic[0, 0] *= float(resize_width) / float(intrinsic_image_dim[0])
    intrinsic[1, 1] *= float(image_dim[1]) / float(intrinsic_image_dim[1])
    intrinsic[0, 2] *= float(image_dim[0] - 1) / float(intrinsic_image_dim[0] - 1)
    intrinsic[1, 2] *= float(image_dim[1] - 1) / float(intrinsic_image_dim[1] - 1)
    return intrinsic
