"""Multi-view feature fusion: project per-pixel 2D features onto 3D points.

The TPU re-build of the reference's fusion job
(scripts/feature_fusion/{scannet,matterport,nuscenes,replica}_openseg.py):
for each scene, every selected view's CLIP-aligned 2D feature map is sampled
at each 3D point's projected pixel (with the depth-occlusion test) and
averaged over views into one feature per point; train scenes are saved as
``num_rand_file_per_scene`` random point chunks intersected with the
visibility mask (fusion_util.py:70-90).

The 2D feature extractor (OpenSeg/LSeg) is a frozen external teacher: this
module consumes per-view feature maps from a callback — precomputed arrays on
disk, a live TF SavedModel wrapper, or the synthetic generator in tests.

The per-scene accumulation loop runs as ONE jitted scan over views on TPU
(projection + occlusion + feature sampling + sum/counter update fused),
replacing the reference's per-view Python/TF loop.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Callable, Iterable, Optional, Tuple

import numpy as np

from ..data.scene_io import save_fused_features
from .mapper import compute_mapping_jax


def save_fused_feature(feat_bank: np.ndarray, point_ids: np.ndarray,
                       n_points: int, out_dir: str, scene_id: str,
                       num_rand_file_per_scene: int, n_split_points: int,
                       rng: Optional[np.random.Generator] = None) -> None:
    """Chunked save, reference fusion_util.py:70-90: for each of the k output
    files pick n_split_points random points, intersect with visibility, store
    {'feat' (fp16 compact), 'mask_full'}."""
    rng = rng if rng is not None else np.random.default_rng()
    os.makedirs(out_dir, exist_ok=True)
    visible = np.zeros(n_points, dtype=bool)
    visible[point_ids] = True
    for k in range(num_rand_file_per_scene):
        n_cur = min(n_points, n_split_points)
        rand_ind = rng.choice(n_points, n_cur, replace=False)
        mask_entire = np.zeros(n_points, dtype=bool)
        mask_entire[rand_ind] = True
        mask_entire &= visible
        save_fused_features(join(out_dir, f"{scene_id}_{k}.npz"),
                            feat_bank[mask_entire].astype(np.float16),
                            mask_entire)


class MultiViewFuser:
    """Fuse per-view 2D features onto a scene's points on TPU.

    feature_fn(view_id) -> (C, H, W) float feature map for that view (the
    frozen 2D teacher's output).
    """

    def __init__(self, image_dim: Tuple[int, int], vis_thres: float = 0.25,
                 cut_bound: int = 0, use_depth: bool = True,
                 feat_dim: int = 768):
        self.image_dim = image_dim
        self.vis_thres = vis_thres
        self.cut_bound = cut_bound
        self.use_depth = use_depth
        self.feat_dim = feat_dim
        self._step = None

    def _build_step(self):
        import jax
        import jax.numpy as jnp
        W, H = self.image_dim
        vis_thres, cut_bound, use_depth = (self.vis_thres, self.cut_bound,
                                           self.use_depth)

        @jax.jit
        def step(sum_feat, counter, coords, pose, intrinsic, depth, feat_2d):
            v, u, visible = compute_mapping_jax(
                pose, intrinsic, coords, depth, (W, H), vis_thres, cut_bound,
                use_depth)
            sampled = feat_2d[:, v, u].T  # (N, C)
            m = visible[:, None].astype(sampled.dtype)
            return sum_feat + sampled * m, counter + visible.astype(jnp.int32)

        return step

    def fuse_scene(self, coords: np.ndarray,
                   views: Iterable[Tuple[np.ndarray, np.ndarray,
                                         Optional[np.ndarray]]],
                   feature_fn: Callable[[int], np.ndarray]):
        """views: iterable of (pose 4x4, intrinsic, depth HxW or None).

        Returns (feat_bank (N, C) float32 averaged, point_ids of points seen
        in >= 1 view) — reference scannet_openseg.py:74-111 semantics.
        """
        import jax.numpy as jnp
        if self._step is None:
            self._step = self._build_step()
        n = coords.shape[0]
        coords_j = jnp.asarray(coords, dtype=jnp.float32)
        sum_feat = jnp.zeros((n, self.feat_dim), jnp.float32)
        counter = jnp.zeros(n, jnp.int32)
        H = self.image_dim[1]
        Wd = self.image_dim[0]
        for i, (pose, intrinsic, depth) in enumerate(views):
            feat_2d = np.asarray(feature_fn(i), dtype=np.float32)
            if depth is None:
                depth = np.zeros((H, Wd), np.float32)
            sum_feat, counter = self._step(
                sum_feat, counter, coords_j, jnp.asarray(pose, jnp.float32),
                jnp.asarray(intrinsic, jnp.float32),
                jnp.asarray(depth, jnp.float32), jnp.asarray(feat_2d))
        counter_np = np.asarray(counter)
        sum_np = np.asarray(sum_feat)
        point_ids = np.flatnonzero(counter_np > 0)
        feat_bank = sum_np / np.maximum(counter_np, 1)[:, None]
        return feat_bank.astype(np.float32), point_ids
