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

The per-scene accumulation runs as chunked device dispatches: views are
stacked ``views_per_dispatch`` at a time and each dispatch runs a single
jitted ``lax.scan`` over its chunk (projection + occlusion + feature sampling
+ sum/counter update fused).  One compiled program serves every chunk (the
last chunk is padded with invalid views), and the per-dispatch host
round-trip (~34 ms through the dev TPU tunnel; far less in production) is
amortized over the chunk.  Feature maps keep the caller's dtype on the host
(fp16 stays fp16 — host-side fp16 conversion is software-slow) and are
upcast on device.
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
                 feat_dim: int = 768, views_per_dispatch: int = 4):
        self.image_dim = image_dim
        self.vis_thres = vis_thres
        self.cut_bound = cut_bound
        self.use_depth = use_depth
        self.feat_dim = feat_dim
        self.views_per_dispatch = max(1, views_per_dispatch)
        self._step = None

    def _build_step(self):
        import jax
        import jax.numpy as jnp
        from jax import lax
        W, H = self.image_dim
        vis_thres, cut_bound, use_depth = (self.vis_thres, self.cut_bound,
                                           self.use_depth)

        @jax.jit
        def step(sum_feat, counter, coords, poses, intrinsics, depths,
                 feats, valid):
            """One scan over a (K, ...) stacked view chunk; padded views carry
            valid=0 and contribute nothing."""
            def body(carry, view):
                s, c = carry
                pose, intr, depth, feat_2d, ok = view
                v, u, visible = compute_mapping_jax(
                    pose, intr, coords, depth, (W, H), vis_thres, cut_bound,
                    use_depth)
                visible = visible & (ok > 0)
                sampled = feat_2d[:, v, u].T.astype(s.dtype)  # (N, C)
                m = visible[:, None].astype(s.dtype)
                return (s + sampled * m, c + visible.astype(jnp.int32)), None
            (sum_feat, counter), _ = lax.scan(
                body, (sum_feat, counter),
                (poses, intrinsics, depths, feats, valid))
            return sum_feat, counter

        return step

    def fuse_scene(self, coords: np.ndarray,
                   views: Iterable[Tuple[np.ndarray, np.ndarray,
                                         Optional[np.ndarray]]],
                   feature_fn: Callable[[int], np.ndarray]):
        """views: iterable of (pose 4x4, intrinsic, depth HxW or None).

        Returns (feat_bank (N, C) float32 averaged, point_ids of points seen
        in >= 1 view) — reference scannet_openseg.py:74-111 semantics.

        Views go to the device ``views_per_dispatch`` at a time (one jitted
        scan per chunk; a single compiled shape since the tail chunk is
        padded with invalid views).
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
        K = self.views_per_dispatch
        views = list(views)

        def dispatch(chunk_views, chunk_feats, valid):
            nonlocal sum_feat, counter
            poses = np.stack([np.asarray(p, np.float32)
                              for p, _, _ in chunk_views])
            intrs = np.stack([np.asarray(i, np.float32)[:3, :3]
                              for _, i, _ in chunk_views])
            depths = np.stack([
                np.zeros((H, Wd), np.float32) if d is None
                else np.asarray(d, np.float32) for _, _, d in chunk_views])
            feats = np.stack(chunk_feats)  # keeps the teacher's dtype
            sum_feat, counter = self._step(
                sum_feat, counter, coords_j, jnp.asarray(poses),
                jnp.asarray(intrs), jnp.asarray(depths), jnp.asarray(feats),
                jnp.asarray(valid, jnp.int32))

        for start in range(0, len(views), K):
            chunk = views[start:start + K]
            feats = [np.asarray(feature_fn(start + j))
                     for j in range(len(chunk))]
            valid = [1] * len(chunk)
            while len(chunk) < K:  # pad the tail to the compiled shape
                chunk.append(chunk[0])
                feats.append(feats[0])
                valid.append(0)
            dispatch(chunk, feats, valid)
        counter_np = np.asarray(counter)
        sum_np = np.asarray(sum_feat)
        point_ids = np.flatnonzero(counter_np > 0)
        feat_bank = sum_np / np.maximum(counter_np, 1)[:, None]
        return feat_bank.astype(np.float32), point_ids
