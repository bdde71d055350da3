"""Multi-view fusion: projection/occlusion parity (JAX vs NumPy reference)
and end-to-end fusion of synthetic views."""

import numpy as np
import pytest

from openscene_tpu.fusion.mapper import (PointCloudToImageMapper,
                                         adjust_intrinsic,
                                         compute_mapping_jax, make_intrinsic)
from openscene_tpu.fusion.fuse import MultiViewFuser, save_fused_feature


def look_at_pose(eye, target):
    """camera_to_world with +z looking from eye to target."""
    fwd = np.asarray(target, float) - np.asarray(eye, float)
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 0, 1.0])
    if np.linalg.norm(right) < 1e-6:
        right = np.array([1.0, 0, 0])
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    pose = np.eye(4)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = right, up, fwd, eye
    return pose


def render_depth(pose, intrinsic, coords, W, H):
    """Z-buffer the points themselves (nearest per pixel)."""
    inv = np.linalg.inv(pose)
    homo = np.concatenate([coords, np.ones((len(coords), 1))], 1).T
    p = inv @ homo
    u = np.round(p[0] * intrinsic[0, 0] / p[2] + intrinsic[0, 2]).astype(int)
    v = np.round(p[1] * intrinsic[1, 1] / p[2] + intrinsic[1, 2]).astype(int)
    depth = np.full((H, W), 1e9, np.float32)
    ok = (p[2] > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    for ui, vi, zi in zip(u[ok], v[ok], p[2][ok]):
        depth[vi, ui] = min(depth[vi, ui], zi)
    depth[depth == 1e9] = 0.0
    return depth


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    coords = rng.random((500, 3)) * [4, 4, 2]
    W, H = 64, 48
    intrinsic = make_intrinsic(40.0, 40.0, W / 2, H / 2)
    pose = look_at_pose([2, -3, 1.2], [2, 2, 1])
    depth = render_depth(pose, intrinsic, coords, W, H)
    return coords, pose, intrinsic, depth, (W, H)


def test_mapping_jax_matches_numpy(scene):
    coords, pose, intrinsic, depth, (W, H) = scene
    mapper = PointCloudToImageMapper((W, H), visibility_threshold=0.1,
                                     cut_bound=2)
    ref = mapper.compute_mapping(pose, coords, depth, intrinsic)
    v, u, vis = compute_mapping_jax(pose, intrinsic[:3, :3], coords, depth,
                                    (W, H), 0.1, 2)
    v, u, vis = map(np.asarray, (v, u, vis))
    assert np.array_equal(vis.astype(int), ref[:, 2])
    assert np.array_equal(v[vis], ref[:, 0][ref[:, 2] == 1])
    assert np.array_equal(u[vis], ref[:, 1][ref[:, 2] == 1])
    assert vis.sum() > 50  # a meaningful chunk of the scene is visible


def test_no_depth_front_mask(scene):
    coords, pose, intrinsic, _, (W, H) = scene
    mapper = PointCloudToImageMapper((W, H), cut_bound=0)
    ref = mapper.compute_mapping(pose, coords, None, intrinsic)
    v, u, vis = compute_mapping_jax(pose, intrinsic[:3, :3], coords,
                                    np.zeros((H, W), np.float32), (W, H),
                                    0.25, 0, use_depth=False)
    assert np.array_equal(np.asarray(vis).astype(int), ref[:, 2])


def test_multi_view_fusion_recovers_features(scene, tmp_path):
    coords, pose, intrinsic, depth, (W, H) = scene
    # 2D features that encode pixel position; fused features of a visible
    # point must equal the average over its views' sampled pixels
    C = 8
    def feature_fn(i):
        f = np.zeros((C, H, W), np.float32)
        f[0] = i + 1
        f[1] = np.arange(W)[None, :] / W
        return f
    poses = [pose, look_at_pose([1, 5, 1.5], [2, 2, 1])]
    depths = [depth, render_depth(poses[1], intrinsic, coords, W, H)]
    fuser = MultiViewFuser((W, H), vis_thres=0.1, cut_bound=2, feat_dim=C)
    views = [(poses[i], intrinsic[:3, :3], depths[i]) for i in range(2)]
    feat_bank, point_ids = fuser.fuse_scene(coords, views, feature_fn)
    assert len(point_ids) > 50
    # channel 0 is the mean view id+1 => between 1 and 2
    ch0 = feat_bank[point_ids, 0]
    assert (ch0 >= 1.0 - 1e-5).all() and (ch0 <= 2.0 + 1e-5).all()

    save_fused_feature(feat_bank, point_ids, len(coords), str(tmp_path),
                       "scene0", num_rand_file_per_scene=2,
                       n_split_points=200, rng=np.random.default_rng(0))
    import glob
    files = sorted(glob.glob(str(tmp_path / "scene0_*.npz")))
    assert len(files) == 2
    blob = np.load(files[0])
    assert blob["feat"].shape[1] == C
    assert blob["mask_full"].sum() == blob["feat"].shape[0]


def test_adjust_intrinsic():
    intr = make_intrinsic(577.870605, 577.870605, 319.5, 239.5)
    out = adjust_intrinsic(intr.copy(), (640, 480), (320, 240))
    assert out[0, 0] == pytest.approx(577.870605 / 2)
    assert out[0, 2] == pytest.approx(319.5 * 319 / 639)
