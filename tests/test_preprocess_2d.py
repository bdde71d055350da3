"""2D preprocessors (matterport/nuscenes/replica) -> fusion view adapters.

Synthesizes tiny raw datasets in the upstream layouts, runs each
preprocessor CLI, and checks the fusion view iterators consume the outputs
(reference: scripts/preprocess/preprocess_2d_{matterport,nuscenes,replica}.py
feeding scripts/feature_fusion/*_openseg.py)."""

import os
from os.path import join

import numpy as np
import pytest

from openscene_tpu.fusion.datasets import (SPECS, matterport_region_views,
                                           nuscenes_views, replica_views)
from openscene_tpu.preprocess import matterport_2d, nuscenes_2d, replica_2d
from openscene_tpu.preprocess.images_2d import save_color, save_depth_u16


def _rand_img(w, h, rng):
    return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)


def _rand_depth(w, h, rng):
    return rng.integers(100, 5000, size=(h, w), dtype=np.uint16)


def test_replica_2d_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    raw = tmp_path / "raw"
    scene = "office0"
    res = raw / scene / "results"
    os.makedirs(res)
    n_frames, freq = 25, 10
    for i in range(n_frames):
        save_color(str(res / f"frame{i:06d}.jpg"), _rand_img(1200, 680, rng))
        save_depth_u16(str(res / f"depth{i:06d}.png"),
                       _rand_depth(1200, 680, rng))
    poses = np.tile(np.eye(4), (n_frames, 1, 1))
    poses[:, 0, 3] = np.arange(n_frames)  # distinguishable translations
    np.savetxt(str(raw / scene / "traj.txt"), poses.reshape(n_frames, 16))

    out = tmp_path / "replica_2d"
    replica_2d.process_scene(scene, str(raw), str(out), freq)
    intr = replica_2d.make_intrinsic(600.0, 600.0, 599.5, 339.5)
    np.savetxt(str(out / "intrinsics.txt"), replica_2d.adjust_intrinsic(
        intr, replica_2d.ORIGINAL_IMG_DIM, replica_2d.IMG_DIM))

    views = list(replica_views(str(out / scene), SPECS["replica"]))
    assert len(views) == 3  # frames 0, 10, 20
    for name, pose, K, depth in views:
        assert pose.shape == (4, 4) and K.shape == (3, 3)
        assert depth.shape == (360, 640)
    # pose of exported frame id 1 is raw frame 10
    assert views[1][1][0, 3] == 10.0


def test_nuscenes_2d_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    raw = tmp_path / "raw"
    scene = "scene-0001"
    ts = "t0001"
    for cam in nuscenes_2d.CAM_LOCS:
        d = raw / scene / "frames" / ts / cam
        os.makedirs(d)
        save_color(str(d / "color_image.jpg"), _rand_img(1600, 900, rng))
        pose = np.eye(4)
        pose[1, 3] = hash(cam) % 7
        np.savetxt(str(d / "cam2scene.txt"), pose)
        K = np.array([[1000.0, 0, 800], [0, 1000.0, 450], [0, 0, 1]])
        np.savetxt(str(d / "K.txt"), K)

    out = tmp_path / "nuscenes_2d"
    nuscenes_2d.process_one_sequence(scene, str(raw), str(out))

    views = list(nuscenes_views(str(out / scene)))
    assert len(views) == 6
    names = [v[0] for v in views]
    assert names == list(nuscenes_2d.CAM_LOCS)
    for name, pose, K, depth in views:
        assert depth is None
        assert pose.shape == (4, 4) and K.shape == (3, 3)
        # intrinsics rescaled 1600x900 -> 800x450: fx halves
        assert abs(K[0, 0] - 500.0) < 1e-6


def test_matterport_2d_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    raw = tmp_path / "raw"
    scene = "B0001"
    cdir = raw / scene / "undistorted_color_images"
    ddir = raw / scene / "undistorted_depth_images"
    pdir = raw / scene / "undistorted_camera_parameters"
    os.makedirs(cdir)
    os.makedirs(ddir)
    os.makedirs(pdir)

    # one pano, one intrinsics line covering 6 scan lines
    K = [500.0, 0, 640, 0, 500.0, 512, 0, 0, 1]
    lines = ["intrinsics_matrix " + " ".join(str(v) for v in K)]
    names = []
    for j in range(6):
        name = f"pano_i1_{j}.jpg"
        names.append(name)
        pose = np.eye(4)
        pose[0, 3] = float(j)
        vals = " ".join(str(v) for v in pose.reshape(-1))
        lines.append(f"scan depth_{j}.png {name} {vals}")
        save_color(str(cdir / name), _rand_img(1280, 1024, rng))
    save_depth_u16(str(ddir / "pano_d1_0.png"), _rand_depth(1280, 1024, rng))
    # every yaw shares the d1_<yaw> naming; write each
    for j in range(1, 6):
        save_depth_u16(str(ddir / f"pano_d1_{j}.png"),
                       _rand_depth(1280, 1024, rng))
    with open(pdir / f"{scene}.conf", "w") as f:
        f.write("\n".join(lines) + "\n")

    out = tmp_path / "matterport_2d"
    n = matterport_2d.process_scene(scene, str(raw), str(out))
    assert n == 6

    # cameras at x = 0..5; region bbox covering x in [-1, 3.5] picks 4
    locs = np.array([[-1.0, -1.0, -1.0], [3.5, 1.0, 1.0]])
    views = matterport_region_views(str(out / scene), locs,
                                    SPECS["matterport"], split="train")
    # pose positions inside bbox: x in {0..3} but bbox is strict (>lo, <hi)
    # on all axes; y=z=0 lies inside (-1, 1): x in {0,1,2,3} minus edges
    assert 1 <= len(views) <= 4
    for name, pose, K3, depth in views:
        assert K3.shape == (3, 3)
        assert depth is not None and depth.shape == (512, 640)
        # preprocessor flips Y/Z columns
        assert pose[1, 1] == -1.0 and pose[2, 2] == -1.0


def test_matterport_conf_parser_multi_pano(tmp_path):
    """Two intrinsics blocks -> per-image intrinsics are block-local."""
    lines = []
    for b in range(2):
        K = [100.0 * (b + 1), 0, 640, 0, 100.0 * (b + 1), 512, 0, 0, 1]
        lines.append("intrinsics_matrix " + " ".join(str(v) for v in K))
        for j in range(6):
            pose = " ".join(str(v) for v in np.eye(4).reshape(-1))
            lines.append(f"scan d{b}_{j}.png pano{b}_i1_{j}.jpg {pose}")
    p = tmp_path / "x.conf"
    p.write_text("\n".join(lines))
    names, intr, extr = matterport_2d.parse_camera_conf(str(p))
    assert len(names) == 12 and intr.shape == (12, 3, 3)
    assert intr[0, 0, 0] == 100.0 and intr[6, 0, 0] == 200.0
