"""PLY IO roundtrip + preprocessing remap/vote logic on synthetic plys."""

import numpy as np

from openscene_tpu.preprocess.point_clouds import (nuscenes_remapper,
                                                   process_scannet_scene,
                                                   scannet_remapper)
from openscene_tpu.utils.ply import read_ply, write_ply_points


def test_ply_points_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.random((100, 3)).astype(np.float32)
    cols = rng.random((100, 3))
    path = str(tmp_path / "pc.ply")
    write_ply_points(path, pts, cols)
    v = read_ply(path)["vertex"]
    got = np.stack([v["x"], v["y"], v["z"]], 1)
    np.testing.assert_allclose(got, pts, rtol=1e-6)
    gc = np.stack([v["red"], v["green"], v["blue"]], 1) / 255.0
    np.testing.assert_allclose(gc, cols, atol=1 / 255.0 + 1e-6)


def _write_scannet_pair(tmp_path, n=50):
    rng = np.random.default_rng(1)
    pts = rng.random((n, 3)).astype(np.float32)
    cols = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    nyu = rng.choice([1, 2, 5, 40, 0], n)  # mix of valid/invalid nyu ids

    def write(path, labels=None):
        props = ["property float x", "property float y", "property float z",
                 "property uchar red", "property uchar green",
                 "property uchar blue"]
        dt = [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
              ("red", "u1"), ("green", "u1"), ("blue", "u1")]
        if labels is not None:
            props.append("property ushort label")
            dt.append(("label", "<u2"))
        arr = np.empty(n, dtype=dt)
        arr["x"], arr["y"], arr["z"] = pts.T
        arr["red"], arr["green"], arr["blue"] = cols.T
        if labels is not None:
            arr["label"] = labels
        header = ("ply\nformat binary_little_endian 1.0\n"
                  f"element vertex {n}\n" + "\n".join(props) +
                  "\nend_header\n")
        with open(path, "wb") as f:
            f.write(header.encode())
            f.write(arr.tobytes())

    ply = str(tmp_path / "scene0000_00_vh_clean_2.ply")
    write(ply)
    write(str(tmp_path / "scene0000_00_vh_clean_2.labels.ply"), nyu)
    return ply, pts, nyu


def test_scannet_preprocess(tmp_path):
    ply, pts, nyu = _write_scannet_pair(tmp_path)
    out = process_scannet_scene(ply, str(tmp_path))
    data = np.load(out)
    np.testing.assert_allclose(data["coords"], pts, rtol=1e-6)
    remap = scannet_remapper()
    np.testing.assert_array_equal(data["labels"], remap[nyu])
    # nyu 1 -> class 0 (wall), nyu 5 -> chair (index 4), invalid -> 255
    assert remap[1] == 0 and remap[5] == 4 and remap[40] == 255


def test_nuscenes_remap():
    remap = nuscenes_remapper()
    assert remap[17] == 3   # car
    assert remap[2] == 6    # person
    assert remap[30] == 15  # vegetation
    assert remap[0] == 255  # unmapped -> ignore
    assert remap[remap != 255].max() == 15
