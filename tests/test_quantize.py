"""Voxel quantization parity tests (vs reference dataset/voxelization_utils.py
semantics: FNV hashing, first-point-wins dedup, reconstruction indices)."""

import numpy as np

from openscene_tpu.data.quantize import fnv_hash_vec, ravel_hash_vec, sparse_quantize


def test_fnv_matches_reference_formula(rng):
    arr = rng.integers(0, 100, size=(50, 3)).astype(np.float64)
    h = fnv_hash_vec(arr)
    # independent scalar implementation
    for i in range(5):
        acc = np.uint64(14695981039346656037)
        for j in range(3):
            acc = acc * np.uint64(1099511628211)
            acc = np.bitwise_xor(acc, np.uint64(arr[i, j]))
        assert acc == h[i]


def test_sparse_quantize_dedup_and_reconstruction(rng):
    # duplicate coordinates must collapse; inds_reverse maps points to voxels
    coords = rng.integers(0, 10, size=(200, 3)).astype(np.float64)
    inds, inds_reverse = sparse_quantize(coords, return_index=True)
    assert len(inds_reverse) == 200
    uniq = coords[inds]
    # every point maps back to a voxel with identical integer coords
    assert np.array_equal(np.floor(uniq[inds_reverse]), np.floor(coords))
    # voxels are unique
    keys = {tuple(r) for r in uniq.astype(int)}
    assert len(keys) == len(inds)


def test_sparse_quantize_first_point_wins(rng):
    coords = np.array([[0, 0, 0], [0, 0, 0], [1, 0, 0]], dtype=np.float64)
    feats = np.array([[1.0], [2.0], [3.0]])
    labels = np.array([7, 8, 9])
    c, f, l = sparse_quantize(coords, feats, labels)
    # first occurrence of the duplicated voxel wins
    row = np.where((c == [0, 0, 0]).all(1))[0][0]
    assert f[row, 0] == 1.0 and l[row] == 7


def test_collision_sets_ignore_label():
    coords = np.array([[0, 0, 0], [0, 0, 0], [1, 0, 0]], dtype=np.float64)
    feats = np.zeros((3, 1))
    labels = np.array([7, 8, 9])
    inds, filtered = sparse_quantize(
        coords, feats, labels, set_ignore_label_when_collision=True,
        return_index=True)
    lab = dict(zip([tuple(r) for r in coords[inds].astype(int)], filtered))
    assert lab[(0, 0, 0)] == 255
    assert lab[(1, 0, 0)] == 9


def test_quantization_size(rng):
    coords = rng.random((100, 3)) * 10
    c1 = sparse_quantize(coords, feats=np.zeros((100, 1)),
                         quantization_size=2.0)[0]
    expected = {tuple(r) for r in np.floor(coords / 2.0).astype(int)}
    assert {tuple(r) for r in c1.astype(int)} == expected


def test_ravel_hash_unique_on_distinct(rng):
    coords = np.unique(rng.integers(0, 30, size=(500, 3)), axis=0).astype(np.float64)
    keys = ravel_hash_vec(coords)
    assert len(np.unique(keys)) == len(coords)
