"""Property test: our direct fused-feature/voxel alignment equals the
reference's index-gymnastics formulation (dataset/feature_loader.py:125-144).
"""

import numpy as np

from openscene_tpu.data.loaders import align_fused_features


def reference_alignment(mask_chunk: np.ndarray, vox_ind: np.ndarray):
    """Literal transcription of the reference semantics (numpy)."""
    mask = mask_chunk[vox_ind]
    mask_ind = np.flatnonzero(mask_chunk)
    index1 = -np.ones(mask_chunk.shape[0], dtype=np.int64)
    index1[mask_ind] = mask_ind
    index1 = index1[vox_ind]
    chunk_ind = index1[index1 != -1]
    index2 = np.zeros(mask_chunk.shape[0])
    index2[mask_ind] = 1
    index3 = np.cumsum(index2).astype(np.int64)
    indices = index3[chunk_ind] - 1
    return mask, indices


def test_alignment_matches_reference_semantics():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n_points = int(rng.integers(10, 500))
        n_vox = int(rng.integers(1, n_points + 1))
        mask_full = rng.random(n_points) < rng.uniform(0.1, 0.9)
        vox_ind = rng.choice(n_points, n_vox, replace=False)
        ours_mask, ours_rows = align_fused_features(mask_full, vox_ind)
        ref_mask, ref_rows = reference_alignment(mask_full, vox_ind)
        assert np.array_equal(ours_mask, ref_mask), trial
        assert np.array_equal(ours_rows, ref_rows), trial


def test_alignment_rows_are_valid():
    rng = np.random.default_rng(1)
    n_points, n_vox = 300, 120
    mask_full = rng.random(n_points) < 0.5
    vox_ind = rng.choice(n_points, n_vox, replace=False)
    feat_mask, rows = align_fused_features(mask_full, vox_ind)
    n_feat = mask_full.sum()
    assert rows.min() >= 0 and rows.max() < n_feat
    assert len(rows) == feat_mask.sum()
    # each picked row is the compact row of that voxel's representative point
    compact_of_point = np.cumsum(mask_full) - 1
    expect = compact_of_point[vox_ind[feat_mask]]
    assert np.array_equal(rows, expect)
