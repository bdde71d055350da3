"""Text-embedding provider provenance guards.

The reference caches genuine CLIP text features only
(/root/reference/run/distill.py:283-290).  Our provider additionally supports
deterministic pseudo-embeddings for synthetic pipelines; these must NEVER be
able to poison a real evaluation through the on-disk cache.  These tests pin
that contract (VERDICT r4 weak #2).
"""

import numpy as np
import pytest

from openscene_tpu.text import extract_text_features, pseudo_embeddings

LABELS = ["wall", "floor", "chair"]


def _plant_cache(cache_dir, tag, dim, provenance):
    emb = pseudo_embeddings([f"a {l} in a scene" for l in LABELS], dim)
    kwargs = dict(embeddings=emb, labels=np.asarray(LABELS))
    if provenance is not None:
        kwargs["provenance"] = np.asarray(provenance)
    path = cache_dir / f"clip_{tag}_labels_{dim}.npz"
    np.savez(path, **kwargs)
    return emb, path


def test_pseudo_stamped_cache_refused_in_real_mode(tmp_path):
    _plant_cache(tmp_path, "scannet_3d", 768, "pseudo")
    with pytest.raises(RuntimeError, match="provenance 'pseudo'"):
        extract_text_features(LABELS, extractor="openseg",
                              cache_dir=str(tmp_path),
                              dataset_name="scannet_3d")


def test_unstamped_cache_refused_in_real_mode(tmp_path):
    _plant_cache(tmp_path, "scannet_3d", 768, None)
    with pytest.raises(RuntimeError, match="provenance 'unstamped'"):
        extract_text_features(LABELS, extractor="openseg",
                              cache_dir=str(tmp_path),
                              dataset_name="scannet_3d")


def test_clip_stamped_cache_accepted(tmp_path):
    emb, _ = _plant_cache(tmp_path, "scannet_3d", 768, "clip")
    got = extract_text_features(LABELS, extractor="openseg",
                                cache_dir=str(tmp_path),
                                dataset_name="scannet_3d")
    np.testing.assert_allclose(got, emb)


def test_pseudo_mode_never_writes_shared_cache(tmp_path):
    cache_dir = tmp_path / "cache"
    got = extract_text_features(LABELS, extractor="openseg",
                                cache_dir=str(cache_dir),
                                dataset_name="scannet_3d",
                                allow_pseudo=True)
    assert got.shape == (3, 768)
    assert not cache_dir.exists() or not list(cache_dir.iterdir())


def test_pseudo_stamped_cache_usable_with_allow_pseudo(tmp_path):
    emb, _ = _plant_cache(tmp_path, "scannet_3d", 768, "pseudo")
    got = extract_text_features(LABELS, extractor="openseg",
                                cache_dir=str(tmp_path),
                                dataset_name="scannet_3d",
                                allow_pseudo=True)
    np.testing.assert_allclose(got, emb)
