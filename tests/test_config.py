"""Config system: YAML section flattening + key/value CLI overrides."""

import pytest

from openscene_tpu.config import Config, load_config


def test_sections_are_cosmetic(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("""
DATA:
  data_root: data/scannet_3d
  voxel_size: 0.02
DISTILL:
  batch_size: 8
  base_lr: 0.0001
TEST:
  feature_type: 'ensemble'
""")
    cfg = load_config(str(p))
    assert cfg.data_root == "data/scannet_3d"
    assert cfg.voxel_size == 0.02
    assert cfg.batch_size == 8
    assert cfg.feature_type == "ensemble"


def test_cli_overrides_with_literal_eval(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("DATA:\n  voxel_size: 0.02\n")
    cfg = load_config(str(p), ("voxel_size", "0.05", "batch_size", "16",
                               "aug", "False", "save_path", "out/x"))
    assert cfg.voxel_size == 0.05
    assert cfg.batch_size == 16
    assert cfg.aug is False
    assert cfg.save_path == "out/x"


def test_dotted_override_uses_last_component():
    cfg = load_config(None, ("DISTILL.base_lr", "0.01"))
    assert cfg.base_lr == 0.01


def test_unknown_keys_kept():
    cfg = load_config(None, ("my_custom_flag", "3"))
    assert cfg.my_custom_flag == 3


def test_shipped_configs_parse():
    import glob
    paths = glob.glob("configs/*/*.yaml")
    assert len(paths) >= 18
    for p in paths:
        cfg = load_config(p)
        assert isinstance(cfg, Config)
        assert cfg.voxel_size > 0
