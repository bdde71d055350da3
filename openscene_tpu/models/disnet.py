"""DisNet: the 3D distillation model wrapper.

Picks the CLIP-space output dimension from the 2D feature extractor
(openseg -> 768, lseg -> 512) and wraps a sparse UNet with 3 input channels
(reference ``models/disnet.py:21-40``).
"""

from __future__ import annotations

from .sparse_unet import apply_unet, init_unet

FEATURE_DIMS = {"openseg": 768, "lseg": 512}


def output_dim(feature_2d_extractor: str) -> int:
    for k, v in FEATURE_DIMS.items():
        if k in feature_2d_extractor:
            return v
    raise NotImplementedError(feature_2d_extractor)


def init_disnet(key, cfg):
    """(params, state) for the distillation model from a Config."""
    return init_unet(key, in_channels=3,
                     out_channels=output_dim(cfg.feature_2d_extractor),
                     arch=cfg.arch_3d)


def apply_disnet(params, state, x, geo, cfg, *, train: bool = False):
    return apply_unet(params, state, x, geo, arch=cfg.arch_3d, train=train,
                      constant_input=not cfg.input_color)
