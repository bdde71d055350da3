"""Standalone sparse ResNet classifiers (ResNet14/18/34/50/101).

The reference ships these in ``models/resnet_base.py:139-160`` (unused by the
OpenScene pipeline but part of the model zoo): a conv stem, four strided
residual stages, global average pooling, and a linear classifier head —
re-built here on the TPU sparse engine.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.geometry import GeometryCaps, build_unet_geometry
from ..sparse.ops import (masked_batch_norm, masked_global_avg_pool, relu,
                          sparse_conv, sparse_down_conv, valid_mask)
from .sparse_unet import (_apply_stage, _bn, _block_init, _conv_init,
                          _bn_init, _nest, _renest_stage, _stage_init,
                          _wplan, UNetArch)


@dataclass(frozen=True)
class ResNetArchSpec:
    block: str
    layers: Tuple[int, ...]
    planes: Tuple[int, ...] = (64, 128, 256, 512)
    init_dim: int = 64

    @property
    def expansion(self):
        return 1 if self.block == "basic" else 4


RESNET_ARCHS: Dict[str, ResNetArchSpec] = {
    "ResNet14": ResNetArchSpec("basic", (1, 1, 1, 1)),
    "ResNet18": ResNetArchSpec("basic", (2, 2, 2, 2)),
    "ResNet34": ResNetArchSpec("basic", (3, 4, 6, 3)),
    "ResNet50": ResNetArchSpec("bottleneck", (3, 4, 6, 3)),
    "ResNet101": ResNetArchSpec("bottleneck", (3, 4, 23, 3)),
}


def init_resnet(key, in_channels: int, num_classes: int,
                arch: str = "ResNet18"):
    a = RESNET_ARCHS[arch]
    ua = UNetArch(a.block, a.layers + (0,) * 4, a.planes + (0,) * 4,
                  a.init_dim)
    keys = iter(jax.random.split(key, 16))
    P: Dict = {}
    S: Dict = {}
    P["conv0"] = _conv_init(next(keys), 125, in_channels, a.init_dim)
    P["bn0"], S["bn0"] = _bn_init(a.init_dim)
    inplanes = a.init_dim
    for i in range(1, 5):
        P[f"conv{i}"] = _conv_init(next(keys), 8, inplanes, inplanes)
        P[f"bn{i}"], S[f"bn{i}"] = _bn_init(inplanes)
        P[f"block{i}"], S[f"block{i}"], inplanes = _stage_init(
            next(keys), ua, i - 1, inplanes)
    P["fc"] = {
        "w": jax.random.normal(next(keys), (inplanes, num_classes)) * 0.01,
        "b": jnp.zeros(num_classes),
    }
    return P, S


def apply_resnet(params, state, x, geo, num_batches: int, *,
                 arch: str = "ResNet18", train: bool = False):
    """x: (cap0, Cin). Returns ((num_batches, num_classes) logits, state).
    Per-scene ids come from the batch column of the coarsest level's coords
    (padded rows are masked out of the pooling)."""
    a = RESNET_ARCHS[arch]
    ns: Dict = {}
    masks = [valid_mask(l.num, l.cap, jnp.float32) for l in geo.levels]
    nums = [l.num for l in geo.levels]

    out = sparse_conv(x, params["conv0"], geo.stem.fwd, geo.stem.flip_perm)
    out = _bn(out, params["bn0"], state["bn0"], masks[0], nums[0], train, ns,
              ("bn0",))
    out = relu(out)
    for i in range(1, 5):
        out = sparse_down_conv(out, params[f"conv{i}"], geo.down[i - 1])
        out = _bn(out, params[f"bn{i}"], state[f"bn{i}"], masks[i], nums[i],
                  train, ns, (f"bn{i}",))
        out = relu(out)
        out = _apply_stage(params[f"block{i}"], state[f"block{i}"], out,
                           geo.self3[i], _wplan(geo, i), masks[i], nums[i],
                           train, ns, f"block{i}", a.block)
    batch_ids = geo.levels[4].coords[:, 0]
    pooled = masked_global_avg_pool(out, masks[4], nums[4], batch_ids,
                                    num_batches)
    logits = pooled @ params["fc"]["w"] + params["fc"]["b"]

    nested = _nest(ns)
    new_state = dict(state)
    for k, v in nested.items():
        if k.startswith("block"):
            new_state[k] = _renest_stage(v, len(state[k]))
        else:
            new_state[k] = v
    return logits, new_state
