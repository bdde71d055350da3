"""Training utilities: schedules, meters, checkpointing, logging.

Parity targets: ``poly_learning_rate`` (util/util.py:111-114), AverageMeter
(util/util.py:86-102), and last/best checkpointing with
{epoch, params, opt_state, best_iou} (util/util.py:18-22,
run/distill.py:234-242) — serialized with flax msgpack instead of torch
pickles.
"""

from __future__ import annotations

import logging
import os
import shutil
import time
from os.path import join
from typing import Any, Dict, Optional

import numpy as np


def step_learning_rate(base_lr: float, epoch: int, step_epoch: int,
                       multiplier: float = 0.1) -> float:
    return base_lr * (multiplier ** (epoch // step_epoch))


def poly_learning_rate(base_lr: float, curr_iter: int, max_iter: int,
                       power: float = 0.9) -> float:
    return base_lr * (1 - float(curr_iter) / max_iter) ** power


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def get_logger(name: str = "main-logger") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        logger.setLevel(logging.INFO)
        handler = logging.StreamHandler()
        fmt = "[%(asctime)s %(filename)s line %(lineno)d] %(message)s"
        handler.setFormatter(logging.Formatter(fmt))
        logger.addHandler(handler)
    return logger


class ScalarWriter:
    """Append-only scalar log (tensorboard stand-in): one JSONL file."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self.path = join(logdir, "scalars.jsonl")

    def add_scalar(self, tag: str, value: float, step: int):
        import json
        with open(self.path, "a") as f:
            f.write(json.dumps({"tag": tag, "value": float(value),
                                "step": int(step), "t": time.time()}) + "\n")

    def close(self):
        pass


def save_checkpoint(payload: Dict[str, Any], is_best: bool, save_dir: str,
                    filename: str = "model_last.ckpt") -> str:
    """Serialize via flax state-dicts (handles optax NamedTuple opt states)
    then msgpack; copy to model_best on improvement (util/util.py:18-22)."""
    import jax
    from flax import serialization
    os.makedirs(save_dir, exist_ok=True)
    path = join(save_dir, filename)
    state_dict = serialization.to_state_dict(
        jax.tree_util.tree_map(lambda x: np.asarray(x), payload))
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(state_dict))
    if is_best:
        shutil.copyfile(path, join(save_dir, "model_best.ckpt"))
    return path


def load_checkpoint(path: str, template: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    """Restore; pass the live pytree as ``template`` to recover structure
    (NamedTuples, lists) from the flat state-dict."""
    from flax import serialization
    with open(path, "rb") as f:
        restored = serialization.msgpack_restore(f.read())
    out = dict(restored)
    if template is not None:
        for k, tmpl in template.items():
            out[k] = serialization.from_state_dict(tmpl, restored[k])
    return out
