"""Device mesh + sharding helpers (the TPU-native replacement of the
reference's DDP/NCCL stack, SURVEY.md §2.3).

Strategy map:
* data parallelism (the reference's only strategy): each device in the
  ``data`` axis gets its own padded scene-batch (stacked leading axis);
  gradients are ``pmean``-ed inside the jitted step — the DDP allreduce
  (run/distill.py:149-150) becomes an XLA collective over ICI.
* ``model`` axis (optional): channel-sharding of the wide CLIP-dim head —
  available for the 768-d distill head where the final GEMM dominates.

Multi-host: ``jax.distributed.initialize()`` + the same mesh spanning all
processes; nothing else changes (collectives ride ICI within a pod and DCN
across hosts).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(data: int = -1, model: int = 1,
             devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if data == -1:
        data = len(devices) // model
    assert data * model <= len(devices), (data, model, len(devices))
    dev = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(dev, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, tree):
    """Shard a pytree whose leaves have a leading per-device axis over
    'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
