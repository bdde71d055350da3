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

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_distributed_initialized = False


def maybe_initialize_distributed(cfg=None) -> bool:
    """Multi-host entry (the reference's multi-node DDP scaffolding,
    run/distill.py:113-116): call once per process BEFORE any backend use.

    Activation is explicit — a coordinator address from
    ``cfg.coordinator_address`` or ``JAX_COORDINATOR_ADDRESS`` — so
    single-host runs never pay the rendezvous. On TPU pods where the
    runtime already knows the topology, address/process counts may be
    omitted and ``jax.distributed.initialize()`` autodetects them.
    Returns True when running multi-host."""
    global _distributed_initialized
    if _distributed_initialized:
        return True
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS", "") or (
        getattr(cfg, "coordinator_address", "") if cfg is not None else "")
    if not addr:
        return False
    kw = {"coordinator_address": addr}
    n = int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0) or (
        int(getattr(cfg, "num_processes", 0)) if cfg is not None else 0)
    pid = os.environ.get("JAX_PROCESS_ID", "")
    pid = int(pid) if pid != "" else (
        int(getattr(cfg, "process_id", -1)) if cfg is not None else -1)
    if n > 0:
        kw["num_processes"] = n
    if pid >= 0:
        kw["process_id"] = pid
    jax.distributed.initialize(**kw)
    _distributed_initialized = True
    return True


def get_mesh(data: int = -1, model: int = 1,
             devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if data == -1:
        data = len(devices) // model
    assert data * model <= len(devices), (data, model, len(devices))
    dev = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(dev, axis_names=("data", "model"))


def model_axis_size(mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return 1
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)


def shard_batch(mesh: Mesh, tree):
    """Shard a pytree whose leaves have a leading per-device axis over
    'data'. When the mesh carries a real 'model' axis and the tree is a
    distill batch, its CLIP-feature targets are additionally channel-sharded
    over 'model' (matching the D-sharded head, see head_sharded_specs)."""
    sharding = NamedSharding(mesh, P("data"))
    put = lambda x: jax.device_put(x, sharding)
    if model_axis_size(mesh) > 1 and getattr(tree, "feat_3d", None) is not None:
        f3 = jax.device_put(tree.feat_3d,
                            NamedSharding(mesh, P("data", None, "model")))
        tree = jax.tree_util.tree_map(put, tree._replace(feat_3d=None))
        return tree._replace(feat_3d=f3)
    return jax.tree_util.tree_map(put, tree)


def head_sharded_specs(tree, axis: str = "model"):
    """Leaf-level PartitionSpec tree for params / optimizer states: every
    leaf replicated EXCEPT leaves living under a ``final`` dict key (the
    wide distill head's 1x1 conv (1, C, D) and its Adam moments), which are
    sharded over ``axis`` along their last (CLIP-D) dim."""
    from jax.tree_util import (DictKey, tree_flatten_with_path,
                               tree_unflatten)
    flat, treedef = tree_flatten_with_path(tree)
    specs = []
    for path, leaf in flat:
        under_final = any(isinstance(k, DictKey) and k.key == "final"
                          for k in path)
        if under_final and getattr(leaf, "ndim", 0) >= 1:
            specs.append(P(*([None] * (leaf.ndim - 1) + [axis])))
        else:
            specs.append(P())
    return tree_unflatten(treedef, specs)


def replicate(mesh: Mesh, tree, head_sharded: bool = False):
    """Place params/state on the mesh: fully replicated, or (for params and
    optimizer states of a model-parallel run) with the distill head
    D-sharded over 'model'."""
    if head_sharded and model_axis_size(mesh) > 1:
        specs = head_sharded_specs(tree)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs)
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
