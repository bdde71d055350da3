"""3D distillation training: regress fused CLIP features from geometry.

The TPU re-build of ``run/distill.py``: a MinkUNet18A consumes voxelized
point clouds (constant-1 input features by default) and regresses the fused
2D CLIP features with a cosine (or L1) loss on the voxels that have targets.

Parity details carried over:
* Adam with a poly LR schedule times 10 — the reference's ``index_split=0``
  puts every param group on the 10x branch (run/distill.py:141-142,344-347),
  so the effective LR is ``10 * base_lr * (1 - it/max_it)^power``;
* per-batch random global coordinate shift (run/distill.py:315), applied in
  batch assembly;
* val-every-epoch mIoU against CLIP text embeddings gates the best
  checkpoint (run/distill.py:219-242).

TPU-native: the train step is one jitted program; under a multi-device mesh
the same step runs under ``shard_map`` over the ``data`` axis with gradient
and BN-statistic ``pmean`` (replacing DDP/NCCL).

Run: ``python -m openscene_tpu.runtime.distill --config <yaml> [key value]*``
"""

from __future__ import annotations

import functools
import os
import sys
import threading
import time
from os.path import isfile, join
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import metrics
from ..config import Config, dataset_name_from_root, load_config
from ..data.batch import DistillBatch, assemble_distill_batch, assemble_seg_batch
from ..data.loaders import FusedFeatureLoader, Point3DLoader
from ..labels import labelset_and_palette
from ..models import apply_unet, init_unet
from ..models.disnet import output_dim
from ..sparse.ops import valid_mask
from ..text import extract_text_features
from ..utils.train_utils import (AverageMeter, ScalarWriter, get_logger,
                                 load_checkpoint, poly_learning_rate,
                                 save_checkpoint)

log = get_logger()


def cosine_distill_loss(out, target, mask, eps: float = 1e-8,
                        model_axis: Optional[str] = None):
    """mean over masked voxels of (1 - cos(out, target))
    (run/distill.py:324-326; torch.nn.CosineSimilarity eps semantics).

    sqrt is guarded: padded rows are exactly zero and d(sqrt)(0) is NaN,
    which would leak through the mask (0 * nan = nan).

    ``model_axis``: when the CLIP feature dim D is channel-sharded over a
    mesh axis (out/target hold (cap, D/m) shards), the three per-row
    reductions are completed with a psum over that axis — the only
    cross-shard communication of the whole head."""
    dot = jnp.sum(out * target, axis=-1)
    sq_o = jnp.sum(out * out, axis=-1)
    sq_t = jnp.sum(target * target, axis=-1)
    if model_axis is not None:
        dot, sq_o, sq_t = jax.lax.psum((dot, sq_o, sq_t), model_axis)
    norm_o = jnp.sqrt(jnp.where(sq_o > 0, sq_o, 1.0))
    norm_t = jnp.sqrt(jnp.where(sq_t > 0, sq_t, 1.0))
    cos = dot / jnp.maximum(norm_o * norm_t, eps)
    return jnp.sum((1.0 - cos) * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def cosine_head_loss(feats, w_final, target, mask, eps: float = 1e-8,
                     model_axis: Optional[str] = None):
    """Cosine distill loss computed in pre-head space.

    With out = feats @ W (the final 1x1 conv, W: (C, D) with D=768/512):
      dot(out, t) = feats . (t @ W^T)          -- (cap, C)
      |out|^2     = feats . (feats @ (W W^T))  -- via the (C, C) Gram matrix
    so the (cap, D) head output (and its (cap, D) cotangent) never
    materialize: at D=768 and ~1.5M-row caps that removes the two largest
    HBM allocations of the train step (~5GB) while computing the identical
    loss (same autodiff fixpoint through u and the Gram matrix)."""
    wf = w_final[0] if w_final.ndim == 3 else w_final  # (C, D) or (C, D/m)
    cdtype = feats.dtype
    u = jnp.dot(target.astype(cdtype), wf.T.astype(cdtype),
                preferred_element_type=jnp.float32)      # (cap, C)
    gram = jnp.dot(wf, wf.T, preferred_element_type=jnp.float32)
    sq_t = jnp.sum(target.astype(jnp.float32) ** 2, axis=-1)
    if model_axis is not None:
        # D-sharded head: u, the Gram matrix and |t|^2 are sums over D —
        # complete them across the shards (all-reduce of (cap,C)+(C,C)+(cap,)
        # instead of ever materializing a (cap, D) tensor per device)
        u, gram, sq_t = jax.lax.psum((u, gram, sq_t), model_axis)
    f32 = feats.astype(jnp.float32)
    dot = jnp.sum(f32 * u, axis=-1)
    sq_o = jnp.sum(jnp.dot(f32, gram.astype(jnp.float32),
                           preferred_element_type=jnp.float32) * f32, axis=-1)
    norm_o = jnp.sqrt(jnp.where(sq_o > 0, sq_o, 1.0))
    norm_t = jnp.sqrt(jnp.where(sq_t > 0, sq_t, 1.0))
    cos = dot / jnp.maximum(norm_o * norm_t, eps)
    return jnp.sum((1.0 - cos) * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def l1_distill_loss(out, target, mask, model_axis: Optional[str] = None):
    diff = jnp.sum(jnp.abs(out - target) * mask[:, None])
    d = out.shape[-1]
    if model_axis is not None:
        diff = jax.lax.psum(diff, model_axis)
        d = d * jax.lax.axis_size(model_axis)
    return diff / jnp.maximum(jnp.sum(mask) * d, 1.0)


def make_optimizer(cfg: Config, max_iter: int):
    def schedule(step):
        frac = 1.0 - step / max_iter
        return cfg.base_lr * cfg.lr_multiplier * jnp.maximum(frac, 0.0) ** cfg.power
    return optax.adam(schedule), schedule


def make_train_step(cfg: Config, opt, mesh=None, geo_caps=None,
                    n_scenes=None, grid_dims0=None):
    """Jitted train step.

    ``geo_caps`` (a static per-level cap tuple) switches the step to
    host-light mode: it consumes a :class:`RawDistillBatch` and builds the
    whole geometry (kernel maps, hierarchy, Pallas window plans, stem
    occupancy) ON DEVICE inside the same jit — the ME-parity behavior of
    rebuilding coordinate maps per batch, minus the host/transfer cost.
    In that mode the step returns an extra ``spill_overflow`` bool: True
    means a window-plan spill bucket overflowed and the batch must be
    re-run via the host/XLA path (the trainer checks it with the loss
    sync).

    ``n_scenes`` (static; scenes per device batch) additionally switches
    the in-jit geometry build to the dense occupancy-grid prober
    (sparse/grid.py, ~10x cheaper at bench scale); scenes whose bbox
    exceeds ``grid_dims0`` (default sparse.grid.DEFAULT_DIMS0) surface as
    the same overflow->host-fallback contract."""
    arch = cfg.arch_3d
    loss_kind = cfg.loss_type
    const_in = not cfg.input_color
    cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    use_windows = jax.default_backend() == "tpu"
    from ..parallel.mesh import model_axis_size
    model_axis = "model" if model_axis_size(mesh) > 1 else None

    def step_core(params, state, opt_state, batch):
        overflow = None
        if geo_caps is not None:
            from ..sparse.geometry_device import build_geometry_parts
            geo, overflow = build_geometry_parts(
                batch.coords, batch.num, geo_caps, windows=use_windows,
                stem_occupancy=const_in, n_scenes=n_scenes,
                grid_dims0=grid_dims0)
        else:
            geo = batch.geo

        def loss_fn(p):
            x = batch.feats.astype(cdtype)
            # targets ship fp16 from the host (storage dtype, and host fp16
            # conversion is software-slow); compute in cdtype like before
            target = batch.feat_3d.astype(cdtype)
            if loss_kind == "cosine" and getattr(cfg, "memory_efficient_loss",
                                                 False):
                # pre-head features + algebraic head: never materializes the
                # (cap, 768) output or its cotangent — unlocks ~1.5x larger
                # voxel caps when HBM-bound, at ~25% step-time cost (the f32
                # Gram path); see cosine_head_loss
                feats, ns = apply_unet(p, state, x, geo, arch=arch,
                                       train=True, constant_input=const_in,
                                       return_prehead=True)
                l = cosine_head_loss(feats, p["final"], target, batch.mask,
                                     model_axis=model_axis)
                return l, ns
            # with a 'model' axis, p["final"] is a (1, C, D/m) shard and
            # apply_unet emits a (cap, D/m) output shard; the losses finish
            # their D-reductions with a psum over the axis
            out, ns = apply_unet(p, state, x, geo, arch=arch,
                                 train=True, constant_input=const_in)
            if loss_kind == "cosine":
                l = cosine_distill_loss(out, target, batch.mask,
                                        model_axis=model_axis)
            elif loss_kind == "l1":
                l = l1_distill_loss(out, target, batch.mask,
                                    model_axis=model_axis)
            else:
                raise NotImplementedError(loss_kind)
            return l, ns
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if mesh is not None:
            if model_axis is not None:
                # Two effects to undo (measured exactly, test_parallel.py
                # test_model_axis_head_sharding_matches_single):
                # (1) each model row backprops through its OWN head D-shard
                #     only, so backbone grads are PARTIAL per row;
                # (2) the loss is psum'd over 'model', and psum's transpose
                #     under shard_map SUMS the replicated grad seeds, so
                #     every per-row grad carries an extra factor n_model.
                # pmean over 'model' fixes the backbone (sums partials,
                # cancels the seed factor); the head shard's grad is
                # complete locally and only needs the 1/n_model.
                nm = model_axis_size(mesh)
                meaned = jax.lax.pmean(grads, model_axis)
                grads = {**meaned, "final": jax.tree_util.tree_map(
                    lambda g: g / nm, grads["final"])}
            grads = jax.lax.pmean(grads, "data")
            new_state = jax.lax.pmean(new_state, "data")
            loss = jax.lax.pmean(loss, "data")
            if overflow is not None:
                overflow = jax.lax.pmax(overflow.astype(jnp.int32), "data")
        updates, new_opt_state = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if geo_caps is not None:
            # on overflow (spill bucket / level cap) the gradients are wrong:
            # keep the pre-step trees so the trainer can re-run the batch
            # through the host-geometry path
            keep = lambda old, new: jax.tree_util.tree_map(
                lambda o, n: jnp.where(overflow, o, n), old, new)
            new_params = keep(params, new_params)
            new_state = keep(state, new_state)
            new_opt_state = keep(opt_state, new_opt_state)
            return new_params, new_state, new_opt_state, loss, overflow
        return new_params, new_state, new_opt_state, loss

    if mesh is None:
        return jax.jit(step_core, donate_argnums=(0, 1, 2))

    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import head_sharded_specs

    def sharded(params, state, opt_state, batches):
        def inner(params, state, opt_state, batch):
            batch = jax.tree_util.tree_map(lambda x: x[0], batch)
            return step_core(params, state, opt_state, batch)

        if model_axis is None:
            pspec, ospec = P(), P()
            bspec = P("data")
        else:
            # head D-sharded over 'model': the final conv + its Adam moments
            # live as (…, D/m) shards; targets ship as (data, cap, D/m)
            pspec = head_sharded_specs(params)
            ospec = head_sharded_specs(opt_state)
            bspec = jax.tree_util.tree_map(lambda _: P("data"), batches)
            bspec = bspec._replace(feat_3d=P("data", None, "model"))
        n_out = 5 if geo_caps is not None else 4
        out_specs = (pspec, P(), ospec) + (P(),) * (n_out - 3)
        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(pspec, P(), ospec, bspec),
            out_specs=out_specs,
            check_vma=False,  # scan carries inside the convs start unvarying
        )(params, state, opt_state, batches)

    return jax.jit(sharded, donate_argnums=(0, 1, 2))


def make_val_step(cfg: Config, mesh=None):
    """Per-batch validation: point-level logits vs text + IoU histograms
    (reference validate(), run/distill.py:403-447).

    Under a mesh, each device takes one scene-batch of the stacked input and
    the loss/histograms are ``psum``-reduced over the ``data`` axis inside
    the step — the TPU equivalent of the reference's
    ``dist.all_reduce(intersection/union/target)`` (run/distill.py:429-431).
    Returns (loss_sum, n_valid_points, inter, union, tgt)."""
    arch = cfg.arch_3d
    cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    const_in = not cfg.input_color
    from ..parallel.mesh import model_axis_size
    model_axis = "model" if model_axis_size(mesh) > 1 else None

    def step_core(params, state, text, batch):
        x = batch.feats.astype(cdtype)
        out, _ = apply_unet(params, state, x, batch.geo, arch=arch,
                            train=False, constant_input=const_in)
        # D-sharded head: out and text are (…, D/m) shards; the class-logit
        # contraction over D completes with a psum over 'model'
        logits_v = out @ jnp.asarray(text).T.astype(jnp.float32)
        if model_axis is not None:
            logits_v = jax.lax.psum(logits_v, model_axis)
        logits = jnp.take(logits_v, batch.inds_reconstruct, axis=0)
        labels = batch.point_labels
        pred = jnp.argmax(logits, axis=-1)
        # cross-entropy with ignore 255 (over valid points only)
        logp = jax.nn.log_softmax(logits, axis=-1)
        valid = labels != 255
        safe = jnp.where(valid, labels, 0)
        ce = -jnp.take_along_axis(logp, safe[:, None].astype(jnp.int32),
                                  axis=1)[:, 0]
        loss_sum = jnp.sum(ce * valid)
        n_valid = jnp.sum(valid)
        inter, union, tgt = metrics.intersection_and_union(
            pred, labels, cfg.classes, cfg.ignore_label)
        return loss_sum, n_valid, inter, union, tgt

    if mesh is None:
        return jax.jit(step_core)

    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import head_sharded_specs

    def sharded(params, state, text, batches):
        def inner(params, state, text, batch):
            batch = jax.tree_util.tree_map(lambda x: x[0], batch)
            out = step_core(params, state, text, batch)
            return jax.lax.psum(out, "data")

        pspec = P() if model_axis is None else head_sharded_specs(params)
        tspec = P() if model_axis is None else P(None, "model")
        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(pspec, P(), tspec, P("data")),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False,
        )(params, state, text, batches)

    return jax.jit(sharded)


def host_batch_from_raw(raw) -> DistillBatch:
    """Rebuild a host-geometry DistillBatch from a RawDistillBatch (overflow
    fallback: window-plan spill bucket or level cap outgrown)."""
    from ..sparse.geometry import GeometryCaps, build_unet_geometry
    n = int(raw.num)
    coords = np.asarray(raw.coords[:n])
    geo = build_unet_geometry(coords, caps=GeometryCaps.for_count(n))
    cap0 = geo.levels[0].cap
    pad0 = cap0 - raw.coords.shape[0]

    def grow(a, fill=0.0):
        a = np.asarray(a)
        if pad0 == 0:
            return a
        if pad0 > 0:
            width = [(0, pad0)] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, width, constant_values=fill)
        return a[:cap0]

    return DistillBatch(geo=geo, feats=grow(raw.feats),
                        feat_3d=grow(raw.feat_3d), mask=grow(raw.mask),
                        labels=grow(raw.labels, 255), num_voxels=n)


class DistillTrainer:
    def __init__(self, cfg: Config, allow_pseudo_text: bool = False):
        self.cfg = cfg
        self.dim = output_dim(cfg.feature_2d_extractor)
        key = jax.random.PRNGKey(cfg.manual_seed)
        self.params, self.state = init_unet(key, 3, self.dim, arch=cfg.arch_3d)

        # ---- device mesh (reference DDP engages from the entry point,
        # run/distill.py:105-150; here cfg.data_parallel picks the 'data'
        # axis size, -1 = all devices) ----
        n_dp = cfg.data_parallel
        if n_dp == -1:
            # auto: all devices, but never more than one scene per device
            # (the reference divides the global batch over ranks)
            n_dp = max(len(jax.devices()) // max(cfg.model_parallel, 1), 1)
            n_dp = min(n_dp, max(cfg.batch_size, 1))
        self.mesh = None
        if n_dp > 1:
            from ..parallel.mesh import get_mesh
            self.mesh = get_mesh(data=n_dp, model=cfg.model_parallel)
            log.info("data-parallel over %d devices (mesh %s)", n_dp,
                     self.mesh.devices.shape)
        self.n_dp = max(n_dp, 1)
        # loud no-op detection: a reference user toggling these must never be
        # silently ignored (VERDICT r1)
        if cfg.sync_bn and self.mesh is None:
            log.warning("sync_bn=True has no effect on a single device; with "
                        "data_parallel>1 BN statistics are always "
                        "synchronized (pmean'd in the sharded step)")
        if cfg.model_parallel > 1:
            assert self.dim % cfg.model_parallel == 0, (
                f"model_parallel={cfg.model_parallel} must divide the "
                f"distill head dim {self.dim}")
            log.info("model_parallel=%d: distill head D-sharded over the "
                     "'model' axis (%d-wide shards)", cfg.model_parallel,
                     self.dim // cfg.model_parallel)
        # reference divides the global batch over ranks (run/distill.py:146)
        self.per_dev_batch = max(cfg.batch_size // self.n_dp, 1)
        self._train_caps = None
        self._caps_lock = threading.Lock()
        self._val_caps = None
        self._val_point_cap = None
        # device-side geometry: kernel maps built inside the jitted step
        # ("auto": on TPU, where the searchsorted probes run at HBM speed;
        # host/XLA-gather geometry elsewhere). Under a mesh the build runs
        # per-shard inside shard_map (each device constructs its own batch's
        # kernel maps — the caps are shared so it is one program).
        dg = str(cfg.device_geometry).lower()
        self.device_geometry = (jax.default_backend() == "tpu"
                                if dg == "auto" else dg in ("on", "true", "1"))
        self._dg_steps: Dict[Tuple, object] = {}
        self._host_step = None
        # grid-prober health: after grid_overflow_limit CONSECUTIVE
        # overflow fallbacks, drop the occupancy-grid prober (n_scenes=None)
        # rather than paying the host fallback on every batch forever
        self._grid_enabled = True
        self._overflow_streak = 0

        self.train_data = FusedFeatureLoader(
            datapath_prefix=cfg.data_root,
            datapath_prefix_feat=cfg.data_root_2d_fused_feature,
            voxel_size=cfg.voxel_size, split="train", aug=cfg.aug,
            memcache=cfg.use_shm, loop=cfg.loop,
            input_color=cfg.input_color, seed=cfg.manual_seed)
        self.batches_per_epoch = max(
            len(self.train_data) // (self.per_dev_batch * self.n_dp), 1)
        max_iter = cfg.epochs * self.batches_per_epoch
        self.opt, self.schedule = make_optimizer(cfg, max_iter)
        self.opt_state = self.opt.init(self.params)
        self.step_fn = make_train_step(cfg, self.opt, mesh=self.mesh)
        self.val_step = make_val_step(cfg, mesh=self.mesh)
        self.rng = np.random.default_rng(cfg.manual_seed)
        self.start_epoch = cfg.start_epoch
        self.best_iou = 0.0
        self.global_step = 0

        labelset_name = dataset_name_from_root(cfg.data_root)
        labels, self.palette, _ = labelset_and_palette(labelset_name)
        self._viz_fwd = None
        self.text = extract_text_features(
            labels, cfg.feature_2d_extractor, cfg.data_root, cfg.prompt_eng,
            cfg.text_embedding_cache, embedding_file=cfg.embedding_file,
            allow_pseudo=allow_pseudo_text or cfg.allow_pseudo_text,
            dataset_name=labelset_name)
        if cfg.evaluate:
            self.val_data = Point3DLoader(
                datapath_prefix=cfg.data_root, voxel_size=cfg.voxel_size,
                split="val", aug=False, memcache=cfg.use_shm, eval_all=True,
                input_color=cfg.input_color, seed=cfg.manual_seed + 1)
        if cfg.resume and isfile(cfg.resume):
            payload = load_checkpoint(cfg.resume, {
                "params": self.params, "state": self.state,
                "opt_state": self.opt_state})
            self.params = payload["params"]
            self.state = payload["state"]
            self.opt_state = payload["opt_state"]
            self.start_epoch = int(payload.get("epoch", 0))
            self.best_iou = float(payload.get("best_iou", 0.0))
            self.global_step = self.start_epoch * self.batches_per_epoch
            log.info("resumed from %s (epoch %d)", cfg.resume, self.start_epoch)
        if self.mesh is not None:
            from ..parallel.mesh import replicate
            self.params = replicate(self.mesh, self.params,
                                    head_sharded=True)
            self.state = replicate(self.mesh, self.state)
            self.opt_state = replicate(self.mesh, self.opt_state,
                                       head_sharded=True)

    def _build_sharded(self, samples):
        """Per-device sample lists -> stacked+sharded DistillBatch with a
        persistent fixed-cap schedule (caps only ever grow; an overflow —
        e.g. an unusually large batch — re-buckets and recompiles once)."""
        from ..data.sharded import (assemble_sharded_distill_batches,
                                    merge_caps)
        from ..parallel.mesh import shard_batch

        per_dev = [samples[d * self.per_dev_batch:(d + 1) * self.per_dev_batch]
                   for d in range(self.n_dp)]
        try:
            batches, caps = assemble_sharded_distill_batches(
                per_dev, self.dim, rng=self.rng, caps=self._train_caps)
        except OverflowError:
            batches, caps = assemble_sharded_distill_batches(
                per_dev, self.dim, rng=self.rng, caps=None)
            with self._caps_lock:
                caps = (merge_caps(self._train_caps, caps)
                        if self._train_caps is not None else caps)
            batches, caps = assemble_sharded_distill_batches(
                per_dev, self.dim, rng=self.rng, caps=caps)
            log.info("re-bucketed sharded caps to %s", caps.fixed)
        with self._caps_lock:
            self._train_caps = caps
        return shard_batch(self.mesh, batches)

    def _build_sharded_raw(self, samples):
        """Per-device sample lists -> stacked+sharded RawDistillBatch with a
        shared persistent cap schedule; geometry is built per-shard inside
        the jitted step."""
        from ..data.sharded import assemble_sharded_raw_batches
        from ..parallel.mesh import shard_batch

        per_dev = [samples[d * self.per_dev_batch:(d + 1) * self.per_dev_batch]
                   for d in range(self.n_dp)]
        with self._caps_lock:
            caps = self._train_caps
        batches, caps = assemble_sharded_raw_batches(per_dev, self.dim,
                                                     rng=self.rng, caps=caps)
        with self._caps_lock:
            self._train_caps = caps
        return shard_batch(self.mesh, batches), caps.fixed

    def _raw_step(self, caps: Tuple[int, ...]):
        """Device-geometry train step, cached per static cap signature."""
        key = (caps, self._grid_enabled)
        if key not in self._dg_steps:
            dims0 = tuple(self.cfg.grid_dims0) or None
            self._dg_steps[key] = make_train_step(
                self.cfg, self.opt, mesh=self.mesh, geo_caps=caps,
                n_scenes=self.per_dev_batch if self._grid_enabled else None,
                grid_dims0=dims0)
        return self._dg_steps[key]

    def _host_batch_from_raw(self, raw):
        return host_batch_from_raw(raw)

    def _host_batches_from_raw_sharded(self, raw):
        """Sharded overflow fallback: rebuild host-geometry DistillBatches
        (one shared cap schedule) from a stacked RawDistillBatch and reshard
        them for the host-geometry mesh step."""
        from ..data.sharded import stack_batches
        from ..parallel.mesh import shard_batch
        from ..sparse.geometry import (GeometryCaps, _bucket,
                                       build_unet_geometry, level_counts)

        raw = jax.tree_util.tree_map(np.asarray, raw)
        counts = [0] * 5
        slices = []
        for d in range(self.n_dp):
            n = int(raw.num[d])
            coords = raw.coords[d][:n]
            slices.append((n, coords))
            for l, c in enumerate(level_counts(coords)):
                counts[l] = max(counts[l], c)
        caps = GeometryCaps(cap0=_bucket(counts[0]),
                            fixed=tuple(_bucket(c) for c in counts))
        cap0 = caps.fixed[0]

        def fit(a, fill=0.0):
            if a.shape[0] == cap0:
                return a
            if a.shape[0] > cap0:  # rows >= num are padding; safe to trim
                return a[:cap0]
            width = [(0, cap0 - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, width, constant_values=fill)

        batches = []
        for d, (n, coords) in enumerate(slices):
            # windows=False: measured spill buckets would be ragged across
            # the device axis (see data/sharded.py)
            geo = build_unet_geometry(coords, caps=caps,
                                      build_windows=False)
            batches.append(DistillBatch(
                geo=geo, feats=fit(raw.feats[d]),
                feat_3d=fit(raw.feat_3d[d]), mask=fit(raw.mask[d]),
                labels=fit(raw.labels[d], 255), num_voxels=n))
        return shard_batch(self.mesh, stack_batches(batches))

    def _epoch_batches(self):
        """Batches built ``workers`` threads ahead of the device step
        (replaces the reference's DataLoader worker pool)."""
        from ..data.batch import assemble_raw_distill_batch
        from ..data.prefetch import Prefetcher

        order = self.rng.permutation(len(self.train_data))
        bs = self.per_dev_batch * self.n_dp

        def build(i):
            idxs = order[i * bs:(i + 1) * bs]
            samples = [self.train_data.get(j) for j in idxs]
            if self.mesh is not None:
                if self.device_geometry:
                    return self._build_sharded_raw(samples)
                return self._build_sharded(samples)
            if self.device_geometry:
                with self._caps_lock:
                    caps = self._train_caps
                batch, caps = assemble_raw_distill_batch(
                    samples, self.dim, caps=caps, rng=self.rng)
                with self._caps_lock:
                    self._train_caps = caps
                return batch, caps.fixed  # caps pinned to THIS batch's shapes
            return assemble_distill_batch(samples, self.dim, rng=self.rng)

        if self.mesh is not None and self._train_caps is None:
            # calibrate the fixed caps synchronously on the first batch so
            # prefetch threads never race the initial schedule
            first = build(0)
            rest = (build(i) for i in range(1, self.batches_per_epoch))
            if self.cfg.workers > 1:
                rest = Prefetcher(build, range(1, self.batches_per_epoch),
                                  workers=self.cfg.workers)
            yield first
            yield from rest
        elif self.cfg.workers <= 1:
            for i in range(self.batches_per_epoch):
                yield build(i)
        else:
            yield from Prefetcher(build, range(self.batches_per_epoch),
                                  workers=self.cfg.workers)

    def train_epoch(self, epoch: int, writer: Optional[ScalarWriter] = None):
        loss_meter = AverageMeter()
        data_meter = AverageMeter()
        batch_meter = AverageMeter()
        end = time.time()
        from ..data.batch import RawDistillBatch
        for i, batch in enumerate(self._epoch_batches()):
            data_meter.update(time.time() - end)
            if isinstance(batch, tuple) and isinstance(batch[0],
                                                       RawDistillBatch):
                batch, caps = batch
                step = self._raw_step(caps)
                (self.params, self.state, self.opt_state, loss,
                 overflow) = step(self.params, self.state, self.opt_state,
                                  batch)
                if bool(overflow):
                    # window-plan spill bucket overflowed: the step kept the
                    # pre-update trees; re-run through the host-geometry path
                    log.warning("device-geometry spill overflow; re-running "
                                "batch %d via the host builder", i)
                    self._overflow_streak += 1
                    limit = self.cfg.grid_overflow_limit
                    if (limit > 0 and self._grid_enabled
                            and self._overflow_streak >= limit):
                        log.warning(
                            "%d consecutive overflow fallbacks: disabling "
                            "the occupancy-grid prober (scene extents "
                            "exceed grid_dims0=%s? raise it in the config)",
                            self._overflow_streak,
                            tuple(self.cfg.grid_dims0)
                            or "default (768,768,256)")
                        self._grid_enabled = False
                        self._overflow_streak = 0
                    if self.mesh is not None:
                        hb = self._host_batches_from_raw_sharded(batch)
                        (self.params, self.state, self.opt_state,
                         loss) = self.step_fn(self.params, self.state,
                                              self.opt_state, hb)
                    else:
                        if self._host_step is None:
                            self._host_step = make_train_step(self.cfg,
                                                              self.opt)
                        hb = self._host_batch_from_raw(batch)
                        (self.params, self.state, self.opt_state,
                         loss) = self._host_step(self.params, self.state,
                                                 self.opt_state, hb)
                else:
                    self._overflow_streak = 0
            else:
                self.params, self.state, self.opt_state, loss = self.step_fn(
                    self.params, self.state, self.opt_state, batch)
            self.global_step += 1
            loss = float(loss)
            loss_meter.update(loss, self.cfg.batch_size)
            batch_meter.update(time.time() - end)
            end = time.time()
            if (i + 1) % self.cfg.print_freq == 0:
                lr = float(self.schedule(self.global_step))
                log.info(
                    "Epoch: [%d/%d][%d/%d] Data %.3f (%.3f) Batch %.3f "
                    "(%.3f) Loss %.4f LR %.2e", epoch + 1, self.cfg.epochs,
                    i + 1, self.batches_per_epoch, data_meter.val,
                    data_meter.avg, batch_meter.val, batch_meter.avg,
                    loss_meter.val, lr)
            if writer:
                writer.add_scalar("loss_train_batch", loss, self.global_step)
            last_batch = batch
        if self.cfg.save_path:
            try:
                self._epoch_end_viz(epoch, last_batch)
            except Exception as e:  # qualitative dump must never kill training
                log.warning("epoch-end viz failed: %s", e)
        return loss_meter.avg

    def _epoch_end_viz(self, epoch: int, batch) -> None:
        """Epoch-end qualitative PLY dump comparing fused 2D labels, model
        predictions and GT on scene 0 of the last train batch
        (run/distill.py:372-398); written to save_path/result/last/."""
        from ..data.batch import RawDistillBatch
        from ..utils.viz import export_labeled_cloud

        if self.mesh is not None:  # stacked: take device 0's sub-batch
            batch = jax.tree_util.tree_map(lambda x: np.asarray(x)[0], batch)
        if isinstance(batch, RawDistillBatch):  # device-geometry path
            batch = self._host_batch_from_raw(batch)
        if self._viz_fwd is None:
            arch, const_in = self.cfg.arch_3d, not self.cfg.input_color
            cdt = (jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16"
                   else jnp.float32)

            @jax.jit
            def fwd(params, state, feats, geo):
                out, _ = apply_unet(params, state, feats.astype(cdt), geo,
                                    arch=arch, train=False,
                                    constant_input=const_in)
                return out
            self._viz_fwd = fwd

        out = np.asarray(self._viz_fwd(self.params, self.state,
                                       jnp.asarray(batch.feats), batch.geo),
                         dtype=np.float32)
        coords = np.asarray(batch.geo.levels[0].coords)
        n = int(batch.geo.levels[0].num)
        rows = (np.asarray(batch.mask[:n]) > 0) & (coords[:n, 0] == 0)
        if not rows.any():
            return
        pcl = coords[:n][rows][:, 1:].astype(np.float32)
        text_t = self.text.T.astype(np.float32)
        pred_ids = (out[:n][rows] @ text_t).argmax(1)
        img_ids = (np.asarray(batch.feat_3d[:n][rows], dtype=np.float32)
                   @ text_t).argmax(1)
        gt = np.asarray(batch.labels[:n][rows]).copy()
        gt[gt == 255] = self.cfg.classes
        folder = join(self.cfg.save_path, "result", "last")
        os.makedirs(folder, exist_ok=True)
        ext = self.cfg.feature_2d_extractor
        export_labeled_cloud(join(folder, f"{ext}_{epoch + 1}.ply"), pcl,
                             img_ids, self.palette)
        export_labeled_cloud(join(folder, f"pred_{epoch + 1}.ply"), pcl,
                             pred_ids, self.palette)
        export_labeled_cloud(join(folder, f"gt_{epoch + 1}.ply"), pcl, gt,
                             self.palette)

    def _dummy_val_sample(self):
        """All-ignore one-voxel scene used to pad the last device group; its
        255 labels contribute nothing to loss or histograms."""
        from ..data.loaders import SceneSample
        return SceneSample(
            coords=np.zeros((1, 3), dtype=np.int32),
            feats=np.ones((1, 3), dtype=np.float32),
            labels=np.full(1, 255, dtype=np.int64),
            inds_reconstruct=np.zeros(1, dtype=np.int64),
            feat_3d=None, feat_mask=None)

    def _validate_sharded(self) -> Tuple[float, float, float, float]:
        """Scenes round-robined over the mesh's data axis; histograms are
        psum-reduced inside the step (reference dist.all_reduce,
        run/distill.py:429-431)."""
        from ..data.sharded import fixed_caps_from_counts, stack_batches
        from ..parallel.mesh import shard_batch
        from ..sparse.geometry import _bucket, level_counts

        n = len(self.val_data)
        if self._val_caps is None:
            counts = [0] * 5
            max_pts = 1
            for i in range(n):
                s = self.val_data.get(i)
                c4 = np.concatenate(
                    [np.zeros((len(s.coords), 1), np.int64),
                     s.coords.astype(np.int64)], axis=1)
                for l, c in enumerate(level_counts(c4)):
                    counts[l] = max(counts[l], c)
                max_pts = max(max_pts, len(s.labels))
            self._val_caps = fixed_caps_from_counts(counts, margin=0.02)
            self._val_point_cap = _bucket(max_pts)

        loss_sum, n_valid = 0.0, 0
        inter = np.zeros(self.cfg.classes)
        union = np.zeros(self.cfg.classes)
        tgt = np.zeros(self.cfg.classes)
        for g in range(0, n, self.n_dp):
            group = [self.val_data.get(i) for i in range(g, min(g + self.n_dp, n))]
            while len(group) < self.n_dp:
                group.append(self._dummy_val_sample())
            batches = stack_batches([
                # windows=False: measured spill buckets would be ragged
                # across the device axis (see data/sharded.py)
                assemble_seg_batch([s], caps=self._val_caps, eval_all=True,
                                   point_cap=self._val_point_cap,
                                   windows=False)
                for s in group])
            batches = shard_batch(self.mesh, batches)
            ls, nv, bi, bu, bt = self.val_step(self.params, self.state,
                                               self.text, batches)
            loss_sum += float(ls)
            n_valid += int(nv)
            inter += np.asarray(bi)
            union += np.asarray(bu)
            tgt += np.asarray(bt)
        miou, macc, allacc = metrics.miou_from_histograms(inter, union, tgt)
        log.info("Val result (over %d devices): mIoU/mAcc/allAcc "
                 "%.4f/%.4f/%.4f", self.n_dp, miou, macc, allacc)
        return loss_sum / max(n_valid, 1), miou, macc, allacc

    def validate(self) -> Tuple[float, float, float, float]:
        if self.mesh is not None:
            return self._validate_sharded()
        loss_meter = AverageMeter()
        inter = np.zeros(self.cfg.classes)
        union = np.zeros(self.cfg.classes)
        tgt = np.zeros(self.cfg.classes)
        for i in range(len(self.val_data)):
            sample = self.val_data.get(i)
            batch = assemble_seg_batch([sample], eval_all=True)
            ls, nv, bi, bu, bt = self.val_step(self.params, self.state,
                                               self.text, batch)
            loss_meter.update(float(ls) / max(int(nv), 1))
            inter += np.asarray(bi)
            union += np.asarray(bu)
            tgt += np.asarray(bt)
        miou, macc, allacc = metrics.miou_from_histograms(inter, union, tgt)
        log.info("Val result: mIoU/mAcc/allAcc %.4f/%.4f/%.4f", miou, macc,
                 allacc)
        return loss_meter.avg, miou, macc, allacc

    def fit(self):
        cfg = self.cfg
        writer = ScalarWriter(cfg.save_path)
        for epoch in range(self.start_epoch, cfg.epochs):
            loss_train = self.train_epoch(epoch, writer)
            epoch_log = epoch + 1
            writer.add_scalar("loss_train", loss_train, epoch_log)
            is_best = False
            if cfg.evaluate and epoch_log % cfg.eval_freq == 0:
                loss_val, miou, macc, allacc = self.validate()
                for tag, v in (("loss_val", loss_val), ("mIoU_val", miou),
                               ("mAcc_val", macc), ("allAcc_val", allacc)):
                    writer.add_scalar(tag, v, epoch_log)
                is_best = miou > self.best_iou
                self.best_iou = max(self.best_iou, miou)
            if epoch_log % cfg.save_freq == 0:
                save_checkpoint({
                    "epoch": epoch_log,
                    "params": self.params,
                    "state": self.state,
                    "opt_state": self.opt_state,
                    "best_iou": self.best_iou,
                }, is_best, join(cfg.save_path, "model"))
        log.info("==>Training done!\nBest Iou: %.3f", self.best_iou)
        return self.best_iou


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg_path, rest = None, []
    it = iter(argv)
    for a in it:
        if a == "--config" or a.startswith("--config="):
            cfg_path = a.split("=", 1)[1] if "=" in a else next(it)
        else:
            rest.append(a)
    cfg = load_config(cfg_path, tuple(rest))
    from ..parallel.mesh import maybe_initialize_distributed
    if maybe_initialize_distributed(cfg):
        log.info("multi-host: process %d/%d, %d global devices",
                 jax.process_index(), jax.process_count(),
                 len(jax.devices()))
    os.makedirs(join(cfg.save_path, "model"), exist_ok=True)
    trainer = DistillTrainer(cfg)
    return trainer.fit()


if __name__ == "__main__":
    main()
