"""Supervised sparse-UNet segmentation baseline (the reference's
``run/train_mink.py``): MinkUNet18A -> class logits, CrossEntropy(ignore 255),
SGD with momentum + weight decay, poly LR (no 10x multiplier here), per-batch
IoU meters, val-gated best checkpoint, per-batch random global shift.

Run: ``python -m openscene_tpu.runtime.train_seg --config configs/scannet/mink.yaml [key value]*``
"""

from __future__ import annotations

import os
import sys
import time
from os.path import isfile, join
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import metrics
from ..config import Config, load_config
from ..data.batch import SegBatch, assemble_seg_batch
from ..data.loaders import Point3DLoader
from ..models import apply_unet, init_unet
from ..utils.train_utils import (AverageMeter, ScalarWriter, get_logger,
                                 load_checkpoint, save_checkpoint)

log = get_logger()


def focal_loss(probs, labels, num_classes: int, gamma: float = 2.0,
               eps: float = 1e-7, reduce: str = "sum"):
    """Focal loss on probabilities (reference util/util.py:261-285 parity:
    labels==255 map to an extra one-hot column that is then dropped, i.e.
    ignored; probs are clamped to [eps, 1-eps])."""
    import jax.numpy as jnp
    lab = jnp.where(labels == 255, num_classes, labels).astype(jnp.int32)
    y = jax.nn.one_hot(lab, num_classes + 1)[:, :num_classes]
    p = jnp.clip(probs, eps, 1.0 - eps)
    loss = -y * jnp.log(p) * (1.0 - p) ** gamma
    return jnp.mean(loss) if reduce == "mean" else jnp.sum(loss)


def cross_entropy_ignore(logits, labels, ignore: int = 255):
    """Mean CE over non-ignored voxels (torch CrossEntropyLoss semantics)."""
    valid = labels != ignore
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)


def make_seg_optimizer(cfg: Config, max_iter: int):
    def schedule(step):
        frac = jnp.maximum(1.0 - step / max_iter, 0.0)
        return cfg.base_lr * frac ** cfg.power
    opt = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(schedule, momentum=cfg.momentum),
    )
    return opt, schedule


def make_seg_train_step(cfg: Config, opt, mesh=None):
    """Jitted supervised train step; under ``mesh`` the same step runs per
    data shard with gradient/BN pmean and psum'd IoU histograms — the
    reference's DDP training (run/train_mink.py world_size scaffolding)."""
    arch = cfg.arch_3d
    const_in = not cfg.input_color
    cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def step_core(params, state, opt_state, batch: SegBatch):
        def loss_fn(p):
            x = batch.feats.astype(cdtype)
            out, ns = apply_unet(p, state, x, batch.geo, arch=arch,
                                 train=True, constant_input=const_in)
            return cross_entropy_ignore(out, batch.labels,
                                        cfg.ignore_label), (out, ns)
        (loss, (out, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if mesh is not None:
            grads = jax.lax.pmean(grads, "data")
            new_state = jax.lax.pmean(new_state, "data")
            loss = jax.lax.pmean(loss, "data")
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        pred = jnp.argmax(out, axis=-1)
        inter, union, tgt = metrics.intersection_and_union(
            pred, batch.labels, cfg.classes, cfg.ignore_label)
        if mesh is not None:
            inter, union, tgt = jax.lax.psum((inter, union, tgt), "data")
        return params, new_state, opt_state, loss, inter, union, tgt

    if mesh is None:
        return jax.jit(step_core, donate_argnums=(0, 1, 2))

    from jax.sharding import PartitionSpec as P

    def sharded(params, state, opt_state, batches):
        def inner(params, state, opt_state, batch):
            batch = jax.tree_util.tree_map(lambda x: x[0], batch)
            return step_core(params, state, opt_state, batch)

        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(), P(), P(), P("data")),
            out_specs=(P(),) * 7,
            check_vma=False,
        )(params, state, opt_state, batches)

    return jax.jit(sharded, donate_argnums=(0, 1, 2))


def make_seg_eval_step(cfg: Config, mesh=None):
    """Per-scene logits at original points; with ``mesh``, takes
    device-stacked SegBatches (one scene per device, identical caps) and
    returns stacked outputs — the reference's scaffolded multi-GPU eval
    (run/eval_mink.py:190-191)."""
    arch = cfg.arch_3d
    const_in = not cfg.input_color
    cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def step(params, state, batch: SegBatch):
        x = batch.feats.astype(cdtype)
        out, _ = apply_unet(params, state, x, batch.geo, arch=arch,
                            train=False, constant_input=const_in)
        return jnp.take(out, batch.inds_reconstruct, axis=0)

    if mesh is None:
        return jax.jit(step)

    from jax.sharding import PartitionSpec as P

    def sharded(params, state, batches):
        def inner(params, state, batch):
            batch = jax.tree_util.tree_map(lambda x: x[0], batch)
            return step(params, state, batch)[None]
        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(), P(), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )(params, state, batches)

    return jax.jit(sharded)


class SegTrainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.params, self.state = init_unet(
            jax.random.PRNGKey(cfg.manual_seed), 3, cfg.classes,
            arch=cfg.arch_3d)
        self.train_data = Point3DLoader(
            datapath_prefix=cfg.data_root, voxel_size=cfg.voxel_size,
            split="train", aug=cfg.aug, memcache=cfg.use_shm, loop=cfg.loop,
            input_color=cfg.input_color, seed=cfg.manual_seed)
        self.mesh = None
        self.n_dp = 1
        if cfg.data_parallel > 1:
            from ..parallel.mesh import get_mesh, replicate
            self.n_dp = min(cfg.data_parallel, len(jax.devices()))
            self.mesh = get_mesh(data=self.n_dp, model=1)
            log.info("supervised training over %d-device data mesh",
                     self.n_dp)
        self.per_dev_batch = max(cfg.batch_size // self.n_dp, 1)
        self._train_caps = None
        self.batches_per_epoch = max(
            len(self.train_data) // (self.per_dev_batch * self.n_dp), 1)
        max_iter = cfg.epochs * self.batches_per_epoch
        self.opt, self.schedule = make_seg_optimizer(cfg, max_iter)
        self.opt_state = self.opt.init(self.params)
        self.step_fn = make_seg_train_step(cfg, self.opt, mesh=self.mesh)
        self.eval_step = make_seg_eval_step(cfg)
        self.rng = np.random.default_rng(cfg.manual_seed)
        if self.mesh is not None:
            from ..parallel.mesh import replicate
            self.params = replicate(self.mesh, self.params)
            self.state = replicate(self.mesh, self.state)
            self.opt_state = replicate(self.mesh, self.opt_state)
        self.start_epoch = cfg.start_epoch
        self.best_iou = 0.0
        self.global_step = 0
        if cfg.evaluate:
            self.val_data = Point3DLoader(
                datapath_prefix=cfg.data_root, voxel_size=cfg.voxel_size,
                split="val", aug=False, memcache=cfg.use_shm, eval_all=True,
                input_color=cfg.input_color, seed=cfg.manual_seed + 1)
        if cfg.resume and isfile(cfg.resume):
            payload = load_checkpoint(cfg.resume, {
                "params": self.params, "state": self.state,
                "opt_state": self.opt_state})
            self.params, self.state = payload["params"], payload["state"]
            self.opt_state = payload["opt_state"]
            self.start_epoch = int(payload.get("epoch", 0))
            self.best_iou = float(payload.get("best_iou", 0.0))

    def train_epoch(self, epoch: int, writer: Optional[ScalarWriter] = None):
        cfg = self.cfg
        loss_meter = AverageMeter()
        inter_m = np.zeros(cfg.classes)
        union_m = np.zeros(cfg.classes)
        tgt_m = np.zeros(cfg.classes)
        order = self.rng.permutation(len(self.train_data))
        bs = self.per_dev_batch * self.n_dp
        for i in range(self.batches_per_epoch):
            idxs = order[i * bs:(i + 1) * bs]
            samples = [self.train_data.get(j) for j in idxs]
            if self.mesh is not None:
                from ..data.sharded import (assemble_sharded_seg_batches,
                                            merge_caps)
                from ..parallel.mesh import shard_batch
                per_dev = [samples[d * self.per_dev_batch:
                                   (d + 1) * self.per_dev_batch]
                           for d in range(self.n_dp)]
                try:
                    batches, caps = assemble_sharded_seg_batches(
                        per_dev, rng=self.rng, caps=self._train_caps)
                except OverflowError:
                    batches, caps = assemble_sharded_seg_batches(
                        per_dev, rng=self.rng, caps=None)
                    if self._train_caps is not None:
                        caps = merge_caps(self._train_caps, caps)
                    batches, caps = assemble_sharded_seg_batches(
                        per_dev, rng=self.rng, caps=caps)
                self._train_caps = caps
                batch = shard_batch(self.mesh, batches)
            else:
                batch = assemble_seg_batch(samples, rng=self.rng, shift=True)
            (self.params, self.state, self.opt_state, loss, bi, bu,
             bt) = self.step_fn(self.params, self.state, self.opt_state,
                                batch)
            self.global_step += 1
            loss_meter.update(float(loss), cfg.batch_size)
            inter_m += np.asarray(bi)
            union_m += np.asarray(bu)
            tgt_m += np.asarray(bt)
            if (i + 1) % cfg.print_freq == 0:
                acc = inter_m.sum() / (tgt_m.sum() + 1e-10)
                log.info("Epoch: [%d/%d][%d/%d] Loss %.4f Accuracy %.4f",
                         epoch + 1, cfg.epochs, i + 1,
                         self.batches_per_epoch, loss_meter.val, acc)
            if writer:
                writer.add_scalar("loss_train_batch", float(loss),
                                  self.global_step)
        miou, macc, allacc = metrics.miou_from_histograms(inter_m, union_m,
                                                          tgt_m)
        log.info("Train result at epoch [%d/%d]: mIoU/mAcc/allAcc "
                 "%.4f/%.4f/%.4f", epoch + 1, cfg.epochs, miou, macc, allacc)
        return loss_meter.avg, miou

    def validate(self) -> float:
        """Single-repeat val mIoU at original points."""
        cfg = self.cfg
        preds, gts = [], []
        for i in range(len(self.val_data)):
            sample = self.val_data.get(i)
            batch = assemble_seg_batch([sample], eval_all=True)
            logits = self.eval_step(self.params, self.state, batch)
            n = batch.num_points
            preds.append(np.asarray(logits[:n]).argmax(1))
            gts.append(np.asarray(batch.point_labels[:n]))
        miou = metrics.evaluate(np.concatenate(preds), np.concatenate(gts),
                                dataset=self.train_data.dataset_name)
        log.info("Val mIoU: %.4f", miou)
        return miou

    def fit(self):
        cfg = self.cfg
        writer = ScalarWriter(cfg.save_path)
        for epoch in range(self.start_epoch, cfg.epochs):
            loss_train, _ = self.train_epoch(epoch, writer)
            epoch_log = epoch + 1
            writer.add_scalar("loss_train", loss_train, epoch_log)
            is_best = False
            if cfg.evaluate and epoch_log % cfg.eval_freq == 0:
                miou = self.validate()
                writer.add_scalar("mIoU_val", miou, epoch_log)
                is_best = miou > self.best_iou
                self.best_iou = max(self.best_iou, miou)
            if epoch_log % cfg.save_freq == 0:
                save_checkpoint({
                    "epoch": epoch_log, "params": self.params,
                    "state": self.state, "opt_state": self.opt_state,
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
    maybe_initialize_distributed(cfg)
    os.makedirs(join(cfg.save_path, "model"), exist_ok=True)
    return SegTrainer(cfg).fit()


if __name__ == "__main__":
    main()
