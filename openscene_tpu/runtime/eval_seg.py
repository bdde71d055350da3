"""Supervised baseline evaluation (the reference's ``run/eval_mink.py``):
labelset-free eval of the trained segmentation UNet with the summed-logit
repeats protocol; saves gt.npy / pred.npy.

Run: ``python -m openscene_tpu.runtime.eval_seg --config configs/scannet/mink.yaml [key value]*``
"""

from __future__ import annotations

import os
import sys
from os.path import join
from typing import Dict, List, Optional

import jax
import numpy as np

from .. import metrics
from ..config import Config, dataset_name_from_root, load_config
from ..data.batch import assemble_seg_batch
from ..data.loaders import Point3DLoader
from ..models import init_unet
from ..utils.train_utils import get_logger, load_checkpoint
from .train_seg import make_seg_eval_step

log = get_logger()


def evaluate_seg(cfg: Config, params=None, state=None) -> Dict[str, float]:
    dataset_name = dataset_name_from_root(cfg.data_root)
    if params is None:
        params, state = init_unet(jax.random.PRNGKey(cfg.manual_seed), 3,
                                  cfg.classes, arch=cfg.arch_3d)
        if cfg.model_path and os.path.isfile(cfg.model_path):
            payload = load_checkpoint(cfg.model_path,
                                      {"params": params, "state": state})
            params, state = payload["params"], payload["state"]
            log.info("loaded %s (epoch %s)", cfg.model_path,
                     payload.get("epoch"))
        elif cfg.model_path:
            raise FileNotFoundError(cfg.model_path)
    mesh = None
    n_dp = 1
    if cfg.data_parallel > 1 and len(jax.devices()) > 1:
        from ..parallel.mesh import get_mesh, replicate
        n_dp = min(cfg.data_parallel, len(jax.devices()))
        mesh = get_mesh(data=n_dp, model=1)
        params = replicate(mesh, params)
        state = replicate(mesh, state)
        log.info("sharded supervised eval over %d devices", n_dp)
    step = make_seg_eval_step(cfg, mesh=mesh)
    loader = Point3DLoader(
        datapath_prefix=cfg.data_root, voxel_size=cfg.voxel_size,
        split=cfg.split, aug=False, memcache=cfg.use_shm, eval_all=True,
        input_color=cfg.input_color, seed=cfg.manual_seed)

    results: Dict[str, float] = {}
    store: Optional[List[np.ndarray]] = None
    rng = np.random.default_rng(cfg.manual_seed)
    is_nuscenes = "nuscenes_3d" in dataset_name

    def scene_logits_single(n_scenes):
        for i in range(n_scenes):
            sample = loader.get(i)
            batch = assemble_seg_batch([sample], eval_all=True)
            logits = np.asarray(step(params, state, batch),
                                dtype=np.float32)[:batch.num_points]
            yield logits, np.asarray(batch.point_labels[:batch.num_points])

    def scene_logits_sharded(n_scenes):
        # one calibration pass -> one compiled shape family (mirrors the
        # zero-shot evaluator, runtime/evaluate.py:_scene_outputs)
        from ..data.sharded import stack_batches
        from ..parallel.mesh import shard_batch
        from ..sparse.geometry import GeometryCaps, _bucket, level_counts

        samples = [loader.get(i) for i in range(n_scenes)]
        counts = [1] * 5
        max_pts = 1
        for s in samples:
            c4 = np.concatenate(
                [np.zeros((len(s.coords), 1), np.int64),
                 s.coords.astype(np.int64)], axis=1)
            for l, c in enumerate(level_counts(c4)):
                counts[l] = max(counts[l], c)
            max_pts = max(max_pts, len(s.labels))
        caps = GeometryCaps(cap0=_bucket(counts[0]),
                            fixed=tuple(_bucket(c) for c in counts))
        pcap = _bucket(max_pts)
        for g in range(0, n_scenes, n_dp):
            group = samples[g:g + n_dp]
            real = len(group)
            while len(group) < n_dp:
                group.append(group[0])  # pad group; outputs discarded
            batches = stack_batches([
                assemble_seg_batch([s], caps=caps, eval_all=True,
                                   point_cap=pcap, windows=False)
                for s in group])
            n_pts = [len(s.labels) for s in group]
            out = step(params, state, shard_batch(mesh, batches))
            out = np.asarray(out, dtype=np.float32)
            for d in range(real):
                yield (out[d][:n_pts[d]],
                       np.asarray(group[d].labels[:n_pts[d]]))

    for rep in range(cfg.test_repeats):
        loader.reseed(int(rng.integers(10000)))
        preds, gts = [], []
        scene_iter = (scene_logits_sharded if mesh is not None
                      else scene_logits_single)(len(loader.data_paths))
        for logits, label in scene_iter:
            if is_nuscenes:
                keep = label != 255
                label, logits = label[keep], logits[keep]
            preds.append(logits)
            gts.append(label)
        gt = np.concatenate(gts)
        logits = np.concatenate(preds)
        cur = metrics.evaluate(logits.argmax(1), gt, dataset=dataset_name)
        results[f"repeat_{rep}"] = cur
        if cfg.test_repeats > 1:
            if store is None:
                store = [p.copy() for p in preds]
            else:
                for s, p in zip(store, preds):
                    s += p
            acc = metrics.evaluate(np.concatenate(store).argmax(1), gt,
                                   dataset=dataset_name, stdout=True)
            results["accumulated"] = acc
            log.info("repeat %d mIoU %.4f accumulated %.4f", rep + 1, cur,
                     acc)
        else:
            results["accumulated"] = cur
            log.info("mIoU %.4f", cur)
        if cfg.save_folder:
            os.makedirs(cfg.save_folder, exist_ok=True)
            np.save(join(cfg.save_folder, "gt.npy"), gt)
            final = (np.concatenate(store) if store is not None
                     else logits).argmax(1)
            np.save(join(cfg.save_folder, "pred.npy"), final)
    results["miou"] = results["accumulated"]
    return results


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
    results = evaluate_seg(cfg)
    log.info("final mIoU: %.4f", results["miou"])
    return results


if __name__ == "__main__":
    main()
