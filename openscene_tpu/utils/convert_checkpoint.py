"""Convert reference PyTorch/MinkowskiEngine checkpoints to this framework.

The published OpenScene checkpoints (``*.pth.tar`` at
cvg-data.inf.ethz.ch/openscene/models/, see BASELINE.md) are torch pickles of
``{'state_dict': ...}`` with MinkowskiEngine module names
(``conv0p1s1.kernel``, ``bn0.bn.weight``, ``block1.0.downsample.0.kernel``,
...; an optional DataParallel ``module.`` / ``net3d.`` prefix).  This
converter maps them onto the functional param/state trees of
``models/sparse_unet.py``:

* conv kernels keep their (K, C_in, C_out) layout but the kernel-offset axis
  is permuted from ME's region order (FIRST coordinate fastest) to this
  engine's x-major ``stencil_offsets`` order (last coordinate fastest);
* MinkowskiBatchNorm ``bn.weight/bias/running_mean/running_var`` become
  (gamma, beta) params + (mean, var) state.

Usage:
    python -m openscene_tpu.utils.convert_checkpoint \
        scannet_openseg.pth.tar out/model_converted.ckpt \
        --arch MinkUNet18A --out_channels 768

REGION-ORDER CAVEAT: MinkowskiEngine's kernel-region iteration order
(which spatial axis varies fastest along the checkpoint's K axis) cannot be
verified in this offline environment (no ME install, no network for the
published checkpoints).  This module therefore makes the assumption an
explicit, switchable parameter:

* ``region_order="x_fastest"`` (default): offsets enumerate with the FIRST
  spatial coordinate fastest — the order ME's hypercube iterator is widely
  reported to use;
* ``region_order="z_fastest"``: C-order enumeration (last axis fastest),
  identical to this engine's own ``stencil_offsets``.

``probe_region_order`` picks the right one empirically from a real
checkpoint + one real scene (a wrong order spatially scrambles every 27-tap
kernel, collapsing distill cosine alignment / val mIoU);
``scripts/decide_region_order.py`` wraps it as the one-command decision
procedure (margin-gated, exits nonzero on ambiguity).  The permutation
algebra is pinned TWICE offline: ``tests/test_convert_checkpoint.py``
re-derives dense ``torch.nn.functional.conv3d`` goldens for both orders at
test time, and checks the committed byte-level fixture
``tests/fixtures/region_order_golden.npz`` — so when a checkpoint arrives
the only open question is which order ME used, answered by that script.
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np

from ..models.sparse_unet import ARCHS, init_unet
from ..sparse.types import stencil_offsets

REGION_ORDERS = ("x_fastest", "z_fastest")


def me_offset_permutation(kernel_size: int,
                          region_order: str = "x_fastest") -> np.ndarray:
    """perm[j] = index in ME's region order of our j-th offset.

    Ours (itertools.product) increments the last (z) coordinate fastest;
    ME's assumed order is set by ``region_order`` (module docstring).
    """
    assert region_order in REGION_ORDERS, region_order
    ours = stencil_offsets(kernel_size)
    if kernel_size % 2 == 1:
        r = kernel_size // 2
        axis = list(range(-r, r + 1))
    else:
        axis = list(range(kernel_size))
    me_order = {}
    idx = 0
    for a in axis:
        for b in axis:
            for c in axis:
                if region_order == "x_fastest":
                    me_order[(c, b, a)] = idx  # x fastest, z slowest
                else:
                    me_order[(a, b, c)] = idx  # z fastest (C order)
                idx += 1
    return np.array([me_order[tuple(o)] for o in ours.tolist()],
                    dtype=np.int64)


def _kernel(sd: Dict[str, np.ndarray], name: str, kernel_size: int,
            region_order: str = "x_fastest") -> np.ndarray:
    w = np.asarray(sd[name + ".kernel"], dtype=np.float32)
    if w.ndim == 2:  # 1x1 convs are stored (C_in, C_out)
        return w[None]
    perm = me_offset_permutation(kernel_size, region_order)
    return w[perm]


def _bn(sd: Dict[str, np.ndarray], name: str):
    p = {"gamma": np.asarray(sd[name + ".bn.weight"], np.float32),
         "beta": np.asarray(sd[name + ".bn.bias"], np.float32)}
    s = {"mean": np.asarray(sd[name + ".bn.running_mean"], np.float32),
         "var": np.asarray(sd[name + ".bn.running_var"], np.float32)}
    return p, s


def convert_state_dict(sd: Dict[str, np.ndarray], arch: str = "MinkUNet18A",
                       region_order: str = "x_fastest"):
    """torch state_dict (numpy-valued) -> (params, state) trees."""
    # strip DataParallel / wrapper prefixes
    def strip(k):
        for pre in ("module.", "net3d."):
            if k.startswith(pre):
                k = k[len(pre):]
        return k

    sd = {strip(k): v for k, v in sd.items()}
    a = ARCHS[arch]
    P: Dict = {}
    S: Dict = {}
    P["conv0"] = _kernel(sd, "conv0p1s1", 5, region_order)
    P["bn0"], S["bn0"] = _bn(sd, "bn0")
    for i in range(1, 5):
        P[f"conv{i}"] = _kernel(sd, f"conv{i}p{2 ** (i - 1)}s2", 2,
                                region_order)
        P[f"bn{i}"], S[f"bn{i}"] = _bn(sd, f"bn{i}")
    for i in range(4, 8):
        P[f"convtr{i}"] = _kernel(sd, f"convtr{i}p{2 ** (8 - i)}s2", 2,
                                  region_order)
        P[f"bntr{i}"], S[f"bntr{i}"] = _bn(sd, f"bntr{i}")
    for b in range(1, 9):
        blocks = []
        states = []
        for j in range(a.layers[b - 1]):
            prefix = f"block{b}.{j}"
            bp: Dict = {}
            bs: Dict = {}
            bp["conv1"] = _kernel(sd, prefix + ".conv1", 3, region_order)
            bp["bn1"], bs["bn1"] = _bn(sd, prefix + ".norm1")
            bp["conv2"] = _kernel(sd, prefix + ".conv2", 3, region_order)
            bp["bn2"], bs["bn2"] = _bn(sd, prefix + ".norm2")
            if a.block == "bottleneck":
                bp["conv3"] = _kernel(sd, prefix + ".conv3", 3, region_order)
                bp["bn3"], bs["bn3"] = _bn(sd, prefix + ".norm3")
            if prefix + ".downsample.0.kernel" in sd:
                bp["down"] = _kernel(sd, prefix + ".downsample.0", 1,
                                     region_order)
                bp["down_bn"], bs["down_bn"] = _bn(sd,
                                                   prefix + ".downsample.1")
            blocks.append(bp)
            states.append(bs)
        P[f"block{b}"] = blocks
        S[f"block{b}"] = states
    P["final"] = _kernel(sd, "final", 1, region_order)
    return P, S


def probe_region_order(sd: Dict[str, np.ndarray], arch: str,
                       scene_coords: np.ndarray, scene_feat_3d: np.ndarray,
                       feat_mask: np.ndarray, voxel_size: float = 0.02):
    """Empirically pick ME's region order from a trained checkpoint.

    Converts the checkpoint under BOTH candidate orders and measures the
    distill objective (mean cosine similarity between model output and the
    scene's fused 2D features) on one real scene.  A trained model only
    aligns with its targets under the correct order — the wrong order
    spatially scrambles every 27-tap kernel.  Returns
    (best_order, {order: mean_cos}).
    """
    import jax
    import jax.numpy as jnp

    from ..data.batch import assemble_distill_batch
    from ..data.loaders import SceneSample
    from ..models import apply_unet

    coords = np.floor(scene_coords / voxel_size).astype(np.int32)
    coords -= coords.min(0)
    _, first = np.unique(
        coords[:, 0].astype(np.int64) * 2 ** 42
        + coords[:, 1].astype(np.int64) * 2 ** 21 + coords[:, 2],
        return_index=True)
    vox_mask = feat_mask[first]
    sample = SceneSample(
        coords=coords[first],
        feats=np.ones((len(first), 3), np.float32),
        labels=np.zeros(len(first), np.int64), inds_reconstruct=None,
        feat_3d=scene_feat_3d[first][vox_mask],
        feat_mask=vox_mask)
    batch = assemble_distill_batch([sample], scene_feat_3d.shape[1],
                                   rng=np.random.default_rng(0), shift=False)

    scores = {}
    for order in REGION_ORDERS:
        params, state = convert_state_dict(sd, arch, region_order=order)
        out, _ = jax.jit(lambda p, s: apply_unet(
            p, s, jnp.asarray(batch.feats, jnp.bfloat16), batch.geo,
            arch=arch, train=False, constant_input=True))(params, state)
        out = np.asarray(out, np.float32)
        t = batch.feat_3d
        m = batch.mask > 0
        num = (out[m] * t[m]).sum(-1)
        den = (np.linalg.norm(out[m], axis=-1)
               * np.linalg.norm(t[m], axis=-1) + 1e-8)
        scores[order] = float((num / den).mean())
    best = max(scores, key=scores.get)
    return best, scores


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--arch", default="MinkUNet18A")
    ap.add_argument("--out_channels", type=int, default=768)
    ap.add_argument("--region_order", default="x_fastest",
                    choices=REGION_ORDERS)
    ap.add_argument("--probe_scene", default="",
                    help="scene .npz + its fused-feature .npz "
                         "(comma-separated) to pick region_order empirically")
    args = ap.parse_args()
    import jax

    from .train_utils import save_checkpoint
    sd = load_torch_checkpoint(args.src)
    region_order = args.region_order
    if args.probe_scene:
        from ..data.scene_io import load_fused_features, load_scene
        scene_path, feat_path = args.probe_scene.split(",")
        coords, _, _ = load_scene(scene_path)
        blob = load_fused_features(feat_path)
        feat, mask_full = blob["feat"], blob["mask_full"]
        full = np.zeros((len(coords), feat.shape[1]), np.float32)
        full[mask_full] = feat.astype(np.float32)
        region_order, scores = probe_region_order(sd, args.arch, coords,
                                                  full, mask_full)
        print(f"probe scores {scores} -> region_order={region_order}")
    params, state = convert_state_dict(sd, args.arch,
                                       region_order=region_order)
    # validate against a freshly initialized tree of the same arch
    ref_p, ref_s = init_unet(jax.random.PRNGKey(0), 3, args.out_channels,
                             arch=args.arch)
    for tree, ref in ((params, ref_p), (state, ref_s)):
        got = jax.tree_util.tree_map(lambda x: np.shape(x), tree)
        want = jax.tree_util.tree_map(lambda x: np.shape(x), ref)
        assert got == want, "converted tree shape mismatch"
    save_checkpoint({"epoch": 0, "params": params, "state": state,
                     "best_iou": 0.0}, False, ".", filename=args.dst)
    print("wrote", args.dst)


if __name__ == "__main__":
    main()
