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

NOTE: ME's even-kernel (k=2 down/up conv) region order should be verified
against a live MinkowskiEngine install when anchoring mIoU parity; this
module centralizes the permutation so a single flip fixes all layers.
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np

from ..models.sparse_unet import ARCHS, init_unet
from ..sparse.types import stencil_offsets


def me_offset_permutation(kernel_size: int) -> np.ndarray:
    """perm[j] = index in ME's region order of our j-th offset.

    ME's hypercube region iterator increments the first (x) coordinate
    fastest; ours (itertools.product) increments the last (z) fastest.
    """
    ours = stencil_offsets(kernel_size)
    if kernel_size % 2 == 1:
        r = kernel_size // 2
        axis = list(range(-r, r + 1))
    else:
        axis = list(range(kernel_size))
    me_order = {}
    idx = 0
    for dz in axis:          # slowest in ME
        for dy in axis:
            for dx in axis:  # fastest in ME
                me_order[(dx, dy, dz)] = idx
                idx += 1
    return np.array([me_order[tuple(o)] for o in ours.tolist()],
                    dtype=np.int64)


def _kernel(sd: Dict[str, np.ndarray], name: str, kernel_size: int
            ) -> np.ndarray:
    w = np.asarray(sd[name + ".kernel"], dtype=np.float32)
    if w.ndim == 2:  # 1x1 convs are stored (C_in, C_out)
        return w[None]
    perm = me_offset_permutation(kernel_size)
    return w[perm]


def _bn(sd: Dict[str, np.ndarray], name: str):
    p = {"gamma": np.asarray(sd[name + ".bn.weight"], np.float32),
         "beta": np.asarray(sd[name + ".bn.bias"], np.float32)}
    s = {"mean": np.asarray(sd[name + ".bn.running_mean"], np.float32),
         "var": np.asarray(sd[name + ".bn.running_var"], np.float32)}
    return p, s


def convert_state_dict(sd: Dict[str, np.ndarray], arch: str = "MinkUNet18A"):
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
    P["conv0"] = _kernel(sd, "conv0p1s1", 5)
    P["bn0"], S["bn0"] = _bn(sd, "bn0")
    for i in range(1, 5):
        P[f"conv{i}"] = _kernel(sd, f"conv{i}p{2 ** (i - 1)}s2", 2)
        P[f"bn{i}"], S[f"bn{i}"] = _bn(sd, f"bn{i}")
    for i in range(4, 8):
        P[f"convtr{i}"] = _kernel(sd, f"convtr{i}p{2 ** (8 - i)}s2", 2)
        P[f"bntr{i}"], S[f"bntr{i}"] = _bn(sd, f"bntr{i}")
    for b in range(1, 9):
        blocks = []
        states = []
        for j in range(a.layers[b - 1]):
            prefix = f"block{b}.{j}"
            bp: Dict = {}
            bs: Dict = {}
            bp["conv1"] = _kernel(sd, prefix + ".conv1", 3)
            bp["bn1"], bs["bn1"] = _bn(sd, prefix + ".norm1")
            bp["conv2"] = _kernel(sd, prefix + ".conv2", 3)
            bp["bn2"], bs["bn2"] = _bn(sd, prefix + ".norm2")
            if a.block == "bottleneck":
                bp["conv3"] = _kernel(sd, prefix + ".conv3", 3)
                bp["bn3"], bs["bn3"] = _bn(sd, prefix + ".norm3")
            if prefix + ".downsample.0.kernel" in sd:
                bp["down"] = _kernel(sd, prefix + ".downsample.0", 1)
                bp["down_bn"], bs["down_bn"] = _bn(sd,
                                                   prefix + ".downsample.1")
            blocks.append(bp)
            states.append(bs)
        P[f"block{b}"] = blocks
        S[f"block{b}"] = states
    P["final"] = _kernel(sd, "final", 1)
    return P, S


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
    args = ap.parse_args()
    import jax

    from .train_utils import save_checkpoint
    sd = load_torch_checkpoint(args.src)
    params, state = convert_state_dict(sd, args.arch)
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
