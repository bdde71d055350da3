"""Sparse UNet family (MinkUNet14/18/34/50/101, plane variants A-D).

Functional re-implementation of the reference architecture
(``models/mink_unet.py:30-263``, ``models/resnet_base.py:31-136`` — themselves
the SR-UNet of Choy et al., CVPR'19) on the TPU sparse engine:

* 4 down / 4 up UNet with a kernel-size-5 stem, kernel-2 stride-2
  down/transposed convs, residual blocks (BasicBlock or Bottleneck) at every
  level, skip concatenation on exactly-cached finer coordinates, and a final
  1x1 projection.
* All convolutions are bias-free (MinkowskiConvolution default); BatchNorm
  carries (gamma, beta) + running stats; ReLU everywhere.

Params and BN state are plain nested dicts (pytrees); ``apply_unet`` is pure:
``(params, state, x, geometry, train) -> (out, new_state)``.

Weight init: He-normal with std = sqrt(2 / (K * C_out)) on conv kernels
(fan-out mode over the kernel volume, matching ME's kaiming init intent,
reference ``models/resnet_base.py:73-80``); BN gamma=1, beta=0.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.ops import (masked_batch_norm, relu, sparse_conv,
                          sparse_down_conv, sparse_up_conv, valid_mask)
from ..sparse.pallas_conv import windowed_sparse_conv
from ..sparse.pallas_edge import (mixed_up_conv, windowed_down_conv,
                                  windowed_up_conv)
from ..sparse.types import UNetGeometry


def _stencil_conv(x, w, plan, wplan):
    """k=3 stencil conv: windowed Pallas kernel when a window plan exists
    for the level, else the XLA gather path (identical semantics).

    Channel widths beyond the scoped-VMEM budget (the 256x256 level-4
    convs' backward, 384-wide D-variants) split into one kernel call per
    dx window class (pallas_conv); odd widths (no pair-packing) fall back
    to XLA."""
    if wplan is not None and w.shape[1] % 2 == 0 and w.shape[2] % 2 == 0:
        return windowed_sparse_conv(x, w, plan.flip_perm, wplan.win_start,
                                    wplan.lidx, wplan.spill_ent,
                                    wplan.spill_fwd)
    return sparse_conv(x, w, plan.fwd, plan.flip_perm)


def _wplan(geo: UNetGeometry, level: int):
    return geo.wplans[level] if len(geo.wplans) > level else None


def _ewplan(geo: UNetGeometry, edge: int):
    return geo.ewplans[edge] if len(geo.ewplans) > edge else None


def _even(w) -> bool:
    return w.shape[1] % 2 == 0 and w.shape[2] % 2 == 0


def _edge_down_conv(x, w, plan, ewp):
    """k=2 s=2 down conv: windowed edge kernel when a plan exists (and
    channels are even — pair-packing), else the XLA gather path."""
    if ewp is not None and _even(w):
        return windowed_down_conv(x, w, *ewp)
    return sparse_down_conv(x, w, plan)


def _edge_up_conv(x, w, plan, ewp):
    """k=2 s=2 up conv: MIXED path when an edge plan exists — XLA forward
    (dense parent GEMMs + placement gather) + windowed parent-grid backward;
    measured faster than both the all-windowed and all-XLA variants
    (pallas_edge.mixed_up_conv docstring)."""
    if ewp is not None and _even(w):
        return mixed_up_conv(x, w, plan.child_parent, plan.child_offset,
                             ewp.dwin_start, ewp.dlidx, ewp.dspill_ent,
                             ewp.dspill_fwd)
    return sparse_up_conv(x, w, plan)


@dataclass(frozen=True)
class UNetArch:
    block: str  # 'basic' (expansion 1) | 'bottleneck' (expansion 4)
    layers: Tuple[int, ...]  # residual blocks per stage (8 stages)
    planes: Tuple[int, ...]  # base planes per stage (8 stages)
    init_dim: int = 32

    @property
    def expansion(self) -> int:
        return 1 if self.block == "basic" else 4


ARCHS: Dict[str, UNetArch] = {
    "MinkUNet14A": UNetArch("basic", (1,) * 8, (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet14B": UNetArch("basic", (1,) * 8, (32, 64, 128, 256, 128, 128, 128, 128)),
    "MinkUNet14C": UNetArch("basic", (1,) * 8, (32, 64, 128, 256, 192, 192, 128, 128)),
    "MinkUNet14D": UNetArch("basic", (1,) * 8, (32, 64, 128, 256, 384, 384, 384, 384)),
    "MinkUNet18A": UNetArch("basic", (2,) * 8, (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet18B": UNetArch("basic", (2,) * 8, (32, 64, 128, 256, 128, 128, 128, 128)),
    "MinkUNet18D": UNetArch("basic", (2,) * 8, (32, 64, 128, 256, 384, 384, 384, 384)),
    "MinkUNet34A": UNetArch("basic", (2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 64, 64)),
    "MinkUNet34B": UNetArch("basic", (2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 64, 32)),
    "MinkUNet34C": UNetArch("basic", (2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 96, 96)),
    "MinkUNet50": UNetArch("bottleneck", (2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 96, 96)),
    "MinkUNet101": UNetArch("bottleneck", (2, 3, 4, 23, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 96, 96)),
}


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------

def _conv_init(key, k_volume: int, cin: int, cout: int) -> jnp.ndarray:
    std = float(np.sqrt(2.0 / (k_volume * cout)))
    return jax.random.normal(key, (k_volume, cin, cout), dtype=jnp.float32) * std


def _bn_init(c: int):
    return ({"gamma": jnp.ones(c), "beta": jnp.zeros(c)},
            {"mean": jnp.zeros(c), "var": jnp.ones(c)})


def _block_init(key, block: str, cin: int, planes: int, expansion: int):
    """One residual block's params/state. Downsample 1x1 conv when shapes
    change (reference models/resnet_base.py:82-118, stride is always 1 in the
    UNet's blocks)."""
    keys = jax.random.split(key, 4)
    params: Dict = {}
    state: Dict = {}
    cout = planes * expansion
    if block == "basic":
        params["conv1"] = _conv_init(keys[0], 27, cin, planes)
        params["bn1"], state["bn1"] = _bn_init(planes)
        params["conv2"] = _conv_init(keys[1], 27, planes, planes)
        params["bn2"], state["bn2"] = _bn_init(planes)
    else:
        params["conv1"] = _conv_init(keys[0], 1, cin, planes)
        params["bn1"], state["bn1"] = _bn_init(planes)
        params["conv2"] = _conv_init(keys[1], 27, planes, planes)
        params["bn2"], state["bn2"] = _bn_init(planes)
        params["conv3"] = _conv_init(keys[2], 1, planes, cout)
        params["bn3"], state["bn3"] = _bn_init(cout)
    if cin != cout:
        params["down"] = _conv_init(keys[3], 1, cin, cout)
        params["down_bn"], state["down_bn"] = _bn_init(cout)
    return params, state


def _stage_init(key, arch: UNetArch, stage: int, cin: int):
    planes = arch.planes[stage]
    n = arch.layers[stage]
    keys = jax.random.split(key, n)
    params, state = [], []
    c = cin
    for i in range(n):
        p, s = _block_init(keys[i], arch.block, c, planes, arch.expansion)
        params.append(p)
        state.append(s)
        c = planes * arch.expansion
    return params, state, c


def init_unet(key, in_channels: int, out_channels: int,
              arch: str = "MinkUNet18A"):
    """Build (params, state) for a MinkUNet. Layout mirrors the reference's
    module names (conv0..convtr7, block1..block8, final)."""
    a = ARCHS[arch]
    keys = iter(jax.random.split(key, 32))
    P: Dict = {}
    S: Dict = {}

    P["conv0"] = _conv_init(next(keys), 125, in_channels, a.init_dim)
    P["bn0"], S["bn0"] = _bn_init(a.init_dim)
    inplanes = a.init_dim

    for i in range(1, 5):  # encoder: conv{i} down + block{i}
        P[f"conv{i}"] = _conv_init(next(keys), 8, inplanes, inplanes)
        P[f"bn{i}"], S[f"bn{i}"] = _bn_init(inplanes)
        P[f"block{i}"], S[f"block{i}"], inplanes = _stage_init(
            next(keys), a, i - 1, inplanes)

    enc_out = [a.init_dim] + [a.planes[i] * a.expansion for i in range(4)]
    for j, i in enumerate(range(4, 8)):  # decoder: convtr{i} up + block{i+1}
        up_out = a.planes[i]
        P[f"convtr{i}"] = _conv_init(next(keys), 8, inplanes, up_out)
        P[f"bntr{i}"], S[f"bntr{i}"] = _bn_init(up_out)
        skip = enc_out[3 - j]  # block3, block2, block1, stem outputs
        inplanes = up_out + skip
        P[f"block{i + 1}"], S[f"block{i + 1}"], inplanes = _stage_init(
            next(keys), a, i, inplanes)

    P["final"] = _conv_init(next(keys), 1, inplanes, out_channels)
    return P, S


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------

def _bn(x, p, s, mask, num, train, new_state, path):
    out, m, v = masked_batch_norm(x, mask, num, p["gamma"], p["beta"],
                                  s["mean"], s["var"], train=train)
    new_state[path] = {"mean": m, "var": v}
    return out


def _conv1x1(x, w):
    """1x1 conv = plain matmul (kernel volume 1); keeps padded rows zero."""
    return jnp.dot(x, w[0].astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)


def _apply_block(p, s, x, plan, wplan, mask, num, train, new_state, path,
                 block):
    residual = x
    if block == "basic":
        out = _stencil_conv(x, p["conv1"], plan, wplan)
        out = _bn(out, p["bn1"], s["bn1"], mask, num, train, new_state,
                  path + ("bn1",))
        out = relu(out)
        out = _stencil_conv(out, p["conv2"], plan, wplan)
        out = _bn(out, p["bn2"], s["bn2"], mask, num, train, new_state,
                  path + ("bn2",))
    else:
        out = _conv1x1(x, p["conv1"])
        out = _bn(out, p["bn1"], s["bn1"], mask, num, train, new_state,
                  path + ("bn1",))
        out = relu(out)
        out = _stencil_conv(out, p["conv2"], plan, wplan)
        out = _bn(out, p["bn2"], s["bn2"], mask, num, train, new_state,
                  path + ("bn2",))
        out = relu(out)
        out = _conv1x1(out, p["conv3"])
        out = _bn(out, p["bn3"], s["bn3"], mask, num, train, new_state,
                  path + ("bn3",))
    if "down" in p:
        residual = _conv1x1(x, p["down"])
        residual = _bn(residual, p["down_bn"], s["down_bn"], mask, num, train,
                       new_state, path + ("down_bn",))
    return relu(out + residual)


def _apply_stage(ps, ss, x, plan, wplan, mask, num, train, new_state, name,
                 block):
    for i, (p, s) in enumerate(zip(ps, ss)):
        x = _apply_block(p, s, x, plan, wplan, mask, num, train, new_state,
                         (name, i), block)
    return x


def _nest(flat: Dict[Tuple, Dict]) -> Dict:
    """Rebuild the nested state dict from {path tuple: bn stats}."""
    out: Dict = {}
    for path, leaf in flat.items():
        cur = out
        for k in path[:-1]:
            cur = cur.setdefault(k, {})
        cur[path[-1]] = leaf
    return out


def _renest_stage(stage_dict, n):
    return [stage_dict[i] for i in range(n)]


def apply_unet(params, state, x, geo: UNetGeometry, *, arch: str,
               train: bool = False, constant_input: bool = False,
               return_prehead: bool = False):
    """Forward pass. x: (cap0, in_ch) activations (compute dtype).

    Returns (out, new_state) with out: (cap0, out_ch) fp32 feature matrix
    (the reference returns the dense ``.F``, models/mink_unet.py:174).

    ``constant_input``: the reference's default input is the constant (1,1,1)
    feature (point_loader.py:166-169).  Then the k=5 stem reduces exactly to
    ``occupancy @ sum_cin(W)`` — one MXU GEMM instead of 125 gathers of
    3-channel rows (which are lane-padded to 128 on TPU and dominate the
    forward).  Only valid when x rows are (1,..,1) at valid rows, 0 at padded.
    """
    a = ARCHS[arch]
    block = a.block
    ns: Dict[Tuple, Dict] = {}

    masks = [valid_mask(l.num, l.cap, jnp.float32) for l in geo.levels]
    nums = [l.num for l in geo.levels]

    # stem
    if constant_input:
        if geo.stem_occ is not None:  # device builder emits occupancy direct
            occ = geo.stem_occ.astype(x.dtype)
        else:
            occ = (geo.stem.fwd < nums[0]).astype(x.dtype)  # (K, cap0)
        wsum = params["conv0"].sum(axis=1)  # (K, Cout)
        out = jax.lax.dot_general(
            occ, wsum.astype(x.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
    else:
        out = sparse_conv(x, params["conv0"], geo.stem.fwd, geo.stem.flip_perm)
    out = _bn(out, params["bn0"], state["bn0"], masks[0], nums[0], train, ns,
              ("bn0",))
    out_p1 = relu(out)

    # encoder
    enc = [out_p1]
    out = out_p1
    for i in range(1, 5):
        out = _edge_down_conv(out, params[f"conv{i}"], geo.down[i - 1],
                              _ewplan(geo, i - 1))
        out = _bn(out, params[f"bn{i}"], state[f"bn{i}"], masks[i], nums[i],
                  train, ns, (f"bn{i}",))
        out = relu(out)
        out = _apply_stage(params[f"block{i}"], state[f"block{i}"], out,
                           geo.self3[i], _wplan(geo, i), masks[i], nums[i],
                           train, ns, f"block{i}", block)
        enc.append(out)

    # decoder: convtr{i} from level (8-i) down to level (7-i), skip-concat
    for j, i in enumerate(range(4, 8)):
        lvl = 3 - j  # target level index
        out = _edge_up_conv(out, params[f"convtr{i}"], geo.down[lvl],
                            _ewplan(geo, lvl))
        out = _bn(out, params[f"bntr{i}"], state[f"bntr{i}"], masks[lvl],
                  nums[lvl], train, ns, (f"bntr{i}",))
        out = relu(out)
        out = jnp.concatenate([out, enc[lvl]], axis=1)
        out = _apply_stage(params[f"block{i + 1}"], state[f"block{i + 1}"],
                           out, geo.self3[lvl], _wplan(geo, lvl), masks[lvl],
                           nums[lvl], train, ns, f"block{i + 1}", block)

    if not return_prehead:
        out = _conv1x1(out, params["final"]).astype(jnp.float32)
    # return_prehead: callers that only need head-projected INNER PRODUCTS
    # (the cosine distill loss) can avoid materializing the (cap, 768)
    # output entirely — see runtime/distill.py:cosine_head_loss

    nested = _nest(ns)
    new_state = dict(state)
    for k, v in nested.items():
        if k.startswith("block"):
            new_state[k] = _renest_stage(v, len(state[k]))
        else:
            new_state[k] = v
    return out, new_state
