"""Full-network checkpoint-conversion parity against a dense torch UNet.

Extends the single-conv golden of ``test_convert_checkpoint.py`` to a
COMPLETE MinkUNet14A: a synthetic ME-format ``state_dict`` (random weights
+ nontrivial BN stats, enumerated in each candidate region order) is (a)
converted by ``convert_state_dict`` and run through ``apply_unet`` on this
engine, and (b) replayed through an independently-written DENSE torch
forward (float64) of the same architecture.

Why dense torch is a faithful MinkowskiEngine reference here: on a FULLY
OCCUPIED voxel box every sparse-conv output site has its complete stencil
active, strided downsampling keeps full occupancy at every level
(16 -> 8 -> 4 -> 2 -> 1), and BatchNorm's active-row set equals the whole
grid — so ME's sparse ops (reference ``models/mink_unet.py:116-174`` on
dense input) reduce exactly to ``F.conv3d`` / ``F.conv_transpose3d`` /
dense BN.  This pins the converter's permutation algebra and the engine's
forward END TO END for both region orders; picking ME's physical order for
a real checkpoint remains ``probe_region_order``'s job.

A committed byte fixture (``tests/fixtures/unet_golden.npz``, regenerate
with ``python -m tests.test_unet_golden_parity``) guards against torch /
numpy drift.
"""

import os

import numpy as np
import pytest

from openscene_tpu.models import apply_unet
from openscene_tpu.models.sparse_unet import ARCHS
from openscene_tpu.utils.convert_checkpoint import (REGION_ORDERS,
                                                    convert_state_dict)

ARCH = "MinkUNet14A"
GRID = 16
CIN, COUT = 3, 20
FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "unet_golden.npz")


def _me_state_dict(rng, cout=COUT):
    """Random ME-format state_dict for MinkUNet14A with nontrivial BN."""
    a = ARCHS[ARCH]
    sd = {}

    def conv(name, K, cin, cout):
        sd[name + ".kernel"] = (rng.standard_normal((K, cin, cout))
                                * (2.0 / np.sqrt(K * cin))).astype(np.float32)

    def conv1(name, cin, cout):
        sd[name + ".kernel"] = (rng.standard_normal((cin, cout))
                                * (1.0 / np.sqrt(cin))).astype(np.float32)

    def bn(name, c):
        sd[name + ".bn.weight"] = (0.5 + rng.random(c)).astype(np.float32)
        sd[name + ".bn.bias"] = (0.2 * rng.standard_normal(c)).astype(
            np.float32)
        sd[name + ".bn.running_mean"] = (0.1 * rng.standard_normal(c)).astype(
            np.float32)
        sd[name + ".bn.running_var"] = (0.5 + rng.random(c)).astype(
            np.float32)

    conv("conv0p1s1", 125, CIN, a.init_dim)
    bn("bn0", a.init_dim)
    inplanes = a.init_dim
    enc_out = [a.init_dim]
    for i in range(1, 5):
        conv(f"conv{i}p{2 ** (i - 1)}s2", 8, inplanes, inplanes)
        bn(f"bn{i}", inplanes)
        planes = a.planes[i - 1]
        prefix = f"block{i}.0"
        conv(prefix + ".conv1", 27, inplanes, planes)
        bn(prefix + ".norm1", planes)
        conv(prefix + ".conv2", 27, planes, planes)
        bn(prefix + ".norm2", planes)
        if inplanes != planes:
            conv1(prefix + ".downsample.0", inplanes, planes)
            bn(prefix + ".downsample.1", planes)
        inplanes = planes
        enc_out.append(planes)
    for j, i in enumerate(range(4, 8)):
        up_out = a.planes[i]
        conv(f"convtr{i}p{2 ** (8 - i)}s2", 8, inplanes, up_out)
        bn(f"bntr{i}", up_out)
        cin_b = up_out + enc_out[3 - j]
        planes = a.planes[i]
        prefix = f"block{i + 1}.0"
        conv(prefix + ".conv1", 27, cin_b, planes)
        bn(prefix + ".norm1", planes)
        conv(prefix + ".conv2", 27, planes, planes)
        bn(prefix + ".norm2", planes)
        if cin_b != planes:
            conv1(prefix + ".downsample.0", cin_b, planes)
            bn(prefix + ".downsample.1", planes)
        inplanes = planes
    conv1("final", inplanes, cout)
    return sd


def _dense_w(w_me, k, region_order, transpose=False):
    """ME-region-order (K, Cin, Cout) -> dense torch conv weight."""
    import torch
    axis = (list(range(-(k // 2), k // 2 + 1)) if k % 2 == 1
            else list(range(k)))
    shift = k // 2 if k % 2 == 1 else 0
    Cin, Cout = w_me.shape[1], w_me.shape[2]
    shape = (Cin, Cout, k, k, k) if transpose else (Cout, Cin, k, k, k)
    dw = np.zeros(shape, np.float64)
    idx = 0
    for a in axis:
        for b in axis:
            for c in axis:
                d = (c, b, a) if region_order == "x_fastest" else (a, b, c)
                blk = w_me[idx] if transpose else w_me[idx].T
                dw[:, :, d[0] + shift, d[1] + shift, d[2] + shift] = blk
                idx += 1
    return torch.from_numpy(dw)


def _dense_forward(sd, region_order, vol):
    """Dense float64 torch forward of MinkUNet14A (eval-mode BN)."""
    import torch
    import torch.nn.functional as F

    def bn(x, name):
        g = torch.from_numpy(sd[name + ".bn.weight"].astype(np.float64))
        b = torch.from_numpy(sd[name + ".bn.bias"].astype(np.float64))
        m = torch.from_numpy(sd[name + ".bn.running_mean"].astype(np.float64))
        v = torch.from_numpy(sd[name + ".bn.running_var"].astype(np.float64))
        sh = (1, -1, 1, 1, 1)
        return ((x - m.view(sh)) / torch.sqrt(v.view(sh) + 1e-5)
                * g.view(sh) + b.view(sh))

    def conv(x, name, k, **kw):
        w = sd[name + ".kernel"].astype(np.float64)
        if w.ndim == 2:  # 1x1
            return F.conv3d(x, torch.from_numpy(w.T[:, :, None, None, None]))
        return F.conv3d(x, _dense_w(w, k, region_order), **kw)

    def convtr(x, name):
        w = sd[name + ".kernel"].astype(np.float64)
        return F.conv_transpose3d(
            x, _dense_w(w, 2, region_order, transpose=True), stride=2)

    def block(x, prefix):
        res = x
        out = conv(x, prefix + ".conv1", 3, padding=1)
        out = F.relu(bn(out, prefix + ".norm1"))
        out = conv(out, prefix + ".conv2", 3, padding=1)
        out = bn(out, prefix + ".norm2")
        if prefix + ".downsample.0.kernel" in sd:
            res = bn(conv(x, prefix + ".downsample.0", 1),
                     prefix + ".downsample.1")
        return F.relu(out + res)

    out = F.relu(bn(conv(vol, "conv0p1s1", 5, padding=2), "bn0"))
    enc = [out]
    for i in range(1, 5):
        out = conv(out, f"conv{i}p{2 ** (i - 1)}s2", 2, stride=2)
        out = F.relu(bn(out, f"bn{i}"))
        out = block(out, f"block{i}.0")
        enc.append(out)
    for j, i in enumerate(range(4, 8)):
        out = convtr(out, f"convtr{i}p{2 ** (8 - i)}s2")
        out = F.relu(bn(out, f"bntr{i}"))
        out = torch.cat([out, enc[3 - j]], dim=1)
        out = block(out, f"block{i + 1}.0")
    return conv(out, "final", 1)


def _box_coords():
    g = np.arange(GRID)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    c = np.stack([xx, yy, zz], -1).reshape(-1, 3)
    c4 = np.concatenate([np.zeros((len(c), 1), np.int64), c], 1)
    order = np.lexsort((c4[:, 3], c4[:, 2], c4[:, 1], c4[:, 0]))
    return c4[order].astype(np.int32)


def _inputs(rng):
    c4 = _box_coords()
    feats = rng.standard_normal((len(c4), CIN)).astype(np.float32)
    return c4, feats


def _run_ours(sd, region_order, c4, feats):
    import jax.numpy as jnp

    from openscene_tpu.sparse.geometry import build_unet_geometry

    params, state = convert_state_dict(sd, ARCH, region_order=region_order)
    geo = build_unet_geometry(c4, build_windows=False)
    cap = geo.levels[0].cap
    x = np.zeros((cap, CIN), np.float32)
    x[:len(c4)] = feats
    out, _ = apply_unet(params, state, jnp.asarray(x), geo, arch=ARCH,
                        train=False)
    return np.asarray(out, np.float32)[:len(c4)]


def _run_dense(sd, region_order, c4, feats):
    import torch
    vol = np.zeros((1, CIN, GRID, GRID, GRID), np.float64)
    vol[0, :, c4[:, 1], c4[:, 2], c4[:, 3]] = feats
    ref = _dense_forward(sd, region_order, torch.from_numpy(vol))
    return ref[0, :, c4[:, 1], c4[:, 2], c4[:, 3]].numpy().T.astype(
        np.float32)


@pytest.mark.parametrize("region_order", REGION_ORDERS)
def test_full_unet_converted_forward_matches_dense(region_order):
    pytest.importorskip("torch")
    rng = np.random.default_rng(7)
    sd = _me_state_dict(rng)
    c4, feats = _inputs(rng)
    ref = _run_dense(sd, region_order, c4, feats)
    out = _run_ours(sd, region_order, c4, feats)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=1e-4 * scale, rtol=1e-3)
    # the two orders genuinely differ (the test isn't vacuous)
    other = [o for o in REGION_ORDERS if o != region_order][0]
    out_other = _run_ours(sd, other, c4, feats)
    assert np.abs(out_other - ref).max() > 1e-2 * scale


def test_full_unet_golden_fixture():
    """Byte-fixture check: committed golden outputs for both orders."""
    z = np.load(FIXTURE)
    c4, feats = z["coords"], z["feats"]
    sd = _me_state_dict(np.random.default_rng(7))
    for order in REGION_ORDERS:
        out = _run_ours(sd, order, c4, feats)
        golden = z[f"golden_{order}"]
        scale = np.abs(golden).max()
        np.testing.assert_allclose(out, golden, atol=1e-4 * scale, rtol=1e-3)


if __name__ == "__main__":  # fixture (re)generation
    rng = np.random.default_rng(7)
    sd = _me_state_dict(rng)
    c4, feats = _inputs(rng)
    payload = {"coords": c4, "feats": feats}
    for order in REGION_ORDERS:
        payload[f"golden_{order}"] = _run_dense(sd, order, c4, feats)
    np.savez_compressed(FIXTURE, **payload)
    print("wrote", FIXTURE)
