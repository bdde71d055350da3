"""Checkpoint converter: synthetic ME-style state_dict -> our trees, shape
and permutation checks."""

import numpy as np
import pytest

from openscene_tpu.models.sparse_unet import ARCHS, init_unet
from openscene_tpu.sparse.types import stencil_offsets
from openscene_tpu.utils.convert_checkpoint import (convert_state_dict,
                                                    me_offset_permutation)


def test_me_permutation_is_bijection():
    for k in (2, 3, 5):
        perm = me_offset_permutation(k)
        assert sorted(perm.tolist()) == list(range(k ** 3))
        # center of odd kernels maps to center (symmetric orders agree there)
        if k % 2 == 1:
            assert perm[k ** 3 // 2] == k ** 3 // 2


def _fake_state_dict(arch="MinkUNet18A", out_channels=32):
    """Build an ME-style state_dict with the right shapes/names."""
    import jax
    params, state = init_unet(jax.random.PRNGKey(0), 3, out_channels,
                              arch=arch)
    a = ARCHS[arch]
    sd = {}

    def put_conv(name, w):
        w = np.asarray(w)
        sd[name + ".kernel"] = w[0] if w.shape[0] == 1 else w

    def put_bn(name, c):
        sd[name + ".bn.weight"] = np.ones(c, np.float32)
        sd[name + ".bn.bias"] = np.zeros(c, np.float32)
        sd[name + ".bn.running_mean"] = np.zeros(c, np.float32)
        sd[name + ".bn.running_var"] = np.ones(c, np.float32)

    put_conv("conv0p1s1", params["conv0"])
    put_bn("bn0", params["conv0"].shape[-1])
    for i in range(1, 5):
        put_conv(f"conv{i}p{2 ** (i - 1)}s2", params[f"conv{i}"])
        put_bn(f"bn{i}", params[f"conv{i}"].shape[-1])
    for i in range(4, 8):
        put_conv(f"convtr{i}p{2 ** (8 - i)}s2", params[f"convtr{i}"])
        put_bn(f"bntr{i}", params[f"convtr{i}"].shape[-1])
    for b in range(1, 9):
        for j, bp in enumerate(params[f"block{b}"]):
            prefix = f"block{b}.{j}"
            put_conv(prefix + ".conv1", bp["conv1"])
            put_bn(prefix + ".norm1", bp["conv1"].shape[-1])
            put_conv(prefix + ".conv2", bp["conv2"])
            put_bn(prefix + ".norm2", bp["conv2"].shape[-1])
            if "down" in bp:
                put_conv(prefix + ".downsample.0", bp["down"])
                put_bn(prefix + ".downsample.1", bp["down"].shape[-1])
    put_conv("final", params["final"])
    return sd, params, state


def test_convert_shapes_match_init():
    import jax
    sd, ref_params, ref_state = _fake_state_dict()
    params, state = convert_state_dict(sd, "MinkUNet18A")
    got = jax.tree_util.tree_map(lambda x: np.shape(x), params)
    want = jax.tree_util.tree_map(lambda x: np.shape(np.asarray(x)),
                                  ref_params)
    assert got == want
    gs = jax.tree_util.tree_map(lambda x: np.shape(x), state)
    ws = jax.tree_util.tree_map(lambda x: np.shape(np.asarray(x)), ref_state)
    assert gs == ws


def test_module_prefix_stripped():
    sd, *_ = _fake_state_dict()
    sd = {"module." + k: v for k, v in sd.items()}
    params, _ = convert_state_dict(sd, "MinkUNet18A")
    assert params["conv0"].shape == (125, 3, 32)


@pytest.mark.parametrize("region_order", ["x_fastest", "z_fastest"])
def test_converted_kernel_matches_dense_conv3d(region_order):
    """Golden-activation check of the permutation algebra: an ME-format
    kernel enumerated in ``region_order`` must, after conversion, make our
    sparse conv reproduce torch's dense conv3d (cross-correlation — the same
    semantics as ME's sparse convolution on a dense grid with zero features
    at holes). Pins the inversion logic for BOTH candidate orders; selecting
    the physical ME order is probe_region_order's job on a real checkpoint."""
    import torch

    from openscene_tpu.sparse.geometry import build_unet_geometry
    from openscene_tpu.sparse.ops import sparse_conv

    rng = np.random.default_rng(0)
    X, Y, Z = 6, 5, 4
    Cin, Cout = 3, 5
    occ = rng.random((X, Y, Z)) < 0.7
    occ[0, 0, 0] = True
    coords = np.argwhere(occ)
    c4 = np.concatenate([np.zeros((len(coords), 1), np.int64), coords], 1)
    order = np.lexsort((c4[:, 3], c4[:, 2], c4[:, 1], c4[:, 0]))
    c4 = c4[order]
    feats = rng.standard_normal((len(c4), Cin)).astype(np.float32)

    w_me = rng.standard_normal((27, Cin, Cout)).astype(np.float32)

    # dense ground truth: weight[co, ci, dx+1, dy+1, dz+1] = w_me[me_idx]
    dense_w = np.zeros((Cout, Cin, 3, 3, 3), np.float32)
    idx = 0
    rng3 = [-1, 0, 1]
    for a in rng3:
        for b in rng3:
            for c in rng3:
                dx, dy, dz = ((c, b, a) if region_order == "x_fastest"
                              else (a, b, c))
                dense_w[:, :, dx + 1, dy + 1, dz + 1] = w_me[idx].T
                idx += 1
    vol = np.zeros((1, Cin, X, Y, Z), np.float32)
    # advanced indices broadcast ahead of the sliced channel dim -> (N, Cin)
    vol[0, :, c4[:, 1], c4[:, 2], c4[:, 3]] = feats
    ref = torch.nn.functional.conv3d(
        torch.from_numpy(vol), torch.from_numpy(dense_w), padding=1)
    # torch keeps the sliced channel dim first here -> (Cout, N)
    ref = ref[0, :, c4[:, 1], c4[:, 2], c4[:, 3]].numpy().T  # (N, Cout)

    geo = build_unet_geometry(c4, build_windows=False)
    cap = geo.levels[0].cap
    x = np.zeros((cap, Cin), np.float32)
    x[:len(c4)] = feats
    w_ours = w_me[me_offset_permutation(3, region_order)]
    out = np.asarray(sparse_conv(x, w_ours, geo.self3[0].fwd,
                                 geo.self3[0].flip_perm))[:len(c4)]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("region_order", ["x_fastest", "z_fastest"])
def test_region_order_golden_fixture(region_order):
    """Committed golden fixture (tests/fixtures/region_order_golden.npz):
    recorded dense-conv3d activations for BOTH candidate ME region orders on
    a fixed scene/kernel. Pins the permutation algebra against bytes on disk
    (no torch at check time), so the day a real checkpoint arrives the only
    open question is which order ME used — decided by one command,
    scripts/decide_region_order.py."""
    import os

    from openscene_tpu.sparse.geometry import build_unet_geometry
    from openscene_tpu.sparse.ops import sparse_conv

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "region_order_golden.npz")
    z = np.load(path)
    c4, feats, w_me = z["coords"], z["feats"], z["w_me"]
    golden = z[f"golden_{region_order}"]

    geo = build_unet_geometry(c4, build_windows=False)
    cap = geo.levels[0].cap
    x = np.zeros((cap, feats.shape[1]), np.float32)
    x[:len(c4)] = feats
    w_ours = w_me[me_offset_permutation(3, region_order)]
    out = np.asarray(sparse_conv(x, w_ours, geo.self3[0].fwd,
                                 geo.self3[0].flip_perm))[:len(c4)]
    np.testing.assert_allclose(out, golden, rtol=1e-4, atol=1e-4)


def test_kernel_permutation_applied():
    """A kernel whose value encodes the ME region index must come out
    reordered to our x-major offset order."""
    sd, params, _ = _fake_state_dict()
    K = 27
    marked = np.zeros((K, 32, 32), np.float32)
    marked[:, 0, 0] = np.arange(K)  # value = ME region index
    sd["block1.0.conv1.kernel"] = marked
    conv = convert_state_dict(sd, "MinkUNet18A")[0]["block1"][0]["conv1"]
    perm = me_offset_permutation(3)
    np.testing.assert_array_equal(conv[:, 0, 0], perm.astype(np.float32))
    # our center offset still holds the ME center weight
    ours = stencil_offsets(3)
    center = int(np.flatnonzero((ours == 0).all(1))[0])
    assert conv[center, 0, 0] == 13  # ME center index for k=3
