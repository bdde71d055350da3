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
