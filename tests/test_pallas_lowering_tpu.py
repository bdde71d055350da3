"""Mosaic LOWERING smoke for every Pallas kernel the UNet instantiates.

Round-3 postmortem: the interpret-mode logic tests can't see Mosaic's
BlockSpec constraints (sublane block dims must divide by 8 or equal the
array dim), so an illegal spec shipped and silently knocked the whole
windowed path back to XLA gathers on the chip (BENCH_r03.json).  This test
compiles — no execution, no data — every (K, C, Cout) kernel combination
``ARCHS["MinkUNet18A"]`` uses, on caps whose tile count is NOT a multiple
of 8 (ntiles=12, the class of the failing (220, 128) ``ulidx`` case), so
any such constraint violation reproduces as a red test in seconds.

Run whenever a TPU backend is reachable (conftest pins CPU without the
env gate, which module-skips this file):
    OPENSCENE_TPU_TESTS=1 python -m pytest tests/test_pallas_lowering_tpu.py -q
"""

import functools

import numpy as np
import pytest

import jax

if jax.default_backend() != "tpu":
    pytest.skip("Mosaic lowering requires a real TPU backend",
                allow_module_level=True)

import jax.numpy as jnp

from openscene_tpu.sparse import pallas_conv, pallas_edge
from openscene_tpu.sparse.pallas_conv import (NCLASS, TILE,
                                              windowed_sparse_conv)
from openscene_tpu.sparse.pallas_edge import (KD, windowed_down_conv,
                                              windowed_up_conv)
from openscene_tpu.sparse.types import flip_permutation, stencil_offsets

# ntiles % 8 != 0 and % 4 == 0: exercises every mt in {4,2,1} with
# mt != ntiles (the illegal-block class Mosaic rejects).
NTILES = 12
CAP = NTILES * TILE  # 1536 >= WIN=512 and >= DWIN=1024

# Every stencil (C, Cout) MinkUNet18A instantiates (fwd covers bwd's
# transposed operand shapes via grad below). 256x256 exercises the
# class-split backward; (384, 384) covers the D-variant split forward.
STENCIL_COMBOS = [
    (32, 32), (32, 64), (64, 64), (64, 128), (128, 128), (128, 256),
    (256, 256), (256, 128), (192, 128), (128, 96), (96, 96), (384, 384),
]
# k=2 s=2 edges: (down C->Cout, up C->Cout) pairs the 18A net uses.
EDGE_COMBOS = [(32, 32), (64, 64), (128, 128), (256, 128), (128, 96),
               (96, 96)]


def _stencil_plan_args(K=27):
    """Shape-only WindowPlan arrays (values irrelevant for lowering)."""
    win_start = jnp.zeros((NTILES, NCLASS), jnp.int32)
    lidx = jnp.zeros((NTILES, K, TILE), jnp.int32)
    spill_ent = jnp.full((64,), -1, jnp.int32)
    spill_fwd = jnp.full((64, K // NCLASS, TILE), CAP - 1, jnp.int32)
    return win_start, lidx, spill_ent, spill_fwd


def _edge_plan_args():
    """Shape-only EdgeWindowPlan arrays (child_cap = parent_cap = CAP)."""
    dwin_start = jnp.zeros((NTILES, KD), jnp.int32)
    dlidx = jnp.zeros((NTILES, KD, TILE), jnp.int32)
    dspill_ent = jnp.full((64,), -1, jnp.int32)
    dspill_fwd = jnp.full((64, TILE), CAP - 1, jnp.int32)
    uwin_start = jnp.zeros((NTILES,), jnp.int32)
    ulidx = jnp.zeros((NTILES, TILE), jnp.int32)
    uoff = jnp.zeros((NTILES, TILE), jnp.int32)
    uspill_tile = jnp.full((8,), -1, jnp.int32)
    uspill_parent = jnp.full((8, TILE), CAP - 1, jnp.int32)
    uspill_off = jnp.zeros((8, TILE), jnp.int32)
    return (dwin_start, dlidx, dspill_ent, dspill_fwd, uwin_start, ulidx,
            uoff, uspill_tile, uspill_parent, uspill_off)


def _compile(fn, *args):
    jax.jit(fn).lower(*args).compile()  # raises on any Mosaic rejection


@pytest.mark.parametrize("C,Cout", STENCIL_COMBOS)
def test_stencil_conv_lowering(C, Cout):
    flip = jnp.asarray(flip_permutation(stencil_offsets(3)))
    plan = _stencil_plan_args()
    x = jnp.zeros((CAP, C), jnp.bfloat16)
    w = jnp.zeros((27, C, Cout), jnp.float32)

    def loss(x_, w_):
        o = windowed_sparse_conv(x_, w_, flip, *plan)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    _compile(functools.partial(jax.value_and_grad(loss, (0, 1))), x, w)


@pytest.mark.parametrize("C,Cout", EDGE_COMBOS)
def test_edge_conv_lowering(C, Cout):
    plan = _edge_plan_args()
    x = jnp.zeros((CAP, C), jnp.bfloat16)
    wd = jnp.zeros((KD, C, Cout), jnp.float32)

    def down_loss(x_, w_):
        o = windowed_down_conv(x_, w_, *plan)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def up_loss(x_, w_):
        o = windowed_up_conv(x_, w_, *plan)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    _compile(functools.partial(jax.value_and_grad(down_loss, (0, 1))), x, wd)
    _compile(functools.partial(jax.value_and_grad(up_loss, (0, 1))), x, wd)
