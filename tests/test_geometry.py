"""Geometry-plan builder tests: kernel maps vs a brute-force dict lookup,
down/up edge consistency, capacity semantics."""

import numpy as np
import pytest

from openscene_tpu.sparse.geometry import (GeometryCaps, build_down_edge,
                                           build_self_plan,
                                           build_unet_geometry, pack_coords,
                                           _pad_level)
from openscene_tpu.sparse.types import stencil_offsets, flip_permutation


def random_coords(rng, n=300, span=12, batches=2):
    pts = set()
    while len(pts) < n:
        b = int(rng.integers(0, batches))
        xyz = tuple(int(v) for v in rng.integers(0, span, 3))
        pts.add((b,) + xyz)
    return np.array(sorted(pts), dtype=np.int32)


def test_pack_coords_injective(rng):
    coords = random_coords(rng, n=500, span=50, batches=4)
    keys = pack_coords(coords)
    assert len(np.unique(keys)) == len(coords)


@pytest.mark.parametrize("kernel", [3, 5])
def test_self_plan_matches_bruteforce(rng, kernel):
    coords = random_coords(rng)
    n = len(coords)
    level = _pad_level(coords, 512)
    plan = build_self_plan(level, kernel)
    offsets = stencil_offsets(kernel)
    table = {tuple(c): i for i, c in enumerate(coords.tolist())}
    for k in range(len(offsets)):
        d = offsets[k]
        for r in range(n):
            c = coords[r]
            key = (c[0], c[1] + d[0], c[2] + d[1], c[3] + d[2])
            expect = table.get(key)
            if expect is None:
                # missing neighbors point somewhere in the zero padding
                # region [n, cap) — spread to avoid a hot gather row
                assert n <= plan.fwd[k, r] < 512, (k, r)
            else:
                assert plan.fwd[k, r] == expect, (k, r)
        # padded rows all point into the padding region
        assert (plan.fwd[k, n:] >= n).all() and (plan.fwd[k, n:] < 512).all()


def test_flip_permutation_is_involution():
    for k in (3, 5):
        off = stencil_offsets(k)
        perm = flip_permutation(off)
        assert (perm[perm] == np.arange(len(off))).all()
        assert (off[perm] == -off).all()


def test_down_edge_semantics(rng):
    coords = random_coords(rng, n=200, span=8)
    fine = _pad_level(coords, 256)
    coarse, plan = build_down_edge(fine, 256)
    n = len(coords)
    nc = int(coarse.num)
    # parents are exactly the unique floor(child/2)
    parents = {(c[0], c[1] // 2, c[2] // 2, c[3] // 2) for c in coords.tolist()}
    got = {tuple(c) for c in coarse.coords[:nc].tolist()}
    assert got == parents
    # each child maps to its parent's row with the right offset id
    prow = {tuple(c): i for i, c in enumerate(coarse.coords[:nc].tolist())}
    for i, c in enumerate(coords.tolist()):
        p = (c[0], c[1] // 2, c[2] // 2, c[3] // 2)
        assert plan.child_parent[i] == prow[p]
        rem = (c[1] % 2, c[2] % 2, c[3] % 2)
        assert plan.child_offset[i] == (rem[0] * 2 + rem[1]) * 2 + rem[2]
        # and fwd is the exact inverse
        assert plan.fwd[plan.child_offset[i], plan.child_parent[i]] == i
    # unassigned (offset, parent) slots point into the child padding region
    filled = (plan.fwd < n).sum()
    assert filled == n
    assert (plan.fwd >= n).sum() == plan.fwd.size - n


def test_unet_geometry_levels(rng):
    coords = random_coords(rng, n=400, span=32)
    # random (non-surface) points barely merge under downsampling; use flat
    # level ratios for the test
    geo = build_unet_geometry(
        coords, caps=GeometryCaps(cap0=1024, level_ratios=(1.0,) * 4))
    assert len(geo.levels) == 5
    assert len(geo.down) == 4
    assert len(geo.self3) == 5
    nums = [int(l.num) for l in geo.levels]
    assert nums[0] == 400
    assert all(nums[i + 1] <= nums[i] for i in range(4))
    assert geo.stem.fwd.shape[0] == 125


def test_cap_overflow_raises(rng):
    coords = random_coords(rng, n=300)
    with pytest.raises(OverflowError):
        _pad_level(coords, 300)  # needs 301 rows (null row reserved)


def test_caps_bucketing():
    caps = GeometryCaps.for_count(5000)
    assert caps.cap0 >= 5001
    assert caps.cap0 % 256 == 0
    # auto mode buckets lower levels by actual count
    assert caps.cap_for(1, 100) >= 101
    assert caps.cap_for(1, 100) % 256 == 0
    # fixed-ratio mode derives everything from cap0
    fixed = GeometryCaps(cap0=5120, level_ratios=(0.5, 0.25, 0.12, 0.06))
    all_caps = fixed.caps
    assert len(all_caps) == 5
    assert all(c % 256 == 0 for c in all_caps)
    assert fixed.cap_for(1, 99999) == all_caps[1]  # ratios ignore counts
