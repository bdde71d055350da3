"""Occupancy-grid geometry prober (sparse/grid.py) vs the NumPy builder.

The grid path must be BIT-identical to geometry.build_self_plan /
build_stem_occupancy for any scene that fits its static dims (same offset
order, same spread-null rows), and must raise the overflow flag (never
silently corrupt) when one doesn't.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openscene_tpu.sparse import grid as gridmod
from openscene_tpu.sparse.geometry import (GeometryCaps, _pad_level,
                                           build_self_plan,
                                           build_unet_geometry)
from openscene_tpu.sparse.geometry_device import build_geometry_parts


def _scenes(seed=0, n_scenes=3, n=400, spread=40, zoff=-17):
    """Lex-sorted multi-scene (cap, 4) coords with negative extents."""
    rng = np.random.default_rng(seed)
    rows = []
    for b in range(n_scenes):
        c = rng.integers(-spread // 2, spread, size=(n, 3))
        c[:, 2] += zoff  # negative z band
        c = np.unique(np.concatenate(
            [np.full((len(c), 1), b), c], axis=1), axis=0)
        rows.append(c)
    coords = np.concatenate(rows).astype(np.int32)
    order = np.lexsort((coords[:, 3], coords[:, 2], coords[:, 1],
                        coords[:, 0]))
    return coords[order]


def _padded(coords, cap):
    out = np.full((cap, 4), 2 ** 20, dtype=np.int32)
    out[:len(coords)] = coords
    return out, len(coords)


@pytest.mark.parametrize("kernel", [3, 5])
def test_self_plan_matches_numpy(kernel):
    coords = _scenes()
    cap = 2048
    padded, n = _padded(coords, cap)
    ref = build_self_plan(_pad_level(coords, cap), kernel)

    g = gridmod.build_level_grid(jnp.asarray(padded), jnp.int32(n), 3,
                                 (64, 64, 64))
    assert not bool(g.overflow)
    plan = jax.jit(
        lambda c, m: gridmod.self_plan_from_grid(
            gridmod.build_level_grid(c, m, 3, (64, 64, 64)), m, kernel)
    )(jnp.asarray(padded), jnp.int32(n))
    np.testing.assert_array_equal(np.asarray(plan.fwd), ref.fwd)
    np.testing.assert_array_equal(np.asarray(plan.flip_perm), ref.flip_perm)


def test_stem_and_self3_share_slabs():
    coords = _scenes(seed=1)
    cap = 2048
    padded, n = _padded(coords, cap)
    ref5 = build_self_plan(_pad_level(coords, cap), 5)
    ref3 = build_self_plan(_pad_level(coords, cap), 3)

    occ, plan3 = jax.jit(lambda c, m: gridmod.stem_and_self3_from_grid(
        gridmod.build_level_grid(c, m, 3, (64, 64, 64)), m))(
            jnp.asarray(padded), jnp.int32(n))
    # occupancy == (fwd row is a real neighbor) of the reference plan
    ref_occ = (ref5.fwd < n).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(occ, np.float32), ref_occ)
    np.testing.assert_array_equal(np.asarray(plan3.fwd), ref3.fwd)


def test_overflow_flag_on_oversized_scene():
    coords = _scenes(spread=100)  # exceeds a (64, 64, 64) grid
    padded, n = _padded(coords, 2048)
    g = gridmod.build_level_grid(jnp.asarray(padded), jnp.int32(n), 3,
                                 (64, 64, 32))
    assert bool(g.overflow)
    # scene index beyond n_scenes also flags
    g2 = gridmod.build_level_grid(jnp.asarray(padded), jnp.int32(n), 2,
                                  (256, 256, 256))
    assert bool(g2.overflow)


def test_build_geometry_parts_grid_matches_host():
    """Full 5-level build (grid path) == host NumPy geometry."""
    coords = _scenes(seed=2, n_scenes=2, n=600)
    caps = GeometryCaps.for_count(len(coords))
    host = build_unet_geometry(coords, caps=caps, build_windows=False)
    cap0 = host.levels[0].cap
    padded, n = _padded(coords, cap0)

    geo, ov = jax.jit(lambda c, m: build_geometry_parts(
        c, m, tuple(l.cap for l in host.levels), n_scenes=2,
        grid_dims0=(128, 128, 128)))(jnp.asarray(padded), jnp.int32(n))
    assert not bool(ov)
    np.testing.assert_array_equal(np.asarray(geo.stem.fwd), host.stem.fwd)
    for l in range(5):
        np.testing.assert_array_equal(np.asarray(geo.self3[l].fwd),
                                      host.self3[l].fwd)
        np.testing.assert_array_equal(np.asarray(geo.levels[l].coords),
                                      host.levels[l].coords)
    for e in range(4):
        np.testing.assert_array_equal(np.asarray(geo.down[e].fwd),
                                      host.down[e].fwd)


def test_grid_stem_occupancy_in_full_build():
    coords = _scenes(seed=3, n_scenes=2, n=500)
    caps = GeometryCaps.for_count(len(coords))
    host = build_unet_geometry(coords, caps=caps, build_windows=False)
    cap0 = host.levels[0].cap
    padded, n = _padded(coords, cap0)
    geo, ov = jax.jit(lambda c, m: build_geometry_parts(
        c, m, tuple(l.cap for l in host.levels), n_scenes=2,
        grid_dims0=(128, 128, 128), stem_occupancy=True))(
            jnp.asarray(padded), jnp.int32(n))
    assert not bool(ov)
    assert geo.stem.fwd is None
    ref_occ = (host.stem.fwd < n).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(geo.stem_occ, np.float32),
                                  ref_occ)
    np.testing.assert_array_equal(np.asarray(geo.self3[0].fwd),
                                  host.self3[0].fwd)


def test_stem_plan_and_self3_fused_matches_separate():
    """Fused colored-stem variant == two separate self_plan_from_grid calls
    (ADVICE r4: the non-occupancy stem path re-gathered shared plane rows)."""
    coords = _scenes()
    cap = 2048
    padded, n = _padded(coords, cap)
    g = gridmod.build_level_grid(jnp.asarray(padded), jnp.int32(n), 3,
                                 (64, 64, 64))
    p5, p3 = gridmod.stem_plan_and_self3_from_grid(g, jnp.int32(n), 5)
    r5 = gridmod.self_plan_from_grid(g, jnp.int32(n), 5)
    r3 = gridmod.self_plan_from_grid(g, jnp.int32(n), 3)
    np.testing.assert_array_equal(np.asarray(p5.fwd), np.asarray(r5.fwd))
    np.testing.assert_array_equal(np.asarray(p3.fwd), np.asarray(r3.fwd))
    np.testing.assert_array_equal(np.asarray(p5.flip_perm),
                                  np.asarray(r5.flip_perm))
    np.testing.assert_array_equal(np.asarray(p3.flip_perm),
                                  np.asarray(r3.flip_perm))


def test_dims_for_level_never_spuriously_overflows():
    """A scene that exactly fills L0 must fit every coarser level (ADVICE
    r4: floor(max/2^l)-floor(min/2^l)+1 can exceed dims0>>l)."""
    dims0 = (64, 64, 64)
    # extreme bbox: min=1, max=64 -> L1 extent floor(64/2)-floor(1/2)+1 = 33
    pts = np.array([[0, 1, 1, 1], [0, 64, 64, 64]], np.int32)
    for level in range(5):
        d = gridmod.dims_for_level(level, dims0)
        c = pts.copy()
        c[:, 1:] >>= level
        padded, n = _padded(c, 256)
        g = gridmod.build_level_grid(jnp.asarray(padded), jnp.int32(n), 1, d)
        assert not bool(g.overflow), (level, d)
    assert gridmod.dims_for_level(0, dims0) == dims0
    assert gridmod.dims_for_level(1, dims0) == (33, 33, 33)
