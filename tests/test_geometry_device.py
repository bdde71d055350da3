"""Device geometry builder vs the NumPy reference builder: bit-identical
plans (levels, stem, self3, down edges) given the same static caps."""

import numpy as np
import pytest

from openscene_tpu.sparse.geometry import (GeometryCaps, _pad_level,
                                           build_unet_geometry, level_counts)
from openscene_tpu.sparse.geometry_device import build_unet_geometry_device


def _scene_coords(seed, n=4000, extent=60, batches=2, negative=False):
    rng = np.random.default_rng(seed)
    pts = []
    for b in range(batches):
        # clustered voxels (room-like walls) so z-runs and planes are real
        base = rng.integers(0, extent, size=(n // batches // 4, 3))
        c = np.concatenate([base + d for d in
                            ([0, 0, 0], [0, 0, 1], [0, 1, 0], [1, 0, 0])])
        if negative:
            c = c - extent // 2
        pts.append(np.concatenate(
            [np.full((len(c), 1), b, np.int64), c], axis=1))
    coords = np.concatenate(pts)
    keys = ((coords[:, 0] * 2 ** 48)
            + ((coords[:, 1] + 2 ** 14) * 2 ** 32)
            + ((coords[:, 2] + 2 ** 14) * 2 ** 16)
            + (coords[:, 3] + 2 ** 14))
    _, first = np.unique(keys, return_index=True)
    coords = coords[np.sort(first)]
    order = np.lexsort((coords[:, 3], coords[:, 2], coords[:, 1],
                        coords[:, 0]))
    return coords[order]


@pytest.mark.parametrize("seed,negative", [(0, False), (1, False), (2, True)])
def test_device_builder_matches_numpy(seed, negative):
    coords = _scene_coords(seed, negative=negative)
    counts = level_counts(coords)
    caps = tuple(max(256, -(-int(c * 1.1) // 256) * 256) for c in counts)
    gcaps = GeometryCaps(cap0=caps[0], fixed=caps)

    ref = build_unet_geometry(coords, caps=gcaps, build_windows=False)
    dev = build_unet_geometry_device(ref.levels[0].coords, len(coords), caps)

    for l in range(5):
        np.testing.assert_array_equal(
            np.asarray(dev.levels[l].num), np.asarray(ref.levels[l].num),
            err_msg=f"level {l} num")
        np.testing.assert_array_equal(
            np.asarray(dev.levels[l].coords), ref.levels[l].coords,
            err_msg=f"level {l} coords")
        np.testing.assert_array_equal(
            np.asarray(dev.self3[l].fwd), ref.self3[l].fwd,
            err_msg=f"level {l} self3 fwd")
    np.testing.assert_array_equal(np.asarray(dev.stem.fwd), ref.stem.fwd,
                                  err_msg="stem fwd")
    for e in range(4):
        np.testing.assert_array_equal(
            np.asarray(dev.down[e].fwd), ref.down[e].fwd,
            err_msg=f"edge {e} fwd")
        np.testing.assert_array_equal(
            np.asarray(dev.down[e].child_parent), ref.down[e].child_parent,
            err_msg=f"edge {e} child_parent")
        np.testing.assert_array_equal(
            np.asarray(dev.down[e].child_offset), ref.down[e].child_offset,
            err_msg=f"edge {e} child_offset")


def test_device_builder_single_voxel():
    coords = np.array([[0, 3, 4, 5]], dtype=np.int64)
    caps = (256,) * 5
    gcaps = GeometryCaps(cap0=256, fixed=caps)
    ref = build_unet_geometry(coords, caps=gcaps, build_windows=False)
    dev = build_unet_geometry_device(ref.levels[0].coords, 1, caps)
    for l in range(5):
        np.testing.assert_array_equal(np.asarray(dev.levels[l].coords),
                                      ref.levels[l].coords)
        np.testing.assert_array_equal(np.asarray(dev.self3[l].fwd),
                                      ref.self3[l].fwd)
    np.testing.assert_array_equal(np.asarray(dev.stem.fwd), ref.stem.fwd)


def test_device_window_plan_matches_host():
    """build_window_plan_device vs the host builder on the same fwd plan:
    identical win_start/lidx; the spill-tile SET matches (bucket sizes may
    differ — device uses a fixed cap, host a measured power of two)."""
    from openscene_tpu.sparse.pallas_conv import (MTILE, TILE, WIN,
                                                  build_window_plan)
    from openscene_tpu.sparse.geometry_device import build_window_plan_device

    coords = _scene_coords(3, n=12000, extent=90)
    counts = level_counts(coords)
    gran = MTILE * TILE  # both window builders require 512-granular caps
    cap0 = max(WIN, -(-int(counts[0] * 1.1) // gran) * gran)
    caps = (cap0,) + tuple(max(256, -(-int(c * 1.2) // 256) * 256)
                           for c in counts[1:])
    gcaps = GeometryCaps(cap0=caps[0], fixed=caps)
    ref = build_unet_geometry(coords, caps=gcaps, build_windows=False)
    fwd = np.asarray(ref.self3[0].fwd)
    num = int(ref.levels[0].num)

    host = build_window_plan(fwd, num, caps[0])
    assert host is not None
    dev, overflow = build_window_plan_device(fwd, num, caps[0])
    assert not bool(overflow)
    np.testing.assert_array_equal(np.asarray(dev.win_start), host.win_start)
    np.testing.assert_array_equal(np.asarray(dev.lidx), host.lidx)
    host_spills = set(host.spill_ent[host.spill_ent >= 0].tolist())
    dev_se = np.asarray(dev.spill_ent)
    dev_spills = set(dev_se[dev_se >= 0].tolist())
    assert dev_spills == host_spills
    # spill_fwd rows agree for the listed (tile, class) entries
    host_sf = np.asarray(host.spill_fwd)
    dev_sf = np.asarray(dev.spill_fwd)
    for hpos, ent in enumerate(host.spill_ent):
        if ent < 0:
            continue
        dpos = int(np.flatnonzero(dev_se == ent)[0])
        np.testing.assert_array_equal(dev_sf[dpos], host_sf[hpos])


def test_device_stem_occupancy_matches_plan():
    """Stem occupancy == (stem.fwd < num) of the index-plan builder."""
    from openscene_tpu.sparse.geometry_device import (
        build_stem_occupancy_device)

    coords = _scene_coords(4, n=6000, extent=70)
    counts = level_counts(coords)
    caps = tuple(max(256, -(-int(c * 1.1) // 256) * 256) for c in counts)
    gcaps = GeometryCaps(cap0=caps[0], fixed=caps)
    ref = build_unet_geometry(coords, caps=gcaps, build_windows=False)
    num = int(ref.levels[0].num)
    occ = build_stem_occupancy_device(ref.levels[0].coords, num, 5)
    want = (np.asarray(ref.stem.fwd) < num).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(occ, np.float32), want)


def test_device_edge_window_plan_matches_host():
    """build_edge_window_plan_device vs the host builder on the same
    DownPlan: identical windows/lidx/offsets; the spill SETS match."""
    from openscene_tpu.sparse.pallas_edge import build_edge_window_plan
    from openscene_tpu.sparse.geometry_device import (
        build_edge_window_plan_device)

    coords = _scene_coords(5, n=14000, extent=100)
    counts = level_counts(coords)
    caps = tuple(max(1024, -(-int(c * 1.15) // 512) * 512) for c in counts)
    gcaps = GeometryCaps(cap0=caps[0], fixed=caps)
    ref = build_unet_geometry(coords, caps=gcaps, build_windows=False)
    for e in range(2):
        plan = ref.down[e]
        cnum = int(ref.levels[e].num)
        pnum = int(ref.levels[e + 1].num)
        host = build_edge_window_plan(
            np.asarray(plan.fwd), np.asarray(plan.child_parent),
            np.asarray(plan.child_offset), cnum, pnum)
        assert host is not None, e
        dev, overflow = build_edge_window_plan_device(
            plan.fwd, plan.child_parent, plan.child_offset, cnum)
        assert not bool(overflow)
        np.testing.assert_array_equal(np.asarray(dev.dwin_start),
                                      host.dwin_start)
        np.testing.assert_array_equal(np.asarray(dev.dlidx), host.dlidx)
        np.testing.assert_array_equal(np.asarray(dev.uwin_start),
                                      host.uwin_start)
        np.testing.assert_array_equal(np.asarray(dev.ulidx), host.ulidx)
        np.testing.assert_array_equal(np.asarray(dev.uoff), host.uoff)
        h_ents = set(host.dspill_ent[host.dspill_ent >= 0].tolist())
        d_se = np.asarray(dev.dspill_ent)
        assert set(d_se[d_se >= 0].tolist()) == h_ents
        h_tiles = set(host.uspill_tile[host.uspill_tile >= 0].tolist())
        d_ut = np.asarray(dev.uspill_tile)
        assert set(d_ut[d_ut >= 0].tolist()) == h_tiles
        for hpos, ent in enumerate(host.dspill_ent):
            if ent < 0:
                continue
            dpos = int(np.flatnonzero(d_se == ent)[0])
            np.testing.assert_array_equal(np.asarray(dev.dspill_fwd)[dpos],
                                          host.dspill_fwd[hpos])
        for hpos, t in enumerate(host.uspill_tile):
            if t < 0:
                continue
            dpos = int(np.flatnonzero(d_ut == t)[0])
            np.testing.assert_array_equal(
                np.asarray(dev.uspill_parent)[dpos], host.uspill_parent[hpos])
            np.testing.assert_array_equal(
                np.asarray(dev.uspill_off)[dpos], host.uspill_off[hpos])
