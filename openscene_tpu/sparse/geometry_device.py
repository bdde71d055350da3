"""On-device (jit-compiled) geometry-plan builder.

The TPU answer to MinkowskiEngine's GPU CoordinateManager (SURVEY.md §2.2):
kernel maps, strided coordinate hierarchies and transpose-conv coordinate
reuse are built *on the accelerator* from nothing but the level-0 voxel
coordinates, so the host ships (cap0, 4) int32 per batch instead of
hundreds of MB of prebuilt plans, and a 1-core host is never the bottleneck.

Bit-identical to the NumPy builder (:mod:`openscene_tpu.sparse.geometry`)
given the same static caps — tested in ``tests/test_geometry_device.py``.

Design notes (all shapes static; ``num`` per level is a traced scalar):

* **Keys** are int32 pairs ``(hi, lo)`` with ``hi = b * 2^16 + (x + 2^14)``
  and ``lo = (y + 2^14) * 2^16 + (z + 2^14)``.  Coordinates are validated to
  ±2^14 by the host packer (geometry.py:pack_coords), so each field has a
  spare headroom bit and a ±1 stencil delta never carries across fields.
  Lexicographic (hi, lo) order == lexicographic (b, x, y, z) order, and the
  level-0 input is already lex-sorted (data/batch.py), so keys arrive sorted.

* **Stencil probing** exploits the z-contiguity of lex-sorted voxels: for
  each (dx, dy) column of the stencil, ONE branchless binary search finds
  the lower bound of ``(x+dx, y+dy, z-r)``; all 2r+1 dz targets then live in
  the next ``2r`` rows (a z-run holds consecutive-z voxels only), resolved
  with cheap windowed compares.  A k=3 plan costs 9 searches/row instead of
  27, k=5 costs 25 instead of 125.

* **Down edges** (k=2, s=2 coordinate hierarchy) sort the children's parent
  keys with ``lax.sort`` (2-key lexicographic) and derive unique ranks via
  a cumsum over first-occurrence flags — the device analogue of np.unique.

* **Null rows**: missing neighbors point into the padded region via the
  same multiplicative-shuffle formula as the host builder (uint32 wrap).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .types import (ConvPlan, DownPlan, LevelGeometry, UNetGeometry,
                    flip_permutation, stencil_offsets)

_F = 1 << 16      # field width inside hi / lo
_H = 1 << 14      # coordinate headroom offset (matches geometry.py)
_SENTINEL = np.int32(2 ** 20)       # padded-row coordinate sentinel
_KMAX = np.int32(2 ** 31 - 1)       # padded-row key sentinel


def _keys_of(coords, num):
    """(cap, 4) int32 sorted coords -> sorted (hi, lo) int32 keys; padded
    rows get (KMAX, KMAX)."""
    cap = coords.shape[0]
    valid = jnp.arange(cap, dtype=jnp.int32) < num
    c = coords.astype(jnp.int32)
    hi = c[:, 0] * _F + (c[:, 1] + _H)
    lo = (c[:, 2] + _H) * _F + (c[:, 3] + _H)
    return jnp.where(valid, hi, _KMAX), jnp.where(valid, lo, _KMAX), valid


def _lower_bound(kh, kl, ph, pl, chunk: int = 1 << 18):
    """First index where (kh, kl) >= (ph, pl).

    TPU-shaped search: a per-element binary search gathers one element per
    probe per step — XLA lowers that to a scalar loop (~0.3GB/s measured).
    Instead descend a 3-level 128-ary pivot tree: one broadcast compare
    against 128 top pivots, then two 128-wide ROW gathers (the fast gather
    path) + lane-reduced compares.  Exact lower bound for n <= 128^3 (2M),
    zero element gathers.

    Probes stream through the tree in ``chunk``-sized blocks (lax.map):
    the search materializes (probes, 128) compare operands, which at
    bench scale (25 stem columns x 1.1M rows = 28M probes) would otherwise
    be a 13GB temp — the blocks bound it at ~130MB.

    Keys must be sorted; sentinel-padded tails (KMAX) sort last and never
    count as < probe for valid probes."""
    n = kh.shape[0]
    B = 128
    assert n <= B * B * B, n
    nb = -(-n // B)                    # number of 128-wide base rows
    pad = nb * B - n
    a3h = jnp.pad(kh, (0, pad), constant_values=_KMAX).reshape(nb, B)
    a3l = jnp.pad(kl, (0, pad), constant_values=_KMAX).reshape(nb, B)
    # level-2 pivots: first element of every base row, padded to (128, 128)
    p2h = jnp.pad(a3h[:, 0], (0, B * B - nb),
                  constant_values=_KMAX).reshape(B, B)
    p2l = jnp.pad(a3l[:, 0], (0, B * B - nb),
                  constant_values=_KMAX).reshape(B, B)
    # level-1 pivots: first element of every level-2 row
    p1h, p1l = p2h[:, 0], p2l[:, 0]

    def lt(h, l, ph_, pl_):
        return (h < ph_) | ((h == ph_) & (l < pl_))

    def search(phc, plc):
        c1 = jnp.sum(lt(p1h[None, :], p1l[None, :], phc[:, None],
                        plc[:, None]), axis=1).astype(jnp.int32)
        j = jnp.clip(c1 - 1, 0, B - 1)
        r2h = jnp.take(p2h, j, axis=0)
        r2l = jnp.take(p2l, j, axis=0)
        c2 = jnp.sum(lt(r2h, r2l, phc[:, None], plc[:, None]),
                     axis=1).astype(jnp.int32)
        m = jnp.minimum(j * B + jnp.clip(c2 - 1, 0, B - 1), nb - 1)
        r3h = jnp.take(a3h, m, axis=0)
        r3l = jnp.take(a3l, m, axis=0)
        c3 = jnp.sum(lt(r3h, r3l, phc[:, None], plc[:, None]),
                     axis=1).astype(jnp.int32)
        pos = jnp.where(c1 == 0, 0, m * B + c3)
        return jnp.minimum(pos, n)

    shape = ph.shape
    ph = ph.reshape(-1)
    pl = pl.reshape(-1)
    m_probes = ph.shape[0]
    if m_probes <= chunk:
        return search(ph, pl).reshape(shape)
    nc = -(-m_probes // chunk)
    cpad = nc * chunk - m_probes
    ph2 = jnp.pad(ph, (0, cpad)).reshape(nc, chunk)
    pl2 = jnp.pad(pl, (0, cpad)).reshape(nc, chunk)
    pos = jax.lax.map(lambda t: search(t[0], t[1]), (ph2, pl2))
    return pos.reshape(-1)[:m_probes].reshape(shape)


def _null_rows(shape, num, cap: int):
    """Device replica of geometry._spread_nulls (uint32 wraparound math)."""
    pad = jnp.maximum(jnp.uint32(cap) - num.astype(jnp.uint32),
                      jnp.uint32(1))
    flat = jnp.arange(int(np.prod(shape)), dtype=jnp.uint32)
    flat = flat * jnp.uint32(2654435761)
    return (num.astype(jnp.int32)
            + (flat % pad).astype(jnp.int32)).reshape(shape)


def _zmask(kh, kl, num, reach: int = 4):
    """(cap,) int32: bit d (1..reach) set iff a voxel exists at z + d in the
    same (b, x, y) column; bit 0 always set (self).

    Rows of a column are consecutive in the lex sort with consecutive-or-
    gapped z, so 'z + d exists' is a shifted compare against row i + s for
    s <= d — no gathers."""
    cap = kh.shape[0]
    zf = kl & jnp.int32(_F - 1)               # z + H field
    colid_l = kl >> 16                        # y + H field
    mask = jnp.ones((cap,), jnp.int32)
    for s in range(1, reach + 1):
        sh_h = jnp.concatenate([kh[s:], jnp.full((s,), _KMAX, jnp.int32)])
        sh_cl = jnp.concatenate([colid_l[s:],
                                 jnp.full((s,), -1, jnp.int32)])
        sh_z = jnp.concatenate([zf[s:], jnp.full((s,), -9, jnp.int32)])
        same = (sh_h == kh) & (sh_cl == colid_l)
        d = sh_z - zf                         # >= s when same column
        hit = same & (d <= reach) & (jnp.arange(cap, dtype=jnp.int32) + s
                                     < num)
        mask = mask | jnp.where(hit, jnp.int32(1) << jnp.clip(d, 0, reach),
                                0)
    return mask


def _column_probes(kh, kl, num, cols, r):
    """One anchored search + 3 element gathers per (dx, dy) column.

    Anchor = lower bound of (col, z - r); every existing target z + dz
    (|dz| <= r <= 2) is then within the anchor's 4-bit forward zmask, and
    its row is pos + popcount(zmask below delta).  Returns per-column
    (pos, anchor_kh, anchor_kl, anchor_zmask, valid_anchor)."""
    cap = kh.shape[0]
    zm = _zmask(kh, kl, num)
    dhi = np.array([c[0] for c in cols], np.int32)
    dlo = np.array([c[1] * _F - r for c in cols], np.int32)
    ph = kh[None, :] + jnp.asarray(dhi)[:, None]          # (G, cap)
    pl = kl[None, :] + jnp.asarray(dlo)[:, None]
    pos = _lower_bound(kh, kl, ph.reshape(-1),
                       pl.reshape(-1)).reshape(len(cols), cap)
    i = jnp.minimum(pos, cap - 1)
    return (pos, jnp.take(kh, i), jnp.take(kl, i), jnp.take(zm, i),
            i < num, zm)


def _col_hits(g, dx, dy, dz, kh, kl, pos, a_kh, a_kl, a_zm, a_val, cap):
    """(exists, row) of offset (dx, dy, dz) via column g's anchor."""
    t_hi = kh + jnp.int32(dx)
    t_lo = kl + jnp.int32(dy * _F + dz)
    colmatch = a_val[g] & (a_kh[g] == t_hi) & ((a_kl[g] >> 16) == (t_lo >> 16))
    delta = (t_lo & jnp.int32(_F - 1)) - (a_kl[g] & jnp.int32(_F - 1))
    inrange = (delta >= 0) & (delta <= 4)
    d = jnp.clip(delta, 0, 4)
    exists = colmatch & inrange & (((a_zm[g] >> d) & 1) == 1)
    below = a_zm[g] & ((jnp.int32(1) << d) - 1)
    row = jnp.minimum(pos[g] + jax.lax.population_count(below), cap - 1)
    return exists, row


def build_self_plan_device(coords, num, kernel_size: int,
                           shared_probes=None) -> ConvPlan:
    """Stride-1 stencil plan on one level: fwd[k, r] = row of
    (coord_r + offset_k), or a spread-null row when absent.

    Matches geometry.build_self_plan bit-for-bit (same offset order, same
    null formula).

    ``shared_probes``: optional ``(cols, probes)`` from a WIDER stencil's
    `_column_probes` on the same level (e.g. the k=5 stem's 24 columns
    contain all 8 k=3 columns).  `_col_hits` is anchor-agnostic — the
    anchor is a lower bound of (col, z - r_any) and the target row is
    recovered through the anchor's zmask — so reusing deeper-reach anchors
    is exact and saves this level's whole probe pass (~25% of the L0
    geometry build's search work when combined with the stem)."""
    cap = coords.shape[0]
    offsets = stencil_offsets(kernel_size)
    K = len(offsets)
    r = kernel_size // 2
    kh, kl, valid = _keys_of(coords, num)
    rows = jnp.arange(cap, dtype=jnp.int32)
    nulls = _null_rows((K, cap), num, cap)

    cols = sorted({(int(dx), int(dy)) for dx, dy, _ in offsets.tolist()
                   if (dx, dy) != (0, 0)})
    if shared_probes is not None:
        shared_cols, shared = shared_probes
        assert set(cols) <= set(shared_cols), (cols, shared_cols)
        col_of = {c: shared_cols.index(c) for c in cols}
        pos, a_kh, a_kl, a_zm, a_val, zm = shared
    else:
        col_of = {c: g for g, c in enumerate(cols)}
        pos, a_kh, a_kl, a_zm, a_val, zm = _column_probes(kh, kl, num,
                                                          cols, r)

    # own-column dz!=0 offsets: direct shifted-neighbor checks, no search
    zf = kl & jnp.int32(_F - 1)
    colid_l = kl >> 16

    def own_neighbor(dz):
        # the z+dz row (if it exists) is one of rows i+sign(dz)*s,
        # s in 1..|dz| (column rows are consecutive, z strictly increasing)
        ok = jnp.zeros((cap,), bool)
        row = jnp.zeros((cap,), jnp.int32)
        for s in range(1, abs(dz) + 1):
            if dz > 0:
                sh_h = jnp.concatenate(
                    [kh[s:], jnp.full((s,), _KMAX, jnp.int32)])
                sh_cl = jnp.concatenate(
                    [colid_l[s:], jnp.full((s,), -1, jnp.int32)])
                sh_z = jnp.concatenate(
                    [zf[s:], jnp.full((s,), -9, jnp.int32)])
                nrow = rows + s
            else:
                sh_h = jnp.concatenate(
                    [jnp.full((s,), _KMAX, jnp.int32), kh[:-s]])
                sh_cl = jnp.concatenate(
                    [jnp.full((s,), -1, jnp.int32), colid_l[:-s]])
                sh_z = jnp.concatenate(
                    [jnp.full((s,), -9, jnp.int32), zf[:-s]])
                nrow = rows - s
            m = ((sh_h == kh) & (sh_cl == colid_l) & (sh_z == zf + dz)
                 & (nrow >= 0) & (nrow < num))
            ok = ok | m
            row = jnp.where(m, jnp.clip(nrow, 0, cap - 1), row)
        return ok, row

    own = {dz: own_neighbor(dz) for dz in range(-r, r + 1) if dz != 0}

    fwd = []
    for k, (dx, dy, dz) in enumerate(offsets.tolist()):
        if dx == 0 and dy == 0:
            if dz == 0:
                fwd.append(jnp.where(valid, rows, nulls[k]))
            else:
                ok, row = own[dz]
                fwd.append(jnp.where(valid & ok, row, nulls[k]))
            continue
        g = col_of[(dx, dy)]
        exists, row = _col_hits(g, dx, dy, dz, kh, kl, pos, a_kh, a_kl,
                                a_zm, a_val, cap)
        fwd.append(jnp.where(valid & exists, row, nulls[k]))
    return ConvPlan(fwd=jnp.stack(fwd), flip_perm=flip_permutation(offsets))


def build_down_edge_device(coords, num, coarse_cap: int
                           ) -> Tuple[LevelGeometry, DownPlan]:
    """Parent level + k=2 s=2 plan from one fine level (device analogue of
    geometry.build_down_edge; parents come out in lex order like np.unique)."""
    cap = coords.shape[0]
    c = coords.astype(jnp.int32)
    valid = jnp.arange(cap, dtype=jnp.int32) < num

    # arithmetic shift = floor division by 2 (negatives handled like numpy)
    pc = jnp.concatenate([c[:, :1], c[:, 1:] >> 1], axis=1)
    hi = pc[:, 0] * _F + (pc[:, 1] + _H)
    lo = (pc[:, 2] + _H) * _F + (pc[:, 3] + _H)
    hi = jnp.where(valid, hi, _KMAX)
    lo = jnp.where(valid, lo, _KMAX)

    # NOTE (r5): per-field >>1 does NOT make the lex parent TUPLE monotone
    # (child (0,2,9,9) sorts between (0,2,0,0) and (0,3,0,0) but their
    # parents (0,1,4,4) / (0,1,0,0) invert) — a sort-free variant was tried
    # and failed the host-parity tests; the 2-key stable sort stays.
    child_idx = jnp.arange(cap, dtype=jnp.int32)
    sh, sl, perm = jax.lax.sort((hi, lo, child_idx), num_keys=2)
    svalid = perm < num

    prev_h = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sh[:-1]])
    prev_l = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sl[:-1]])
    is_new = ((sh != prev_h) | (sl != prev_l)) & svalid
    gid = jnp.cumsum(is_new.astype(jnp.int32)) - 1          # parent rank
    n_parent = is_new.astype(jnp.int32).sum()

    # parent coords (lex order) into the padded coarse level
    pcoords = jnp.full((coarse_cap, 4), _SENTINEL, dtype=jnp.int32)
    src = jnp.take(pc, perm, axis=0)
    tgt = jnp.where(is_new, gid, coarse_cap - 1)  # overwrite-safe dump row
    pcoords = pcoords.at[tgt].set(jnp.where(is_new[:, None], src, _SENTINEL))
    # the dump row may hold a stale sentinel write; re-assert it
    pcoords = pcoords.at[coarse_cap - 1].set(_SENTINEL)

    # child -> parent rank (original child order)
    cp_nulls = _null_rows((cap,), n_parent, coarse_cap)
    child_parent = jnp.zeros(cap, jnp.int32).at[perm].set(
        jnp.where(svalid, gid, 0))
    child_parent = jnp.where(valid, child_parent, cp_nulls)

    rem = c[:, 1:] - (pc[:, 1:] << 1)
    off_id = (rem[:, 0] * 2 + rem[:, 1]) * 2 + rem[:, 2]
    child_offset = jnp.where(valid, off_id, 0)

    fwd = _null_rows((8, coarse_cap), num, cap).reshape(-1)
    flat = jnp.where(valid, child_offset * coarse_cap + child_parent,
                     8 * coarse_cap)  # out-of-range: dropped by scatter mode
    fwd = fwd.at[flat].set(jnp.where(valid, child_idx, 0), mode="drop")
    fwd = fwd.reshape(8, coarse_cap)

    level = LevelGeometry(coords=pcoords, num=n_parent.astype(jnp.int32))
    return level, DownPlan(fwd=fwd, child_parent=child_parent,
                           child_offset=child_offset)


def build_window_plan_device(fwd, num, cap: int, kernel_size: int = 3,
                             spill_cap: Optional[int] = None):
    """Device analogue of pallas_conv.build_window_plan.

    Returns (WindowPlan, spill_overflow) where ``spill_overflow`` is a traced
    bool scalar: True when more than ``spill_cap`` (tile, class) ENTRIES
    exceeded their windows (the host builder would fall back to the XLA
    path; inside a jit the caller must surface the flag and re-dispatch —
    see runtime/distill.py).  Differences from the host builder: the spill
    bucket is a fixed ``spill_cap`` instead of a measured count.  Its size
    is a real cost: every conv's spill correction gathers + scatters
    spill_cap*KC*TILE rows regardless of actual spills.  Real scenes spill
    2-3% of tiles at WIN=512 with ~1 overflowing class per spilled tile
    (scripts/dev_window_stats); the ~4.2%-of-ntiles default gives ~1.5x
    headroom, overflow -> trainer re-runs the batch via the host path.
    """
    from .pallas_conv import (INVALID, MTILE, NCLASS, TILE, WIN,
                              WindowPlan, wins_for_cap)

    K = fwd.shape[0]
    assert cap >= WIN and cap % (MTILE * TILE) == 0, (cap, WIN, TILE)
    wins = wins_for_cap(cap)  # cap-keyed: matches the conv op's choice
    offsets = stencil_offsets(kernel_size)
    k_class = (offsets[:, 0] - offsets[:, 0].min()).astype(np.int32)
    KC = K // NCLASS
    ntiles = cap // TILE
    if spill_cap is None:
        # per-(tile,class) ENTRY bucket, 64-granular: real scenes spill
        # 2-3% of tiles and ~1 class per spilled tile; ~4.2% of tiles as
        # entries gives ~1.5x headroom without pow2 overshoot
        spill_cap = max(16, -(-ntiles // 24 // 64) * 64)
    f = fwd.reshape(K, ntiles, TILE)
    valid = f < num
    imax = jnp.int32(np.iinfo(np.int32).max)
    big = jnp.where(valid, f, imax)

    win_start = []
    lidx = jnp.full((ntiles, K, TILE), INVALID, dtype=jnp.int32)
    bad_c = []
    for c in range(NCLASS):
        ks = np.flatnonzero(k_class == c)
        mn = big[ks].min(axis=(0, 2))
        mn = jnp.where(mn == imax, 0, mn)
        start = jnp.minimum((mn // 128) * 128, cap - wins[c])
        win_start.append(start)
        mx = jnp.where(valid[ks], f[ks], -1).max(axis=(0, 2))
        bad = (mx - start) >= wins[c]
        bad_c.append(bad)
        loc = f[ks] - start[None, :, None]
        loc = jnp.where(valid[ks], loc, INVALID)
        loc = jnp.where(bad[None, :, None], INVALID, loc)
        lidx = lidx.at[:, ks, :].set(jnp.transpose(loc, (1, 0, 2)))
    win_start = jnp.stack(win_start, axis=1).astype(jnp.int32)

    bad_flat = jnp.stack(bad_c, axis=1).reshape(-1)  # (ntiles*NCLASS,)
    n_spill = bad_flat.astype(jnp.int32).sum()
    rank = jnp.cumsum(bad_flat.astype(jnp.int32)) - 1
    spill_ent = jnp.full((spill_cap,), -1, dtype=jnp.int32)
    tgt = jnp.where(bad_flat & (rank < spill_cap), rank, spill_cap)
    spill_ent = spill_ent.at[tgt].set(
        jnp.arange(ntiles * NCLASS, dtype=jnp.int32), mode="drop")
    # entry e = tile*NCLASS + class -> that class's KC offset rows
    f_by_ent = jnp.transpose(f.reshape(NCLASS, KC, ntiles, TILE),
                             (2, 0, 1, 3)).reshape(ntiles * NCLASS, KC, TILE)
    spill_fwd = jnp.take(f_by_ent, jnp.maximum(spill_ent, 0), axis=0)
    spill_fwd = jnp.where((spill_ent >= 0)[:, None, None], spill_fwd, 0)

    plan = WindowPlan(win_start=win_start,
                      lidx=lidx,
                      k_class=k_class,
                      spill_ent=spill_ent, spill_fwd=spill_fwd)
    return plan, n_spill > spill_cap


def build_edge_window_plan_device(fwd, child_parent, child_offset,
                                  child_num, d_spill_cap: Optional[int] = None,
                                  u_spill_cap: Optional[int] = None):
    """Device analogue of pallas_edge.build_edge_window_plan.

    Returns (EdgeWindowPlan, overflow) with traced overflow (spill buckets
    are static caps; exceeding one means the plan silently drops work, so
    the caller must fall back).  Default buckets: measured spill rates on
    the bench batch are 0.45-1.8% of (parent tile, offset) entries at
    DWIN=1024 and 0.9-2% of child tiles at UWIN=512; ~4%/~5% caps give
    >2x headroom."""
    from .pallas_conv import TILE
    from .pallas_edge import DWIN, INVALID_D, INVALID_U, KD, UWIN, \
        EdgeWindowPlan

    parent_cap = fwd.shape[1]
    child_cap = child_parent.shape[0]
    assert child_cap >= DWIN and parent_cap >= UWIN, (child_cap, parent_cap)
    ptiles = parent_cap // TILE
    ctiles = child_cap // TILE
    if d_spill_cap is None:
        d_spill_cap = max(64, -(-ptiles * KD // 25 // 64) * 64)
    if u_spill_cap is None:
        u_spill_cap = max(16, -(-ctiles // 20 // 64) * 64)
    imax = jnp.int32(np.iinfo(np.int32).max)

    # ---- down side ----
    f = fwd.reshape(KD, ptiles, TILE)
    fvalid = f < child_num
    big = jnp.where(fvalid, f, imax)
    mn = big.min(axis=2)
    mn = jnp.where(mn == imax, 0, mn)
    start = jnp.minimum((mn // 128) * 128, child_cap - DWIN)
    mx = jnp.where(fvalid, f, -1).max(axis=2)
    dbad = (mx - start) >= DWIN                            # (KD, ptiles)
    loc = f - start[:, :, None]
    loc = jnp.where(fvalid & ~dbad[:, :, None], loc, INVALID_D)
    dwin_start = start.T.astype(jnp.int32)
    dlidx = jnp.transpose(loc, (1, 0, 2)).astype(jnp.int32)
    bad_flat = dbad.T.reshape(-1)                          # ptile*KD + k
    n_d = bad_flat.astype(jnp.int32).sum()
    rank = jnp.cumsum(bad_flat.astype(jnp.int32)) - 1
    dspill_ent = jnp.full((d_spill_cap,), -1, dtype=jnp.int32)
    tgt = jnp.where(bad_flat & (rank < d_spill_cap), rank, d_spill_cap)
    dspill_ent = dspill_ent.at[tgt].set(
        jnp.arange(ptiles * KD, dtype=jnp.int32), mode="drop")
    f_by_ent = jnp.transpose(f, (1, 0, 2)).reshape(ptiles * KD, TILE)
    dspill_fwd = jnp.take(f_by_ent, jnp.maximum(dspill_ent, 0), axis=0)
    dspill_fwd = jnp.where((dspill_ent >= 0)[:, None], dspill_fwd, 0)

    # ---- up side ----
    cp = child_parent.reshape(ctiles, TILE)
    rvalid = (jnp.arange(child_cap) < child_num).reshape(ctiles, TILE)
    bigp = jnp.where(rvalid, cp, imax)
    mnp = bigp.min(axis=1)
    mnp = jnp.where(mnp == imax, 0, mnp)
    startp = jnp.minimum((mnp // 128) * 128, parent_cap - UWIN)
    mxp = jnp.where(rvalid, cp, -1).max(axis=1)
    ubad = (mxp - startp) >= UWIN
    ulidx = cp - startp[:, None]
    ulidx = jnp.where(rvalid & ~ubad[:, None], ulidx, INVALID_U)
    n_u = ubad.astype(jnp.int32).sum()
    ranku = jnp.cumsum(ubad.astype(jnp.int32)) - 1
    uspill_tile = jnp.full((u_spill_cap,), -1, dtype=jnp.int32)
    tgtu = jnp.where(ubad & (ranku < u_spill_cap), ranku, u_spill_cap)
    uspill_tile = uspill_tile.at[tgtu].set(
        jnp.arange(ctiles, dtype=jnp.int32), mode="drop")
    # invalid child rows -> parent NULL row (zero features/cotangents)
    cp_null = jnp.where(rvalid, cp, parent_cap - 1)
    uspill_parent = jnp.take(cp_null, jnp.maximum(uspill_tile, 0), axis=0)
    uspill_parent = jnp.where((uspill_tile >= 0)[:, None], uspill_parent,
                              parent_cap - 1)
    off_t = child_offset.reshape(ctiles, TILE)
    uspill_off = jnp.take(off_t, jnp.maximum(uspill_tile, 0), axis=0)

    plan = EdgeWindowPlan(
        dwin_start=dwin_start, dlidx=dlidx,
        dspill_ent=dspill_ent, dspill_fwd=dspill_fwd,
        uwin_start=startp.astype(jnp.int32), ulidx=ulidx.astype(jnp.int32),
        uoff=off_t.astype(jnp.int32), uspill_tile=uspill_tile,
        uspill_parent=uspill_parent, uspill_off=uspill_off)
    return plan, (n_d > d_spill_cap) | (n_u > u_spill_cap)


def build_stem_occupancy_device(coords, num, kernel_size: int = 5,
                                return_probes: bool = False):
    """(K, cap) bf16 stencil occupancy — the only thing the k=5 stem needs
    for constant-input models (occupancy GEMM, models/sparse_unet.py) —
    without ever materializing the (K, cap) int32 index plan.

    Same anchored zmask scheme as build_self_plan_device (3 gathers per
    column instead of 2*(2r+1)); own-column bits come straight from the
    forward/backward shifted compares.

    ``return_probes=True`` additionally returns ``(cols, probes)`` for
    reuse by the same level's k=3 plan (build_self_plan_device)."""
    cap = coords.shape[0]
    offsets = stencil_offsets(kernel_size)
    r = kernel_size // 2
    assert r <= 2, kernel_size  # zmask reach covers 2r <= 4
    kh, kl, valid = _keys_of(coords, num)

    cols = sorted({(int(dx), int(dy)) for dx, dy, _ in offsets.tolist()
                   if (dx, dy) != (0, 0)})
    col_of = {c: g for g, c in enumerate(cols)}
    pos, a_kh, a_kl, a_zm, a_val, zm = _column_probes(kh, kl, num, cols, r)

    zf = kl & jnp.int32(_F - 1)
    colid_l = kl >> 16
    rows = jnp.arange(cap, dtype=jnp.int32)

    def own_exists(dz):
        ok = jnp.zeros((cap,), bool)
        for s in range(1, abs(dz) + 1):
            if dz > 0:
                sh_h = jnp.concatenate(
                    [kh[s:], jnp.full((s,), _KMAX, jnp.int32)])
                sh_cl = jnp.concatenate(
                    [colid_l[s:], jnp.full((s,), -1, jnp.int32)])
                sh_z = jnp.concatenate(
                    [zf[s:], jnp.full((s,), -9, jnp.int32)])
                nrow = rows + s
            else:
                sh_h = jnp.concatenate(
                    [jnp.full((s,), _KMAX, jnp.int32), kh[:-s]])
                sh_cl = jnp.concatenate(
                    [jnp.full((s,), -1, jnp.int32), colid_l[:-s]])
                sh_z = jnp.concatenate(
                    [jnp.full((s,), -9, jnp.int32), zf[:-s]])
                nrow = rows - s
            ok = ok | ((sh_h == kh) & (sh_cl == colid_l) & (sh_z == zf + dz)
                       & (nrow >= 0) & (nrow < num))
        return ok

    own = {dz: own_exists(dz) for dz in range(-r, r + 1) if dz != 0}

    occ = []
    for (dx, dy, dz) in offsets.tolist():
        if dx == 0 and dy == 0:
            occ.append(valid if dz == 0 else (own[dz] & valid))
            continue
        g = col_of[(dx, dy)]
        exists, _ = _col_hits(g, dx, dy, dz, kh, kl, pos, a_kh, a_kl,
                              a_zm, a_val, cap)
        occ.append(exists & valid)
    out = jnp.stack(occ).astype(jnp.bfloat16)
    if return_probes:
        return out, (cols, (pos, a_kh, a_kl, a_zm, a_val, zm))
    return out


def build_geometry_parts(coords, num, caps: Tuple[int, ...],
                         stem_kernel: int = 5, num_levels: int = 5,
                         windows: bool = False,
                         stem_occupancy: bool = False,
                         n_scenes: Optional[int] = None,
                         grid_dims0: Optional[Tuple[int, int, int]] = None):
    """Traceable geometry construction (call from inside an outer jit, e.g.
    the train step). Returns (UNetGeometry, spill_overflow bool scalar).

    ``windows=True`` attaches device-built Pallas window plans for every
    level whose cap fits the kernel's tiling; ``spill_overflow`` is True iff
    any level's spill bucket overflowed (caller must fall back — the plan
    would silently drop spill corrections otherwise).
    ``stem_occupancy=True`` builds the k=5 stem as a (K, cap0) occupancy
    matrix only (constant-input models).

    ``n_scenes`` (static) switches the stem/self-plan construction to the
    dense occupancy-grid prober (:mod:`openscene_tpu.sparse.grid`) — ~10x
    cheaper at bench scale than the searchsorted path — sized by
    ``grid_dims0`` (L0 extents, halved per level).  A scene exceeding the
    static grid raises ``overflow`` (caller falls back, same contract as
    spill overflow).  ``n_scenes=None`` keeps the search-based path."""
    from .pallas_conv import MTILE, TILE, WIN

    num = jnp.asarray(num)
    levels = [LevelGeometry(coords=jnp.asarray(coords),
                            num=num.astype(jnp.int32))]
    downs = []
    overflow = jnp.zeros((), bool)
    for l in range(num_levels - 1):
        coarse, plan = build_down_edge_device(
            levels[l].coords, levels[l].num, caps[l + 1])
        # a coarse level outgrowing its static cap would silently corrupt
        # ranks (the NumPy builder raises OverflowError here) — flag it
        overflow = overflow | (coarse.num > caps[l + 1] - 1)
        levels.append(coarse)
        downs.append(plan)
    stem_occ = None
    if n_scenes is not None:
        from . import grid as gridmod
        dims0 = grid_dims0 or gridmod.DEFAULT_DIMS0
        grids = []
        for l, lv in enumerate(levels):
            g = gridmod.build_level_grid(lv.coords, lv.num, n_scenes,
                                         gridmod.dims_for_level(l, dims0))
            overflow = overflow | g.overflow
            grids.append(g)
        if stem_occupancy:
            stem = ConvPlan(fwd=None,
                            flip_perm=flip_permutation(
                                stencil_offsets(stem_kernel)))
            stem_occ, self3_l0 = gridmod.stem_and_self3_from_grid(
                grids[0], levels[0].num, stem_kernel)
        else:
            # fused: both plans share the k=5 dx-plane row gathers (the
            # same reason the occupancy path fuses via
            # stem_and_self3_from_grid)
            stem, self3_l0 = gridmod.stem_plan_and_self3_from_grid(
                grids[0], levels[0].num, stem_kernel)
        self3 = tuple([self3_l0] + [
            gridmod.self_plan_from_grid(grids[l], levels[l].num, 3)
            for l in range(1, num_levels)])
    else:
        l0_probes = None
        if stem_occupancy:
            stem = ConvPlan(fwd=None,
                            flip_perm=flip_permutation(
                                stencil_offsets(stem_kernel)))
            stem_occ, l0_probes = build_stem_occupancy_device(
                levels[0].coords, levels[0].num, stem_kernel,
                return_probes=True)
        else:
            stem = build_self_plan_device(levels[0].coords, levels[0].num,
                                          stem_kernel)
        # L0's k=3 plan reuses the stem's column probes (its 8 columns are a
        # subset of the k=5 stem's 24; the anchored-zmask row recovery is
        # anchor-reach-agnostic) — saves a full 8-column probe pass at cap0.
        self3 = tuple(
            build_self_plan_device(lv.coords, lv.num, 3,
                                   shared_probes=l0_probes if l == 0 else
                                   None)
            for l, lv in enumerate(levels))
    wplans = [None] * num_levels
    ewplans = [None] * (num_levels - 1)
    if windows:
        from .pallas_conv import WPLAN_MIN_CAP
        from .pallas_edge import DWIN, EWPLAN_MIN_CAP, UWIN
        for l in range(num_levels):
            cap = caps[l]
            if (cap >= max(WIN, WPLAN_MIN_CAP)
                    and cap % (MTILE * TILE) == 0):
                wplans[l], ov = build_window_plan_device(
                    self3[l].fwd, levels[l].num, cap)
                overflow = overflow | ov
        for e in range(num_levels - 1):
            if (caps[e] >= max(DWIN, EWPLAN_MIN_CAP) and caps[e + 1] >= UWIN
                    and caps[e] % (4 * TILE) == 0
                    and caps[e + 1] % (4 * TILE) == 0):
                ewplans[e], ov = build_edge_window_plan_device(
                    downs[e].fwd, downs[e].child_parent,
                    downs[e].child_offset, levels[e].num)
                overflow = overflow | ov
    geo = UNetGeometry(levels=tuple(levels), stem=stem, self3=self3,
                       down=tuple(downs), wplans=tuple(wplans),
                       stem_occ=stem_occ, ewplans=tuple(ewplans))
    return geo, overflow


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _build_geometry_jit(coords, num, caps: Tuple[int, ...], stem_kernel: int,
                        num_levels: int):
    geo, _ = build_geometry_parts(coords, num, caps, stem_kernel, num_levels)
    return geo


def build_unet_geometry_device(coords, num, caps: Tuple[int, ...],
                               stem_kernel: int = 5,
                               num_levels: int = 5) -> UNetGeometry:
    """Full 5-level UNet geometry on device (standalone jitted entry).

    coords: (caps[0], 4) int32, lex-sorted valid rows first, sentinel-padded
    (as produced by geometry._pad_level / data/batch.py).
    num: () int32 valid-row count.  caps: static per-level capacities
    (a GeometryCaps.fixed schedule).  For in-step construction (windows,
    stem occupancy) use :func:`build_geometry_parts` inside your own jit.
    """
    if coords.shape[0] != caps[0]:
        raise ValueError(f"coords cap {coords.shape[0]} != caps[0] {caps[0]}")
    return _build_geometry_jit(jnp.asarray(coords), jnp.asarray(num),
                               tuple(int(c) for c in caps), stem_kernel,
                               num_levels)
