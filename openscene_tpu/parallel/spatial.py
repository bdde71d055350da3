"""Cross-chip spatial sharding of ONE oversized scene (halo exchange).

The reference scales past single-GPU memory by training on random 20k-point
chunks and evaluating whole scenes at batch 1
(/root/reference/scripts/feature_fusion/scannet_openseg.py:145-150,
``test_batch_size: 1`` in every reference config) — a scene must always fit
one device.  SURVEY.md §2.3/§7 flags the TPU-native extension: when a scene
exceeds one chip, split its voxels across the ICI mesh by coordinate order
and exchange stencil halos — the context-parallelism analogue for sparse
convolutions.

Design (prototype; validated against the single-device engine on the
virtual CPU mesh by tests/test_spatial_sharding.py):

* Rows are lex-sorted by packed coordinate key (sparse.geometry.pack_coords)
  and split into D CONTIGUOUS rank ranges, one per device.  The sort order
  is spatially coherent, so most stencil neighbors stay on-shard; only the
  boundary needs communication.
* The k^3 stencil plan is built per shard against the GLOBAL coordinate
  set; every (offset, output row) source is classified local / remote /
  missing.  The sorted-unique remote rows form the shard's fixed-cap HALO.
* Exchange = ONE ``all_gather`` per conv of a compact per-device EXPORT
  buffer holding only the rows some other shard needs — O(boundary), not
  O(cap).  The collective rides ICI, and its AD transpose (a psum-scatter
  of the halo cotangents back to their owners) gives the backward halo
  exchange for free — no hand-written transpose plan is needed across the
  shard boundary.
* Compute is the engine's standard scatter-free gather-GEMM
  (sparse/ops.py) over an extended row buffer ``[local rows | halo rows]``;
  missing neighbors point at the shard's own zero padding, preserving the
  engine-wide padded-row invariant (sparse/ops.py docstring).

``ppermute`` to the O(1) neighboring shards (instead of ``all_gather``) is
the bandwidth-optimal upgrade once D grows; the per-owner export lists this
module builds are exactly the send lists that upgrade needs.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..sparse.geometry import offset_key_delta, pack_coords
from ..sparse.types import stencil_offsets


class SpatialShards(NamedTuple):
    """Host-built plan for one spatially sharded level.

    coords:     (D, cap_d, 4) int32 — per-shard padded voxel coords.
    num:        (D,)   int32 — valid rows of each shard.
    fwd:        (D, K, cap_d) int32 — gather plan into the extended buffer
                ``[local (cap_d) | halo (H)]``; missing neighbors point into
                the shard's own zero padding.
    export_idx: (D, E) int32 — local rows each device publishes to the pool.
    halo_src:   (D, H) int32 — positions into the flattened (D*E,) pool.
    flip_perm:  (K,)   int32 — mirrored-offset permutation (diagnostics).
    perm:       (N,)   int32 — input row of each global sorted position.
    starts:     (D+1,) int64 — sorted-range boundary of each shard.
    """
    coords: np.ndarray
    num: np.ndarray
    fwd: np.ndarray
    export_idx: np.ndarray
    halo_src: np.ndarray
    flip_perm: np.ndarray
    perm: np.ndarray
    starts: np.ndarray

    @property
    def n_shards(self) -> int:
        return self.fwd.shape[0]

    @property
    def cap_d(self) -> int:
        return self.fwd.shape[2]

    @property
    def halo_cap(self) -> int:
        return self.halo_src.shape[1]


def _round_up(n: int, m: int) -> int:
    return ((max(n, 1) + m - 1) // m) * m


def build_spatial_shards(coords: np.ndarray, n_shards: int,
                         kernel_size: int = 3,
                         round_to: int = 8) -> SpatialShards:
    """Split one scene's voxels into D contiguous sorted ranges and build
    per-shard stencil plans with halo/export exchange lists.

    ``coords``: (N, 4) int (batch, x, y, z) UNIQUE voxels (any row order).
    """
    from ..sparse.types import flip_permutation

    coords = np.asarray(coords, dtype=np.int32)
    N = coords.shape[0]
    D = int(n_shards)
    keys = pack_coords(coords)
    if len(np.unique(keys)) != N:
        raise ValueError("spatial sharding expects unique voxel coords")
    perm = np.argsort(keys, kind="stable").astype(np.int32)
    skeys = keys[perm]
    scoords = coords[perm]

    starts = np.linspace(0, N, D + 1).astype(np.int64)
    counts = np.diff(starts)
    # >= 1 spare zero row per shard so missing neighbors always have a
    # zero-padding target even in the fullest shard
    cap_d = _round_up(int(counts.max()) + 1, round_to)

    offsets = stencil_offsets(kernel_size)
    K = len(offsets)
    deltas = offset_key_delta(offsets)

    fwd = np.zeros((D, K, cap_d), dtype=np.int32)
    halo_lists = []
    # remote global-sorted positions requested FROM each owner, per owner
    requested = [[] for _ in range(D)]
    # per-shard raw probe results kept for the remote rewrite second pass
    probe_pos = []
    for d in range(D):
        lo, hi = int(starts[d]), int(starts[d + 1])
        n_d = hi - lo
        # missing neighbors: spread across this shard's zero padding
        # [n_d, cap_d) (single-row nulls serialize the gather; see
        # sparse/geometry.py:_spread_nulls)
        pad = np.uint32(cap_d - n_d)
        flat = (np.arange(K * cap_d, dtype=np.uint32)
                * np.uint32(2654435761))
        fwd[d] = (n_d + (flat % pad).astype(np.int32)).reshape(K, cap_d)

        probes = skeys[lo:hi][None, :] + deltas[:, None]      # (K, n_d)
        pos = np.searchsorted(skeys, probes)
        pos_c = np.minimum(pos, N - 1)
        found = (skeys[pos_c] == probes) if N else np.zeros_like(pos, bool)
        gpos = np.where(found, pos_c, -1)                     # (K, n_d)
        local = found & (gpos >= lo) & (gpos < hi)
        remote = found & ~local
        fwd[d][:, :n_d][local] = (gpos[local] - lo).astype(np.int32)
        halo_d = np.unique(gpos[remote]).astype(np.int64)
        halo_lists.append(halo_d)
        owners = np.searchsorted(starts, halo_d, side="right") - 1
        for o in np.unique(owners):
            requested[o].append(halo_d[owners == o])
        probe_pos.append((gpos, remote, halo_d))

    export_rows = [np.unique(np.concatenate(r)) if r else
                   np.empty(0, dtype=np.int64) for r in requested]
    E = _round_up(max(len(e) for e in export_rows), round_to)
    H = _round_up(max(len(h) for h in halo_lists), round_to)

    export_idx = np.zeros((D, E), dtype=np.int32)
    halo_src = np.zeros((D, H), dtype=np.int32)
    out_coords = np.full((D, cap_d, 4), 2 ** 20, dtype=np.int32)
    num = np.zeros((D,), dtype=np.int32)
    for d in range(D):
        lo, hi = int(starts[d]), int(starts[d + 1])
        num[d] = hi - lo
        out_coords[d, :hi - lo] = scoords[lo:hi]
        e = export_rows[d]
        export_idx[d, :len(e)] = (e - lo).astype(np.int32)

        gpos, remote, halo_d = probe_pos[d]
        if len(halo_d):
            owners = np.searchsorted(starts, halo_d, side="right") - 1
            pool_pos = np.empty(len(halo_d), dtype=np.int32)
            for o in np.unique(owners):
                m = owners == o
                pool_pos[m] = (o * E + np.searchsorted(
                    export_rows[o], halo_d[m])).astype(np.int32)
            halo_src[d, :len(halo_d)] = pool_pos
            # rewrite remote fwd entries to extended-buffer halo slots
            slot = cap_d + np.searchsorted(halo_d, gpos[remote])
            fwd[d][:, :num[d]][remote] = slot.astype(np.int32)

    return SpatialShards(
        coords=out_coords, num=num, fwd=fwd, export_idx=export_idx,
        halo_src=halo_src, flip_perm=flip_permutation(offsets),
        perm=perm, starts=starts)


def shard_rows(x: np.ndarray, shards: SpatialShards) -> np.ndarray:
    """(N, C) input-order row features -> (D, cap_d, C) zero-padded shards."""
    D, cap_d = shards.n_shards, shards.cap_d
    out = np.zeros((D, cap_d) + x.shape[1:], dtype=x.dtype)
    xs = np.asarray(x)[shards.perm]
    for d in range(D):
        lo, hi = int(shards.starts[d]), int(shards.starts[d + 1])
        out[d, :hi - lo] = xs[lo:hi]
    return out


def unshard_rows(y, shards: SpatialShards) -> np.ndarray:
    """(D, cap_d, C) shard outputs -> (N, C) in the ORIGINAL row order."""
    y = np.asarray(y)
    ys = np.concatenate(
        [y[d, :int(shards.num[d])] for d in range(shards.n_shards)], axis=0)
    out = np.empty_like(ys)
    out[shards.perm] = ys
    return out


def make_spatial_conv(mesh, shards: SpatialShards, axis: str = "space"):
    """Jitted spatially-sharded stencil conv over ``mesh``'s ``axis``.

    Returns ``f(x_shards, w) -> y_shards`` with
    ``x_shards: (D, cap_d, Cin)`` sharded over the axis, ``w: (K, Cin, Cout)``
    replicated.  Fully differentiable: the all_gather's AD transpose routes
    halo cotangents back to their owner shards.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    D, K, cap_d = shards.fwd.shape
    E = shards.export_idx.shape[1]

    def conv(x, w, fwd, exp_idx, halo_src):
        x, fwd = x[0], fwd[0]
        exp_idx, halo_src = exp_idx[0], halo_src[0]
        pool = jax.lax.all_gather(x[exp_idx], axis)          # (D, E, Cin)
        halo = pool.reshape(D * E, x.shape[1])[halo_src]     # (H, Cin)
        ext = jnp.concatenate([x, halo], axis=0)
        acc0 = jnp.zeros((cap_d, w.shape[2]), dtype=x.dtype)

        def step(acc, kslice):
            f, wk = kslice
            return acc + ext[f] @ wk, None

        out, _ = jax.lax.scan(step, acc0, (fwd, w))
        return out[None]

    pspec = P(axis)
    sharded = jax.shard_map(
        conv, mesh=mesh,
        in_specs=(pspec, P(), pspec, pspec, pspec),
        out_specs=pspec, check_vma=False)

    fwd = jnp.asarray(shards.fwd)
    exp_idx = jnp.asarray(shards.export_idx)
    halo_src = jnp.asarray(shards.halo_src)

    def f(x_shards, w):
        return sharded(x_shards, w, fwd, exp_idx, halo_src)

    return jax.jit(f)
