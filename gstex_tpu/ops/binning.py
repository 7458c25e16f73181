"""Tile binning: pair expansion, depth ordering, dense per-tile lists (XLA).

The TPU-native replacement for the CUDA rasterizer's intersection-pair stages
(inferred stages 2–4 of ``gstex_cuda.texture.texture_gaussians``, SURVEY.md
§2.1). Two strategies, both all-static-shape with counted (never silent)
overflow:

- **sort** (default): expand pairs to ``pair_cap`` with a scatter+cummax
  segment-id map over the count prefix sum (NOT ``searchsorted`` — the
  binary-search gather costs ~120 ms at 1M pairs on-chip vs ~5 ms for the
  running max) and order with one lexicographic ``lax.sort`` on
  (tile, depth, id) (~8 ms at 1M — cheap on TPU).
- **coverage**: no pair-level sort at all — depth-argsort the N gaussians
  once (stable → ties break by id, matching the reference's (depth, id)
  key), then each pair's within-tile rank is rank(g, t) = #{shallower
  gaussians covering tile t}, a gaussian-axis prefix sum of the
  (N, num_tiles) AABB coverage indicator. Measures slightly slower than
  the sort path at 800²/50k (rank-table gather dominates) but has no
  pair_cap-sized sort; kept selectable for large-pair regimes.

Also provides ``get_num_tiles_hit`` mirroring
``gstex_cuda.get_aabb_2d.get_num_tiles_hit_2d`` (``gstex.py:1080,1127``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileGrid(NamedTuple):
    height: int
    width: int
    tile_h: int
    tile_w: int

    @property
    def ntx(self) -> int:
        return -(-self.width // self.tile_w)

    @property
    def nty(self) -> int:
        return -(-self.height // self.tile_h)

    @property
    def num_tiles(self) -> int:
        return self.ntx * self.nty


class TileBins(NamedTuple):
    """Dense per-tile splat lists, front-to-back within each tile."""

    ids: jax.Array          # (num_tiles, s_max) int32 gaussian ids (0 where invalid)
    mask: jax.Array         # (num_tiles, s_max) bool
    counts: jax.Array       # (num_tiles,) int32 — pre-truncation per-tile pair counts
    num_tiles_hit: jax.Array  # (N,) int32 per-gaussian tile counts
    total_pairs: jax.Array  # () int32 — true pair count (pre-cap)
    overflow: jax.Array     # () int32 — pairs dropped by pair_cap/s_max


# slot alignment of per-tile segments in the flat pair-major layout: each
# tile's segment starts at a multiple of this, so dynamic-offset DMAs of
# (CHUNK, F) record slices and chart-grad blocks are tile-aligned on the
# f32 (8, 128) HBM tiling. Must be a multiple of the kernels' CHUNK.
SLOT_ALIGN = 16


class FlatBins(NamedTuple):
    """Flat pair-major splat lists: the dense (T, s_max) layout wastes
    mean-count→max-count on every HBM buffer it touches (records gather,
    pair-space chart grads, their segment reductions). Here pairs live in
    ONE flat array ordered (tile, depth, id) with each tile's segment
    start aligned to SLOT_ALIGN; every buffer is sized by the true pair
    count (+ alignment), not ``T·s_max``. The CUDA reference uses the
    same shape (sorted pair list + per-tile ranges — its
    ``isect_offsets``); the v4 dense lists remain for the older kernels.

    ``s_cap`` bounds only per-tile walk state (SMEM id window, VMEM
    chart-grad scratch), not any HBM buffer.
    """

    gids: jax.Array         # (slot_cap,) int32 pair gaussian ids (0 in pad slots)
    slot_valid: jax.Array   # (slot_cap,) bool — real pair (not alignment pad)
    starts: jax.Array       # (num_tiles,) int32 SLOT_ALIGN-aligned segment starts
    counts: jax.Array       # (num_tiles,) int32 true per-tile counts (pre-clamp)
    num_tiles_hit: jax.Array  # (N,) int32 per-gaussian tile counts
    total_pairs: jax.Array  # () int32 — true pair count (pre-cap)
    overflow: jax.Array     # () int32 — pairs dropped by pair_cap/s_cap


def tile_ranges(centers, extents, grid: TileGrid, valid):
    """Clamped inclusive-exclusive tile index ranges per gaussian."""
    tx0 = jnp.clip(jnp.floor((centers[:, 0] - extents[:, 0]) / grid.tile_w), 0, grid.ntx).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((centers[:, 0] + extents[:, 0]) / grid.tile_w) + 1, 0, grid.ntx).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((centers[:, 1] - extents[:, 1]) / grid.tile_h), 0, grid.nty).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((centers[:, 1] + extents[:, 1]) / grid.tile_h) + 1, 0, grid.nty).astype(jnp.int32)
    w = jnp.maximum(tx1 - tx0, 0)
    h = jnp.maximum(ty1 - ty0, 0)
    counts = jnp.where(valid, w * h, 0).astype(jnp.int32)
    return tx0, ty0, w, counts


def get_num_tiles_hit(centers, extents, grid: TileGrid, valid) -> jax.Array:
    """Per-gaussian overlapped-tile counts (``get_num_tiles_hit_2d`` parity)."""
    _, _, _, counts = tile_ranges(centers, extents, grid, valid)
    return counts


def _pair_owner(counts: jax.Array, offsets: jax.Array,
                pair_cap: int) -> jax.Array:
    """Owning-gaussian index for each pair slot 0..pair_cap-1.

    Equivalent to ``searchsorted(offsets+counts, arange(pair_cap), 'right')``
    but TPU-cheap: the queries are consecutive integers, so scatter each
    gaussian's index at its segment start and take a running max (~5 ms vs
    ~120 ms for the binary-search gather at 1M pairs on-chip)."""
    n = counts.shape[0]
    g = jnp.arange(n, dtype=jnp.int32)
    mark = jnp.zeros((pair_cap,), jnp.int32).at[
        jnp.where(counts > 0, offsets, pair_cap)].set(g + 1, mode="drop")
    gid = jax.lax.cummax(mark) - 1
    # slots before the first segment / past the total stay in-range
    return jnp.clip(gid, 0, n - 1)


# coverage-table budget: N * num_tiles int32 entries (bytes = 4x this)
_COVERAGE_BUDGET = 128 * 1024 * 1024


def build_tile_bins(
    centers: jax.Array,
    extents: jax.Array,
    depths: jax.Array,
    valid: jax.Array,
    grid: TileGrid,
    pair_cap: int,
    s_max: int,
    method: str = "auto",
    cull_fn=None,
) -> TileBins:
    """Expand (gaussian, tile) pairs, depth-order per tile, densify.

    Args:
        centers, extents: (N,2) screen AABBs (`surfel_aabb_2d`).
        depths: (N,) view z of gaussian centers (sort key, as in gsplat).
        valid: (N,) bool cull mask.
        pair_cap: static capacity for the expanded pair list.
        s_max: static per-tile list capacity.
        method: "coverage" | "sort" | "auto" (coverage unless the N×T
            indicator table would exceed the memory budget).
        cull_fn: optional per-pair cull ``(gid, tx, ty) -> keep`` applied
            before the sort (see ``ops.cull.make_pair_cull``); dropped pairs
            vanish from the dense lists and tile counts (output-identical
            when the cull is conservative w.r.t. the kernel alpha cutoff).
    """
    n = centers.shape[0]
    if method == "auto":
        # on-chip: sort 88 ms vs coverage 103 ms at 1M pair_cap / 50k
        # gaussians (the lex sort is ~8 ms; coverage's rank-table gather
        # costs more than it saves) — the sort path also has no N·T table
        method = "sort"
    if method == "coverage":
        if cull_fn is not None:
            raise ValueError("cull_fn requires method='sort' (coverage "
                             "ranks assume un-culled pair sets)")
        return _build_tile_bins_coverage(centers, extents, depths, valid,
                                         grid, pair_cap, s_max)
    tx0, ty0, tw, counts = tile_ranges(centers, extents, grid, valid)
    counts = jnp.where(depths > 1e-6, counts, 0)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1] if n > 0 else jnp.int32(0)

    # pair k -> owning gaussian via running max over segment starts
    k = jnp.arange(pair_cap, dtype=jnp.int32)
    gid = _pair_owner(counts, offsets, pair_cap)
    local = k - offsets[gid]
    w_g = jnp.maximum(tw[gid], 1)
    ty = ty0[gid] + local // w_g
    tx = tx0[gid] + local % w_g
    tile = ty * grid.ntx + tx
    pair_valid = k < total
    if cull_fn is not None:
        pair_valid = jnp.logical_and(pair_valid, cull_fn(gid, tx, ty))
    tile = jnp.where(pair_valid, tile, grid.num_tiles)  # sentinel sorts last

    # lexicographic sort by (tile, depth, id) — stable front-to-back order
    depth_k = depths[gid]
    tile_s, _, gid_s = jax.lax.sort(
        (tile, depth_k, gid), num_keys=3)

    # per-tile start offsets and within-tile ranks
    tile_ids = jnp.arange(grid.num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_s, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_s, tile_ids, side="right").astype(jnp.int32)
    tile_counts = ends - starts
    rank = k - starts[jnp.minimum(tile_s, grid.num_tiles - 1)]

    in_range = jnp.logical_and(tile_s < grid.num_tiles, rank < s_max)
    flat_idx = jnp.where(in_range, tile_s * s_max + rank, grid.num_tiles * s_max)
    ids_dense = jnp.zeros((grid.num_tiles * s_max,), jnp.int32).at[flat_idx].set(
        gid_s, mode="drop").reshape(grid.num_tiles, s_max)
    mask_dense = jnp.zeros((grid.num_tiles * s_max,), bool).at[flat_idx].set(
        True, mode="drop").reshape(grid.num_tiles, s_max)

    overflow = jnp.maximum(total - pair_cap, 0) + jnp.sum(
        jnp.maximum(tile_counts - s_max, 0))
    return TileBins(
        ids=ids_dense,
        mask=mask_dense,
        counts=tile_counts,
        num_tiles_hit=counts,
        total_pairs=total,
        overflow=overflow.astype(jnp.int32),
    )


def flat_slot_cap(pair_cap: int, num_tiles: int) -> int:
    """Static flat-buffer capacity: every real pair + worst-case per-tile
    alignment padding."""
    return pair_cap + SLOT_ALIGN * num_tiles


def settle_caps(total_pairs: int, max_tile_count: int) -> tuple[int, int]:
    """Demand-based static capacities: what the trainer's overflow-driven
    growth converges to for a scene with the given measured pair demand
    (``total_pairs`` pre-truncation, ``max_tile_count`` the hottest tile's
    pair count). 1.5x / 1.25x headroom, quantized so nearby scenes share a
    compilation. Every pair-space op (expansion, cull, sort, scatter,
    grad reductions) scales with pair_cap, so demand sizing beats blind
    power-of-2 doubling (~2x over-provision in the worst case)."""
    pair_cap = max(1 << 16, -(-int(1.5 * total_pairs) // 65536) * 65536)
    s_cap = max(256, -(-int(1.25 * max_tile_count) // 256) * 256)
    return min(pair_cap, 1 << 23), min(s_cap, 4096)


def build_tile_bins_flat(
    centers: jax.Array,
    extents: jax.Array,
    depths: jax.Array,
    valid: jax.Array,
    grid: TileGrid,
    pair_cap: int,
    s_cap: int,
    cull_fn=None,
) -> FlatBins:
    """Pair-major flat binning (see ``FlatBins``): same expansion, cull and
    (tile, depth, id) sort as ``build_tile_bins``, but pairs land in one
    flat slot array with SLOT_ALIGN-aligned per-tile segments instead of a
    dense (T, s_max) matrix.

    ``s_cap`` clamps per-tile counts (walk/scratch bound); clamped pairs
    are counted in ``overflow`` exactly like the dense path's s_max.
    """
    n = centers.shape[0]
    nt = grid.num_tiles
    assert pair_cap <= 1 << 24, "f32-packed offsets need pair_cap <= 2^24"
    tx0, ty0, tw, counts = tile_ranges(centers, extents, grid, valid)
    counts = jnp.where(depths > 1e-6, counts, 0)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1] if n > 0 else jnp.int32(0)

    gid = _pair_owner(counts, offsets, pair_cap)
    # ONE per-pair row gather for everything per-gaussian the pipeline
    # needs — AABB origin/width, pair offset, sort depth, and the cull's
    # coefficient table. Separate (N,) gathers measured ~6x slower at 512k
    # pair slots on-chip (scripts_dev/tpu_binstages.py); all int columns
    # are small enough to round-trip f32 exactly (pair_cap <= 2^24).
    cols = [tx0.astype(jnp.float32), ty0.astype(jnp.float32),
            tw.astype(jnp.float32), offsets.astype(jnp.float32), depths]
    fused_cull = cull_fn is not None and hasattr(cull_fn, "table")
    table = jnp.stack(cols, axis=1)
    if fused_cull:
        table = jnp.concatenate([table, cull_fn.table], axis=1)
    # transpose ONCE to quantities-on-rows (C, P): every per-pair column
    # below is then a free (1, P) row slice. In P-major form each column
    # extraction is an (8,128)->(1024) relayout — the slice_reduce fusions
    # cost 6.5 ms/step at 393k pairs in the round-3 trace.
    rowT = table[gid].T                                       # (C, P)
    k2 = jax.lax.broadcasted_iota(jnp.int32, (1, pair_cap), 1)
    local = k2 - rowT[3:4].astype(jnp.int32)
    w_g = jnp.maximum(rowT[2:3].astype(jnp.int32), 1)
    ty2 = rowT[1:2].astype(jnp.int32) + local // w_g
    tx2 = rowT[0:1].astype(jnp.int32) + local % w_g
    tile2 = ty2 * grid.ntx + tx2
    pair_valid = k2 < total
    if fused_cull:
        pair_valid = jnp.logical_and(
            pair_valid, cull_fn.eval_rows_t(rowT[5:], tx2, ty2))
    elif cull_fn is not None:
        pair_valid = jnp.logical_and(
            pair_valid, cull_fn(gid, tx2.reshape(-1),
                                ty2.reshape(-1)).reshape(1, -1))
    tile2 = jnp.where(pair_valid, tile2, nt)  # sentinel sorts last
    tile = tile2.reshape(pair_cap)
    depth_k = rowT[4:5].reshape(pair_cap)

    tile_s, _, gid_s = jax.lax.sort((tile, depth_k, gid), num_keys=3)

    tile_ids = jnp.arange(nt, dtype=jnp.int32)
    seg0 = jnp.searchsorted(tile_s, tile_ids, side="left").astype(jnp.int32)
    seg1 = jnp.searchsorted(tile_s, tile_ids, side="right").astype(jnp.int32)
    tile_counts = seg1 - seg0
    clamped = jnp.minimum(tile_counts, s_cap)
    padded = -(-clamped // SLOT_ALIGN) * SLOT_ALIGN
    starts = (jnp.cumsum(padded) - padded).astype(jnp.int32)

    # one (nt, 2) row gather for (segment start, slot start), kept 2-D
    ssT = jnp.stack([seg0, starts], axis=1)[
        jnp.minimum(tile_s, nt - 1)].T                        # (2, P)
    k1r = jax.lax.broadcasted_iota(jnp.int32, (1, pair_cap), 1)
    rank2 = k1r - ssT[0:1]
    slot_cap = flat_slot_cap(pair_cap, nt)
    in_range = jnp.logical_and(tile_s.reshape(1, -1) < nt, rank2 < s_cap)
    slot = jnp.where(in_range, ssT[1:2] + rank2,
                     slot_cap).reshape(pair_cap)
    # single scatter: store gid+1 so validity rides along (0 = empty slot)
    g1 = jnp.zeros((slot_cap,), jnp.int32).at[slot].set(gid_s + 1,
                                                        mode="drop")
    gids = jnp.maximum(g1 - 1, 0)
    slot_valid = g1 > 0

    overflow = jnp.maximum(total - pair_cap, 0) + jnp.sum(
        jnp.maximum(tile_counts - s_cap, 0))
    return FlatBins(
        gids=gids,
        slot_valid=slot_valid,
        starts=starts,
        counts=tile_counts,
        num_tiles_hit=counts,
        total_pairs=total.astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
    )


def _build_tile_bins_coverage(centers, extents, depths, valid, grid: TileGrid,
                              pair_cap: int, s_max: int) -> TileBins:
    """Sort-free binning: ranks from a gaussian-axis coverage prefix sum."""
    n = centers.shape[0]
    nt = grid.num_tiles
    tx0, ty0, tw, counts = tile_ranges(centers, extents, grid, valid)
    counts = jnp.where(depths > 1e-6, counts, 0)

    # depth order over gaussians (stable argsort → ties break by id, the
    # reference's (depth, id) lexicographic key); culled ones sort last
    key = jnp.where(counts > 0, depths, jnp.inf)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    tx0_s, ty0_s, tw_s = tx0[order], ty0[order], tw[order]
    counts_s = counts[order]
    th_s = jnp.where(tw_s > 0, counts_s // jnp.maximum(tw_s, 1), 0)

    # (N, nty, ntx) AABB coverage indicator → chunked exclusive prefix sum
    # along the gaussian axis: base[g, t] = #{g' < g covering t} = the
    # within-tile depth rank of the (g, t) pair.
    ys = jnp.arange(grid.nty, dtype=jnp.int32)
    xs = jnp.arange(grid.ntx, dtype=jnp.int32)
    cov_y = jnp.logical_and(ty0_s[:, None] <= ys,
                            ys < (ty0_s + th_s)[:, None])
    cov_x = jnp.logical_and(tx0_s[:, None] <= xs,
                            xs < (tx0_s + tw_s)[:, None])
    cov = (cov_y[:, :, None] & cov_x[:, None, :]).reshape(n, nt)
    cov = cov.astype(jnp.int32)

    blk = 256
    n_pad = -(-n // blk) * blk
    cov_p = jnp.pad(cov, ((0, n_pad - n), (0, 0))).reshape(-1, blk, nt)
    intra = jnp.cumsum(cov_p, axis=1)                    # inclusive in-chunk
    chunk_tot = intra[:, -1, :]                          # (nc, nt)
    chunk_base = jnp.cumsum(chunk_tot, axis=0) - chunk_tot
    base_incl = (intra + chunk_base[:, None, :]).reshape(n_pad, nt)[:n]
    base_excl = base_incl - cov                          # (N, nt) ranks
    tile_counts = (chunk_base[-1] + chunk_tot[-1]).astype(jnp.int32)

    # pair expansion in depth-major order (prefix sum + binary search); all
    # pairs of shallower gaussians precede ours, so ranks are cap-consistent
    offsets = jnp.cumsum(counts_s) - counts_s
    total = (offsets[-1] + counts_s[-1] if n > 0 else jnp.int32(0))
    k = jnp.arange(pair_cap, dtype=jnp.int32)
    gs = _pair_owner(counts_s, offsets, pair_cap)
    local = k - offsets[gs]
    w_g = jnp.maximum(tw_s[gs], 1)
    tile = (ty0_s[gs] + local // w_g) * grid.ntx + (tx0_s[gs] + local % w_g)
    rank = base_excl.reshape(-1)[gs * nt + tile]
    pair_valid = k < total

    in_range = jnp.logical_and(pair_valid, rank < s_max)
    flat_idx = jnp.where(in_range, tile * s_max + rank, nt * s_max)
    gid_orig = order[gs]
    ids_dense = jnp.zeros((nt * s_max,), jnp.int32).at[flat_idx].set(
        gid_orig, mode="drop").reshape(nt, s_max)
    mask_dense = jnp.zeros((nt * s_max,), bool).at[flat_idx].set(
        True, mode="drop").reshape(nt, s_max)

    overflow = jnp.maximum(total - pair_cap, 0) + jnp.sum(
        jnp.maximum(tile_counts - s_max, 0))
    return TileBins(
        ids=ids_dense,
        mask=mask_dense,
        counts=tile_counts,
        num_tiles_hit=counts,
        total_pairs=total.astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
    )
