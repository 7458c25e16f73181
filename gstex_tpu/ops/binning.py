"""Tile binning: pair expansion, depth sort, dense per-tile lists (pure XLA).

The TPU-native replacement for the CUDA rasterizer's intersection-pair stages
(inferred stages 2–4 of ``gstex_cuda.texture.texture_gaussians``, SURVEY.md
§2.1): instead of dynamic allocation + radix sort, pairs are expanded to a
static capacity with ``searchsorted`` over a prefix sum, ordered with one
lexicographic ``lax.sort`` on (tile, depth, id), and scattered into dense
padded per-tile lists that every renderer tier consumes. All shapes static;
overflow is counted, never silent.

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


def build_tile_bins(
    centers: jax.Array,
    extents: jax.Array,
    depths: jax.Array,
    valid: jax.Array,
    grid: TileGrid,
    pair_cap: int,
    s_max: int,
) -> TileBins:
    """Expand (gaussian, tile) pairs, sort by (tile, depth, id), densify.

    Args:
        centers, extents: (N,2) screen AABBs (`surfel_aabb_2d`).
        depths: (N,) view z of gaussian centers (sort key, as in gsplat).
        valid: (N,) bool cull mask.
        pair_cap: static capacity for the expanded pair list.
        s_max: static per-tile list capacity.
    """
    n = centers.shape[0]
    tx0, ty0, tw, counts = tile_ranges(centers, extents, grid, valid)
    counts = jnp.where(depths > 1e-6, counts, 0)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1] if n > 0 else jnp.int32(0)

    # pair k -> owning gaussian via binary search on the prefix sum
    k = jnp.arange(pair_cap, dtype=jnp.int32)
    gid = jnp.searchsorted(offsets + counts, k, side="right").astype(jnp.int32)
    gid = jnp.minimum(gid, n - 1)
    local = k - offsets[gid]
    w_g = jnp.maximum(tw[gid], 1)
    ty = ty0[gid] + local // w_g
    tx = tx0[gid] + local % w_g
    tile = ty * grid.ntx + tx
    pair_valid = k < total
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
