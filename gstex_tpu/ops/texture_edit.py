"""Inverse rasterization for texture painting (``texture_edit``).

Covers ``gstex_cuda.texture_edit.texture_edit`` (reference
``nerfstudio/models/gstex.py:567-606``, settings bit 13): splat an RGBA
canvas back into the texel charts of the surfels visible inside a depth
window. Structurally this is the transpose of the texel-fetch path — per
(pixel, splat): blend weight × bilinear chart weights scattered into chart
space — so it reuses the separable-weight formulation of the renderer.

Returns dense per-Gaussian (Ch, Cw, 5) accumulators with channels
0:3 = Σ w·rgb, 3 = Σ w·α_canvas, 4 = Σ w — the caller normalizes and lerps
(``gstex.py:603-605``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .binning import TileBins, TileGrid
from .camera import Camera
from .rasterize import _pixel_geometry, _splat_local, _tile_pixel_coords
from .surfel import SplatGeom, T_EPS


def _tileize(img, grid: TileGrid):
    """(H, W[, c]) -> (T, P[, c]) matching the renderer's tile order."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    c = img.shape[-1]
    hp = grid.nty * grid.tile_h
    wp = grid.ntx * grid.tile_w
    img = jnp.pad(img, ((0, hp - img.shape[0]), (0, wp - img.shape[1]),
                        (0, 0)))
    img = img.reshape(grid.nty, grid.tile_h, grid.ntx, grid.tile_w, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(grid.num_tiles,
                                               grid.tile_h * grid.tile_w, c)
    return img[..., 0] if squeeze else img


def texture_edit(
    geom: SplatGeom,
    texture_shape: tuple,      # (N, Ch, Cw, _)
    texture_hw: jax.Array,
    bins: TileBins,
    cam: Camera,
    grid: TileGrid,
    canvas_rgb: jax.Array,     # (H, W, 3)
    canvas_alpha: jax.Array,   # (H, W, 1) or (H, W)
    depth_lower: jax.Array,    # (H, W)
    depth_upper: jax.Array,    # (H, W)
) -> jax.Array:
    """Scatter the canvas into chart space. Returns (N, Ch, Cw, 5)."""
    n, ch_pad, cw_pad = texture_shape[0], texture_shape[1], texture_shape[2]
    cam_arrays = (cam.fx, cam.fy, cam.cx, cam.cy, cam.c2w,
                  jnp.zeros((2,), jnp.float32))
    origin, dirs, px = _pixel_geometry(grid, cam_arrays)
    num_tiles, P = px.shape[:2]
    s_cap = bins.ids.shape[1]

    vals = jnp.concatenate([
        _tileize(canvas_rgb, grid),
        _tileize(canvas_alpha.reshape(canvas_rgb.shape[0], -1, 1)[..., :1],
                 grid),
        jnp.ones((num_tiles, P, 1), jnp.float32),
    ], axis=-1)                                              # (T, P, 5)
    lo = _tileize(depth_lower, grid)
    hi = _tileize(depth_upper, grid)

    a_iota = jnp.arange(ch_pad, dtype=jnp.float32)
    b_iota = jnp.arange(cw_pad, dtype=jnp.float32)

    def body(carry, xs):
        T, n_contrib, acc = carry
        s, ids_s, mask_s = xs
        g = jax.tree.map(lambda a: a[ids_s], geom)
        hw = texture_hw[ids_s]
        chart0 = jnp.zeros((ids_s.shape[0], 1, 1, 1), jnp.float32)
        outs = _splat_local(g, chart0, jnp.ones_like(hw), origin, dirs, px)
        a = jnp.where(mask_s[:, None], outs["alpha"], 0.0)

        considered = jnp.logical_and(a > 0.0, n_contrib == s_cap)
        next_T = T * (1.0 - a)
        would_break = jnp.logical_and(considered, next_T <= T_EPS)
        applied = jnp.logical_and(considered, ~would_break)
        w = jnp.where(applied, a * T, 0.0)
        in_window = jnp.logical_and(outs["t"] >= lo, outs["t"] <= hi)
        w_eff = jnp.where(in_window, w, 0.0)

        # separable bilinear scatter weights
        hf = hw[:, 0:1].astype(jnp.float32)
        wf = hw[:, 1:2].astype(jnp.float32)
        x = jnp.clip(outs["uv"][..., 0] * hf, 0.0, hf - 1.0)   # (T, P)
        y = jnp.clip(outs["uv"][..., 1] * wf, 0.0, wf - 1.0)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - a_iota))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[..., None] - b_iota))

        wval = w_eff[..., None] * vals                         # (T, P, 5)
        m = wx[..., :, None] * wval[..., None, :]              # (T,P,Ch,5)
        dchart = jnp.einsum("tpb,tpac->tabc", wy, m)           # (T,Ch,Cw,5)

        acc = acc.at[ids_s].add(dchart)
        T = jnp.where(applied, next_T, T)
        n_contrib = jnp.where(would_break, s, n_contrib)
        return (T, n_contrib, acc), None

    init = (
        jnp.ones((num_tiles, P), jnp.float32),
        jnp.full((num_tiles, P), s_cap, jnp.int32),
        jnp.zeros((n, ch_pad, cw_pad, 5), jnp.float32),
    )
    xs = (jnp.arange(s_cap, dtype=jnp.int32), bins.ids.T, bins.mask.T)
    (_, _, acc), _ = jax.lax.scan(body, init, xs)
    return acc


def apply_edit(cur_texture_rgb: jax.Array, accum: jax.Array,
               eps: float = 1e-6) -> jax.Array:
    """Normalize the (N,Ch,Cw,5) accumulator and lerp into the current RGB
    texture (``gstex.py:603-605``)."""
    weight = accum[..., 3:4] / (accum[..., 4:5] + eps)
    edit_rgb = accum[..., :3] / (accum[..., 3:4] + eps)
    return edit_rgb * weight + cur_texture_rgb * (1.0 - weight)
