"""Pallas TPU rasterizer — fused per-tile blend kernels.

The performance tier of the renderer stack (DESIGN.md), replacing the CUDA
``texture_gaussians`` inner loop (SURVEY.md §2.1 stage 5): one grid cell per
32×32-pixel tile (mapped to the native (8,128) VPU shape), a dynamic-bound
while-loop over the tile's front-to-back splat list with whole-tile early
exit, and the jagged texel fetch expressed as a separable bilinear-weight
matmul on the MXU (gather-free).

Data flow per frame (all static shapes):
  XLA: build per-splat records (N,F) → gather into pair order (F,T,S) and
       transposed charts (T, S·Cw, Ch·3)
  Pallas fwd: per-tile blend → packed channel maps + (T_final, n_contrib)
  Pallas bwd (rasterize_pallas_bwd.py): back-to-front walk emitting per-pair
       record/chart gradients, conflict-free; XLA segment-sums by gaussian id
       and pulls back through the record builder with jax.vjp.

Record layout (F=32), built by ``build_records``:
  0-2  n          surfel normal
  3    a_n        n·(μ−o)
  4-6  b1         ax1/l0          7   a1 = (o−μ)·ax1/l0
  8-10 b2         ax2/l1          11  a2 = (o−μ)·ax2/l1
  12-14 b1u       sg(m0)·sg(ax1)  15  a1u = (o−μ)·b1u   (detached uv frame,
  16-18 b2u       sg(m1)·sg(ax2)  19  a2u = (o−μ)·b2u    gstex.py:975-990)
  20   opacity    21-23 rgb       24-25 xy (projected center)
  26   h          27 w            28-31 reserved
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TileBins, TileGrid
from .camera import Camera
from .surfel import (AA_SIGMA2, ALPHA_CLAMP, ALPHA_CUTOFF, EXTENT_SIGMA,
                     REG_FAR, REG_NEAR, T_EPS, SplatGeom)

F_REC = 32
# packed output channels (each occupying 8 sublanes of the (1, NCH*8, 128)
# output block): img(3) tex(3) depth alpha normal(3) reg | T_final m1
CH_NAMES = ["img0", "img1", "img2", "tex0", "tex1", "tex2", "depth", "alpha",
            "n0", "n1", "n2", "reg", "t_final", "m1"]
NCH = len(CH_NAMES)


def build_records(geom: SplatGeom, origin: jax.Array) -> jax.Array:
    """Per-splat precomputed intersection coefficients (N, F_REC)."""
    om = origin - geom.mean                       # (N,3)
    sg = jax.lax.stop_gradient
    b1 = geom.ax1 / geom.l0[:, None]
    b2 = geom.ax2 / geom.l1[:, None]
    b1u = sg(geom.uv_scale[:, 0:1]) * sg(geom.ax1)
    b2u = sg(geom.uv_scale[:, 1:2]) * sg(geom.ax2)
    cols = [
        geom.normal,                                        # 0-2
        -jnp.sum(om * geom.normal, axis=-1, keepdims=True),  # 3: n·(μ−o)
        b1,                                                 # 4-6
        jnp.sum(om * b1, axis=-1, keepdims=True),           # 7
        b2,                                                 # 8-10
        jnp.sum(om * b2, axis=-1, keepdims=True),           # 11
        b1u,                                                # 12-14
        jnp.sum(om * b1u, axis=-1, keepdims=True),          # 15
        b2u,                                                # 16-18
        jnp.sum(om * b2u, axis=-1, keepdims=True),          # 19
        geom.opacity[:, None],                              # 20
        geom.rgb,                                           # 21-23
        geom.xy,                                            # 24-25
    ]
    rec = jnp.concatenate(cols, axis=-1)
    pad = jnp.zeros((rec.shape[0], F_REC - rec.shape[-1] - 2), rec.dtype)
    return rec, pad  # h/w appended by caller (ints kept separate for grads)


def assemble_records(geom: SplatGeom, origin, texture_hw) -> jax.Array:
    rec, pad = build_records(geom, origin)
    hw = texture_hw.astype(jnp.float32)
    return jnp.concatenate([rec, hw, pad], axis=-1)


def pack_charts(texture: jax.Array) -> jax.Array:
    """(N, Ch, Cw, 3) -> (N, Cw, Ch*3) transposed charts (matmul RHS)."""
    n, ch, cw, c = texture.shape
    return texture.transpose(0, 2, 1, 3).reshape(n, cw, ch * c)


def _cam_info(cam: Camera, px_offset) -> jax.Array:
    flip = jnp.diag(jnp.array([1.0, -1.0, -1.0], jnp.float32))
    R = cam.c2w[:3, :3] @ flip                      # gsplat cam-to-world rot
    o = cam.c2w[:3, 3]
    return jnp.concatenate([
        jnp.stack([cam.fx, cam.fy, cam.cx, cam.cy]),
        jnp.asarray(px_offset, jnp.float32).reshape(2),
        o.reshape(3),
        R.reshape(9),
    ]).astype(jnp.float32)


def _pixel_grids(grid: TileGrid, t, cam_ref):
    """Global pixel coords + world ray dirs for tile t, shaped (8, 128)."""
    th, tw = grid.tile_h, grid.tile_w
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    p = sub * 128 + lane
    ly = (p // tw).astype(jnp.float32)
    lx = (p % tw).astype(jnp.float32)
    ty = (t // grid.ntx).astype(jnp.float32)
    tx = (t % grid.ntx).astype(jnp.float32)
    gx = tx * tw + lx + cam_ref[4]
    gy = ty * th + ly + cam_ref[5]
    fx, fy, cx, cy = cam_ref[0], cam_ref[1], cam_ref[2], cam_ref[3]
    dx = (gx + 0.5 - cx) / fx
    dy = (gy + 0.5 - cy) / fy
    # world dir = R @ (dx, dy, 1)
    d0 = cam_ref[9] * dx + cam_ref[10] * dy + cam_ref[11]
    d1 = cam_ref[12] * dx + cam_ref[13] * dy + cam_ref[14]
    d2 = cam_ref[15] * dx + cam_ref[16] * dy + cam_ref[17]
    return gx, gy, (d0, d1, d2)


def _splat_response(rec, s, dirs, gx, gy):
    """Shared per-splat forward math on (8,128) pixel arrays.

    rec: callable f -> scalar record field. Returns dict of (8,128) arrays.
    """
    d0, d1, d2 = dirs
    nd = rec(0) * d0 + rec(1) * d1 + rec(2) * d2
    abs_nd = jnp.abs(nd)
    safe_nd = jnp.where(abs_nd < 1e-9, jnp.where(nd < 0, -1e-9, 1e-9), nd)
    t_hit = rec(3) / safe_nd

    b1d = rec(4) * d0 + rec(5) * d1 + rec(6) * d2
    b2d = rec(8) * d0 + rec(9) * d1 + rec(10) * d2
    u = rec(7) + t_hit * b1d
    v = rec(11) + t_hit * b2d
    r2 = u * u + v * v
    g_surf = jnp.exp(-0.5 * r2)
    g_surf = jnp.where(r2 <= EXTENT_SIGMA * EXTENT_SIGMA, g_surf, 0.0)

    dpx = gx - rec(24)
    dpy = gy - rec(25)
    r2s = dpx * dpx + dpy * dpy
    g_scr = jnp.exp(-0.5 * r2s / AA_SIGMA2)

    g = jnp.maximum(g_surf, g_scr)
    alpha = jnp.minimum(rec(20) * g, ALPHA_CLAMP)
    alpha = jnp.where(alpha < ALPHA_CUTOFF, 0.0, alpha)
    alpha = jnp.where(t_hit > 1e-6, alpha, 0.0)

    b1ud = rec(12) * d0 + rec(13) * d1 + rec(14) * d2
    b2ud = rec(16) * d0 + rec(17) * d1 + rec(18) * d2
    uv_u = jnp.clip(0.5 + rec(15) + t_hit * b1ud, 0.0, 1.0)
    uv_v = jnp.clip(0.5 + rec(19) + t_hit * b2ud, 0.0, 1.0)

    tc = jnp.maximum(t_hit, REG_NEAR)
    m = (REG_FAR / (REG_FAR - REG_NEAR)) * (1.0 - REG_NEAR / tc)

    flip = jnp.where(nd > 0.0, -1.0, 1.0)
    return {
        "t": t_hit, "alpha": alpha, "u": u, "v": v, "uv_u": uv_u,
        "uv_v": uv_v, "m": m, "flip": flip, "nd": nd, "safe_nd": safe_nd,
        "g_surf": g_surf, "g_scr": g_scr, "g": g, "r2": r2,
        "b1d": b1d, "b2d": b2d, "b1ud": b1ud, "b2ud": b2ud,
        "dpx": dpx, "dpy": dpy,
    }


def _bilinear_weights(coord, size, cap):
    """Separable bilinear weights (8,128,cap) for clamped coord in [0,size-1].

    Texel a of an h-sized axis sits at x = uv*h; weights are
    max(0, 1-|x-a|) with x clamped into [0, h-1] (surfel.py alignment).
    """
    x = jnp.clip(coord, 0.0, size - 1.0)
    a = jax.lax.broadcasted_iota(jnp.float32, (8, 128, cap), 2)
    return jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - a))


def _fetch_texel(charts_ref, s, wy, wx, ch, cw):
    """Separable bilinear fetch: (wy @ chart_t) then contract over Ch rows.

    charts_ref block: (1, S*Cw, Ch*3); rows [s*Cw:(s+1)*Cw] are this splat's
    transposed chart (Cw, Ch*3). Returns 3 arrays (8,128) and the matmul
    intermediate (8,128,Ch*3) reused by the backward.
    """
    chart_t = charts_ref[0, pl.ds(s * cw, cw), :]          # (Cw, Ch*3)
    wy_flat = wy.reshape(8 * 128, cw)
    tmp = jnp.dot(wy_flat, chart_t,
                  preferred_element_type=jnp.float32)       # (P, Ch*3)
    tmp = tmp.reshape(8, 128, ch * 3)
    outs = []
    for c in range(3):
        acc = jnp.zeros((8, 128), jnp.float32)
        for a in range(ch):
            acc = acc + wx[..., a] * tmp[..., a * 3 + c]
        outs.append(acc)
    return outs, tmp


def _fwd_kernel(grid: TileGrid, s_max: int, chart_pad, counts_ref, cam_ref,
                records_ref, charts_ref, out_ref, ncontrib_ref):
    ch_pad, cw_pad = chart_pad
    t = pl.program_id(0)
    count = counts_ref[t]
    gx, gy, dirs = _pixel_grids(grid, t, cam_ref)

    zeros = jnp.zeros((8, 128), jnp.float32)
    init = {name: zeros for name in CH_NAMES if name != "t_final"}
    init["t_final"] = jnp.ones((8, 128), jnp.float32)
    carry0 = (jnp.int32(0), jnp.full((8, 128), s_max, jnp.int32), init)

    def cond(carry):
        s, ncon, acc = carry
        return jnp.logical_and(s < count,
                               jnp.max(acc["t_final"]) > T_EPS)

    def body(carry):
        s, ncon, acc = carry

        def rec(f):
            return records_ref[f, 0, s]

        r = _splat_response(rec, s, dirs, gx, gy)
        a = r["alpha"]
        T = acc["t_final"]

        considered = jnp.logical_and(a > 0.0, ncon == s_max)
        next_T = T * (1.0 - a)
        would_break = jnp.logical_and(considered, next_T <= T_EPS)
        applied = jnp.logical_and(considered, ~would_break)
        w = jnp.where(applied, a * T, 0.0)

        h_g, w_g = rec(26), rec(27)
        wx = _bilinear_weights(r["uv_u"] * h_g, h_g, ch_pad)
        wy = _bilinear_weights(r["uv_v"] * w_g, w_g, cw_pad)
        (tex0, tex1, tex2), _ = _fetch_texel(charts_ref, s, wy, wx,
                                             ch_pad, cw_pad)

        m = r["m"]
        new_acc = dict(acc)
        new_acc["img0"] = acc["img0"] + w * rec(21)
        new_acc["img1"] = acc["img1"] + w * rec(22)
        new_acc["img2"] = acc["img2"] + w * rec(23)
        new_acc["tex0"] = acc["tex0"] + w * tex0
        new_acc["tex1"] = acc["tex1"] + w * tex1
        new_acc["tex2"] = acc["tex2"] + w * tex2
        new_acc["depth"] = acc["depth"] + w * r["t"]
        new_acc["n0"] = acc["n0"] + w * r["flip"] * rec(0)
        new_acc["n1"] = acc["n1"] + w * r["flip"] * rec(1)
        new_acc["n2"] = acc["n2"] + w * r["flip"] * rec(2)
        new_acc["reg"] = acc["reg"] + 2.0 * w * (m * acc["alpha"] - acc["m1"])
        new_acc["alpha"] = acc["alpha"] + w
        new_acc["m1"] = acc["m1"] + w * m
        new_acc["t_final"] = jnp.where(applied, next_T, T)
        ncon = jnp.where(would_break, s, ncon)
        return (s + 1, ncon, new_acc)

    _, ncontrib, acc = jax.lax.while_loop(cond, body, carry0)
    for i, name in enumerate(CH_NAMES):
        out_ref[0, pl.ds(i * 8, 8), :] = acc[name]
    ncontrib_ref[0] = ncontrib


class PallasInputs(NamedTuple):
    records_t: jax.Array   # (F, T, S)
    charts_g: jax.Array    # (T, S*Cw, Ch*3)
    counts: jax.Array      # (T,) int32 (clamped to s_max)
    cam_info: jax.Array    # (18,)


def prepare_pallas_inputs(geom, texture_packed, texture_hw, bins: TileBins,
                          cam: Camera, px_offset=None) -> PallasInputs:
    if px_offset is None:
        px_offset = jnp.zeros((2,), jnp.float32)
    origin = cam.c2w[:3, 3]
    records = assemble_records(geom, origin, texture_hw)    # (N, F)
    rec_pairs = records[bins.ids]                           # (T, S, F)
    records_t = rec_pairs.transpose(2, 0, 1)                # (F, T, S)
    charts_g = texture_packed[bins.ids]                     # (T, S, Cw, Ch3)
    tt, ss, cw, ch3 = charts_g.shape
    charts_g = charts_g.reshape(tt, ss * cw, ch3)
    s_max = bins.ids.shape[1]
    counts = jnp.minimum(bins.counts, s_max)
    return PallasInputs(records_t, charts_g, counts,
                        _cam_info(cam, px_offset))


def rasterize_pallas_fwd(grid: TileGrid, chart_pad, inputs: PallasInputs,
                         interpret: bool = False):
    """Run the forward kernel. Returns (maps dict of (T,8,128), ncontrib)."""
    f, num_tiles, s_max = inputs.records_t.shape
    kernel = functools.partial(_fwd_kernel, grid, s_max, chart_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((F_REC, 1, s_max), lambda t, c, cam: (0, t, 0)),
            pl.BlockSpec((1, s_max * chart_pad[1], chart_pad[0] * 3),
                         lambda t, c, cam: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, NCH * 8, 128), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda t, c, cam: (t, 0, 0)),
        ],
    )
    out, ncontrib = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, NCH * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 8, 128), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(inputs.counts, inputs.cam_info, inputs.records_t, inputs.charts_g)
    maps = {name: out[:, i * 8:(i + 1) * 8, :]
            for i, name in enumerate(CH_NAMES)}
    return maps, ncontrib


def untile_packed(arr: jax.Array, grid: TileGrid) -> jax.Array:
    """(T, 8, 128) kernel-layout map -> (H, W) image."""
    th, tw = grid.tile_h, grid.tile_w
    img = arr.reshape(grid.nty, grid.ntx, th, tw)
    img = img.transpose(0, 2, 1, 3).reshape(grid.nty * th, grid.ntx * tw)
    return img[: grid.height, : grid.width]
