"""Pallas TPU rasterizer — fused per-tile blend kernels.

The performance tier of the renderer stack (DESIGN.md), replacing the CUDA
``texture_gaussians`` inner loop (SURVEY.md §2.1 stage 5): one grid cell per
32×32-pixel tile (mapped to the native (8,128) VPU shape), a dynamic-bound
while-loop over CHUNK-sized groups of the tile's front-to-back splat list
with whole-tile early exit. Per chunk, the intersection/falloff math is
vectorized over (CHUNK, 8, 128); the blend recurrence and the jagged texel
fetch (separable bilinear weights contracted on the MXU — gather-free)
unroll over the CHUNK splats. All memory accesses are aligned vector loads:
Mosaic forbids dynamic scalar indexing on the lane axis, so per-splat fields
are read as (CHUNK, F) row blocks.

Data flow per frame (all static shapes):
  XLA: build per-splat records (N,F) → gather into pair order (T,S,F) and
       transposed charts (T, S·Cw', Ch·3)
  Pallas fwd: per-tile blend → packed channel maps + (T_final, n_contrib)
  Pallas bwd (rasterize_pallas_bwd.py): back-to-front walk emitting per-pair
       record/chart gradients, conflict-free; the XLA caller turns pair
       grads into parameter grads through the differentiable record builder.

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
CHUNK = 4  # splats processed per loop iteration (aligned row blocks)
# packed output channels (each occupying 8 sublanes of the (1, NCH*8, 128)
# output block): img(3) tex(3) depth alpha normal(3) reg | T_final m1
CH_NAMES = ["img0", "img1", "img2", "tex0", "tex1", "tex2", "depth", "alpha",
            "n0", "n1", "n2", "reg", "t_final", "m1"]
NCH = len(CH_NAMES)


def build_records(geom: SplatGeom, origin: jax.Array):
    """Per-splat precomputed intersection coefficients (N, F_REC-2)."""
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
    return jnp.concatenate(cols, axis=-1)


def assemble_records(geom: SplatGeom, origin, texture_hw) -> jax.Array:
    rec = build_records(geom, origin)
    hw = texture_hw.astype(jnp.float32)
    pad = jnp.zeros((rec.shape[0], F_REC - rec.shape[-1] - 2), rec.dtype)
    return jnp.concatenate([rec, hw, pad], axis=-1)


CH3_PAD = 128  # DMA slices must be 128-aligned on the minor dim


def pack_charts(texture: jax.Array) -> jax.Array:
    """(N, Ch, Cw, 3) -> (N, Cw', 128) transposed charts (matmul RHS).

    Cw' pads to a multiple of 8 (aligned per-splat row blocks); the channel
    dim (Ch·3) pads to 128 because Mosaic DMA slices must be tile-aligned on
    the minor axis — in VMEM the lanes pad to 128 regardless, so only the
    transient HBM pair buffer pays for it."""
    n, ch, cw, c = texture.shape
    assert ch * c <= CH3_PAD
    t = texture.transpose(0, 2, 1, 3).reshape(n, cw, ch * c)
    cw_pad = -(-cw // 8) * 8
    return jnp.pad(t, ((0, 0), (0, cw_pad - cw), (0, CH3_PAD - ch * c)))


def _cam_info(cam: Camera, px_offset) -> jax.Array:
    flip = jnp.diag(jnp.array([1.0, -1.0, -1.0], jnp.float32))
    # HIGHEST: a bf16 MXU pass here rounds the rotation fed to the
    # kernel's per-pixel ray dirs (cam_ref[9:18]) to ~4e-3 rel —
    # the round-4/5 trained-state consistency failure class
    R = jnp.matmul(cam.c2w[:3, :3], flip,
                   precision=jax.lax.Precision.HIGHEST)
    o = cam.c2w[:3, 3]
    return jnp.concatenate([
        jnp.stack([cam.fx, cam.fy, cam.cx, cam.cy]),
        jnp.asarray(px_offset, jnp.float32).reshape(2),
        o.reshape(3),
        R.reshape(9),
    ]).astype(jnp.float32)


def _lane_bc(v):
    """(A, 1) -> (A, 128): Mosaic supports single-dim broadcasts only, and
    XLA folds jnp.broadcast_to chains back into one both-dims broadcast, so
    the lane widening uses the TPU-native repeat primitive (opaque to the
    XLA simplifier); later elementwise ops broadcast the sublane dim."""
    return pltpu.repeat(v, 128, axis=1)


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


def _chunk_response(chunk, valid, dirs, gx, gy):
    """Vectorized per-splat forward math for a (CHUNK, F) record block.

    Returns a dict of (CHUNK, 8, 128) arrays. ``valid`` is a (CHUNK,1,1)
    0/1 mask for tail splats beyond the tile's count.
    """
    def col(f):
        return _lane_bc(chunk[:, f:f + 1])[:, None, :]   # (K,1,128)

    d0, d1, d2 = (d[None] for d in dirs)             # (1,8,128)
    gxb, gyb = gx[None], gy[None]

    nd = col(0) * d0 + col(1) * d1 + col(2) * d2
    abs_nd = jnp.abs(nd)
    safe_nd = jnp.where(abs_nd < 1e-9, jnp.where(nd < 0, -1e-9, 1e-9), nd)
    t_hit = col(3) / safe_nd

    b1d = col(4) * d0 + col(5) * d1 + col(6) * d2
    b2d = col(8) * d0 + col(9) * d1 + col(10) * d2
    u = col(7) + t_hit * b1d
    v = col(11) + t_hit * b2d
    r2 = u * u + v * v
    g_surf = jnp.exp(-0.5 * r2)
    g_surf = jnp.where(r2 <= EXTENT_SIGMA * EXTENT_SIGMA, g_surf, 0.0)

    dpx = gxb - col(24)
    dpy = gyb - col(25)
    r2s = dpx * dpx + dpy * dpy
    g_scr = jnp.exp(-0.5 * r2s / AA_SIGMA2)

    g = jnp.maximum(g_surf, g_scr)
    alpha = jnp.minimum(col(20) * g, ALPHA_CLAMP)
    alpha = jnp.where(alpha < ALPHA_CUTOFF, 0.0, alpha)
    alpha = jnp.where(t_hit > 1e-6, alpha, 0.0)
    alpha = alpha * valid

    b1ud = col(12) * d0 + col(13) * d1 + col(14) * d2
    b2ud = col(16) * d0 + col(17) * d1 + col(18) * d2
    uv_u = jnp.clip(0.5 + col(15) + t_hit * b1ud, 0.0, 1.0)
    uv_v = jnp.clip(0.5 + col(19) + t_hit * b2ud, 0.0, 1.0)

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
    """Separable bilinear weights (8,128,cap) for a (8,128) coord.

    Texel a of an h-sized axis sits at x = uv*h; weights are
    max(0, 1-|x-a|) with x clamped into [0, h-1] (surfel.py alignment).
    ``size`` is a (1,1) array (broadcasts)."""
    x = jnp.clip(coord, 0.0, size - 1.0)
    a = jax.lax.broadcasted_iota(jnp.int32, (8, 128, cap), 2).astype(
        jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - a))


def _chart_slice(charts_ref, c, k, cw_blk):
    """Aligned (Cw', Ch*3) chart rows for splat k of chunk c (k may be
    traced; cw_blk is a multiple of 8 so the offset is provably aligned)."""
    base = pl.multiple_of(c * (CHUNK * cw_blk) + k * cw_blk, 8)
    return charts_ref[0, pl.ds(base, cw_blk), :]


def _chart_dma(charts_hbm, t, c, cw_blk, chart_buf, chart_sem, slot,
               chunk=None):
    """Async copy of chunk c's chart rows (HBM -> VMEM slot). The charts
    stay in HBM (pl.ANY) and stream per chunk — as VMEM-pipelined blocks
    they alone would blow the default VMEM budget. ``chunk`` defaults to
    this module's CHUNK; kernels with a different chunk size must pass
    their own."""
    rows = (chunk if chunk is not None else CHUNK) * cw_blk
    base = pl.multiple_of(c * rows, 8)
    return pltpu.make_async_copy(
        charts_hbm.at[t, pl.ds(base, rows), :],
        chart_buf.at[slot],
        chart_sem.at[slot],
    )


import os as _os

_DEBUG_SKIP = _os.environ.get("GSTEX_PALLAS_SKIP", "")


def _fetch_texel(chart_t, wy, wx, ch_pad, cw_blk):
    """Separable bilinear fetch for ONE splat: (wy @ chart_t) then contract
    over Ch. Returns ([r,g,b] each (8,128), matmul intermediate)."""
    if "fetch" in _DEBUG_SKIP:  # perf-isolation hook (dev only)
        z = wx[..., 0] * 0.0
        return [z, z, z], jnp.zeros((8, 128, chart_t.shape[-1]), jnp.float32)
    if "matmul" in _DEBUG_SKIP:
        tmp = jnp.broadcast_to((wy[..., 0] + chart_t[0, 0])[..., None],
                               (8, 128, chart_t.shape[-1]))
        outs = []
        for cc in range(3):
            acc = jnp.zeros((8, 128), jnp.float32)
            for aa in range(ch_pad):
                acc = acc + wx[..., aa] * tmp[..., aa * 3 + cc]
            outs.append(acc)
        return outs, tmp
    wy_flat = wy.reshape(8 * 128, cw_blk)
    tmp = jnp.dot(wy_flat, chart_t,
                  preferred_element_type=jnp.float32)       # (P, CH3_PAD)
    tmp = tmp.reshape(8, 128, chart_t.shape[-1])
    outs = []
    for cc in range(3):
        acc = jnp.zeros((8, 128), jnp.float32)
        for aa in range(ch_pad):
            acc = acc + wx[..., aa] * tmp[..., aa * 3 + cc]
        outs.append(acc)
    return outs, tmp


# scratch field registry: per-chunk response staged in a VMEM scratch ref so
# the inner fori can read per-splat slices with dynamic MAJOR-dim ref
# indexing (the one dynamic-index pattern Mosaic supports everywhere)
RESP_FIELDS = [
    "alpha", "t", "uv_u", "uv_v", "m", "flip",          # 0-5
    "g", "g_surf", "g_scr", "r2", "u", "v",             # 6-11
    "b1d", "b2d", "b1ud", "b2ud", "nd", "safe_nd",      # 12-17
    "dpx", "dpy",                                        # 18-19
    "c_h", "c_w", "c_op", "c_a1u", "c_a2u",              # 20-24 (record cols)
    "c_rgb0", "c_rgb1", "c_rgb2", "c_n0", "c_n1", "c_n2",  # 25-30
]
RESP_IDX = {n: i for i, n in enumerate(RESP_FIELDS)}
N_RESP = len(RESP_FIELDS)
_COL_OF = {"c_h": 26, "c_w": 27, "c_op": 20, "c_a1u": 15, "c_a2u": 19,
           "c_rgb0": 21, "c_rgb1": 22, "c_rgb2": 23, "c_n0": 0, "c_n1": 1,
           "c_n2": 2}


def _fill_response(resp_ref, chunk, valid, dirs, gx, gy):
    """Compute the vectorized chunk response and stage it in scratch."""
    r = _chunk_response(chunk, valid, dirs, gx, gy)
    for name in RESP_FIELDS:
        if name.startswith("c_"):
            colv = _lane_bc(chunk[:, _COL_OF[name]:_COL_OF[name] + 1])
            val = jnp.broadcast_to(colv[:, None, :], (CHUNK, 8, 128))
        else:
            val = r[name]
        resp_ref[RESP_IDX[name]] = val


def _fwd_kernel(grid: TileGrid, s_max: int, chart_pad, cw_blk, counts_ref,
                cam_ref, records_ref, charts_ref, out_ref, ncontrib_ref,
                chart_buf, chart_sem):
    ch_pad = chart_pad[0]
    t = pl.program_id(0)
    count = counts_ref[t]
    n_chunks = (count + CHUNK - 1) // CHUNK
    gx, gy, dirs = _pixel_grids(grid, t, cam_ref)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1, 128), 0)

    @pl.when(n_chunks > 0)
    def _():
        _chart_dma(charts_ref, t, 0, cw_blk, chart_buf, chart_sem,
                   jnp.int32(0)).start()

    zeros = jnp.zeros((8, 128), jnp.float32)
    init = {name: zeros for name in CH_NAMES if name != "t_final"}
    init["t_final"] = jnp.ones((8, 128), jnp.float32)
    carry0 = (jnp.int32(0), jnp.full((8, 128), s_max, jnp.int32), init)

    def cond(carry):
        c, ncon, acc = carry
        # see rasterize_pallas2: t_final never drops below T_EPS (a break
        # leaves T unchanged), so exit when every pixel has broken instead
        return jnp.logical_and(c < n_chunks, jnp.max(ncon) == s_max)

    def body(carry):
        c, ncon, acc = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            _chart_dma(charts_ref, t, c + 1, cw_blk, chart_buf, chart_sem,
                       jax.lax.rem(c + 1, 2)).start()

        _chart_dma(charts_ref, t, c, cw_blk, chart_buf, chart_sem,
                   slot).wait()

        base = pl.multiple_of(c * CHUNK, CHUNK)
        chunk = records_ref[0, pl.ds(base, CHUNK), :]        # (K, F)
        valid = (c * CHUNK + k_iota < count).astype(jnp.float32)
        r = _chunk_response(chunk, valid, dirs, gx, gy)
        cb = chart_buf[slot]                                 # (K*Cw', 128)

        def col(f):
            return _lane_bc(chunk[:, f:f + 1])[:, None, :]   # (K,1,128)

        rgb_c = [col(21), col(22), col(23)]
        n_c = [col(0), col(1), col(2)]
        h_c, w_c = col(26), col(27)

        # fully unrolled blend: static value slices only — dynamic-index VMEM
        # reads cost ~100s of cycles each and dominated the staged variant
        new_acc = dict(acc)
        T = acc["t_final"]
        ncon_new = ncon
        for k in range(CHUNK):
            s = c * CHUNK + k
            a = r["alpha"][k]
            considered = jnp.logical_and(a > 0.0, ncon_new == s_max)
            next_T = T * (1.0 - a)
            would_break = jnp.logical_and(considered, next_T <= T_EPS)
            applied = jnp.logical_and(considered, ~would_break)
            w = jnp.where(applied, a * T, 0.0)

            h_g, w_g = h_c[k], w_c[k]                        # (1,128)
            wx = _bilinear_weights(r["uv_u"][k] * h_g, h_g, ch_pad)
            wy = _bilinear_weights(r["uv_v"][k] * w_g, w_g, cw_blk)
            chart_t = cb[k * cw_blk:(k + 1) * cw_blk, :]
            (tex0, tex1, tex2), _ = _fetch_texel(chart_t, wy, wx, ch_pad,
                                                 cw_blk)

            m = r["m"][k]
            fl = r["flip"][k]
            new_acc["img0"] = new_acc["img0"] + w * rgb_c[0][k]
            new_acc["img1"] = new_acc["img1"] + w * rgb_c[1][k]
            new_acc["img2"] = new_acc["img2"] + w * rgb_c[2][k]
            new_acc["tex0"] = new_acc["tex0"] + w * tex0
            new_acc["tex1"] = new_acc["tex1"] + w * tex1
            new_acc["tex2"] = new_acc["tex2"] + w * tex2
            new_acc["depth"] = new_acc["depth"] + w * r["t"][k]
            new_acc["n0"] = new_acc["n0"] + w * fl * n_c[0][k]
            new_acc["n1"] = new_acc["n1"] + w * fl * n_c[1][k]
            new_acc["n2"] = new_acc["n2"] + w * fl * n_c[2][k]
            new_acc["reg"] = new_acc["reg"] + 2.0 * w * (
                m * new_acc["alpha"] - new_acc["m1"])
            new_acc["alpha"] = new_acc["alpha"] + w
            new_acc["m1"] = new_acc["m1"] + w * m
            T = jnp.where(applied, next_T, T)
            ncon_new = jnp.where(would_break, s, ncon_new)
        new_acc["t_final"] = T
        return (c + 1, ncon_new, new_acc)

    c_final, ncontrib, acc = jax.lax.while_loop(cond, body, carry0)

    # an early exit may leave one prefetched DMA in flight — drain it
    @pl.when(c_final < n_chunks)
    def _():
        _chart_dma(charts_ref, t, c_final, cw_blk, chart_buf, chart_sem,
                   jax.lax.rem(c_final, 2)).wait()

    for i, name in enumerate(CH_NAMES):
        out_ref[0, pl.ds(i * 8, 8), :] = acc[name]
    ncontrib_ref[0] = ncontrib


class PallasInputs(NamedTuple):
    records_t: jax.Array   # (T, S, F)
    charts_g: jax.Array    # (T, S*Cw', Ch*3)
    counts: jax.Array      # (T,) int32 (clamped to s_max)
    cam_info: jax.Array    # (18,)


def prepare_pallas_inputs(geom, texture_packed, texture_hw, bins: TileBins,
                          cam: Camera, px_offset=None) -> PallasInputs:
    if px_offset is None:
        px_offset = jnp.zeros((2,), jnp.float32)
    origin = cam.c2w[:3, 3]
    records = assemble_records(geom, origin, texture_hw)    # (N, F)
    rec_pairs = records[bins.ids]                           # (T, S, F)
    charts_g = texture_packed[bins.ids]                     # (T, S, Cw', Ch3)
    tt, ss, cw, ch3 = charts_g.shape
    charts_g = charts_g.reshape(tt, ss * cw, ch3)
    s_max = bins.ids.shape[1]
    counts = jnp.minimum(bins.counts, s_max)
    return PallasInputs(rec_pairs, charts_g, counts,
                        _cam_info(cam, px_offset))


def rasterize_pallas_fwd(grid: TileGrid, chart_pad, inputs: PallasInputs,
                         interpret: bool = False):
    """Run the forward kernel. Returns (maps dict of (T,8,128), ncontrib)."""
    num_tiles, s_max, f = inputs.records_t.shape
    cw_blk = inputs.charts_g.shape[1] // s_max
    kernel = functools.partial(_fwd_kernel, grid, s_max, chart_pad, cw_blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, s_max, F_REC), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # charts stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, NCH * 8, 128), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda t, c, cam: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK * cw_blk, CH3_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
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
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
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
