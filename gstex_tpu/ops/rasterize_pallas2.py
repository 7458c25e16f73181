"""Pallas rasterizer v2 — lanes-major layout (the fast path).

Measured on-chip (DESIGN.md): the v1 per-tile kernel spent ~5.4 µs/splat in
a Mosaic relayout feeding the texel matmul and ~3.4 µs in lane-padded
(8,128,cap) weight temporaries. v2 removes both by construction:

- pixels live on LANES: per-pixel rows are (1, 1024), per-chunk splat
  vectorization uses SUBLANES: (CHUNK, 1024). Every array is a whole number
  of fully-utilized (8,128) registers; no shape in the kernel ever needs a
  sublane↔lane relayout.
- the texel fetch is `tmp = chartᵀ·wy` expressed as
  dot_general(chart (cw,128), wy (cw,1024), contract dim0·dim0) →
  (128, 1024) — natively MXU-shaped, zero transposes — followed by an
  8-term row FMA against wx (ch,1024).
- charts stream from HBM per chunk (double-buffered DMA, as v1).

Same inputs/outputs as v1 (rasterize_pallas): records (T,S,F), packed
charts (T, S·Cw', 128), counts; packed channel maps. Outputs match v1 and
the XLA tier within the parity-test tolerance (not bitwise): the m/reg
channel computes the mapped depth via reciprocal-multiply
(``invtc = safe_nd/numer`` then a multiply) where v1 uses a divide —
~1 ulp apart.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TileGrid
from .surfel import (AA_SIGMA2, ALPHA_CLAMP, ALPHA_CUTOFF, EXTENT_SIGMA,
                     REG_FAR, REG_NEAR, T_EPS)
import functools as _ft

from .rasterize_pallas import (CH3_PAD, CH_NAMES, F_REC, NCH, PallasInputs)
from .rasterize_pallas import _chart_dma as _chart_dma_base

CHUNK = 16
_chart_dma = _ft.partial(_chart_dma_base, chunk=CHUNK)

# f32 emulation depth for the kernel MXU dots. Mosaic supports only
# DEFAULT (1 bf16 pass — too coarse for t_hit) and HIGHEST (6 passes);
# Precision.HIGH (3 passes) raises NotImplementedError in the pallas
# lowering as of jax 0.8, so the cheaper middle option is unavailable.
MXU_DOT_PRECISION = jax.lax.Precision.HIGHEST

P = 1024  # pixels per 32x32 tile

G_NAMES = ["img0", "img1", "img2", "tex0", "tex1", "tex2", "depth", "alpha",
           "n0", "n1", "n2", "reg"]
NG = len(G_NAMES)


def _rep(v, n=P):
    """(A, 1) -> (A, n) lane repeat (unfoldable by the XLA simplifier)."""
    return pltpu.repeat(v, n, axis=1)


def _pixel_rows(grid: TileGrid, t, cam_ref):
    """Pixel coords + world ray dirs for tile t as (1, tile_h*tile_w) rows."""
    th, tw = grid.tile_h, grid.tile_w
    p = jax.lax.broadcasted_iota(jnp.int32, (1, th * tw), 1)
    ly = (p // tw).astype(jnp.float32)
    lx = (p % tw).astype(jnp.float32)
    ty = (t // grid.ntx).astype(jnp.float32)
    tx = (t % grid.ntx).astype(jnp.float32)
    gx = tx * tw + lx + cam_ref[4]
    gy = ty * th + ly + cam_ref[5]
    dx = (gx + 0.5 - cam_ref[2]) / cam_ref[0]
    dy = (gy + 0.5 - cam_ref[3]) / cam_ref[1]
    d0 = cam_ref[9] * dx + cam_ref[10] * dy + cam_ref[11]
    d1 = cam_ref[12] * dx + cam_ref[13] * dy + cam_ref[14]
    d2 = cam_ref[15] * dx + cam_ref[16] * dy + cam_ref[17]
    return gx, gy, (d0, d1, d2)


def _response2(chunk, valid, dirs, gx, gy, mxu: bool = False):
    """Chunk response as (CHUNK, pixels) arrays (splats on sublanes).

    With ``mxu=True`` the five per-splat direction dots (n·d, b1·d, b2·d,
    b1u·d, b2u·d — each affine in the ray dir with per-splat coefficients)
    run as ONE stacked (5K,3)@(3,P) matmul instead of 5 broadcast-FMA
    chains on the VPU."""
    pixels = gx.shape[-1]
    k = chunk.shape[0]

    def col(f):
        return _rep(chunk[:, f:f + 1], pixels)          # (K, pix)

    d0, d1, d2 = dirs                                   # (1, P)
    if mxu:
        dmat = jnp.concatenate([d0, d1, d2], axis=0)     # (3, P)

        def ddot(base):
            return jax.lax.dot_general(
                chunk[:, base:base + 3], dmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=MXU_DOT_PRECISION)             # (K, P)

        nd = ddot(0)
        b1d = ddot(4)
        b2d = ddot(8)
        b1ud = ddot(12)
        b2ud = ddot(16)
    else:
        nd = col(0) * d0 + col(1) * d1 + col(2) * d2
        b1d = col(4) * d0 + col(5) * d1 + col(6) * d2
        b2d = col(8) * d0 + col(9) * d1 + col(10) * d2
        b1ud = col(12) * d0 + col(13) * d1 + col(14) * d2
        b2ud = col(16) * d0 + col(17) * d1 + col(18) * d2
    safe_nd = jnp.where(jnp.abs(nd) < 1e-9,
                        jnp.where(nd < 0, -1e-9, 1e-9), nd)
    # t keeps the true divide (reciprocal·mult differs by ~1ulp, which the
    # chart-size-scaled bilinear fetch amplifies past the XLA-parity
    # tolerance); inv_nd is for the BACKWARD's d_an/d_nd only — unused
    # here, so the forward compile DCEs it.
    inv_nd = 1.0 / safe_nd
    t_hit = col(3) / safe_nd

    u = col(7) + t_hit * b1d
    v = col(11) + t_hit * b2d
    r2 = u * u + v * v
    # g = max(g_surf, g_scr) with g_surf zeroed outside the 3-sigma ellipse.
    # exp is monotone, so take the max in ARG space and pay one exp instead
    # of two (bitwise-identical: the same winning argument is exponentiated).
    # The ellipse mask becomes arg_s = -1e30 (exp -> 0), which also makes
    # surf_sel false outside the ellipse — subsuming the backward's guard.
    arg_s = jnp.where(r2 <= EXTENT_SIGMA * EXTENT_SIGMA, -0.5 * r2, -1e30)
    dpx = gx - col(24)
    dpy = gy - col(25)
    arg_c = (-0.5 / AA_SIGMA2) * (dpx * dpx + dpy * dpy)
    surf_sel = arg_s >= arg_c
    g = jnp.exp(jnp.maximum(arg_s, arg_c))
    alpha = jnp.minimum(col(20) * g, ALPHA_CLAMP)
    alpha = jnp.where(alpha < ALPHA_CUTOFF, 0.0, alpha)
    alpha = jnp.where(t_hit > 1e-6, alpha, 0.0)
    alpha = alpha * valid

    uvu_raw = 0.5 + col(15) + t_hit * b1ud
    uvv_raw = 0.5 + col(19) + t_hit * b2ud
    uv_u = jnp.clip(uvu_raw, 0.0, 1.0)
    uv_v = jnp.clip(uvv_raw, 0.0, 1.0)

    # m = kfac·(1 − NEAR/max(t, NEAR)) without the (K,P) divide: 1/t =
    # nd/numer, and 1/numer is a per-splat (K,1) reciprocal (~free at 1/P
    # the lanes). Where t < NEAR (incl. t ≤ 0: numer may be 0 → ±inf,
    # discarded) the clamp makes 1/tc the constant 1/NEAR.
    inv_numer = 1.0 / chunk[:, 3:4]
    inv_t = safe_nd * _rep(inv_numer, pixels)
    invtc = jnp.where(t_hit >= REG_NEAR, inv_t, 1.0 / REG_NEAR)
    m = (REG_FAR / (REG_FAR - REG_NEAR)) * (1.0 - REG_NEAR * invtc)
    flip = jnp.where(nd > 0.0, -1.0, 1.0)
    return {
        "t": t_hit, "alpha": alpha, "u": u, "v": v, "uv_u": uv_u,
        "uv_v": uv_v, "m": m, "flip": flip, "nd": nd, "safe_nd": safe_nd,
        "inv_nd": inv_nd, "invtc": invtc,
        "uvu_raw": uvu_raw, "uvv_raw": uvv_raw,
        "surf_sel": surf_sel, "g": g, "r2": r2,
        "b1d": b1d, "b2d": b2d, "b1ud": b1ud, "b2ud": b2ud,
        "dpx": dpx, "dpy": dpy,
    }


def _weights_row(coord, size, cap):
    """(cap, P) separable bilinear weights for a (1, P) coord row."""
    x = jnp.clip(coord, 0.0, size - 1.0)
    a = jax.lax.broadcasted_iota(jnp.int32, (cap, P), 0).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(x - a))


import os as _os

_DEBUG_SKIP = _os.environ.get("GSTEX_PALLAS_SKIP", "")


def _fetch2(chart, wy, wx, ch_pad):
    """tex (3, P) = Σ_a wx[a]·(chartᵀ·wy)[a·3+c].

    chart: (cw, 128); wy: (cw, P); wx: (ch, P).
    Returns (tex (3,P), tmp (128,P))."""
    if "fetch" in _DEBUG_SKIP:  # perf-isolation hook (dev only)
        z = wx[0:1, :] * 0.0
        return jnp.concatenate([z, z, z], axis=0), jnp.zeros((128, P),
                                                             jnp.float32)
    tmp = jax.lax.dot_general(chart, wy, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (128, P)
    tex = jnp.zeros((3, P), jnp.float32)
    for aa in range(ch_pad):
        tex = tex + wx[aa:aa + 1, :] * tmp[aa * 3:(aa + 1) * 3, :]
    return tex, tmp


def _fwd_kernel2(grid: TileGrid, s_max: int, ch_pad, cw_blk, counts_ref,
                 cam_ref, records_ref, charts_ref, out_ref, ncontrib_ref,
                 chart_buf, chart_sem):
    t = pl.program_id(0)
    count = counts_ref[t]
    n_chunks = (count + CHUNK - 1) // CHUNK
    gx, gy, dirs = _pixel_rows(grid, t, cam_ref)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, P), 0)

    @pl.when(n_chunks > 0)
    def _():
        _chart_dma(charts_ref, t, 0, cw_blk, chart_buf, chart_sem,
                   jnp.int32(0)).start()

    zrow = jnp.zeros((1, P), jnp.float32)
    init = {name: zrow for name in CH_NAMES if name != "t_final"}
    init["t_final"] = jnp.ones((1, P), jnp.float32)
    carry0 = (jnp.int32(0), jnp.full((1, P), s_max, jnp.int32), init)

    def cond(carry):
        c, ncon, acc = carry
        # a broken pixel keeps its (just-above-T_EPS) transmittance, so
        # t_final can't signal tile completion; "every pixel has recorded a
        # break index" can (unbroken pixels always have T > T_EPS, and once
        # all pixels broke no further splat is applied — output-identical)
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
        r = _response2(chunk, valid, dirs, gx, gy)
        cb = chart_buf[slot]                                 # (K*cw, 128)
        rgb_c = _rep(chunk[:, 21:22]), _rep(chunk[:, 22:23]), \
            _rep(chunk[:, 23:24])
        n_c = _rep(chunk[:, 0:1]), _rep(chunk[:, 1:2]), _rep(chunk[:, 2:3])
        h_c = _rep(chunk[:, 26:27])
        w_c = _rep(chunk[:, 27:28])

        new_acc = dict(acc)
        T = acc["t_final"]
        ncon_new = ncon
        for k in range(CHUNK):
            s = c * CHUNK + k
            a = r["alpha"][k:k + 1, :]
            considered = jnp.logical_and(a > 0.0, ncon_new == s_max)
            next_T = T * (1.0 - a)
            would_break = jnp.logical_and(considered, next_T <= T_EPS)
            applied = jnp.logical_and(considered, ~would_break)
            w = jnp.where(applied, a * T, 0.0)

            h_g = h_c[k:k + 1, :]
            w_g = w_c[k:k + 1, :]
            wx = _weights_row(r["uv_u"][k:k + 1, :] * h_g, h_g, ch_pad)
            wy = _weights_row(r["uv_v"][k:k + 1, :] * w_g, w_g, cw_blk)
            chart_t = cb[k * cw_blk:(k + 1) * cw_blk, :]
            tex, _ = _fetch2(chart_t, wy, wx, ch_pad)

            m = r["m"][k:k + 1, :]
            fl = r["flip"][k:k + 1, :]
            new_acc["img0"] = new_acc["img0"] + w * rgb_c[0][k:k + 1, :]
            new_acc["img1"] = new_acc["img1"] + w * rgb_c[1][k:k + 1, :]
            new_acc["img2"] = new_acc["img2"] + w * rgb_c[2][k:k + 1, :]
            new_acc["tex0"] = new_acc["tex0"] + w * tex[0:1, :]
            new_acc["tex1"] = new_acc["tex1"] + w * tex[1:2, :]
            new_acc["tex2"] = new_acc["tex2"] + w * tex[2:3, :]
            new_acc["depth"] = new_acc["depth"] + w * r["t"][k:k + 1, :]
            new_acc["n0"] = new_acc["n0"] + w * fl * n_c[0][k:k + 1, :]
            new_acc["n1"] = new_acc["n1"] + w * fl * n_c[1][k:k + 1, :]
            new_acc["n2"] = new_acc["n2"] + w * fl * n_c[2][k:k + 1, :]
            new_acc["reg"] = new_acc["reg"] + 2.0 * w * (
                m * new_acc["alpha"] - new_acc["m1"])
            new_acc["alpha"] = new_acc["alpha"] + w
            new_acc["m1"] = new_acc["m1"] + w * m
            T = jnp.where(applied, next_T, T)
            ncon_new = jnp.where(would_break, s, ncon_new)
        new_acc["t_final"] = T
        return (c + 1, ncon_new, new_acc)

    c_final, ncontrib, acc = jax.lax.while_loop(cond, body, carry0)

    @pl.when(c_final < n_chunks)
    def _():
        _chart_dma(charts_ref, t, c_final, cw_blk, chart_buf, chart_sem,
                   jax.lax.rem(c_final, 2)).wait()

    for i, name in enumerate(CH_NAMES):
        out_ref[0, pl.ds(i * 8, 8), :] = acc[name].reshape(8, 128)
    ncontrib_ref[0] = ncontrib.reshape(8, 128)


def rasterize_pallas2_fwd(grid: TileGrid, chart_pad, inputs: PallasInputs,
                          interpret: bool = False):
    num_tiles, s_max, f = inputs.records_t.shape
    cw_blk = inputs.charts_g.shape[1] // s_max
    kernel = functools.partial(_fwd_kernel2, grid, s_max, chart_pad[0],
                               cw_blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, s_max, F_REC), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
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


def _bwd_kernel2(grid: TileGrid, s_max: int, ch_pad, cw_blk, counts_ref,
                 cam_ref, records_ref, charts_ref, fwdout_ref, ncon_ref,
                 gmaps_ref, drec_ref, dchart_ref, chart_buf, chart_sem):
    t = pl.program_id(0)
    count = counts_ref[t]
    gx, gy, dirs = _pixel_rows(grid, t, cam_ref)
    d0, d1, d2 = dirs
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, P), 0)

    drec_ref[0] = jnp.zeros((s_max, F_REC), jnp.float32)
    dchart_ref[0] = jnp.zeros((s_max * cw_blk, CH3_PAD), jnp.float32)

    def fwd_ch(name):
        i = CH_NAMES.index(name)
        return fwdout_ref[0, pl.ds(i * 8, 8), :].reshape(1, P)

    def g_ch(name):
        i = G_NAMES.index(name)
        return gmaps_ref[0, pl.ds(i * 8, 8), :].reshape(1, P)

    m0_tot = fwd_ch("alpha")
    m1_tot = fwd_ch("m1")
    t_final = fwd_ch("t_final")
    ncon = ncon_ref[0].reshape(1, P)

    g_img = (g_ch("img0"), g_ch("img1"), g_ch("img2"))
    g_tex = (g_ch("tex0"), g_ch("tex1"), g_ch("tex2"))
    g_depth = g_ch("depth")
    g_alpha = g_ch("alpha")
    g_norm = (g_ch("n0"), g_ch("n1"), g_ch("n2"))
    g_reg = g_ch("reg")

    start = jnp.minimum(count, jnp.max(ncon) + 1)
    n_chunks = (start + CHUNK - 1) // CHUNK

    @pl.when(n_chunks > 0)
    def _():
        _chart_dma(charts_ref, t, n_chunks - 1, cw_blk, chart_buf,
                   chart_sem, jax.lax.rem(n_chunks - 1, 2)).start()

    kf_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, F_REC), 0)
    ff_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, F_REC), 1)

    zrow = jnp.zeros((1, P), jnp.float32)
    carry0 = (n_chunks - 1, t_final, zrow, zrow, zrow)

    def cond(carry):
        return carry[0] >= 0

    def body(carry):
        c, T_next, Bs, E, D = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c - 1 >= 0)
        def _():
            _chart_dma(charts_ref, t, c - 1, cw_blk, chart_buf, chart_sem,
                       jax.lax.rem(c - 1, 2)).start()

        _chart_dma(charts_ref, t, c, cw_blk, chart_buf, chart_sem,
                   slot).wait()

        base = pl.multiple_of(c * CHUNK, CHUNK)
        chunk = records_ref[0, pl.ds(base, CHUNK), :]        # (K, F)
        valid = (c * CHUNK + k_iota < count).astype(jnp.float32)
        r = _response2(chunk, valid, dirs, gx, gy)
        cb = chart_buf[slot]
        rgb_c = _rep(chunk[:, 21:22]), _rep(chunk[:, 22:23]), \
            _rep(chunk[:, 23:24])
        n_c = _rep(chunk[:, 0:1]), _rep(chunk[:, 1:2]), _rep(chunk[:, 2:3])
        h_c = _rep(chunk[:, 26:27])
        w_c = _rep(chunk[:, 27:28])
        op_c = _rep(chunk[:, 20:21])
        a1u_c = _rep(chunk[:, 15:16])
        a2u_c = _rep(chunk[:, 19:20])

        T = T_next
        grad_chunk = jnp.zeros((CHUNK, F_REC), jnp.float32)
        for k in reversed(range(CHUNK)):
            a = r["alpha"][k:k + 1, :]
            t_k = r["t"][k:k + 1, :]
            fl = r["flip"][k:k + 1, :]
            m = r["m"][k:k + 1, :]
            applied = jnp.logical_and(a > 0.0, c * CHUNK + k < ncon)
            one_minus = 1.0 - a
            T_k = jnp.where(applied, T / one_minus, T)
            w = jnp.where(applied, a * T_k, 0.0)
            A = m0_tot - w - E
            C = m1_tot - w * m - D

            h_g = h_c[k:k + 1, :]
            w_g = w_c[k:k + 1, :]
            x_raw = r["uv_u"][k:k + 1, :] * h_g
            y_raw = r["uv_v"][k:k + 1, :] * w_g
            wx = _weights_row(x_raw, h_g, ch_pad)
            wy = _weights_row(y_raw, w_g, cw_blk)
            chart_t = cb[k * cw_blk:(k + 1) * cw_blk, :]
            tex, tmp = _fetch2(chart_t, wy, wx, ch_pad)

            s_direct = (rgb_c[0][k:k + 1, :] * g_img[0]
                        + rgb_c[1][k:k + 1, :] * g_img[1]
                        + rgb_c[2][k:k + 1, :] * g_img[2]
                        + tex[0:1, :] * g_tex[0] + tex[1:2, :] * g_tex[1]
                        + tex[2:3, :] * g_tex[2]
                        + t_k * g_depth + g_alpha
                        + fl * (n_c[0][k:k + 1, :] * g_norm[0]
                                + n_c[1][k:k + 1, :] * g_norm[1]
                                + n_c[2][k:k + 1, :] * g_norm[2]))
            s_k = s_direct + 2.0 * g_reg * ((m * A - C) + (D - m * E))
            d_alpha = jnp.where(applied, T_k * s_k - Bs / one_minus, 0.0)
            d_m = 2.0 * g_reg * w * (A - E)

            # chart gradient: dchartᵀ[b, j] = Σ_p wy[b,p]·M2[j,p]
            wcot = [w * g_tex[cc] for cc in range(3)]
            m2 = jnp.concatenate(
                [wx[aa:aa + 1, :] * wcot[cc]
                 for aa in range(ch_pad) for cc in range(3)]
                + [jnp.zeros((CH3_PAD - ch_pad * 3, P), jnp.float32)],
                axis=0)                                        # (128, P)
            d_chart = jax.lax.dot_general(
                wy, m2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # (cw, 128)
            cbase = pl.multiple_of(c * (CHUNK * cw_blk) + k * cw_blk, 8)
            dchart_ref[0, pl.ds(cbase, cw_blk), :] = d_chart

            # d wrt sample coords
            xg = jnp.clip(x_raw, 0.0, h_g - 1.0)
            yg = jnp.clip(y_raw, 0.0, w_g - 1.0)
            a_io = jax.lax.broadcasted_iota(
                jnp.int32, (ch_pad, P), 0).astype(jnp.float32)
            dfx = xg - a_io
            dwx_dx = jnp.where(jnp.abs(dfx) <= 1.0, -jnp.sign(dfx), 0.0)
            d_x = jnp.zeros((1, P), jnp.float32)
            for aa in range(ch_pad):
                coeff = (wcot[0] * tmp[aa * 3:aa * 3 + 1, :]
                         + wcot[1] * tmp[aa * 3 + 1:aa * 3 + 2, :]
                         + wcot[2] * tmp[aa * 3 + 2:aa * 3 + 3, :])
                d_x = d_x + coeff * dwx_dx[aa:aa + 1, :]
            # d_wy[b,p] = Σ_j chart[b,j]·M2[j,p]
            d_wy = jax.lax.dot_general(
                chart_t, m2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (cw, P)
            b_io = jax.lax.broadcasted_iota(
                jnp.int32, (cw_blk, P), 0).astype(jnp.float32)
            dfy = yg - b_io
            dwy_dy = jnp.where(jnp.abs(dfy) <= 1.0, -jnp.sign(dfy), 0.0)
            d_y = jnp.sum(d_wy * dwy_dy, axis=0, keepdims=True)
            x_pass = jnp.logical_and(x_raw >= 0.0, x_raw <= h_g - 1.0)
            y_pass = jnp.logical_and(y_raw >= 0.0, y_raw <= w_g - 1.0)
            d_x = jnp.where(x_pass, d_x, 0.0)
            d_y = jnp.where(y_pass, d_y, 0.0)

            # chain rule
            opg = op_c[k:k + 1, :] * r["g"][k:k + 1, :]
            interior = jnp.logical_and(opg <= ALPHA_CLAMP,
                                       opg >= ALPHA_CUTOFF)
            interior = jnp.logical_and(interior, t_k > 1e-6)
            dag = jnp.where(interior, d_alpha, 0.0)
            d_op = r["g"][k:k + 1, :] * dag
            # winner value is r["g"]; surf_sel encodes the ellipse mask
            d_G = op_c[k:k + 1, :] * dag * r["g"][k:k + 1, :]
            surf_sel = r["surf_sel"][k:k + 1, :]
            dGs_eff = jnp.where(surf_sel, d_G, 0.0)
            d_u = -r["u"][k:k + 1, :] * dGs_eff
            d_v = -r["v"][k:k + 1, :] * dGs_eff
            dGc_eff = jnp.where(surf_sel, 0.0, d_G)
            d_xy0 = (r["dpx"][k:k + 1, :] / AA_SIGMA2) * dGc_eff
            d_xy1 = (r["dpy"][k:k + 1, :] / AA_SIGMA2) * dGc_eff

            b1ud_k = r["b1ud"][k:k + 1, :]
            b2ud_k = r["b2ud"][k:k + 1, :]
            uvu_raw = 0.5 + a1u_c[k:k + 1, :] + t_k * b1ud_k
            uvv_raw = 0.5 + a2u_c[k:k + 1, :] + t_k * b2ud_k
            u_pass = jnp.logical_and(uvu_raw >= 0.0, uvu_raw <= 1.0)
            v_pass = jnp.logical_and(uvv_raw >= 0.0, uvv_raw <= 1.0)
            d_uvu = jnp.where(u_pass, d_x * h_g, 0.0)
            d_uvv = jnp.where(v_pass, d_y * w_g, 0.0)

            kfac = REG_FAR / (REG_FAR - REG_NEAR)
            tc = jnp.maximum(t_k, REG_NEAR)
            d_t = w * g_depth
            d_t = d_t + jnp.where(t_k >= REG_NEAR,
                                  d_m * kfac * REG_NEAR / (tc * tc), 0.0)
            d_t = d_t + d_u * r["b1d"][k:k + 1, :] + d_v * r["b2d"][k:k + 1, :]
            d_t = d_t + d_uvu * b1ud_k + d_uvv * b2ud_k

            nd_k = r["nd"][k:k + 1, :]
            snd_k = r["safe_nd"][k:k + 1, :]
            nd_pass = jnp.abs(nd_k) >= 1e-9
            d_an = d_t / snd_k
            d_nd = jnp.where(nd_pass, -t_k / snd_k * d_t, 0.0)

            wfl = w * fl
            vals = [
                jnp.sum(d_nd * d0 + wfl * g_norm[0]),
                jnp.sum(d_nd * d1 + wfl * g_norm[1]),
                jnp.sum(d_nd * d2 + wfl * g_norm[2]),
                jnp.sum(d_an),
                jnp.sum(d_u * t_k * d0),
                jnp.sum(d_u * t_k * d1),
                jnp.sum(d_u * t_k * d2),
                jnp.sum(d_u),
                jnp.sum(d_v * t_k * d0),
                jnp.sum(d_v * t_k * d1),
                jnp.sum(d_v * t_k * d2),
                jnp.sum(d_v),
                jnp.sum(d_uvu * t_k * d0),
                jnp.sum(d_uvu * t_k * d1),
                jnp.sum(d_uvu * t_k * d2),
                jnp.sum(d_uvu),
                jnp.sum(d_uvv * t_k * d0),
                jnp.sum(d_uvv * t_k * d1),
                jnp.sum(d_uvv * t_k * d2),
                jnp.sum(d_uvv),
                jnp.sum(d_op),
                jnp.sum(w * g_img[0]),
                jnp.sum(w * g_img[1]),
                jnp.sum(w * g_img[2]),
                jnp.sum(d_xy0),
                jnp.sum(d_xy1),
            ]
            for f, v in enumerate(vals):
                mask_kf = jnp.logical_and(kf_iota == k, ff_iota == f)
                grad_chunk = grad_chunk + v * mask_kf.astype(jnp.float32)

            Bs = Bs + s_k * w
            E = E + w
            D = D + w * m
            T = T_k

        drec_ref[0, pl.ds(base, CHUNK), :] = grad_chunk
        return (c - 1, T, Bs, E, D)

    jax.lax.while_loop(cond, body, carry0)


def rasterize_pallas2_bwd(grid: TileGrid, chart_pad, counts, cam_info,
                          records_t, charts_g, fwd_out, ncontrib, gmaps,
                          interpret: bool = False):
    num_tiles, s_max, f = records_t.shape
    cw_blk = charts_g.shape[1] // s_max
    kernel = functools.partial(_bwd_kernel2, grid, s_max, chart_pad[0],
                               cw_blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, s_max, F_REC), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, NCH * 8, 128), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, NG * 8, 128), lambda t, c, cam: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, s_max, F_REC), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, s_max * cw_blk, CH3_PAD),
                         lambda t, c, cam: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK * cw_blk, CH3_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    d_records, d_charts = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(records_t.shape, jnp.float32),
            jax.ShapeDtypeStruct(charts_g.shape, jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(counts, cam_info, records_t, charts_g, fwd_out, ncontrib, gmaps)
    return d_records, d_charts
