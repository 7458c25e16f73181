"""Pallas backward kernel: fused back-to-front gradient walk per tile.

The TPU equivalent of the CUDA fused backward (SURVEY.md §2.1 stage 6):
recovers per-splat transmittance via ``T_k = T_{k+1}/(1-α_k)``, maintains the
suffix sums of rasterize.py's derivation, and emits per-PAIR gradients —
record-field grads (T, S, F) and transposed-chart grads (T, S·Cw', Ch·3) —
written conflict-free (each pair slot is owned by exactly one tile). The
XLA caller turns pair grads into parameter grads through the differentiable
gather/record-builder (scatter-add by construction).

Structure mirrors the forward: CHUNK-sized aligned record blocks, geometry
vectorized over (CHUNK, 8, 128), the sequential recurrence + per-splat
matmuls unrolled in REVERSE chunk order, then the full chain rule applied
vectorized and reduced to (CHUNK,) per-field gradient columns.

All clip/max/cutoff subgradient choices mirror jnp semantics so the kernel
matches the XLA tier's autodiff (tested in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TileGrid
from .surfel import (AA_SIGMA2, ALPHA_CLAMP, ALPHA_CUTOFF, EXTENT_SIGMA,
                     REG_FAR, REG_NEAR)
from .rasterize_pallas import (CH3_PAD, CH_NAMES, CHUNK, F_REC, N_RESP,
                               NCH, RESP_IDX, _bilinear_weights, _chart_dma,
                               _fetch_texel, _fill_response, _pixel_grids)

# cotangent channel order in the packed gmaps input (12 channels × 8 sublanes)
G_NAMES = ["img0", "img1", "img2", "tex0", "tex1", "tex2", "depth", "alpha",
           "n0", "n1", "n2", "reg"]
NG = len(G_NAMES)


def _bwd_kernel(grid: TileGrid, s_max: int, chart_pad, cw_blk, counts_ref,
                cam_ref, records_ref, charts_ref, fwdout_ref, ncon_ref,
                gmaps_ref, drec_ref, dchart_ref, resp_ref, chart_buf,
                chart_sem):
    ch_pad = chart_pad[0]
    t = pl.program_id(0)
    count = counts_ref[t]
    gx, gy, dirs = _pixel_grids(grid, t, cam_ref)
    d0, d1, d2 = dirs

    # zero-init outputs (pallas blocks are uninitialized)
    drec_ref[0] = jnp.zeros((s_max, F_REC), jnp.float32)
    dchart_ref[0] = jnp.zeros((s_max * cw_blk, CH3_PAD), jnp.float32)

    def fwd_ch(name):
        i = CH_NAMES.index(name)
        return fwdout_ref[0, pl.ds(i * 8, 8), :]

    def g_ch(name):
        i = G_NAMES.index(name)
        return gmaps_ref[0, pl.ds(i * 8, 8), :]

    m0_tot = fwd_ch("alpha")
    m1_tot = fwd_ch("m1")
    t_final = fwd_ch("t_final")
    ncon = ncon_ref[0]

    g_img = (g_ch("img0"), g_ch("img1"), g_ch("img2"))
    g_tex = (g_ch("tex0"), g_ch("tex1"), g_ch("tex2"))
    g_depth = g_ch("depth")
    g_alpha = g_ch("alpha")
    g_norm = (g_ch("n0"), g_ch("n1"), g_ch("n2"))
    g_reg = g_ch("reg")

    # skip whole chunks past every pixel's break point
    start = jnp.minimum(count, jnp.max(ncon) + 1)
    n_chunks = (start + CHUNK - 1) // CHUNK

    @pl.when(n_chunks > 0)
    def _():
        _chart_dma(charts_ref, t, n_chunks - 1, cw_blk, chart_buf,
                   chart_sem, jax.lax.rem(n_chunks - 1, 2)).start()
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1, 128), 0)

    zeros = jnp.zeros((8, 128), jnp.float32)
    carry0 = (n_chunks - 1, t_final, zeros, zeros, zeros)

    def cond(carry):
        return carry[0] >= 0

    # one-hot masks from 2D iota — .at[].set traces a scatter and captured
    # array constants are rejected by pallas_call, so build them inline
    kf_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, F_REC), 0)
    ff_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, F_REC), 1)

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
        _fill_response(resp_ref, chunk, valid, dirs, gx, gy)

        def pick(k, name):
            return resp_ref[RESP_IDX[name], k]

        # reverse inner WHILE loop: a static-bound fori gets unrolled by
        # Mosaic, keeping every iteration's lane-padded temporaries live at
        # once (VMEM OOM); while_loop keeps one iteration's buffers
        def splat_body(inner):
            k, T, Bs, E, D, grad_chunk = inner
            a = pick(k, "alpha")
            m = pick(k, "m")
            uvu_k = pick(k, "uv_u")
            uvv_k = pick(k, "uv_v")
            t_k = pick(k, "t")
            fl = pick(k, "flip")
            g_k = pick(k, "g")
            gs_k = pick(k, "g_surf")
            gc_k = pick(k, "g_scr")
            r2_k = pick(k, "r2")
            u_k = pick(k, "u")
            v_k = pick(k, "v")
            b1d_k = pick(k, "b1d")
            b2d_k = pick(k, "b2d")
            b1ud_k = pick(k, "b1ud")
            b2ud_k = pick(k, "b2ud")
            nd_k = pick(k, "nd")
            snd_k = pick(k, "safe_nd")
            dpx_k = pick(k, "dpx")
            dpy_k = pick(k, "dpy")
            h_g = pick(k, "c_h")
            w_g = pick(k, "c_w")
            op_k = pick(k, "c_op")
            a1u_k = pick(k, "c_a1u")
            a2u_k = pick(k, "c_a2u")
            rgb0, rgb1, rgb2 = (pick(k, "c_rgb0"), pick(k, "c_rgb1"),
                                pick(k, "c_rgb2"))
            n0c, n1c, n2c = (pick(k, "c_n0"), pick(k, "c_n1"),
                             pick(k, "c_n2"))
            applied = jnp.logical_and(a > 0.0, c * CHUNK + k < ncon)
            one_minus = 1.0 - a
            T_k = jnp.where(applied, T / one_minus, T)
            w = jnp.where(applied, a * T_k, 0.0)
            A = m0_tot - w - E
            C = m1_tot - w * m - D

            wx = _bilinear_weights(uvu_k * h_g, h_g, ch_pad)
            wy = _bilinear_weights(uvv_k * w_g, w_g, cw_blk)
            kbase = pl.multiple_of(k * cw_blk, 8)
            chart_t = chart_buf[slot, pl.ds(kbase, cw_blk), :]
            (tex0, tex1, tex2), tmp = _fetch_texel(chart_t, wy, wx, ch_pad,
                                                   cw_blk)

            s_direct = (rgb0 * g_img[0] + rgb1 * g_img[1] + rgb2 * g_img[2]
                        + tex0 * g_tex[0] + tex1 * g_tex[1] + tex2 * g_tex[2]
                        + t_k * g_depth + g_alpha
                        + fl * (n0c * g_norm[0] + n1c * g_norm[1]
                                + n2c * g_norm[2]))
            s_k = s_direct + 2.0 * g_reg * ((m * A - C) + (D - m * E))
            d_alpha = jnp.where(applied, T_k * s_k - Bs / one_minus, 0.0)
            d_m = 2.0 * g_reg * w * (A - E)

            # texel fetch backward
            wcot = [w * g_tex[cc] for cc in range(3)]
            wy_flat = wy.reshape(8 * 128, cw_blk)
            M = jnp.concatenate(
                [(wx[..., aa] * wcot[cc])[..., None]
                 for aa in range(ch_pad) for cc in range(3)]
                + [jnp.zeros((8, 128, CH3_PAD - ch_pad * 3), jnp.float32)],
                axis=-1)
            M_flat = M.reshape(8 * 128, CH3_PAD)
            d_chart = jax.lax.dot_general(
                wy_flat, M_flat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (Cw', 128)
            cbase = pl.multiple_of(c * (CHUNK * cw_blk) + k * cw_blk, 8)
            dchart_ref[0, pl.ds(cbase, cw_blk), :] = d_chart

            x_raw = uvu_k * h_g
            y_raw = uvv_k * w_g
            xg = jnp.clip(x_raw, 0.0, h_g - 1.0)
            yg = jnp.clip(y_raw, 0.0, w_g - 1.0)
            a_io = jax.lax.broadcasted_iota(
                jnp.int32, (8, 128, ch_pad), 2).astype(jnp.float32)
            dfx = xg[..., None] - a_io
            dwx_dx = jnp.where(jnp.abs(dfx) <= 1.0, -jnp.sign(dfx), 0.0)
            d_x = jnp.zeros((8, 128), jnp.float32)
            for aa in range(ch_pad):
                coeff = (wcot[0] * tmp[..., aa * 3 + 0]
                         + wcot[1] * tmp[..., aa * 3 + 1]
                         + wcot[2] * tmp[..., aa * 3 + 2])
                d_x = d_x + coeff * dwx_dx[..., aa]
            d_wy = jax.lax.dot_general(
                M_flat, chart_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(8, 128, cw_blk)
            b_io = jax.lax.broadcasted_iota(
                jnp.int32, (8, 128, cw_blk), 2).astype(jnp.float32)
            dfy = yg[..., None] - b_io
            dwy_dy = jnp.where(jnp.abs(dfy) <= 1.0, -jnp.sign(dfy), 0.0)
            d_y = jnp.sum(d_wy * dwy_dy, axis=-1)
            x_pass = jnp.logical_and(x_raw >= 0.0, x_raw <= h_g - 1.0)
            y_pass = jnp.logical_and(y_raw >= 0.0, y_raw <= w_g - 1.0)
            d_x = jnp.where(x_pass, d_x, 0.0)
            d_y = jnp.where(y_pass, d_y, 0.0)

            # ---- chain rule for this splat (8,128) ----
            opg = op_k * g_k
            interior = jnp.logical_and(opg <= ALPHA_CLAMP,
                                       opg >= ALPHA_CUTOFF)
            interior = jnp.logical_and(interior, t_k > 1e-6)
            dag = jnp.where(interior, d_alpha, 0.0)
            d_op = g_k * dag
            d_G = op_k * dag
            surf_sel = gs_k >= gc_k
            dGs_eff = jnp.where(
                jnp.logical_and(surf_sel,
                                r2_k <= EXTENT_SIGMA * EXTENT_SIGMA),
                gs_k * d_G, 0.0)
            d_u = -u_k * dGs_eff
            d_v = -v_k * dGs_eff
            dGc_eff = jnp.where(surf_sel, 0.0, gc_k * d_G)
            d_xy0 = (dpx_k / AA_SIGMA2) * dGc_eff
            d_xy1 = (dpy_k / AA_SIGMA2) * dGc_eff

            uvu_raw = 0.5 + a1u_k + t_k * b1ud_k
            uvv_raw = 0.5 + a2u_k + t_k * b2ud_k
            u_pass = jnp.logical_and(uvu_raw >= 0.0, uvu_raw <= 1.0)
            v_pass = jnp.logical_and(uvv_raw >= 0.0, uvv_raw <= 1.0)
            d_uvu = jnp.where(u_pass, d_x * h_g, 0.0)
            d_uvv = jnp.where(v_pass, d_y * w_g, 0.0)

            kfac = REG_FAR / (REG_FAR - REG_NEAR)
            tc = jnp.maximum(t_k, REG_NEAR)
            d_t = w * g_depth
            d_t = d_t + jnp.where(t_k >= REG_NEAR,
                                  d_m * kfac * REG_NEAR / (tc * tc), 0.0)
            d_t = d_t + d_u * b1d_k + d_v * b2d_k
            d_t = d_t + d_uvu * b1ud_k + d_uvv * b2ud_k

            nd_pass = jnp.abs(nd_k) >= 1e-9
            d_an = d_t / snd_k
            d_nd = jnp.where(nd_pass, -t_k / snd_k * d_t, 0.0)

            wfl = w * fl
            vals = [
                jnp.sum(d_nd * d0 + wfl * g_norm[0]),     # 0-2: n
                jnp.sum(d_nd * d1 + wfl * g_norm[1]),
                jnp.sum(d_nd * d2 + wfl * g_norm[2]),
                jnp.sum(d_an),                            # 3: a_n
                jnp.sum(d_u * t_k * d0),                  # 4-6: b1
                jnp.sum(d_u * t_k * d1),
                jnp.sum(d_u * t_k * d2),
                jnp.sum(d_u),                             # 7: a1
                jnp.sum(d_v * t_k * d0),                  # 8-10: b2
                jnp.sum(d_v * t_k * d1),
                jnp.sum(d_v * t_k * d2),
                jnp.sum(d_v),                             # 11: a2
                jnp.sum(d_uvu * t_k * d0),                # 12-14: b1u
                jnp.sum(d_uvu * t_k * d1),
                jnp.sum(d_uvu * t_k * d2),
                jnp.sum(d_uvu),                           # 15: a1u
                jnp.sum(d_uvv * t_k * d0),                # 16-18: b2u
                jnp.sum(d_uvv * t_k * d1),
                jnp.sum(d_uvv * t_k * d2),
                jnp.sum(d_uvv),                           # 19: a2u
                jnp.sum(d_op),                            # 20: opacity
                jnp.sum(w * g_img[0]),                    # 21-23: rgb
                jnp.sum(w * g_img[1]),
                jnp.sum(w * g_img[2]),
                jnp.sum(d_xy0),                           # 24-25: xy
                jnp.sum(d_xy1),
            ]
            # scatter the 26 scalars into row k of the (K, F) grad block:
            # rank-0 splats + static one-hot columns (Mosaic-safe)
            for f, v in enumerate(vals):
                mask_kf = jnp.logical_and(kf_iota == k, ff_iota == f)
                grad_chunk = grad_chunk + v * mask_kf.astype(jnp.float32)

            Bs = Bs + s_k * w
            E = E + w
            D = D + w * m
            return (k - 1, T_k, Bs, E, D, grad_chunk)

        _, T, Bs, E, D, grad_chunk = jax.lax.while_loop(
            lambda inner: inner[0] >= 0, splat_body,
            (jnp.int32(CHUNK - 1), T_next, Bs, E, D,
             jnp.zeros((CHUNK, F_REC), jnp.float32)))
        drec_ref[0, pl.ds(base, CHUNK), :] = grad_chunk

        return (c - 1, T, Bs, E, D)

    jax.lax.while_loop(cond, body, carry0)


def rasterize_pallas_bwd(grid: TileGrid, chart_pad, counts, cam_info,
                         records_t, charts_g, fwd_out, ncontrib, gmaps,
                         interpret: bool = False):
    """Run the backward kernel.

    gmaps: (T, NG*8, 128) packed cotangents (G_NAMES order).
    Returns (d_records_t (T,S,F), d_charts_g (T, S*Cw', Ch*3)).
    """
    num_tiles, s_max, f = records_t.shape
    cw_blk = charts_g.shape[1] // s_max
    kernel = functools.partial(_bwd_kernel, grid, s_max, chart_pad, cw_blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, s_max, F_REC), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # charts stay in HBM
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
            pltpu.VMEM((N_RESP, CHUNK, 8, 128), jnp.float32),
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
