"""Pallas backward kernel: fused back-to-front gradient walk per tile.

The TPU equivalent of the CUDA fused backward (SURVEY.md §2.1 stage 6):
recovers per-splat transmittance via ``T_k = T_{k+1}/(1-α_k)``, maintains the
suffix sums of rasterize.py's derivation, and emits per-PAIR gradients —
record-field grads (F, T, S) and transposed-chart grads (T, S·Cw, Ch·3) —
written conflict-free (each pair slot is owned by exactly one tile). The
XLA caller turns pair grads into parameter grads through the differentiable
gather/record-builder (scatter-add by construction).

All clip/max/cutoff subgradient choices mirror jnp semantics so the kernel
matches the XLA tier's autodiff bit-for-bit (tested in interpret mode).
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
from .rasterize_pallas import (CH_NAMES, F_REC, NCH, _bilinear_weights,
                               _pixel_grids, _splat_response)

# cotangent channel order in the packed gmaps input (12 channels × 8 sublanes)
G_NAMES = ["img0", "img1", "img2", "tex0", "tex1", "tex2", "depth", "alpha",
           "n0", "n1", "n2", "reg"]
NG = len(G_NAMES)


def _bwd_kernel(grid: TileGrid, s_max: int, chart_pad, counts_ref, cam_ref,
                records_ref, charts_ref, fwdout_ref, ncon_ref, gmaps_ref,
                drec_ref, dchart_ref):
    ch_pad, cw_pad = chart_pad
    t = pl.program_id(0)
    count = counts_ref[t]
    gx, gy, dirs = _pixel_grids(grid, t, cam_ref)
    d0, d1, d2 = dirs

    # zero-init outputs (pallas blocks are uninitialized)
    drec_ref[:, 0, :] = jnp.zeros((F_REC, s_max), jnp.float32)
    dchart_ref[0] = jnp.zeros((s_max * cw_pad, ch_pad * 3), jnp.float32)

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

    # skip splats past every pixel's break point
    start = jnp.minimum(count, jnp.max(ncon) + 1)

    zeros = jnp.zeros((8, 128), jnp.float32)
    carry0 = (start - 1, t_final, zeros, zeros, zeros)  # s, T_next, Bs, E, D

    def cond(carry):
        s = carry[0]
        return s >= 0

    def body(carry):
        s, T_next, Bs, E, D = carry

        def rec(f):
            return records_ref[f, 0, s]

        r = _splat_response(rec, s, dirs, gx, gy)
        a = r["alpha"]
        applied = jnp.logical_and(a > 0.0, s < ncon)
        one_minus = 1.0 - a
        T_k = jnp.where(applied, T_next / one_minus, T_next)
        w = jnp.where(applied, a * T_k, 0.0)

        # texel fetch forward (needed for s_k and the fetch backward)
        h_g, w_g = rec(26), rec(27)
        x_raw = r["uv_u"] * h_g
        y_raw = r["uv_v"] * w_g
        wx = _bilinear_weights(x_raw, h_g, ch_pad)
        wy = _bilinear_weights(y_raw, w_g, cw_pad)
        chart_t = charts_ref[0, pl.ds(s * cw_pad, cw_pad), :]   # (Cw, Ch3)
        wy_flat = wy.reshape(8 * 128, cw_pad)
        tmp = jnp.dot(wy_flat, chart_t,
                      preferred_element_type=jnp.float32)       # (P, Ch3)
        tmp = tmp.reshape(8, 128, ch_pad * 3)
        texel = []
        for c in range(3):
            acc = jnp.zeros((8, 128), jnp.float32)
            for aa in range(ch_pad):
                acc = acc + wx[..., aa] * tmp[..., aa * 3 + c]
            texel.append(acc)

        m = r["m"]
        A = m0_tot - w - E
        C = m1_tot - w * m - D

        s_direct = (rec(21) * g_img[0] + rec(22) * g_img[1]
                    + rec(23) * g_img[2]
                    + texel[0] * g_tex[0] + texel[1] * g_tex[1]
                    + texel[2] * g_tex[2]
                    + r["t"] * g_depth + g_alpha
                    + r["flip"] * (rec(0) * g_norm[0] + rec(1) * g_norm[1]
                                   + rec(2) * g_norm[2]))
        s_k = s_direct + 2.0 * g_reg * ((m * A - C) + (D - m * E))
        d_alpha = jnp.where(applied, T_k * s_k - Bs / one_minus, 0.0)
        d_m = 2.0 * g_reg * w * (A - E)

        # ---- chain through the local math ----
        # alpha = min(op·G, .999) with cutoff/cull gates
        opg = rec(20) * r["g"]
        interior = jnp.logical_and(opg <= ALPHA_CLAMP, opg >= ALPHA_CUTOFF)
        interior = jnp.logical_and(interior, r["t"] > 1e-6)
        dag = jnp.where(interior, d_alpha, 0.0)
        d_op_px = r["g"] * dag
        d_G = rec(20) * dag
        surf_sel = r["g_surf"] >= r["g_scr"]
        d_Gs = jnp.where(surf_sel, d_G, 0.0)
        d_Gc = jnp.where(surf_sel, 0.0, d_G)
        # Gs = exp(-r2/2)·[r2≤9]
        sup = r["r2"] <= EXTENT_SIGMA * EXTENT_SIGMA
        dGs_eff = jnp.where(sup, r["g_surf"] * d_Gs, 0.0)
        d_u = -r["u"] * dGs_eff
        d_v = -r["v"] * dGs_eff
        # Gc = exp(-r2s/2σ²); dpx = gx − xy0
        dGc_eff = r["g_scr"] * d_Gc
        d_xy0_px = (r["dpx"] / AA_SIGMA2) * dGc_eff
        d_xy1_px = (r["dpy"] / AA_SIGMA2) * dGc_eff

        # texel fetch backward
        wcot = [w * g_tex[c] for c in range(3)]
        # chart grad: dchartT = wy^T @ M,  M[p, a*3+c] = wx_a · wcot_c
        M = jnp.zeros((8, 128, ch_pad * 3), jnp.float32)
        for aa in range(ch_pad):
            for c in range(3):
                M = M.at[..., aa * 3 + c].set(wx[..., aa] * wcot[c])
        M_flat = M.reshape(8 * 128, ch_pad * 3)
        d_chart = jax.lax.dot_general(
            wy_flat, M_flat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (Cw, Ch3)
        dchart_ref[0, pl.ds(s * cw_pad, cw_pad), :] = (
            dchart_ref[0, pl.ds(s * cw_pad, cw_pad), :] + d_chart)

        # d wrt x (via wx): dx = Σ_a (Σ_c wcot_c·tmp[a3+c]) · dwx_a/dx
        xg = jnp.clip(x_raw, 0.0, h_g - 1.0)
        a_iota = jax.lax.broadcasted_iota(jnp.float32, (8, 128, ch_pad), 2)
        diff_x = xg[..., None] - a_iota
        dwx_dx = jnp.where(jnp.abs(diff_x) <= 1.0, -jnp.sign(diff_x), 0.0)
        d_x = jnp.zeros((8, 128), jnp.float32)
        for aa in range(ch_pad):
            coeff = (wcot[0] * tmp[..., aa * 3 + 0]
                     + wcot[1] * tmp[..., aa * 3 + 1]
                     + wcot[2] * tmp[..., aa * 3 + 2])
            d_x = d_x + coeff * dwx_dx[..., aa]
        # d wrt y (via wy): dwy = M @ chartT^T  -> (P, Cw)
        d_wy = jax.lax.dot_general(
            M_flat, chart_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(8, 128, cw_pad)
        yg = jnp.clip(y_raw, 0.0, w_g - 1.0)
        b_iota = jax.lax.broadcasted_iota(jnp.float32, (8, 128, cw_pad), 2)
        diff_y = yg[..., None] - b_iota
        dwy_dy = jnp.where(jnp.abs(diff_y) <= 1.0, -jnp.sign(diff_y), 0.0)
        d_y = jnp.sum(d_wy * dwy_dy, axis=-1)
        # clip gates: x = clip(uvu·h) and uvu = clip(raw)
        x_pass = jnp.logical_and(x_raw >= 0.0, x_raw <= h_g - 1.0)
        y_pass = jnp.logical_and(y_raw >= 0.0, y_raw <= w_g - 1.0)
        uvu_raw = 0.5 + rec(15) + r["t"] * r["b1ud"]
        uvv_raw = 0.5 + rec(19) + r["t"] * r["b2ud"]
        u_pass = jnp.logical_and(uvu_raw >= 0.0, uvu_raw <= 1.0)
        v_pass = jnp.logical_and(uvv_raw >= 0.0, uvv_raw <= 1.0)
        d_uvu = jnp.where(jnp.logical_and(x_pass, u_pass), d_x * h_g, 0.0)
        d_uvv = jnp.where(jnp.logical_and(y_pass, v_pass), d_y * w_g, 0.0)

        # accumulate t cotangent from all paths
        d_t = w * g_depth
        # m path: m = K(1 − N/max(t,N)), dm/dt = K·N/t² for t ≥ N
        kf = REG_FAR / (REG_FAR - REG_NEAR)
        tc = jnp.maximum(r["t"], REG_NEAR)
        d_t = d_t + jnp.where(r["t"] >= REG_NEAR,
                              d_m * kf * REG_NEAR / (tc * tc), 0.0)
        d_t = d_t + d_u * r["b1d"] + d_v * r["b2d"]
        d_t = d_t + d_uvu * r["b1ud"] + d_uvv * r["b2ud"]

        # t = a_n / snd
        nd_pass = jnp.abs(r["nd"]) >= 1e-9
        d_an_px = d_t / r["safe_nd"]
        d_nd = jnp.where(nd_pass, -r["t"] / r["safe_nd"] * d_t, 0.0)

        # ---- reduce to per-splat scalar grads (record layout) ----
        def red(x):
            return jnp.sum(x)

        wn = w * r["flip"]
        drec_ref[0, 0, s] = red(d_nd * d0 + wn * g_norm[0])
        drec_ref[1, 0, s] = red(d_nd * d1 + wn * g_norm[1])
        drec_ref[2, 0, s] = red(d_nd * d2 + wn * g_norm[2])
        drec_ref[3, 0, s] = red(d_an_px)
        drec_ref[4, 0, s] = red(d_u * r["t"] * d0)
        drec_ref[5, 0, s] = red(d_u * r["t"] * d1)
        drec_ref[6, 0, s] = red(d_u * r["t"] * d2)
        drec_ref[7, 0, s] = red(d_u)
        drec_ref[8, 0, s] = red(d_v * r["t"] * d0)
        drec_ref[9, 0, s] = red(d_v * r["t"] * d1)
        drec_ref[10, 0, s] = red(d_v * r["t"] * d2)
        drec_ref[11, 0, s] = red(d_v)
        drec_ref[12, 0, s] = red(d_uvu * r["t"] * d0)
        drec_ref[13, 0, s] = red(d_uvu * r["t"] * d1)
        drec_ref[14, 0, s] = red(d_uvu * r["t"] * d2)
        drec_ref[15, 0, s] = red(d_uvu)
        drec_ref[16, 0, s] = red(d_uvv * r["t"] * d0)
        drec_ref[17, 0, s] = red(d_uvv * r["t"] * d1)
        drec_ref[18, 0, s] = red(d_uvv * r["t"] * d2)
        drec_ref[19, 0, s] = red(d_uvv)
        drec_ref[20, 0, s] = red(d_op_px)
        drec_ref[21, 0, s] = red(w * g_img[0])
        drec_ref[22, 0, s] = red(w * g_img[1])
        drec_ref[23, 0, s] = red(w * g_img[2])
        drec_ref[24, 0, s] = red(d_xy0_px)
        drec_ref[25, 0, s] = red(d_xy1_px)

        Bs = Bs + s_k * w
        E = E + w
        D = D + w * m
        return (s - 1, T_k, Bs, E, D)

    jax.lax.while_loop(cond, body, carry0)


def rasterize_pallas_bwd(grid: TileGrid, chart_pad, counts, cam_info,
                         records_t, charts_g, fwd_out, ncontrib, gmaps,
                         interpret: bool = False):
    """Run the backward kernel.

    gmaps: (T, NG*8, 128) packed cotangents (G_NAMES order).
    Returns (d_records_t (F,T,S), d_charts_g (T, S*Cw, Ch*3)).
    """
    f, num_tiles, s_max = records_t.shape
    kernel = functools.partial(_bwd_kernel, grid, s_max, chart_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((F_REC, 1, s_max), lambda t, c, cam: (0, t, 0)),
            pl.BlockSpec((1, s_max * chart_pad[1], chart_pad[0] * 3),
                         lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, NCH * 8, 128), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, NG * 8, 128), lambda t, c, cam: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((F_REC, 1, s_max), lambda t, c, cam: (0, t, 0)),
            pl.BlockSpec((1, s_max * chart_pad[1], chart_pad[0] * 3),
                         lambda t, c, cam: (t, 0, 0)),
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
            dimension_semantics=("arbitrary",)),
    )(counts, cam_info, records_t, charts_g, fwd_out, ncontrib, gmaps)
    return d_records, d_charts
