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
from .rasterize_pallas import (CH_NAMES, CHUNK, F_REC, NCH,
                               _bilinear_weights, _chart_slice,
                               _chunk_response, _fetch_texel, _pixel_grids)

# cotangent channel order in the packed gmaps input (12 channels × 8 sublanes)
G_NAMES = ["img0", "img1", "img2", "tex0", "tex1", "tex2", "depth", "alpha",
           "n0", "n1", "n2", "reg"]
NG = len(G_NAMES)


def _bwd_kernel(grid: TileGrid, s_max: int, chart_pad, cw_blk, counts_ref,
                cam_ref, records_ref, charts_ref, fwdout_ref, ncon_ref,
                gmaps_ref, drec_ref, dchart_ref):
    ch_pad = chart_pad[0]
    t = pl.program_id(0)
    count = counts_ref[t]
    gx, gy, dirs = _pixel_grids(grid, t, cam_ref)
    d0, d1, d2 = dirs

    # zero-init outputs (pallas blocks are uninitialized)
    drec_ref[0] = jnp.zeros((s_max, F_REC), jnp.float32)
    dchart_ref[0] = jnp.zeros((s_max * cw_blk, ch_pad * 3), jnp.float32)

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
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1, 1), 0)

    zeros = jnp.zeros((8, 128), jnp.float32)
    carry0 = (n_chunks - 1, t_final, zeros, zeros, zeros)

    def cond(carry):
        return carry[0] >= 0

    def body(carry):
        c, T_next, Bs, E, D = carry
        base = pl.multiple_of(c * CHUNK, CHUNK)
        chunk = records_ref[0, pl.ds(base, CHUNK), :]        # (K, F)
        valid = (c * CHUNK + k_iota < count).astype(jnp.float32)
        r = _chunk_response(chunk, valid, dirs, gx, gy)

        def col(f):
            return chunk[:, f][:, None, None]

        h_col = col(26)
        w_col = col(27)

        # ---- reverse sequential recurrence over the chunk ----
        T = T_next
        per_k = [None] * CHUNK
        for k in reversed(range(CHUNK)):
            a = r["alpha"][k]
            applied = jnp.logical_and(a > 0.0, c * CHUNK + k < ncon)
            one_minus = 1.0 - a
            T_k = jnp.where(applied, T / one_minus, T)
            w = jnp.where(applied, a * T_k, 0.0)
            m = r["m"][k]
            A = m0_tot - w - E
            C = m1_tot - w * m - D

            h_g = chunk[k:k + 1, 26:27]
            w_g = chunk[k:k + 1, 27:28]
            wx = _bilinear_weights(r["uv_u"][k] * h_g, h_g, ch_pad)
            wy = _bilinear_weights(r["uv_v"][k] * w_g, w_g, cw_blk)
            chart_t = _chart_slice(charts_ref, c, k, cw_blk)
            (tex0, tex1, tex2), tmp = _fetch_texel(chart_t, wy, wx, ch_pad,
                                                   cw_blk)

            s_direct = (chunk[k:k + 1, 21:22] * g_img[0]
                        + chunk[k:k + 1, 22:23] * g_img[1]
                        + chunk[k:k + 1, 23:24] * g_img[2]
                        + tex0 * g_tex[0] + tex1 * g_tex[1] + tex2 * g_tex[2]
                        + r["t"][k] * g_depth + g_alpha
                        + r["flip"][k] * (chunk[k:k + 1, 0:1] * g_norm[0]
                                          + chunk[k:k + 1, 1:2] * g_norm[1]
                                          + chunk[k:k + 1, 2:3] * g_norm[2]))
            s_k = s_direct + 2.0 * g_reg * ((m * A - C) + (D - m * E))
            d_alpha = jnp.where(applied, T_k * s_k - Bs / one_minus, 0.0)
            d_m = 2.0 * g_reg * w * (A - E)

            # texel fetch backward for this splat
            wcot = [w * g_tex[cc] for cc in range(3)]
            wy_flat = wy.reshape(8 * 128, cw_blk)
            M = jnp.concatenate(
                [(wx[..., aa] * wcot[cc])[..., None]
                 for aa in range(ch_pad) for cc in range(3)], axis=-1)
            M_flat = M.reshape(8 * 128, ch_pad * 3)
            d_chart = jax.lax.dot_general(
                wy_flat, M_flat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (Cw', Ch3)
            cbase = pl.multiple_of(c * (CHUNK * cw_blk), 8)
            dchart_ref[0, pl.ds(cbase + k * cw_blk, cw_blk), :] = d_chart

            # d wrt the bilinear sample coords
            x_raw = r["uv_u"][k] * h_g
            y_raw = r["uv_v"][k] * w_g
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

            per_k[k] = {"w": w, "d_alpha": d_alpha, "d_m": d_m,
                        "d_x": jnp.where(x_pass, d_x, 0.0),
                        "d_y": jnp.where(y_pass, d_y, 0.0)}

            Bs = Bs + s_k * w
            E = E + w
            D = D + w * m
            T = T_k

        def stack(name):
            return jnp.concatenate(
                [per_k[k][name][None] for k in range(CHUNK)], axis=0)

        w_s = stack("w")
        d_alpha_s = stack("d_alpha")
        d_m_s = stack("d_m")
        d_x_s = stack("d_x")
        d_y_s = stack("d_y")

        # ---- vectorized chain rule over (K, 8, 128) ----
        opg = col(20) * r["g"]
        interior = jnp.logical_and(opg <= ALPHA_CLAMP, opg >= ALPHA_CUTOFF)
        interior = jnp.logical_and(interior, r["t"] > 1e-6)
        dag = jnp.where(interior, d_alpha_s, 0.0) * valid
        d_op = r["g"] * dag
        d_G = col(20) * dag
        surf_sel = r["g_surf"] >= r["g_scr"]
        dGs_eff = jnp.where(
            jnp.logical_and(surf_sel,
                            r["r2"] <= EXTENT_SIGMA * EXTENT_SIGMA),
            r["g_surf"] * d_G, 0.0)
        d_u = -r["u"] * dGs_eff
        d_v = -r["v"] * dGs_eff
        dGc_eff = jnp.where(surf_sel, 0.0, r["g_scr"] * d_G)
        d_xy0 = (r["dpx"] / AA_SIGMA2) * dGc_eff
        d_xy1 = (r["dpy"] / AA_SIGMA2) * dGc_eff

        uvu_raw = 0.5 + col(15) + r["t"] * r["b1ud"]
        uvv_raw = 0.5 + col(19) + r["t"] * r["b2ud"]
        u_pass = jnp.logical_and(uvu_raw >= 0.0, uvu_raw <= 1.0)
        v_pass = jnp.logical_and(uvv_raw >= 0.0, uvv_raw <= 1.0)
        d_uvu = jnp.where(u_pass, d_x_s * h_col, 0.0)
        d_uvv = jnp.where(v_pass, d_y_s * w_col, 0.0)

        kf = REG_FAR / (REG_FAR - REG_NEAR)
        tc = jnp.maximum(r["t"], REG_NEAR)
        d_t = w_s * g_depth[None]
        d_t = d_t + jnp.where(r["t"] >= REG_NEAR,
                              d_m_s * kf * REG_NEAR / (tc * tc), 0.0)
        d_t = d_t + d_u * r["b1d"] + d_v * r["b2d"]
        d_t = d_t + d_uvu * r["b1ud"] + d_uvv * r["b2ud"]

        nd_pass = jnp.abs(r["nd"]) >= 1e-9
        d_an = d_t / r["safe_nd"]
        d_nd = jnp.where(nd_pass, -r["t"] / r["safe_nd"] * d_t, 0.0)

        wfl = w_s * r["flip"]
        d0b, d1b, d2b = d0[None], d1[None], d2[None]

        def red(x):
            return jnp.sum(x, axis=(1, 2))               # (K,)

        cols = [
            red(d_nd * d0b + wfl * g_norm[0][None]),      # 0-2: n
            red(d_nd * d1b + wfl * g_norm[1][None]),
            red(d_nd * d2b + wfl * g_norm[2][None]),
            red(d_an),                                    # 3: a_n
            red(d_u * r["t"] * d0b),                      # 4-6: b1
            red(d_u * r["t"] * d1b),
            red(d_u * r["t"] * d2b),
            red(d_u),                                     # 7: a1
            red(d_v * r["t"] * d0b),                      # 8-10: b2
            red(d_v * r["t"] * d1b),
            red(d_v * r["t"] * d2b),
            red(d_v),                                     # 11: a2
            red(d_uvu * r["t"] * d0b),                    # 12-14: b1u
            red(d_uvu * r["t"] * d1b),
            red(d_uvu * r["t"] * d2b),
            red(d_uvu),                                   # 15: a1u
            red(d_uvv * r["t"] * d0b),                    # 16-18: b2u
            red(d_uvv * r["t"] * d1b),
            red(d_uvv * r["t"] * d2b),
            red(d_uvv),                                   # 19: a2u
            red(d_op),                                    # 20: opacity
            red(w_s * g_img[0][None]),                    # 21-23: rgb
            red(w_s * g_img[1][None]),
            red(w_s * g_img[2][None]),
            red(d_xy0),                                   # 24-25: xy
            red(d_xy1),
        ]
        grad_chunk = jnp.concatenate(
            [cc[:, None] for cc in cols]
            + [jnp.zeros((CHUNK, F_REC - len(cols)), jnp.float32)], axis=1)
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
            pl.BlockSpec((1, s_max * cw_blk, chart_pad[0] * 3),
                         lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, NCH * 8, 128), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, NG * 8, 128), lambda t, c, cam: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, s_max, F_REC), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, s_max * cw_blk, chart_pad[0] * 3),
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
