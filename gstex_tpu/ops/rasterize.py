"""Production XLA tile renderer with a custom VJP.

The TPU-native equivalent of ``gstex_cuda.texture.texture_gaussians``
(reference ``nerfstudio/models/gstex.py:1132-1172``): consumes the dense
per-tile front-to-back lists from ``binning.build_tile_bins`` and blends one
splat per scan step, vectorized over (tiles × pixels).

Reverse-mode: a straight autodiff of the blend scan would store per-step
carries (O(S·H·W) memory), so the backward is hand-derived — the classic
back-to-front walk that recovers transmittance via ``T_k = T_{k+1}/(1-α_k)``
and per-splat suffix sums (the structure of the fused CUDA backward,
SURVEY.md §2.1 stage 6) — while the *local* per-splat math (intersection,
falloff, chart fetch, distortion mapping) is pulled back with ``jax.vjp``
inside the reverse scan. Gradients are produced for all splat fields and
scatter-added into the dense chart tensor; camera inputs get zero gradients
(no camera optimization, matching the inert camera_opt group —
``full_images_datamanager.py:305-310``).

Derivation (per pixel; k indexes the tile's front-to-back list):
  w_k = α_k·T_k,  T_{k+1} = T_k(1-α_k)  (applied iff k < break index and α>0)
  O_ch = Σ_k w_k y_k,ch                  for img/tex/depth/alpha/normal
  O_reg = Σ_k 2 w_k (m_k A_k − C_k),     A_k = Σ_{j<k} w_j, C_k = Σ_{j<k} w_j m_j
  ∂L/∂w_k = s_k = Σ_ch g_ch y_k,ch + 2 g_reg [(m_k A_k − C_k) + (D_k − m_k E_k)]
  ∂L/∂α_k = T_k s_k − (Σ_{j>k} s_j w_j)/(1−α_k)
  ∂L/∂m_k = 2 g_reg w_k (A_k − E_k)
with suffix sums E_k = Σ_{j>k} w_j, D_k = Σ_{j>k} w_j m_j maintained
back-to-front and prefixes recovered as A_k = M0 − w_k − E_k,
C_k = M1 − w_k m_k − D_k from the forward totals M0 (= alpha map), M1.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import surfel
from .binning import TileBins, TileGrid
from .camera import Camera, camera_origin, pixel_ray_dirs
from .surfel import SplatGeom, T_EPS


def _tile_pixel_coords(grid: TileGrid):
    """Continuous pixel coords per (tile, local pixel): two (T, P) arrays."""
    th, tw = grid.tile_h, grid.tile_w
    ty, tx = np.mgrid[0 : grid.nty, 0 : grid.ntx]
    ly, lx = np.mgrid[0:th, 0:tw]
    px_x = (tx.reshape(-1, 1) * tw + lx.reshape(1, -1)).astype(np.float32)
    px_y = (ty.reshape(-1, 1) * th + ly.reshape(1, -1)).astype(np.float32)
    return jnp.asarray(px_x), jnp.asarray(px_y)


def untile(maps: jax.Array, grid: TileGrid) -> jax.Array:
    """(T, P, c) or (T, P) per-tile maps -> (H, W[, c]) image."""
    squeeze = maps.ndim == 2
    if squeeze:
        maps = maps[..., None]
    c = maps.shape[-1]
    th, tw = grid.tile_h, grid.tile_w
    img = maps.reshape(grid.nty, grid.ntx, th, tw, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(grid.nty * th, grid.ntx * tw, c)
    img = img[: grid.height, : grid.width]
    return img[..., 0] if squeeze else img


def _expand_geom(g: SplatGeom) -> SplatGeom:
    """Add a pixel axis: (T, ...) -> (T, 1, ...) for broadcasting against (T, P)."""
    return jax.tree.map(lambda a: a[:, None] if a.ndim == 1 else a[:, None, :], g)


# texel-fetch contraction precision: "highest" = fp32 (exact parity);
# "default" = bf16 multiplies (~2-8x faster on MXU, ~0.4% relative error on
# albedo values). Settable by benchmarks/configs.
TEXEL_PRECISION = "highest"


def _texel_precision():
    return (jax.lax.Precision.HIGHEST if TEXEL_PRECISION == "highest"
            else jax.lax.Precision.DEFAULT)


def _separable_texel(chart, hw, uv):
    """Bilinear chart sample as a separable-weight contraction (gather-free).

    Mathematically identical to ``surfel.chart_sample_bilinear`` (the oracle
    keeps the gather form as an independent implementation); per-pixel
    dynamic-index gathers lower catastrophically on TPU, einsums don't.
    chart: (T, Ch, Cw, C); hw: (T, 2); uv: (T, P, 2) -> (T, P, C).
    """
    ch, cw = chart.shape[1], chart.shape[2]
    hf = hw[:, 0:1].astype(chart.dtype)
    wf = hw[:, 1:2].astype(chart.dtype)
    x = jnp.clip(uv[..., 0] * hf, 0.0, hf - 1.0)
    y = jnp.clip(uv[..., 1] * wf, 0.0, wf - 1.0)
    a = jnp.arange(ch, dtype=chart.dtype)
    b = jnp.arange(cw, dtype=chart.dtype)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - a))   # (T,P,Ch)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[..., None] - b))   # (T,P,Cw)
    return jnp.einsum("tpa,tpb,tabc->tpc", wx, wy, chart,
                      precision=_texel_precision())


def _splat_local(g: SplatGeom, chart, hw, origin, dirs, px):
    """Per-splat, per-pixel local quantities. All leading dims (T, P).

    The differentiable "inner loop body": everything the blend recurrence
    consumes from one splat. Pulled back with jax.vjp in the backward pass.
    """
    hit = surfel.intersect(_expand_geom(g), origin, dirs, px)
    texel = _separable_texel(chart, hw, hit["uv"])
    m = surfel.reg_depth_map(hit["t"])
    return {
        "alpha": hit["alpha"],
        "texel": texel,
        "t": hit["t"],
        "n_eff": hit["n_eff"],
        "m": m,
        "uv": hit["uv"],
    }


def _splat_local_chunk(g: SplatGeom, chart, hw, origin, dirs, px):
    """Chunk-vectorized per-splat quantities: leading dims (T, K, P).

    g fields are (T, K, ...); dirs/px are (T, P, ...). Vectorizing K splats
    per scan step amortizes the per-step overhead that dominates long scans
    on TPU.
    """
    gk = jax.tree.map(
        lambda a: a[:, :, None] if a.ndim == 2 else a[:, :, None, :], g)
    hit = surfel.intersect(gk, origin, dirs[:, None], px[:, None])
    ch, cw = chart.shape[2], chart.shape[3]
    hf = hw[..., 0:1, None].astype(chart.dtype)          # (T,K,1,1)
    wf = hw[..., 1:2, None].astype(chart.dtype)
    x = jnp.clip(hit["uv"][..., 0] * hf[..., 0], 0.0, hf[..., 0] - 1.0)
    y = jnp.clip(hit["uv"][..., 1] * wf[..., 0], 0.0, wf[..., 0] - 1.0)
    a = jnp.arange(ch, dtype=chart.dtype)
    b = jnp.arange(cw, dtype=chart.dtype)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - a))   # (T,K,P,Ch)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[..., None] - b))   # (T,K,P,Cw)
    texel = jnp.einsum("tkpa,tkpb,tkabc->tkpc", wx, wy, chart,
                       precision=_texel_precision())
    m = surfel.reg_depth_map(hit["t"])
    return {
        "alpha": hit["alpha"],
        "texel": texel,
        "t": hit["t"],
        "n_eff": hit["n_eff"],
        "m": m,
        "uv": hit["uv"],
    }


SCAN_CHUNK = 8  # splats per scan step (s_max must be a multiple)


def _chunk_xs(ids, mask, s_cap):
    num_tiles = ids.shape[0]
    k = SCAN_CHUNK
    assert s_cap % k == 0, f"s_max {s_cap} must be a multiple of {k}"
    ids_c = ids.reshape(num_tiles, s_cap // k, k).transpose(1, 0, 2)
    mask_c = mask.reshape(num_tiles, s_cap // k, k).transpose(1, 0, 2)
    s_base = jnp.arange(s_cap // k, dtype=jnp.int32) * k
    return s_base, ids_c, mask_c


def _forward_scan(geom, texture, texture_hw, ids, mask, origin, dirs, px,
                  extra: bool):
    """Front-to-back blend, SCAN_CHUNK splats per scan step.

    Returns (maps, aux) with maps per (T, P[, c]) and aux residuals
    (T_final, n_contrib, m1 total) for the backward walk.
    """
    num_tiles, P = px.shape[0], px.shape[1]
    s_cap = ids.shape[1]
    tex_c = texture.shape[-1]
    dt = jnp.result_type(texture.dtype, jnp.float32)
    K = SCAN_CHUNK

    def body(carry, xs):
        T, n_contrib, acc = carry
        s_base, ids_c, mask_c = xs                      # (T,K)
        g = jax.tree.map(lambda a: a[ids_c], geom)      # (T,K,...)
        chart = texture[ids_c]
        hw = texture_hw[ids_c]
        outs = _splat_local_chunk(g, chart, hw, origin, dirs, px)
        a_all = jnp.where(mask_c[:, :, None], outs["alpha"], 0.0)

        new_acc = dict(acc)
        for k in range(K):
            a = a_all[:, k]
            considered = jnp.logical_and(a > 0.0, n_contrib == s_cap)
            next_T = T * (1.0 - a)
            would_break = jnp.logical_and(considered, next_T <= T_EPS)
            applied = jnp.logical_and(considered, ~would_break)
            w = jnp.where(applied, a * T, 0.0)
            m = outs["m"][:, k]
            new_acc["img"] = new_acc["img"] + w[..., None] * g.rgb[:, k, None, :]
            new_acc["tex"] = new_acc["tex"] + w[..., None] * outs["texel"][:, k]
            new_acc["depth"] = new_acc["depth"] + w * outs["t"][:, k]
            new_acc["normal"] = (new_acc["normal"]
                                 + w[..., None] * outs["n_eff"][:, k])
            new_acc["reg"] = new_acc["reg"] + 2.0 * w * (
                m * new_acc["alpha"] - new_acc["m1"])
            new_acc["alpha"] = new_acc["alpha"] + w
            new_acc["m1"] = new_acc["m1"] + w * m
            if extra:
                uv_k = outs["uv"][:, k]
                new_acc["uv"] = new_acc["uv"] + w[..., None] * jnp.concatenate(
                    [uv_k, jnp.full_like(uv_k[..., :1], 0.5)], axis=-1)
            T = jnp.where(applied, next_T, T)
            n_contrib = jnp.where(would_break, s_base + k, n_contrib)
        return (T, n_contrib, new_acc), None

    acc0 = {
        "img": jnp.zeros((num_tiles, P, 3), dt),
        "tex": jnp.zeros((num_tiles, P, tex_c), dt),
        "depth": jnp.zeros((num_tiles, P), dt),
        "alpha": jnp.zeros((num_tiles, P), dt),
        "normal": jnp.zeros((num_tiles, P, 3), dt),
        "reg": jnp.zeros((num_tiles, P), dt),
        "m1": jnp.zeros((num_tiles, P), dt),
    }
    if extra:
        acc0["uv"] = jnp.zeros((num_tiles, P, 3), dt)

    init = (
        jnp.ones((num_tiles, P), dt),
        jnp.full((num_tiles, P), s_cap, jnp.int32),
        acc0,
    )
    xs = _chunk_xs(ids, mask, s_cap)
    (T_fin, n_contrib, acc), _ = jax.lax.scan(body, init, xs)

    maps = {k: acc[k] for k in acc if k != "m1"}
    aux = {"T_final": T_fin, "n_contrib": n_contrib, "m1": acc["m1"]}
    return maps, aux


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _raster_core(grid: TileGrid, geom: SplatGeom, texture, cam_arrays, aux_in):
    maps, _ = _raster_core_fwd_impl(grid, geom, texture, cam_arrays, aux_in)
    return maps


def _pixel_geometry(grid, cam_arrays):
    px_x, px_y = _tile_pixel_coords(grid)
    fx, fy, cx, cy, c2w, px_off = cam_arrays
    # px_off shifts this grid within the full image — used when a device
    # renders only its band of tile rows (parallel/shard.py)
    px_x = px_x + px_off[0]
    px_y = px_y + px_off[1]
    dx = (px_x + 0.5 - cx) / fx
    dy = (px_y + 0.5 - cy) / fy
    d_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)
    flip = jnp.diag(jnp.array([1.0, -1.0, -1.0], jnp.float32))
    # precision=HIGHEST: default f32 matmul is ONE bf16 MXU pass on TPU —
    # degraded ray dirs moved trained-scene ray-surfel hits by whole
    # texels (round-4 renderer-consistency failure, see ops/camera.py)
    hp = jax.lax.Precision.HIGHEST
    R = jnp.matmul(c2w[:3, :3], flip, precision=hp)
    dirs = jnp.matmul(d_cam, R.T, precision=hp)
    origin = c2w[:3, 3]
    px = jnp.stack([px_x, px_y], axis=-1)
    return origin, dirs, px


def _raster_core_fwd_impl(grid, geom, texture, cam_arrays, aux_in):
    origin, dirs, px = _pixel_geometry(grid, cam_arrays)
    maps, aux = _forward_scan(
        geom, texture, aux_in["texture_hw"], aux_in["ids"], aux_in["mask"],
        origin, dirs, px, extra=False)
    return maps, aux


def _raster_core_fwd(grid, geom, texture, cam_arrays, aux_in):
    maps, aux = _raster_core_fwd_impl(grid, geom, texture, cam_arrays, aux_in)
    res = (geom, texture, cam_arrays, aux_in, aux,
           maps["alpha"], aux["m1"])
    return maps, res


def _raster_core_bwd(grid, res, g_maps):
    geom, texture, cam_arrays, aux_in, aux, m0_tot, m1_tot = res
    ids, mask, texture_hw = aux_in["ids"], aux_in["mask"], aux_in["texture_hw"]
    origin, dirs, px = _pixel_geometry(grid, cam_arrays)
    s_cap = ids.shape[1]
    n_contrib = aux["n_contrib"]

    g_img = g_maps["img"]
    g_tex = g_maps["tex"]
    g_depth = g_maps["depth"]
    g_alpha = g_maps["alpha"]
    g_normal = g_maps["normal"]
    g_reg = g_maps["reg"]

    geom_grads0 = jax.tree.map(jnp.zeros_like, geom)
    texture_grad0 = jnp.zeros_like(texture)

    K = SCAN_CHUNK

    def body(carry, xs):
        T_next, Bs, E, D = carry
        s_base, ids_c, mask_c = xs                       # (T,K)
        g = jax.tree.map(lambda a: a[ids_c], geom)
        chart = texture[ids_c]
        hw = texture_hw[ids_c]

        outs, pull = jax.vjp(
            lambda g_, c_: _splat_local_chunk(g_, c_, hw, origin, dirs, px),
            g, chart)
        a_all = jnp.where(mask_c[:, :, None], outs["alpha"], 0.0)

        # reverse unrolled recurrence over the chunk; per-splat cotangents
        # are collected and pulled back through the chunk vjp in one call
        cot_alpha = [None] * K
        cot_texel = [None] * K
        cot_t = [None] * K
        cot_n = [None] * K
        cot_m = [None] * K
        w_list = [None] * K
        T = T_next
        for k in reversed(range(K)):
            a = a_all[:, k]
            applied = jnp.logical_and(a > 0.0, s_base + k < n_contrib)
            T_k = jnp.where(applied, T / (1.0 - a), T)
            w = jnp.where(applied, a * T_k, 0.0)
            m = outs["m"][:, k]
            A_k = m0_tot - w - E
            C_k = m1_tot - w * m - D

            s_direct = (
                jnp.einsum("tc,tpc->tp", g.rgb[:, k], g_img,
                           precision=jax.lax.Precision.HIGHEST)
                + jnp.sum(outs["texel"][:, k] * g_tex, axis=-1)
                + outs["t"][:, k] * g_depth
                + g_alpha
                + jnp.sum(outs["n_eff"][:, k] * g_normal, axis=-1)
            )
            s_k = s_direct + 2.0 * g_reg * ((m * A_k - C_k) + (D - m * E))
            d_alpha = jnp.where(applied, T_k * s_k - Bs / (1.0 - a), 0.0)
            d_alpha = jnp.where(mask_c[:, k, None], d_alpha, 0.0)
            d_m = 2.0 * g_reg * w * (A_k - E)

            cot_alpha[k] = d_alpha
            cot_texel[k] = w[..., None] * g_tex
            cot_t[k] = w * g_depth
            cot_n[k] = w[..., None] * g_normal
            cot_m[k] = d_m
            w_list[k] = w

            Bs = Bs + s_k * w
            E = E + w
            D = D + w * m
            T = T_k

        cot = {
            "alpha": jnp.stack(cot_alpha, axis=1),
            "texel": jnp.stack(cot_texel, axis=1),
            "t": jnp.stack(cot_t, axis=1),
            "n_eff": jnp.stack(cot_n, axis=1),
            "m": jnp.stack(cot_m, axis=1),
            "uv": jnp.zeros_like(outs["uv"]),
        }
        dg, dchart = pull(cot)
        # rgb is consumed outside _splat_local_chunk (identity path)
        d_rgb = jnp.einsum("tkp,tpc->tkc", jnp.stack(w_list, axis=1), g_img,
                           precision=jax.lax.Precision.HIGHEST)
        dg = dg._replace(rgb=dg.rgb + d_rgb)

        # emit per-chunk pair grads (stacked by scan) — one bulk segment-sum
        # afterwards is far cheaper than per-step scatter-adds on TPU
        return (T, Bs, E, D), (dg, dchart)

    num_tiles, P = px.shape[0], px.shape[1]
    dt = aux["T_final"].dtype
    init = (
        aux["T_final"],
        jnp.zeros((num_tiles, P), dt),
        jnp.zeros((num_tiles, P), dt),
        jnp.zeros((num_tiles, P), dt),
    )
    xs = _chunk_xs(ids, mask, s_cap)
    _, (dg_steps, dchart_steps) = jax.lax.scan(
        body, init, xs, reverse=True)

    # bulk reduction of the (S/K, T, K, ...) pair grads by gaussian id
    n = texture.shape[0]
    flat_ids = xs[1].reshape(-1)                     # (S*T,) chunk-major
    geom_gr = jax.tree.map(
        lambda stacked, buf: jax.ops.segment_sum(
            stacked.reshape((-1,) + stacked.shape[3:]), flat_ids,
            num_segments=n).astype(buf.dtype),
        dg_steps, geom_grads0)
    tex_gr = jax.ops.segment_sum(
        dchart_steps.reshape((-1,) + dchart_steps.shape[3:]), flat_ids,
        num_segments=n).astype(texture_grad0.dtype)

    cam_zeros = jax.tree.map(jnp.zeros_like, cam_arrays)
    aux_zeros = jax.tree.map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), aux_in)
    return geom_gr, tex_gr, cam_zeros, aux_zeros


_raster_core.defvjp(_raster_core_fwd, _raster_core_bwd)


def rasterize(
    geom: SplatGeom,
    texture: jax.Array,
    texture_hw: jax.Array,
    bins: TileBins,
    cam: Camera,
    grid: TileGrid,
    extra_channels: bool = False,
    px_offset=None,
):
    """Render all output maps as (H, W, ...) images.

    Differentiable wrt geom fields and texture. When ``extra_channels`` is
    set, adds the forward-only ``uv`` visualization map (the C=6 eval render
    of ``gstex.py:1086-1088,1195``) — not differentiable.
    """
    if px_offset is None:
        px_offset = jnp.zeros((2,), jnp.float32)
    cam_arrays = (cam.fx, cam.fy, cam.cx, cam.cy, cam.c2w,
                  jnp.asarray(px_offset, jnp.float32))
    aux_in = {"ids": bins.ids, "mask": bins.mask,
              "texture_hw": texture_hw}
    if extra_channels:
        origin, dirs, px = _pixel_geometry(grid, cam_arrays)
        maps, _ = _forward_scan(geom, texture, texture_hw, bins.ids, bins.mask,
                                origin, dirs, px, extra=True)
    else:
        maps = _raster_core(grid, geom, texture, cam_arrays, aux_in)
    out = {
        "img": untile(maps["img"], grid),
        "texture_rgb": untile(maps["tex"], grid),
        "depth": untile(maps["depth"], grid),
        "alpha": untile(maps["alpha"], grid),
        "normal": untile(maps["normal"], grid),
        "reg": untile(maps["reg"], grid),
    }
    if extra_channels:
        out["uv"] = untile(maps["uv"], grid)
    return out
