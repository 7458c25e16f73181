"""GStex model: parameters, chart budgeting, rendering, losses (functional).

The JAX re-design of ``GStexModel`` (reference ``nerfstudio/models/gstex.py``):
parameters are a pytree, rendering and losses are pure functions, and the
jagged texture is a dense padded chart tensor (DESIGN.md). All reference
semantics are cited inline.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sh as sh_ops
from ..ops import ssim as ssim_ops
from ..ops import ssim_fused
from ..ops.binning import TileBins, TileGrid, build_tile_bins
from ..ops.camera import Camera
from ..ops.prepare import activate_scales, prepare_splats
from ..ops.rasterize import rasterize
from ..ops.surfel import chart_sample_bilinear


class GStexParams(NamedTuple):
    """Trainable leaves (the per-group optimizer targets,
    ``gstex.py:928-943``)."""

    means: jax.Array          # (N,3)
    log_scales: jax.Array     # (N,2) — 3rd axis is derived, not a parameter
    quats: jax.Array          # (N,4) wxyz
    opacity_logits: jax.Array  # (N,1)
    features_dc: jax.Array    # (N,3)
    features_rest: jax.Array  # (N,K-1,3)
    texture: jax.Array        # (N,Ch,Cw,3) dense padded charts (texture_dc)


class GStexBuffers(NamedTuple):
    """Non-trainable state (buffers in the reference)."""

    texture_hw: jax.Array     # (N,2) int32 active chart dims (texture_dims)
    mappings: jax.Array       # (N,2) chart uv scales (detached in use)
    pixel_scale: jax.Array    # () float32 (gstex.py:250)
    test_colors: jax.Array    # (N,3) eval visualization colors (gstex.py:309)


@dataclasses.dataclass(frozen=True)
class GStexConfig:
    """Mirrors ``GStexModelConfig`` (``gstex.py:163-221``) plus TPU knobs."""

    sh_degree: int = 3
    sh_degree_interval: int = 1000
    ssim_lambda: float = 0.2
    pixel_num: float = 1e6
    sigma_factor: float = 3.0
    build_chart_every: int = 100
    background_color: str = "random"   # random | black | white
    lambda_normal: Union[float, Sequence[float]] = 0.0
    lambda_reg: Union[float, Sequence[float]] = 0.0
    use_normal_loss: bool = False
    fix_init: bool = False
    num_downscales: int = 0        # start at 1/2^d resolution (gstex.py:180)
    resolution_schedule: int = 250  # double every n steps (gstex.py:176)
    # TPU-specific
    # dense chart padding (Ch, Cw); None = auto-size from the scene's true
    # (unclamped) chart-dimension distribution at init (resolve_chart_pad)
    chart_pad: Optional[tuple[int, int]] = (8, 8)
    chart_pad_max: tuple[int, int] = (128, 128)  # auto-pad hard ceiling
    chart_pad_headroom: float = 1.25   # auto-pad growth slack for recharts
    # dense texture storage budget (bytes) for the auto pad: at large N a
    # heavy scale tail would otherwise blow up (N, Ch, Cw, 3) storage
    chart_mem_budget: float = 2e9
    tile_h: int = 32
    tile_w: int = 32
    pair_cap: int = 1 << 20
    s_max: int = 512
    renderer: str = "xla"                 # xla | pallas | pallas_interpret
    # conservative per-pair alpha cull at binning time (ops/cull.py):
    # output-identical (drops only pairs the kernel's 1/255 cutoff zeroes)
    pair_cull: bool = True
    # mixed precision (the reference plumbs GradScaler but ships
    # mixed_precision=False, ``engine/trainer.py:130,460``): "bf16" streams
    # the packed chart table in bfloat16 — texel fetches upcast to f32 in
    # the kernels and every gradient/accumulation stays f32. Halves the
    # chart DMA traffic; PSNR impact measured on the held-out protocol
    # (DESIGN.md round-4 notes) before choosing the default.
    texel_dtype: str = "f32"              # f32 | bf16
    # one-pass Pallas SSIM loss+grad (ops/ssim_fused.py; ~12 ms/step of
    # XLA conv slices -> ~4.6 ms at 800², bitwise-equivalent grads).
    # Falls back to the XLA convs when the image shape is unsupported.
    fused_ssim: bool = True

    def grid(self, height: int, width: int) -> TileGrid:
        return TileGrid(height=height, width=width,
                        tile_h=self.tile_h, tile_w=self.tile_w)


def _table_dtype(cfg: "GStexConfig"):
    """Packed-chart-table dtype for the texel_dtype mixed-precision knob
    (bf16 texel streams, f32 accumulation everywhere)."""
    return jnp.bfloat16 if cfg.texel_dtype == "bf16" else None


def lean_losses(cfg: "GStexConfig") -> bool:
    """True when the reg + normal loss terms are STATICALLY zero (plain 0
    floats, no schedules, no normal loss) — the headline NVS configs. The
    Pallas kernels then skip the whole depth-distortion / normal compute
    chain (their cotangents are structural zeros the opaque kernel could
    not otherwise see)."""
    def _zero(v):
        return isinstance(v, (int, float)) and float(v) == 0.0

    return (_zero(cfg.lambda_reg) and _zero(cfg.lambda_normal)
            and not cfg.use_normal_loss)


def schedule_value(v, step):
    """lambda_normal / lambda_reg schedules: float or [v0, v1, switch_step]
    (``gstex.py:1304-1311``)."""
    if isinstance(v, (int, float)):
        return jnp.float32(v)
    v0, v1, sw = v
    return jnp.where(step >= sw, jnp.float32(v1), jnp.float32(v0))


def active_sh_degree(cfg: GStexConfig, step):
    """SH degree schedule (``gstex.py:1103``)."""
    return jnp.minimum(step // cfg.sh_degree_interval, cfg.sh_degree)


# ---------------------------------------------------------------------------
# chart budgeting (build_charts, gstex.py:841-888)
# ---------------------------------------------------------------------------

def resolve_chart_pad(cfg: GStexConfig, log_scales: jax.Array
                      ) -> tuple[int, int]:
    """Scene-adaptive dense chart pad: run the texel-budget search with NO
    dim clamp, take the max resulting (h, w) with rechart headroom, round up
    to a multiple of 8, and cap at ``chart_pad_max``.

    This is what makes the reference's arbitrary-size jagged charts
    (``jagged_texture.py:36-43``; LOD configs need charts ~88x88,
    ``scripts/blender_lod.py:26`` with pixel_num=1e6 over 128 Gaussians)
    reachable in the static-shape dense layout: the pad is chosen per scene
    at init, large enough that the budget clamp never bites.
    """
    big = (100000, 100000)   # effectively unclamped search
    hw, _, _ = build_charts(cfg, log_scales, pad=big)
    h = float(jnp.max(hw[:, 0])) * cfg.chart_pad_headroom
    w = float(jnp.max(hw[:, 1])) * cfg.chart_pad_headroom
    # dense storage budget: shrink the pad (aspect-preserving) until
    # N*Ch*Cw*3*4 bytes fits chart_mem_budget — the tail then clamps (the
    # budget search compensates, like the reference's global scale would)
    n = log_scales.shape[0]
    area_cap = cfg.chart_mem_budget / (n * 12.0)
    if h * w > area_cap:
        sc = float(np.sqrt(area_cap / (h * w)))
        h, w = max(h * sc, 1.0), max(w * sc, 1.0)
    rnd = lambda v: max(8, -(-int(np.ceil(v)) // 8) * 8)
    return (min(rnd(h), cfg.chart_pad_max[0]),
            min(rnd(w), cfg.chart_pad_max[1]))


def build_charts(cfg: GStexConfig, log_scales: jax.Array,
                 update_pixel_scale: bool = True,
                 pixel_scale: Optional[jax.Array] = None,
                 pad: Optional[tuple[int, int]] = None):
    """Binary-search the global texel scale so Σ ceil(σf·l0/s)·ceil(σf·l1/s)
    hits the ``pixel_num`` budget within 0.1%, then derive per-Gaussian chart
    dims and uv mappings (``gstex.py:841-888``). Chart dims are additionally
    clamped to the dense storage pad ``pad`` (DESIGN.md deviation;
    budget-neutral via the clamped score; with an auto-resolved pad the
    clamp never bites at init).

    Returns (texture_hw (N,2) int32, mappings (N,2), pixel_scale ()).
    """
    sf = cfg.sigma_factor
    if pad is None:
        pad = cfg.chart_pad
        if pad is None:
            raise ValueError("build_charts needs an explicit pad when "
                             "cfg.chart_pad is auto (None)")
    ch, cw = pad
    l0, l1 = activate_scales(jax.lax.stop_gradient(log_scales))
    target = float(cfg.pixel_num)

    def dims_at(scale):
        h = jnp.clip(jnp.ceil(sf * l0 / scale), 1, ch)
        w = jnp.clip(jnp.ceil(sf * l1 / scale), 1, cw)
        return h, w

    def score(scale):
        h, w = dims_at(scale)
        return jnp.sum(h * w)

    if target <= 0:
        # pixel_num == 0 simulates 2DGS: one texel per Gaussian
        # (gstex.py:204-206)
        hw = jnp.ones((l0.shape[0], 2), jnp.int32)
        mappings = jnp.stack([1.0 / (2 * sf * l0), 1.0 / (2 * sf * l1)], -1)
        ps = pixel_scale if pixel_scale is not None else jnp.float32(10.0)
        return hw, mappings, ps

    if update_pixel_scale or pixel_scale is None:
        lo = jnp.float32(10.0)
        hi = jnp.sqrt(jnp.sum(sf * sf * l0 * l1) / target)
        # the closed-form hi ignores ceil() and the pad clamp: when the clamp
        # binds (e.g. auto pad capped at chart_pad_max), score(hi) can fall
        # short and the true solution lies below — expand the bracket until
        # hi yields enough texels (or the pad capacity ceiling is hit)
        hi = jax.lax.while_loop(
            lambda s: jnp.logical_and(score(s) < target, s > 1e-8),
            lambda s: s * 0.5, hi)
        tol = 1e-3

        def body(i, carry):
            lo, hi, mid = carry
            s = score(mid)
            too_few = s < (1 - tol) * target
            done = jnp.logical_and(~too_few, s <= (1 + tol) * target)
            new_lo = jnp.where(too_few, mid, lo)
            new_hi = jnp.where(too_few, hi, mid)
            new_mid = jnp.where(done, mid, 0.5 * (new_lo + new_hi))
            return (jnp.where(done, lo, new_lo), jnp.where(done, hi, new_hi),
                    new_mid)

        mid0 = 0.5 * (lo + hi)
        _, _, scale = jax.lax.fori_loop(0, 31, body, (lo, hi, mid0))
    else:
        scale = pixel_scale

    h, w = dims_at(scale)
    hw = jnp.stack([h, w], axis=-1).astype(jnp.int32)
    mappings = jnp.stack([1.0 / (2.0 * sf * l0), 1.0 / (2.0 * sf * l1)],
                         axis=-1)
    return hw, mappings, scale


def resample_charts(texture: jax.Array, old_hw: jax.Array,
                    new_hw: jax.Array) -> jax.Array:
    """Bilinear-resample every chart from its old active dims to new dims.

    The dense-layout equivalent of ``JaggedTexture.init_from_dims`` +
    ``texture_sample`` (``jagged_texture.py:116-143``): new texel (a,b) sits
    at uv = (a/h', b/w') and samples the old chart. Texels outside the new
    active region are zeroed.
    """
    n, ch, cw, c = texture.shape
    aa, bb = jnp.meshgrid(jnp.arange(ch), jnp.arange(cw), indexing="ij")

    def one(chart, ohw, nhw):
        uv = jnp.stack([aa / nhw[0], bb / nhw[1]], axis=-1).astype(jnp.float32)
        vals = chart_sample_bilinear(chart, ohw[0], ohw[1], uv)
        active = jnp.logical_and(aa < nhw[0], bb < nhw[1])
        return jnp.where(active[..., None], vals, 0.0)

    return jax.vmap(one)(texture, old_hw, new_hw)


def rechart(cfg: GStexConfig, params: GStexParams, buffers: GStexBuffers):
    """The every-100-steps retexture callback (``gstex.py:890-895``):
    re-budget charts, resample the texture, refresh mappings. Shapes are
    static — no realloc, no recompilation. Dims clamp to the texture's
    actual storage pad (auto-resolved with headroom at init)."""
    new_hw, mappings, scale = build_charts(
        cfg, params.log_scales, pad=params.texture.shape[1:3])
    new_texture = resample_charts(params.texture, buffers.texture_hw, new_hw)
    params = params._replace(texture=new_texture)
    buffers = buffers._replace(texture_hw=new_hw, mappings=mappings,
                               pixel_scale=scale)
    return params, buffers


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_params(
    cfg: GStexConfig,
    means: jax.Array,
    log_scales2: jax.Array,
    quats: jax.Array,
    opacity_logits: jax.Array,
    features_dc: jax.Array,
    features_rest: jax.Array,
    key: Optional[jax.Array] = None,
) -> tuple[GStexParams, GStexBuffers]:
    """Build params + buffers from raw (pre-activation) fields, e.g. a loaded
    2DGS ply (``gstex.py:241-377``). The texture dc is initialized from
    features_dc broadcast over each chart (``gstex.py:341-342`` clones
    features_dc into the 1×1 charts, then ``build_charts`` resamples — which
    replicates the dc across the chart)."""
    n = means.shape[0]
    pad = cfg.chart_pad
    if pad is None:
        pad = resolve_chart_pad(cfg, jnp.asarray(log_scales2, jnp.float32))
    ch, cw = pad
    hw, mappings, scale = build_charts(cfg, log_scales2, pad=pad)
    texture = jnp.zeros((n, ch, cw, 3), jnp.float32)
    # dc replicated across each active chart (what resampling a 1-texel chart
    # produces in the reference)
    aa, bb = jnp.meshgrid(jnp.arange(ch), jnp.arange(cw), indexing="ij")

    def fill(dc, nhw):
        active = jnp.logical_and(aa < nhw[0], bb < nhw[1])
        return jnp.where(active[..., None], dc[None, None, :], 0.0)

    texture = jax.vmap(fill)(features_dc, hw)
    params = GStexParams(
        means=jnp.asarray(means, jnp.float32),
        log_scales=jnp.asarray(log_scales2, jnp.float32),
        quats=jnp.asarray(quats, jnp.float32),
        opacity_logits=jnp.asarray(opacity_logits, jnp.float32).reshape(n, 1),
        features_dc=jnp.asarray(features_dc, jnp.float32),
        features_rest=jnp.asarray(features_rest, jnp.float32),
        texture=texture,
    )
    if key is None:
        key = jax.random.key(0)
    buffers = GStexBuffers(
        texture_hw=hw,
        mappings=mappings,
        pixel_scale=jnp.asarray(scale, jnp.float32),
        test_colors=jax.random.uniform(key, (n, 3)),
    )
    return params, buffers


# ---------------------------------------------------------------------------
# rendering
# ---------------------------------------------------------------------------

def render(
    cfg: GStexConfig,
    params: GStexParams,
    buffers: GStexBuffers,
    cam: Camera,
    step,
    background: jax.Array,
    extra: bool = False,
    eval_only: bool = False,
):
    """Full forward render (``GStexModel.get_outputs``, ``gstex.py:992-1236``).

    Returns the composited rgb plus raw maps. ``background`` is (3,).
    ``eval_only`` (pallas renderers only) uses the forward-only kernel:
    rgb/depth/alpha maps without loss channels or backward residuals.
    """
    prep = prepare_splats(
        params.means, params.log_scales, params.quats, params.opacity_logits,
        params.features_dc, params.features_rest, buffers.mappings, cam,
        active_sh_degree=active_sh_degree(cfg, step),
        sh_degree=cfg.sh_degree, fix_init=cfg.fix_init,
        extent_sigma=cfg.sigma_factor)
    if cfg.renderer == "oracle":
        # per-pixel fp32 oracle (``gstex_cuda._torch_impl`` analog,
        # SURVEY.md §4.1): no binning, no capacities, cannot overflow —
        # the independent referee for parity GT (round-3 verdict item 2)
        from ..ops.rasterize_ref import render_oracle

        if cfg.sh_degree > 0:
            texture = sh_ops.sh_to_rgb(params.texture)
        else:
            texture = jax.nn.sigmoid(params.texture)
        maps = render_oracle(prep.geom, texture, buffers.texture_hw, cam,
                             extra_channels=extra)
        rgb = maps["img"] + maps["texture_rgb"] + (
            1.0 - maps["alpha"][..., None]) * background[None, None, :]
        out = dict(maps)
        out["rgb"] = jnp.clip(rgb, 0.0, 1.0)
        out["background"] = background
        out["overflow"] = jnp.int32(0)
        out["total_pairs"] = jnp.int32(0)
        out["max_tile_count"] = jnp.int32(0)
        if cfg.use_normal_loss:
            from ..ops.normals import depth_to_normal

            out["estimated_normals"] = jax.lax.stop_gradient(
                depth_to_normal(maps["depth"], cam))
        return out
    grid = cfg.grid(cam.height, cam.width)
    cull_fn = None
    if cfg.pair_cull:
        from ..ops.cull import make_pair_cull

        cull_fn = make_pair_cull(jax.lax.stop_gradient(prep.geom), cam, grid)
    # the default pallas tier (v5) consumes the flat pair-major layout;
    # the dense (T, s_max) lists back the older tiers, the XLA oracle, and
    # the huge-chart fallback (see rasterize_pallas_api.use_flat_path).
    # When NEITHER pallas tier fits the chart shape in memory (the
    # chart_pad_max regime: few gaussians, giant per-gaussian charts —
    # v5's pair-space grad rows overflow HBM, v4's per-tile chart-grad
    # output window overflows VMEM), fall back to the XLA tier: that
    # regime is low-pair-count by construction, so the scan renderer is
    # both correct and fast enough there.
    from ..ops.rasterize_pallas_api import dense_pallas_fits, use_flat_path

    use_flat = not extra and use_flat_path(
        cfg.renderer, params.texture.shape[1:3], cfg.pair_cap,
        grid.num_tiles)
    if (not use_flat and cfg.renderer.startswith("pallas")
            and not dense_pallas_fits(params.texture.shape[1:3],
                                      cfg.s_max)):
        cfg = dataclasses.replace(cfg, renderer="xla")
    if use_flat:
        from ..ops.binning import build_tile_bins_flat

        bins = build_tile_bins_flat(prep.centers, prep.extents, prep.depths,
                                    prep.valid, grid, pair_cap=cfg.pair_cap,
                                    s_cap=cfg.s_max, cull_fn=cull_fn)
    else:
        bins = build_tile_bins(prep.centers, prep.extents, prep.depths,
                               prep.valid, grid, pair_cap=cfg.pair_cap,
                               s_max=cfg.s_max, cull_fn=cull_fn)
    # texture albedo: SH2RGB(texture_dc) when sh_degree>0, else sigmoid
    # (gstex.py:1117-1121)
    if cfg.sh_degree > 0:
        texture = sh_ops.sh_to_rgb(params.texture)
    else:
        texture = jax.nn.sigmoid(params.texture)
    if use_flat and eval_only:
        from ..ops.rasterize_pallas_api import rasterize_pl5_eval

        maps = rasterize_pl5_eval(prep.geom, texture, buffers.texture_hw,
                                  bins, cam, grid, s_cap=cfg.s_max,
                                  interpret="interpret" in cfg.renderer,
                                  table_dtype=_table_dtype(cfg),
                                  background=background)
    elif use_flat:
        from ..ops.rasterize_pallas_api import rasterize_pl5

        import os as _os

        fuse_rgb = _os.environ.get("GSTEX_FUSE_RGB", "1") != "0"
        maps = rasterize_pl5(prep.geom, texture, buffers.texture_hw, bins,
                             cam, grid, s_cap=cfg.s_max,
                             interpret="interpret" in cfg.renderer,
                             lean=lean_losses(cfg),
                             background=background if fuse_rgb else None,
                             table_dtype=_table_dtype(cfg))
    elif cfg.renderer.startswith("pallas") and not extra and eval_only:
        from ..ops.rasterize_pallas_api import rasterize_pl_eval

        maps = rasterize_pl_eval(prep.geom, texture, buffers.texture_hw,
                                 bins, cam, grid,
                                 interpret="interpret" in cfg.renderer)
    elif cfg.renderer.startswith("pallas") and not extra:
        from ..ops.rasterize_pallas_api import rasterize_pl

        if cfg.renderer.startswith("pallas1"):
            version = 1
        elif cfg.renderer.startswith("pallas2"):
            version = 2
        elif cfg.renderer.startswith("pallas3"):
            version = 3
        else:
            version = 4
        maps = rasterize_pl(prep.geom, texture, buffers.texture_hw, bins,
                            cam, grid,
                            interpret="interpret" in cfg.renderer,
                            version=version)
    else:
        maps = rasterize(prep.geom, texture, buffers.texture_hw, bins, cam,
                         grid, extra_channels=extra)
    out = dict(maps)
    if "rgb" not in maps:
        rgb = maps["img"] + maps["texture_rgb"] + (
            1.0 - maps["alpha"][..., None]) * background[None, None, :]
        out["rgb"] = jnp.clip(rgb, 0.0, 1.0)  # gstex.py:1204-1205
    out["background"] = background
    out["overflow"] = bins.overflow
    out["total_pairs"] = bins.total_pairs
    out["max_tile_count"] = jnp.max(bins.counts)
    if cfg.use_normal_loss:
        from ..ops.normals import depth_to_normal

        out["estimated_normals"] = jax.lax.stop_gradient(
            depth_to_normal(maps["depth"], cam))
    return out


def render_eval_images(
    cfg: GStexConfig,
    params: GStexParams,
    buffers: GStexBuffers,
    cam: Camera,
    step,
    background: jax.Array,
    edit_texture: jax.Array | None = None,
):
    """The full eval image set (``gstex.py:1174-1235``): rgb, depth,
    accumulation, test (threshold-opacity random colors), uv visualization,
    edit overlay, clean normals, only_rgb / only_texture."""
    outputs = render(cfg, params, buffers, cam, step, background, extra=True)
    bg = background[None, None, :]
    alpha1 = outputs["alpha"][..., None]

    # test render: random per-gaussian colors, opacities thresholded at 0.5
    # (gstex.py:1188-1194: <=0.5 zeroed first, then >0.2 of the zeroed tensor
    # promoted — net effect: 1 if >0.5 else 0)
    test_logits = jnp.where(
        jax.nn.sigmoid(params.opacity_logits) > 0.5, 40.0, -40.0)
    test_params = params._replace(opacity_logits=test_logits)
    tmaps = _test_color_img(cfg, test_params, buffers, cam, step)
    test_img = jnp.clip(
        tmaps["img"] + (1.0 - tmaps["alpha"][..., None]) * bg, 0.0, 1.0)

    uv_im = jnp.clip(outputs["uv"] + (1.0 - alpha1) * bg, 0.0, 1.0)

    images = {
        "rgb": outputs["rgb"],
        "depth": outputs["depth"][..., None],
        "accumulation": alpha1,
        "test": test_img,
        "uv": uv_im,
        "only_rgb": jnp.clip(outputs["img"] + 0.5, 0.0, 1.0),
        "only_texture": jnp.clip(outputs["texture_rgb"], 0.0, 1.0),
        "clean_normal_img": jnp.clip(
            0.5 * (outputs["normal"] + 1.0) + (1.0 - alpha1) * bg, 0.0, 1.0),
        "normal_im": outputs["normal"],
        "reg": outputs["reg"][..., None],
        "background": background,
    }
    if edit_texture is not None:
        # edit overlay render (settings bit 15 path, gstex.py:1198-1200):
        # re-render the texture term with the edited albedo
        from ..ops.binning import build_tile_bins as _btb
        from ..ops.prepare import prepare_splats as _ps
        from ..ops.rasterize import rasterize as _rast

        prep = _ps(params.means, params.log_scales, params.quats,
                   params.opacity_logits, params.features_dc,
                   params.features_rest, buffers.mappings, cam,
                   active_sh_degree=active_sh_degree(cfg, step),
                   sh_degree=cfg.sh_degree, fix_init=cfg.fix_init,
                   extent_sigma=cfg.sigma_factor)
        grid = cfg.grid(cam.height, cam.width)
        bins = _btb(prep.centers, prep.extents, prep.depths, prep.valid,
                    grid, pair_cap=cfg.pair_cap, s_max=cfg.s_max)
        emaps = _rast(prep.geom, edit_texture, buffers.texture_hw, bins,
                      cam, grid)
        images["edit"] = jnp.clip(
            outputs["img"] + emaps["texture_rgb"] + (1.0 - alpha1) * bg,
            0.0, 1.0)
    else:
        images["edit"] = outputs["rgb"]
    return images


def _test_color_img(cfg, test_params, buffers, cam, step):
    """Σ w · test_color with thresholded opacities (the out_img part of the
    test render)."""
    from ..ops.binning import build_tile_bins as _btb
    from ..ops.prepare import prepare_splats as _ps
    from ..ops.rasterize import rasterize as _rast

    prep = _ps(test_params.means, test_params.log_scales, test_params.quats,
               test_params.opacity_logits, test_params.features_dc,
               test_params.features_rest, buffers.mappings, cam,
               active_sh_degree=0, sh_degree=0, fix_init=cfg.fix_init,
               extent_sigma=cfg.sigma_factor)
    # sh_degree=0 prepare makes rgb = sigmoid(features_dc); instead use the
    # raw test colors
    prep = prep._replace(geom=prep.geom._replace(rgb=buffers.test_colors))
    grid = cfg.grid(cam.height, cam.width)
    bins = _btb(prep.centers, prep.extents, prep.depths, prep.valid, grid,
                pair_cap=cfg.pair_cap, s_max=cfg.s_max)
    return _rast(prep.geom, jnp.zeros_like(test_params.texture),
                 buffers.texture_hw, bins, cam, grid)


def composite_gt(image: jax.Array, background: jax.Array) -> jax.Array:
    """Alpha-composite RGBA ground truth over the background
    (``gstex.py:1249-1260``)."""
    if image.shape[-1] == 4:
        a = image[..., 3:4]
        return a * image[..., :3] + (1 - a) * background[None, None, :]
    return image


def loss_fn(cfg: GStexConfig, outputs: dict, gt_rgb: jax.Array, step,
            mask: Optional[jax.Array] = None):
    """0.8·L1 + 0.2·(1−SSIM) + normal + reg (``gstex.py:1277-1322``)."""
    pred = outputs["rgb"]
    gt = gt_rgb
    if mask is not None:
        pred = pred * mask
        gt = gt * mask
    l1 = jnp.mean(jnp.abs(gt - pred))
    if cfg.fused_ssim and ssim_fused.fused_ssim_supported(pred.shape):
        # grad w.r.t. the render only — the GT side is constant
        simloss = 1.0 - ssim_fused.fused_ssim(
            pred, gt, 1.0, jax.default_backend() != "tpu")
    else:
        simloss = 1.0 - ssim_ops.ssim(gt, pred)
    if lean_losses(cfg):
        # statically-zero regularizers: skip the terms entirely so the
        # normal/reg map untiling and its backward DCE away (XLA does not
        # fold 0*x, so a traced zero keeps the whole chain alive)
        normal_loss = jnp.float32(0.0)
        reg_loss = jnp.float32(0.0)
    else:
        lam_n = schedule_value(cfg.lambda_normal, step)
        lam_r = schedule_value(cfg.lambda_reg, step)
        # normal loss: mean(α − n·n̂); with use_normal_loss the estimate
        # comes from the (detached) depth map, else n̂ = n
        # (gstex.py:1218-1222,1316)
        estimated = outputs.get("estimated_normals", outputs["normal"])
        normal_loss = lam_n * jnp.mean(
            outputs["alpha"]
            - jnp.sum(outputs["normal"] * estimated, axis=-1))
        reg_loss = lam_r * jnp.mean(outputs["reg"])
    main = (1.0 - cfg.ssim_lambda) * l1 + cfg.ssim_lambda * simloss
    total = main + normal_loss + reg_loss
    return total, {"main_loss": main, "l1": l1, "ssim_loss": simloss,
                   "normal_loss": normal_loss, "reg_loss": reg_loss}


def cull_gaussians(params: GStexParams, buffers: GStexBuffers,
                   keep_mask: np.ndarray):
    """Remove gaussians (``JaggedTexture.cull``, ``jagged_texture.py:66-80``).

    With dense charts this is a row select — no offset rebuild needed.
    Host-side (changes N). keep_mask: (N,) bool numpy.
    """
    keep = np.asarray(keep_mask)
    sel = lambda a: jnp.asarray(np.asarray(a)[keep])
    params = GStexParams(*[sel(x) for x in params])
    buffers = GStexBuffers(
        texture_hw=sel(buffers.texture_hw),
        mappings=sel(buffers.mappings),
        pixel_scale=buffers.pixel_scale,
        test_colors=sel(buffers.test_colors),
    )
    return params, buffers


def duplicate_gaussians(params: GStexParams, buffers: GStexBuffers,
                        dup_mask: np.ndarray):
    """Append copies of selected gaussians (``dup_and_split`` analog,
    ``jagged_texture.py:82-114``). Host-side (changes N)."""
    dup = np.asarray(dup_mask)
    cat = lambda a: jnp.asarray(
        np.concatenate([np.asarray(a), np.asarray(a)[dup]], axis=0))
    params = GStexParams(*[cat(x) for x in params])
    buffers = GStexBuffers(
        texture_hw=cat(buffers.texture_hw),
        mappings=cat(buffers.mappings),
        pixel_scale=buffers.pixel_scale,
        test_colors=cat(buffers.test_colors),
    )
    return params, buffers


def downscale_factor(cfg: GStexConfig, step: int) -> int:
    """Training-resolution schedule (``_get_downscale_factor``,
    ``gstex.py:955-962``). Host-side (int step)."""
    return 2 ** max(cfg.num_downscales - step // cfg.resolution_schedule, 0)


def texel_count(buffers: GStexBuffers) -> jax.Array:
    """Σ h·w — the ``texel_count`` metric (``gstex.py:1394``)."""
    return jnp.sum(buffers.texture_hw[:, 0] * buffers.texture_hw[:, 1])


def sample_background(cfg: GStexConfig, key: jax.Array) -> jax.Array:
    """Per-step training background (``gstex.py:1012-1018``)."""
    if cfg.background_color == "random":
        return jax.random.uniform(key, (3,))
    if cfg.background_color == "white":
        return jnp.ones((3,))
    return jnp.zeros((3,))
