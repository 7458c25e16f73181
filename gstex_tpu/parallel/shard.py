"""Multi-chip rendering and training via shard_map over a tile-row mesh.

The TPU-native replacement for the reference's DDP data parallelism
(SURVEY.md §2.3): instead of replicating whole images per GPU process with
NCCL grad all-reduce, the image's tile rows are sharded across chips on a
``jax.sharding.Mesh`` — every chip bins and rasterizes only its horizontal
band (Gaussians + charts replicated), the bands are ``all_gather``'d for the
full-image SSIM loss, and parameter/texel gradients arrive through the
collective transpose (reduce-scatter) + ``psum``, riding ICI. Multi-host uses
the same mesh over ``jax.distributed`` processes.

Works identically on a virtual CPU mesh (tests / dryrun) and a real slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..models import gstex as model
from ..ops import sh as sh_ops
from ..ops.binning import TileGrid, build_tile_bins
from ..ops.camera import Camera
from ..ops.prepare import prepare_splats
from ..ops.rasterize import rasterize
from ..train.step import TrainState


def band_grid(cfg: model.GStexConfig, height: int, width: int,
              ndev: int) -> tuple[TileGrid, int]:
    """Per-device band grid: tile rows are split evenly (image rows padded up
    to a multiple of ndev·tile_h)."""
    full = cfg.grid(height, width)
    nty = -(-full.nty // ndev) * ndev
    band_rows = nty // ndev
    bg = TileGrid(height=band_rows * cfg.tile_h, width=width,
                  tile_h=cfg.tile_h, tile_w=cfg.tile_w)
    return bg, band_rows * cfg.tile_h


def _render_band(cfg, params, buffers, cam, step, axis_name, bgrid, band_h):
    """Render this device's band. Returns per-band maps (band_h, W, ...)."""
    idx = jax.lax.axis_index(axis_name)
    y0 = (idx * band_h).astype(jnp.float32)
    prep = prepare_splats(
        params.means, params.log_scales, params.quats, params.opacity_logits,
        params.features_dc, params.features_rest, buffers.mappings, cam,
        active_sh_degree=model.active_sh_degree(cfg, step),
        sh_degree=cfg.sh_degree, fix_init=cfg.fix_init,
        extent_sigma=cfg.sigma_factor)
    centers = prep.centers - jnp.stack(
        [jnp.zeros_like(y0), y0])[None, :]
    cull_fn = None
    if cfg.pair_cull:
        from ..ops.cull import make_pair_cull

        cull_fn = make_pair_cull(jax.lax.stop_gradient(prep.geom), cam,
                                 bgrid, px_offset=(jnp.float32(0.0), y0))
    bins = build_tile_bins(centers, prep.extents, prep.depths, prep.valid,
                           bgrid, pair_cap=cfg.pair_cap, s_max=cfg.s_max,
                           cull_fn=cull_fn)
    if cfg.sh_degree > 0:
        texture = sh_ops.sh_to_rgb(params.texture)
    else:
        texture = jax.nn.sigmoid(params.texture)
    maps = rasterize(prep.geom, texture, buffers.texture_hw, bins, cam, bgrid,
                     px_offset=jnp.stack([jnp.zeros_like(y0), y0]))
    maps["overflow"] = bins.overflow
    return maps


def _sharded_step_core(cfg: model.GStexConfig,
                       tx: optax.GradientTransformation,
                       mesh: Mesh, height: int, width: int,
                       axis_name: str = "tile"):
    """The shard_map'd per-step body shared by the single-step and scanned
    multi-chip train makers."""
    ndev = mesh.shape[axis_name]
    bgrid, band_h = band_grid(cfg, height, width, ndev)

    def shard_fn(params, buffers, opt_state, step, key, cam_tuple, image):
        fx_, fy_, cx_, cy_, c2w_ = cam_tuple
        cam = Camera(fx=fx_, fy=fy_, cx=cx_, cy=cy_, height=height,
                     width=width, c2w=c2w_)
        key, bg_key = jax.random.split(key)
        background = model.sample_background(cfg, bg_key)
        gt = model.composite_gt(image, background)

        def loss_of(params):
            maps = _render_band(cfg, params, buffers, cam, step, axis_name,
                                bgrid, band_h)
            band_rgb = maps["img"] + maps["texture_rgb"] + (
                1.0 - maps["alpha"][..., None]) * background[None, None, :]
            band_rgb = jnp.clip(band_rgb, 0.0, 1.0)
            full_rgb = jax.lax.all_gather(
                band_rgb, axis_name, axis=0, tiled=True)[:height]
            # L1 + SSIM on the gathered full image (identical on every
            # device); band-local regularizer means are psum-averaged
            outputs = {
                "rgb": full_rgb,
                "alpha": maps["alpha"],
                "normal": maps["normal"],
                "reg": maps["reg"],
            }
            l1 = jnp.mean(jnp.abs(gt - full_rgb))
            from ..ops import ssim as ssim_ops
            simloss = 1.0 - ssim_ops.ssim(gt, full_rgb)
            lam_n = model.schedule_value(cfg.lambda_normal, step)
            lam_r = model.schedule_value(cfg.lambda_reg, step)
            normal_part = jnp.sum(
                maps["alpha"] - jnp.sum(maps["normal"] * maps["normal"], -1))
            reg_part = jnp.sum(maps["reg"])
            # padded band rows beyond the image render empty (alpha/reg = 0),
            # so normalizing by the true pixel count matches the single-device
            # full-image mean exactly
            n_px = height * width
            normal_loss = lam_n * jax.lax.psum(normal_part, axis_name) / n_px
            reg_loss = lam_r * jax.lax.psum(reg_part, axis_name) / n_px
            main = (1.0 - cfg.ssim_lambda) * l1 + cfg.ssim_lambda * simloss
            total = main + normal_loss + reg_loss
            return total, (full_rgb, maps["overflow"])

        (loss, (rgb, overflow)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        grads = jax.lax.psum(grads, axis_name)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": loss,
            "overflow": jax.lax.psum(overflow, axis_name),
            "psnr": 10.0 * -jnp.log10(
                jnp.maximum(jnp.mean((rgb - gt) ** 2), 1e-12)),
        }
        return params, opt_state, step + 1, key, metrics

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False)


def make_sharded_train_step(cfg: model.GStexConfig,
                            tx: optax.GradientTransformation,
                            mesh: Mesh, height: int, width: int,
                            axis_name: str = "tile"):
    """Jitted multi-chip train step: (state, cam, image) -> (state, metrics).

    All inputs replicated; each device renders its band; grads are psum'd;
    the (replicated, deterministic) optimizer update runs on every device.
    """
    sharded = _sharded_step_core(cfg, tx, mesh, height, width, axis_name)

    @jax.jit
    def step_fn(state: TrainState, cam: Camera, image):
        cam_tuple = (cam.fx, cam.fy, cam.cx, cam.cy, cam.c2w)
        params, opt_state, step, key, metrics = sharded(
            state.params, state.buffers, state.opt_state, state.step,
            state.key, cam_tuple, image)
        return TrainState(params, state.buffers, opt_state, step, key), metrics

    return step_fn


def make_sharded_train_scan(cfg: model.GStexConfig,
                            tx: optax.GradientTransformation,
                            mesh: Mesh, height: int, width: int,
                            axis_name: str = "tile"):
    """Scanned multi-chip training: n steps fused under one dispatch.

    lax.scan over the shard_map'd step — XLA overlaps the grad psum /
    all_gather collectives of step i with step i+1's binning (the
    collectives ride ICI while the VPU starts the next frame), and the host
    syncs once per chunk. Takes (state, cams, images) where ``cams`` is a
    Camera pytree with a leading chunk axis (``stack_cameras``) and images
    is (n, H, W, 3); all cameras must match this maker's (height, width).
    """
    sharded = _sharded_step_core(cfg, tx, mesh, height, width, axis_name)

    @jax.jit
    def scan_fn(state: TrainState, cams: Camera, images):
        def body(st, x):
            cam, image = x
            params, opt_state, step, key, metrics = sharded(
                st.params, st.buffers, st.opt_state, st.step, st.key,
                (cam.fx, cam.fy, cam.cx, cam.cy, cam.c2w), image)
            return (TrainState(params, st.buffers, opt_state, step, key),
                    metrics)

        return jax.lax.scan(body, state, (cams, images))

    return scan_fn


def make_sharded_render(cfg: model.GStexConfig, mesh: Mesh,
                        height: int, width: int, axis_name: str = "tile"):
    """Jitted multi-chip forward render: (state, cam, background) -> rgb."""
    ndev = mesh.shape[axis_name]
    bgrid, band_h = band_grid(cfg, height, width, ndev)

    def shard_fn(params, buffers, step, cam_tuple, background):
        fx_, fy_, cx_, cy_, c2w_ = cam_tuple
        cam = Camera(fx=fx_, fy=fy_, cx=cx_, cy=cy_, height=height,
                     width=width, c2w=c2w_)
        maps = _render_band(cfg, params, buffers, cam, step, axis_name,
                            bgrid, band_h)
        band_rgb = maps["img"] + maps["texture_rgb"] + (
            1.0 - maps["alpha"][..., None]) * background[None, None, :]
        band_rgb = jnp.clip(band_rgb, 0.0, 1.0)
        return jax.lax.all_gather(band_rgb, axis_name, axis=0,
                                  tiled=True)[:height]

    sharded = shard_map(shard_fn, mesh=mesh,
                        in_specs=(P(), P(), P(), P(), P()),
                        out_specs=P(), check_vma=False)

    @jax.jit
    def render_fn(state: TrainState, cam: Camera, background):
        cam_tuple = (cam.fx, cam.fy, cam.cx, cam.cy, cam.c2w)
        return sharded(state.params, state.buffers, state.step, cam_tuple,
                       background)

    return render_fn
