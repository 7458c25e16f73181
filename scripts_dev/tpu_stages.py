"""Dev: per-stage timing of the pallas render path on the real chip.

Stages: prepare(splats+bins) | pallas_inputs(gather) | fwd kernel | bwd kernel
| XLA grad assembly (full vjp minus kernels). Usage:
    python scripts_dev/tpu_stages.py [N] [s_max]
Optionally GSTEX_PALLAS_SKIP=fetch to stub the texel fetch.
"""

import sys
import time

import jax
import jax.numpy as jnp

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()

from gstex_tpu.data.synthetic import orbit_camera, random_scene  # noqa: E402
from gstex_tpu.models import gstex as model  # noqa: E402
from gstex_tpu.models.gstex import prepare_splats, active_sh_degree  # noqa: E402
from gstex_tpu.ops import sh as sh_ops  # noqa: E402
from gstex_tpu.ops.binning import build_tile_bins  # noqa: E402
from gstex_tpu.ops import rasterize_pallas as rp  # noqa: E402
from gstex_tpu.ops import rasterize_pallas2 as rp2  # noqa: E402
from gstex_tpu.ops import rasterize_pallas_api as rapi  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
S_MAX = int(sys.argv[2]) if len(sys.argv) > 2 else 512
H = W = 800

cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=1 << 20, s_max=S_MAX, pixel_num=1e6,
                        background_color="black", renderer="pallas")


@jax.jit
def init():
    scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad,
                         spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
    return model.init_params(cfg, scene["means"], scene["log_scales"],
                             scene["quats"], scene["opacity_logits"],
                             scene["features_dc"], scene["features_rest"])


params, buffers = init()
cam = orbit_camera(H, W, dist=4.0)
grid = cfg.grid(cam.height, cam.width)


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timeit(name, fn, *args, iters=6):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        sync(jax.tree.leaves(out)[0])
    ms = 1000 * (time.perf_counter() - t0) / iters
    print(f"{name:28s} {ms:8.2f} ms", flush=True)
    return out, ms


@jax.jit
def stage_inputs(params):
    prep = prepare_splats(
        params.means, params.log_scales, params.quats, params.opacity_logits,
        params.features_dc, params.features_rest, buffers.mappings, cam,
        active_sh_degree=active_sh_degree(cfg, 3000),
        sh_degree=cfg.sh_degree, fix_init=cfg.fix_init,
        extent_sigma=cfg.sigma_factor)
    bins = build_tile_bins(prep.centers, prep.extents, prep.depths,
                           prep.valid, grid, pair_cap=cfg.pair_cap,
                           s_max=cfg.s_max)
    texture = sh_ops.sh_to_rgb(params.texture)
    packed = rp.pack_charts(texture)
    inputs = rp.prepare_pallas_inputs(prep.geom, packed, buffers.texture_hw,
                                      bins, cam)
    return inputs


inputs, _ = timeit("prepare+bins+gather", stage_inputs, params)
pairs = int(jnp.sum(inputs.counts))
print(f"pairs (clamped) = {pairs}")

chart_pad = cfg.chart_pad


@jax.jit
def fwd_only(records_t, charts_g, counts, cam_info):
    maps, ncon = rp2.rasterize_pallas2_fwd(
        grid, chart_pad, rp.PallasInputs(records_t, charts_g, counts,
                                         cam_info))
    return maps["img0"], ncon


(_, ncon), fwd_ms = timeit("pallas2 fwd kernel", fwd_only, inputs.records_t,
                           inputs.charts_g, inputs.counts, inputs.cam_info)


@jax.jit
def fwd_full(records_t, charts_g, counts, cam_info):
    maps, ncon = rp2.rasterize_pallas2_fwd(
        grid, chart_pad, rp.PallasInputs(records_t, charts_g, counts,
                                         cam_info))
    out = jnp.concatenate([maps[n] for n in rp.CH_NAMES], axis=1)
    return out, ncon


(fwd_out, ncon), _ = timeit("pallas2 fwd (+repack)", fwd_full,
                            inputs.records_t, inputs.charts_g, inputs.counts,
                            inputs.cam_info)

gmaps = jnp.ones((fwd_out.shape[0], rp2.NG * 8, 128), jnp.float32)


@jax.jit
def bwd_only(counts, cam_info, records_t, charts_g, fwd_out, ncon, gmaps):
    return rp2.rasterize_pallas2_bwd(grid, chart_pad, counts, cam_info,
                                     records_t, charts_g, fwd_out, ncon,
                                     gmaps)


_, bwd_ms = timeit("pallas2 bwd kernel", bwd_only, inputs.counts,
                   inputs.cam_info, inputs.records_t, inputs.charts_g,
                   fwd_out, ncon, gmaps)


@jax.jit
def full_vjp(params):
    def loss_fn(p):
        out = model.render(cfg, p, buffers, cam, jnp.int32(3000),
                           jnp.zeros(3))
        return out["rgb"].mean() + out["depth"].mean() + out["reg"].mean()

    return jax.grad(loss_fn)(params)


_, full_ms = timeit("full render vjp", full_vjp, params)

print(f"\nsummary: fwd {fwd_ms:.1f} bwd {bwd_ms:.1f} "
      f"other {full_ms - fwd_ms - bwd_ms:.1f} (of {full_ms:.1f}) ms; "
      f"us/splat-tile fwd {1000 * fwd_ms / pairs:.2f} "
      f"bwd {1000 * bwd_ms / pairs:.2f}")


# --- prepare split ---
@jax.jit
def stage_prep(params):
    prep = prepare_splats(
        params.means, params.log_scales, params.quats, params.opacity_logits,
        params.features_dc, params.features_rest, buffers.mappings, cam,
        active_sh_degree=active_sh_degree(cfg, 3000),
        sh_degree=cfg.sh_degree, fix_init=cfg.fix_init,
        extent_sigma=cfg.sigma_factor)
    return prep


prep, _ = timeit("  prepare_splats", stage_prep, params)


@jax.jit
def stage_bins(prep):
    return build_tile_bins(prep.centers, prep.extents, prep.depths,
                           prep.valid, grid, pair_cap=cfg.pair_cap,
                           s_max=cfg.s_max)


bins, _ = timeit("  build_tile_bins", stage_bins, prep)


@jax.jit
def stage_gather(params, prep, bins):
    texture = sh_ops.sh_to_rgb(params.texture)
    packed = rp.pack_charts(texture)
    return rp.prepare_pallas_inputs(prep.geom, packed, buffers.texture_hw,
                                    bins, cam)


_, _ = timeit("  pack+gather", stage_gather, params, prep, bins)
