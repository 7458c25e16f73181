"""Forward-path decomposition on the trained/dense scene: binning | records
gather | pack | fwd kernel | untile, each timed cumulatively."""
import os
import time

import jax
import jax.numpy as jnp

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene, surface_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.ops import rasterize_pallas as rp
from gstex_tpu.ops import rasterize_pallas3 as rp3
from gstex_tpu.ops import rasterize_pallas4 as rp4
from gstex_tpu.ops import sh as sh_ops
from gstex_tpu.ops.binning import build_tile_bins
from gstex_tpu.ops.cull import make_pair_cull
from gstex_tpu.ops.prepare import prepare_splats

N = 50_000
H = W = 800
S_MAX = int(os.environ.get(
    "S_MAX", "2048" if os.environ.get("SCENE") == "trained" else "1024"))
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=1 << 19, s_max=S_MAX, pixel_num=1e6,
                        background_color="black")


@jax.jit
def init():
    if os.environ.get("SCENE") == "trained":
        scene = surface_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad)
    else:
        scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad,
                             spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
    return model.init_params(cfg, scene["means"], scene["log_scales"],
                             scene["quats"], scene["opacity_logits"],
                             scene["features_dc"], scene["features_rest"])


params, buffers = init()
cam = orbit_camera(H, W, dist=4.0)
grid = cfg.grid(H, W)


def prep_and_bins(p):
    prep = prepare_splats(p.means, p.log_scales, p.quats, p.opacity_logits,
                          p.features_dc, p.features_rest, buffers.mappings,
                          cam, active_sh_degree=3)
    cf = make_pair_cull(prep.geom, cam, grid)
    bins = build_tile_bins(prep.centers, prep.extents, prep.depths,
                           prep.valid, grid, pair_cap=cfg.pair_cap,
                           s_max=cfg.s_max, cull_fn=cf)
    return prep, bins


@jax.jit
def stage_prep(p):
    prep = prepare_splats(p.means, p.log_scales, p.quats, p.opacity_logits,
                          p.features_dc, p.features_rest, buffers.mappings,
                          cam, active_sh_degree=3)
    return prep.centers


@jax.jit
def stage_bins(p):
    prep, bins = prep_and_bins(p)
    return bins.counts


@jax.jit
def stage_records(p):
    prep, bins = prep_and_bins(p)
    records = rp.assemble_records(prep.geom, cam.c2w[:3, 3],
                                  buffers.texture_hw)
    rec_pairs = records[bins.ids]
    return rec_pairs[0, 0, 0]


@jax.jit
def stage_pack(p):
    prep, bins = prep_and_bins(p)
    records = rp.assemble_records(prep.geom, cam.c2w[:3, 3],
                                  buffers.texture_hw)
    rec_pairs = records[bins.ids]
    texture = sh_ops.sh_to_rgb(p.texture)
    packed = rp4.pack_charts_v4(texture)
    table = packed.reshape(-1, packed.shape[-1])
    return rec_pairs[0, 0, 0] + table[0, 0].astype(jnp.float32)


@jax.jit
def stage_kernel(p):
    prep, bins = prep_and_bins(p)
    records = rp.assemble_records(prep.geom, cam.c2w[:3, 3],
                                  buffers.texture_hw)
    rec_pairs = records[bins.ids]
    texture = sh_ops.sh_to_rgb(p.texture)
    packed = rp4.pack_charts_v4(texture)
    table = packed.reshape(-1, packed.shape[-1])
    counts = jnp.minimum(bins.counts, bins.ids.shape[1])
    cam_info = rp._cam_info(cam, jnp.zeros((2,), jnp.float32))
    maps, ncon = rp4.rasterize_pallas4_fwd(
        grid, cfg.chart_pad,
        rp4.PallasInputs4(rec_pairs, bins.ids, counts, cam_info), table)
    return maps["img0"][0, 0, 0]


@jax.jit
def stage_render(p):
    out = model.render(cfg, p, buffers, cam, jnp.int32(3000), jnp.zeros(3))
    return out["rgb"][0, 0, 0]


def timeit(name, fn, iters=10):
    r = fn()
    float(jnp.asarray(r).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
        float(jnp.asarray(r).ravel()[0])
    print(f"{name:16s} {1000 * (time.perf_counter() - t0) / iters:8.1f} ms",
          flush=True)


timeit("prep", lambda: stage_prep(params))
timeit("+bins", lambda: stage_bins(params))
timeit("+records", lambda: stage_records(params))
timeit("+pack", lambda: stage_pack(params))
timeit("+fwd kernel", lambda: stage_kernel(params))
timeit("full render", lambda: stage_render(params))
