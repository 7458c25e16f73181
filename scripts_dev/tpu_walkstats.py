"""How far do tiles actually walk? ncontrib / counts stats on the bench scene."""
import jax
import jax.numpy as jnp
import numpy as np
from gstex_tpu.utils.tpu import enable_compilation_cache
enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene, surface_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.ops.binning import build_tile_bins
from gstex_tpu.ops.cull import make_pair_cull
from gstex_tpu.ops.prepare import prepare_splats
from gstex_tpu.ops import sh as sh_ops
from gstex_tpu.ops import rasterize_pallas as rp
from gstex_tpu.ops import rasterize_pallas3 as rp3
from gstex_tpu.ops import rasterize_pallas4 as rp4

import os

N = 50_000
H = W = 800
_S_MAX = int(os.environ.get("S_MAX", "2048" if os.environ.get("SCENE") == "trained" else "1024"))
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=1 << 19, s_max=_S_MAX, pixel_num=1e6,
                        background_color="black")

@jax.jit
def init():
    import os
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

@jax.jit
def make_inputs(p):
    prep = prepare_splats(p.means, p.log_scales, p.quats, p.opacity_logits,
                          p.features_dc, p.features_rest, buffers.mappings,
                          cam, active_sh_degree=3)
    cf = make_pair_cull(prep.geom, cam, grid)
    bins = build_tile_bins(prep.centers, prep.extents, prep.depths,
                           prep.valid, grid, pair_cap=cfg.pair_cap,
                           s_max=cfg.s_max, cull_fn=cf)
    texture = sh_ops.sh_to_rgb(p.texture)
    packed = rp3.pack_charts_cmajor(texture)
    table = packed.reshape(-1, packed.shape[-1])
    records = rp.assemble_records(prep.geom, cam.c2w[:3, 3],
                                  buffers.texture_hw)
    rec_pairs = records[bins.ids]
    counts = jnp.minimum(bins.counts, bins.ids.shape[1])
    cam_info = rp._cam_info(cam, jnp.zeros((2,), jnp.float32))
    return rec_pairs, bins.ids, counts, cam_info, table

rec_pairs, ids, counts, cam_info, table = jax.block_until_ready(
    make_inputs(params))

@jax.jit
def fwd(rec_pairs, ids, counts, cam_info, table):
    maps, ncon = rp4.rasterize_pallas4_fwd(
        grid, cfg.chart_pad,
        rp4.PallasInputs4(rec_pairs, ids, counts, cam_info), table)
    return ncon

ncon = np.asarray(fwd(rec_pairs, ids, counts, cam_info, table))  # (T,pr,128)
cnt = np.asarray(counts).astype(np.int64)
ncon_t = ncon.reshape(ncon.shape[0], -1)           # per-tile pixel ncontrib
walk = np.minimum(ncon_t.max(1) + 1, cnt)          # fwd chunks walked * 16
K = rp4.CHUNK
print(f"tiles {len(cnt)}  total pairs {cnt.sum()}  count mean {cnt.mean():.0f}"
      f"  max {cnt.max()}")
print(f"per-pixel ncontrib: mean {ncon_t.mean():.1f}  p50 "
      f"{np.percentile(ncon_t, 50):.0f}  p95 {np.percentile(ncon_t, 95):.0f}")
print(f"fwd walked splats/tile: mean {walk.mean():.1f}  p95 "
      f"{np.percentile(walk, 95):.0f}  max {walk.max()}")
print(f"fwd walked chunks total {np.ceil(walk / K).sum():.0f} "
      f"(vs count-chunks {np.ceil(cnt / K).sum():.0f}, "
      f"s_max-chunks {len(cnt) * cfg.s_max // K})")
pix_work = ncon_t.sum()
tile_work = (np.ceil(walk / K) * K * 1024).sum()
print(f"per-pixel useful work fraction: {pix_work / tile_work:.3f}")
