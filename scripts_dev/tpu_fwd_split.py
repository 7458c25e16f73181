"""fwd kernel decomposition via GSTEX_PALLAS_SKIP."""
import time
import jax
import jax.numpy as jnp
from gstex_tpu.utils.tpu import enable_compilation_cache
enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.ops.binning import build_tile_bins
from gstex_tpu.ops.cull import make_pair_cull
from gstex_tpu.ops.prepare import prepare_splats
from gstex_tpu.ops import sh as sh_ops
from gstex_tpu.ops import rasterize_pallas as rp
from gstex_tpu.ops import rasterize_pallas3 as rp3
from gstex_tpu.ops import rasterize_pallas4 as rp4

N = 50_000
H = W = 800
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=1 << 19, s_max=512, pixel_num=1e6,
                        background_color="black")

@jax.jit
def init():
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
float(counts[0])

def fwd_fn():
    @jax.jit
    def f(rec_pairs, ids, counts, cam_info, table):
        maps, ncon = rp4.rasterize_pallas4_fwd(
            grid, cfg.chart_pad,
            rp4.PallasInputs4(rec_pairs, ids, counts, cam_info), table)
        return maps["img0"]
    return lambda: f(rec_pairs, ids, counts, cam_info, table)

def timeit(name, fn, iters=8):
    r = fn(); float(r[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(); float(r[0, 0, 0])
    print(f"{name:28s} {1000*(time.perf_counter()-t0)/iters:8.2f} ms",
          flush=True)

for skip in ("", "fetch", "fetch,dma"):
    rp4._DEBUG_SKIP = skip
    timeit(f"fwd skip='{skip}'", fwd_fn())
