"""Dev: v3 vs v4 kernel timing + parity on the real chip."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()

from gstex_tpu.data.synthetic import orbit_camera, random_scene  # noqa: E402
from gstex_tpu.models import gstex as model  # noqa: E402
from gstex_tpu.models.gstex import prepare_splats, active_sh_degree  # noqa: E402
from gstex_tpu.ops import sh as sh_ops  # noqa: E402
from gstex_tpu.ops.binning import build_tile_bins  # noqa: E402
from gstex_tpu.ops import rasterize_pallas as rp  # noqa: E402
from gstex_tpu.ops import rasterize_pallas3 as rp3  # noqa: E402
from gstex_tpu.ops import rasterize_pallas4 as rp4  # noqa: E402

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
chart_pad = cfg.chart_pad


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
    print(f"{name:26s} {ms:8.2f} ms", flush=True)
    return out, ms


@jax.jit
def make_inputs(params):
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
    packed = rp3.pack_charts_cmajor(texture)
    in3 = rp.prepare_pallas_inputs(prep.geom, packed, buffers.texture_hw,
                                   bins, cam)
    table = packed.reshape(-1, packed.shape[-1])
    return in3, bins.ids, table


in3, ids, table = make_inputs(params)
pairs = int(jnp.sum(in3.counts))
print(f"pairs = {pairs}")

in4 = rp4.PallasInputs4(in3.records_t, ids, in3.counts, in3.cam_info)


@jax.jit
def f3(records_t, charts_g, counts, cam_info):
    maps, ncon = rp3.rasterize_pallas3_fwd(
        grid, chart_pad, rp.PallasInputs(records_t, charts_g, counts,
                                         cam_info))
    return jnp.concatenate([maps[n] for n in rp.CH_NAMES], axis=1), ncon


@jax.jit
def f4(records_t, ids, counts, cam_info, table):
    maps, ncon = rp4.rasterize_pallas4_fwd(
        grid, chart_pad, rp4.PallasInputs4(records_t, ids, counts, cam_info),
        table)
    return jnp.concatenate([maps[n] for n in rp.CH_NAMES], axis=1), ncon


(o3, nc3), t3 = timeit("v3 fwd", f3, in3.records_t, in3.charts_g,
                       in3.counts, in3.cam_info)
(o4, nc4), t4 = timeit("v4 fwd", f4, in4.records_t, in4.ids, in4.counts,
                       in4.cam_info, table)
d = np.abs(np.asarray(o3) - np.asarray(o4))
print(f"fwd parity: max|d|={d.max():.2e} ncon equal="
      f"{bool(jnp.all(nc3 == nc4))}")

gmaps = jnp.ones((o3.shape[0], rp3.NG * 8, 128), jnp.float32)


@jax.jit
def b3(counts, cam_info, records_t, charts_g, fwd_out, ncon, gmaps):
    return rp3.rasterize_pallas3_bwd(grid, chart_pad, counts, cam_info,
                                     records_t, charts_g, fwd_out, ncon,
                                     gmaps)


@jax.jit
def b4(counts, cam_info, records_t, ids, table, fwd_out, ncon, gmaps):
    return rp4.rasterize_pallas4_bwd(grid, chart_pad, counts, cam_info,
                                     records_t, ids, table, fwd_out, ncon,
                                     gmaps)


(dr3, dc3), tb3 = timeit("v3 bwd", b3, in3.counts, in3.cam_info,
                         in3.records_t, in3.charts_g, o3, nc3, gmaps)
(dr4, dc4), tb4 = timeit("v4 bwd", b4, in4.counts, in4.cam_info,
                         in4.records_t, in4.ids, table, o4, nc4, gmaps)
dd = np.abs(np.asarray(dr3) - np.asarray(dr4))
sc = np.abs(np.asarray(dr3)).max() + 1e-8
print(f"bwd drec parity: max|d|/scale={dd.max() / sc:.2e}")
# dchart layouts differ (v4 packs pack_n splats per block); api tests
# cover end-to-end texel-grad parity.
print(f"\nus/splat-tile: v3 fwd {1000 * t3 / pairs:.3f} "
      f"v4 fwd {1000 * t4 / pairs:.3f} | v3 bwd {1000 * tb3 / pairs:.3f} "
      f"v4 bwd {1000 * tb4 / pairs:.3f}")
