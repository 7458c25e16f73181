"""Probe: pair counts and binning time with/without the alpha cull."""
import time
import jax
import jax.numpy as jnp
from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.ops.binning import build_tile_bins
from gstex_tpu.ops.cull import make_pair_cull
from gstex_tpu.ops.prepare import prepare_splats

H = W = 800
N = 50_000
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=1 << 19, s_max=512, pixel_num=1e6)
scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad,
                     spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
params, buffers = model.init_params(
    cfg, scene["means"], scene["log_scales"], scene["quats"],
    scene["opacity_logits"], scene["features_dc"], scene["features_rest"])
cam = orbit_camera(H, W, dist=4.0)
grid = cfg.grid(H, W)

def bins_fn(cull):
    def f(params, buffers):
        prep = prepare_splats(params.means, params.log_scales, params.quats,
                              params.opacity_logits, params.features_dc,
                              params.features_rest, buffers.mappings, cam,
                              active_sh_degree=3)
        cf = make_pair_cull(prep.geom, cam, grid) if cull else None
        b = build_tile_bins(prep.centers, prep.extents, prep.depths,
                            prep.valid, grid, pair_cap=cfg.pair_cap,
                            s_max=cfg.s_max, cull_fn=cf)
        return b.counts.sum(), b.total_pairs, b.counts.max()
    return jax.jit(f)

for cull in (False, True):
    f = bins_fn(cull)
    kept, total, mx = f(params, buffers)
    print(f"cull={cull}: kept={int(kept)} total={int(total)} max_tile={int(mx)}")
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        kept, total, mx = f(params, buffers)
        int(kept)  # host sync
        ts.append(time.perf_counter() - t0)
    print(f"  binning+prep time: {min(ts)*1e3:.1f} ms")
