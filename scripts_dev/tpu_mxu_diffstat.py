"""Distribution of output diffs between MXU=0 and MXU=4 response paths."""
import jax
import jax.numpy as jnp
import numpy as np
from gstex_tpu.utils.tpu import enable_compilation_cache
enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.ops import rasterize_pallas4 as rp4

N = 50_000
H = W = 800
cam = orbit_camera(H, W, dist=4.0)

def render(level):
    rp4.MXU_LEVEL = level
    cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                            pair_cap=1 << 19, s_max=512, pixel_num=1e6,
                            background_color="black", renderer="pallas")
    @jax.jit
    def init():
        scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad,
                             spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
        return model.init_params(cfg, scene["means"], scene["log_scales"],
                                 scene["quats"], scene["opacity_logits"],
                                 scene["features_dc"], scene["features_rest"])
    params, buffers = init()
    @jax.jit
    def f(params, buffers):
        out = model.render(cfg, params, buffers, cam, jnp.int32(3000),
                           jnp.zeros(3))
        return out["rgb"], out["depth"], out["alpha"]
    return [np.asarray(x) for x in f(params, buffers)]

r0 = render(0)
r4 = render(4)
for name, a, b in zip(("rgb", "depth", "alpha"), r0, r4):
    d = np.abs(a - b)
    print(f"{name}: max {d.max():.3e}  n>1e-4 {(d > 1e-4).sum()}  "
          f"n>1e-3 {(d > 1e-3).sum()}  total {d.size}", flush=True)
