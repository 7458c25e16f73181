"""Eval (forward-only) kernel vs full train-forward kernel timing + parity."""
import time
import jax
import jax.numpy as jnp
import numpy as np
from gstex_tpu.utils.tpu import enable_compilation_cache
enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model

N = 50_000
H = W = 800
cam = orbit_camera(H, W, dist=4.0)
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

def run(eval_only):
    @jax.jit
    def f(params, buffers):
        out = model.render(cfg, params, buffers, cam, jnp.int32(3000),
                           jnp.zeros(3), eval_only=eval_only)
        return out["rgb"], out["depth"], out["alpha"]
    r = f(params, buffers)
    float(r[0][0, 0, 0])
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        r = f(params, buffers)
        float(r[0][0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    return dt, [np.asarray(x) for x in r]

dt_full, r_full = run(False)
dt_eval, r_eval = run(True)
print(f"full fwd render: {1000*dt_full:.1f} ms  ({1/dt_full:.2f} fps at 800p)")
print(f"eval fwd render: {1000*dt_eval:.1f} ms  ({1/dt_eval:.2f} fps at 800p)")
for name, a, b in zip(("rgb", "depth", "alpha"), r_full, r_eval):
    d = np.abs(a - b)
    print(f"{name}: max diff {d.max():.3e}  n>1e-3 {(d > 1e-3).sum()}",
          flush=True)
