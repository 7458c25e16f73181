"""Dev: compile + run just the pallas forward on the real chip."""

import sys
import time

import jax
import jax.numpy as jnp

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()
jax.config.update("jax_traceback_filtering", "off")

from gstex_tpu.data.synthetic import orbit_camera, random_scene  # noqa: E402
from gstex_tpu.models import gstex as model  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
S_MAX = int(sys.argv[2]) if len(sys.argv) > 2 else 512
H = W = 800

cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=1 << 20, s_max=S_MAX, pixel_num=1e6,
                        background_color="black", renderer="pallas")


@jax.jit
def build():
    scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad,
                         spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
    return model.init_params(cfg, scene["means"], scene["log_scales"],
                             scene["quats"], scene["opacity_logits"],
                             scene["features_dc"], scene["features_rest"])


params, buffers = build()
jax.block_until_ready(params)
cam = orbit_camera(H, W, dist=4.0)
fn = jax.jit(lambda p: model.render(cfg, p, buffers, cam, jnp.int32(3000),
                                    jnp.zeros(3)))
t0 = time.time()
out = fn(params)
jax.block_until_ready(out)
print(f"pallas compile+first {time.time()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(10):
    out = fn(params)
jax.block_until_ready(out)
ms = 1000 * (time.perf_counter() - t0) / 10
print(f"pallas fwd {ms:.2f} ms ({H*W/1e6/(ms/1000):.1f} Mpix/s) "
      f"alpha={float(out['alpha'].mean()):.4f} "
      f"pairs={int(out['total_pairs'])}", flush=True)
