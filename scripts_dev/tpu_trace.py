"""jax profiler trace of one train step (trained scene) for op-level
attribution."""
import os
import time

import jax
import jax.numpy as jnp

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, surface_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.train import optim, step as train_step

N = 50_000
H = W = 800
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=393216, s_max=1536, pixel_num=1e6,
                        background_color="black", renderer="pallas")
cam = orbit_camera(H, W, dist=4.0)
gt = jnp.zeros((H, W, 3), jnp.float32)


@jax.jit
def init():
    scene = surface_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad)
    return model.init_params(cfg, scene["means"], scene["log_scales"],
                             scene["quats"], scene["opacity_logits"],
                             scene["features_dc"], scene["features_rest"])


params, buffers = init()
state, tx = train_step.init_state(cfg, optim.OptimConfig(), params, buffers,
                                  jax.random.key(1))
step = train_step.make_train_step(cfg, tx)
state, m = step(state, cam, gt, None)
float(m["loss"])
out = os.environ.get("TRACE_DIR", "/tmp/jax_trace")
with jax.profiler.trace(out):
    for _ in range(3):
        state, m = step(state, cam, gt, None)
        float(m["loss"])
print("trace written to", out)
