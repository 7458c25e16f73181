"""Single-dispatch train-step timing (trained + dense scenes, 800², 50k).

Floor-corrected methodology: force a 1-element host transfer per timed
iteration; the ~24 ms dispatch floor is constant across variants, so only
DELTAS are meaningful. Prints ms/step for the jitted single-step path.
"""
import sys
import time

import jax
import jax.numpy as jnp

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene, surface_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.train import optim, step as train_step

N = 50_000
H = W = 800
SCENES = {
    "trained": dict(pair_cap=393216, s_max=1536),
    "dense": dict(pair_cap=458752, s_max=768),
}


def run(scene):
    caps = SCENES[scene]
    cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                            pixel_num=1e6, background_color="black",
                            renderer="pallas", **caps)
    cam = orbit_camera(H, W, dist=4.0)
    gt = jnp.zeros((H, W, 3), jnp.float32)

    @jax.jit
    def init():
        if scene == "trained":
            s = surface_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad)
        else:
            s = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad,
                             spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
        return model.init_params(cfg, s["means"], s["log_scales"],
                                 s["quats"], s["opacity_logits"],
                                 s["features_dc"], s["features_rest"])

    params, buffers = init()
    state, tx = train_step.init_state(cfg, optim.OptimConfig(), params,
                                      buffers, jax.random.key(1))
    step = train_step.make_train_step(cfg, tx)
    state, m = step(state, cam, gt, None)
    assert int(m["overflow"]) == 0, f"overflow {int(m['overflow'])}"
    float(m["loss"])
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, cam, gt, None)
        float(m["loss"])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{scene}: {dt:.1f} ms/step (incl ~24 ms dispatch floor)")


for scene in (sys.argv[1:] or ["trained", "dense"]):
    run(scene)
