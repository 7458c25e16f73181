"""v5 bwd kernel decomposition via GSTEX_PALLAS_SKIP (dense scene)."""
import os
import time

import jax
import jax.numpy as jnp

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene, surface_scene
from gstex_tpu.models import gstex as model

N = 50_000
H = W = 800
SCENE = os.environ.get("SCENE", "dense")
S_MAX = int(os.environ.get("S_MAX", "2048" if SCENE == "trained" else "1024"))
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=1 << 19, s_max=S_MAX, pixel_num=1e6,
                        background_color="black", renderer="pallas")
cam = orbit_camera(H, W, dist=4.0)
gt = jnp.zeros((H, W, 3), jnp.float32)


@jax.jit
def init():
    if SCENE == "trained":
        scene = surface_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad)
    else:
        scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad,
                             spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
    return model.init_params(cfg, scene["means"], scene["log_scales"],
                             scene["quats"], scene["opacity_logits"],
                             scene["features_dc"], scene["features_rest"])


params, buffers = init()


def loss_of(p):
    out = model.render(cfg, p, buffers, cam, jnp.int32(3000), jnp.zeros(3))
    total, _ = model.loss_fn(cfg, out, gt, jnp.int32(3000))
    return total


@jax.jit
def fwd(p):
    out = model.render(cfg, p, buffers, cam, jnp.int32(3000), jnp.zeros(3))
    return out["rgb"]


grad_fn = jax.jit(jax.value_and_grad(loss_of))


def timeit(name, fn, iters=8):
    r = fn()
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
        float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    print(f"{name:20s} {1000 * (time.perf_counter() - t0) / iters:8.1f} ms",
          flush=True)


skip = os.environ.get("GSTEX_PALLAS_SKIP", "")
timeit(f"fwd [{skip}]", lambda: fwd(params))
timeit(f"loss+grad [{skip}]", lambda: grad_fn(params))
