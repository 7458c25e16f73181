"""v5 on-chip validation + timing vs v4: fwd render, train-step grads."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene, surface_scene
from gstex_tpu.models import gstex as model

N = int(os.environ.get("N", "50000"))
H = W = int(os.environ.get("RES", "800"))
SCENE = os.environ.get("SCENE", "trained")
S_MAX = int(os.environ.get("S_MAX", "2048" if SCENE == "trained" else "1024"))
PAIR_CAP = int(os.environ.get("PAIR_CAP", str(1 << 19)))

cam = orbit_camera(H, W, dist=4.0)
gt = jnp.zeros((H, W, 3), jnp.float32)


def build(renderer):
    cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                            pair_cap=PAIR_CAP, s_max=S_MAX, pixel_num=1e6,
                            background_color="black", renderer=renderer)

    @jax.jit
    def init():
        if SCENE == "trained":
            scene = surface_scene(jax.random.key(0), N,
                                  chart_pad=cfg.chart_pad)
        else:
            scene = random_scene(jax.random.key(0), N,
                                 chart_pad=cfg.chart_pad, spread=1.2,
                                 scale_lo=-4.5, scale_hi=-2.5)
        return model.init_params(cfg, scene["means"], scene["log_scales"],
                                 scene["quats"], scene["opacity_logits"],
                                 scene["features_dc"],
                                 scene["features_rest"])

    params, buffers = init()
    return cfg, params, buffers


def timeit(name, fn, iters=8):
    r = fn()
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
        float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {1000 * dt:8.1f} ms", flush=True)
    return r


results = {}
for renderer in ("pallas4", "pallas"):
    cfg, params, buffers = build(renderer)

    @jax.jit
    def fwd(p):
        out = model.render(cfg, p, buffers, cam, jnp.int32(3000),
                           jnp.zeros(3))
        return out["rgb"], out["overflow"]

    def loss_of(p):
        out = model.render(cfg, p, buffers, cam, jnp.int32(3000),
                           jnp.zeros(3))
        total, _ = model.loss_fn(cfg, out, gt, jnp.int32(3000))
        return total

    grad_fn = jax.jit(jax.value_and_grad(loss_of))

    rgb, ovf = timeit(f"{renderer} fwd", lambda: fwd(params))
    assert int(ovf) == 0, f"overflow {int(ovf)}"
    lv, grads = timeit(f"{renderer} loss+grad", lambda: grad_fn(params))
    results[renderer] = (np.asarray(rgb), float(lv), jax.tree.map(
        np.asarray, grads))

rgb4, l4, g4 = results["pallas4"]
rgb5, l5, g5 = results["pallas"]
print(f"rgb diff max {np.abs(rgb4 - rgb5).max():.3e}  "
      f"loss {l4:.6f} vs {l5:.6f}")
for (p4, a), (p5, b) in zip(
        jax.tree_util.tree_flatten_with_path(g4)[0],
        jax.tree_util.tree_flatten_with_path(g5)[0]):
    scale = np.abs(a).max() + 1e-12
    print(f"grad {jax.tree_util.keystr(p4):24s} rel diff "
          f"{np.abs(a - b).max() / scale:.3e}")
