"""Full train-step stage decomposition: render fwd | +loss | +vjp | +optim."""
import time
import jax
import jax.numpy as jnp
from gstex_tpu.utils.tpu import enable_compilation_cache
enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene, surface_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.train import optim, step as train_step

H = W = 800
N = 50_000
cam = orbit_camera(H, W, dist=4.0)
gt = jnp.zeros((H, W, 3), jnp.float32)
import os as _os

_S_MAX = int(_os.environ.get(
    "S_MAX", "2048" if _os.environ.get("SCENE") == "trained" else "1024"))
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=1 << 19, s_max=_S_MAX, pixel_num=1e6,
                        background_color="black", renderer="pallas")

@jax.jit
def init():
    import os
    if os.environ.get("SCENE") == "trained":
        scene = surface_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad)
    else:
        scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad,
                             spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
    return model.init_params(cfg, scene["means"], scene["log_scales"],
                             scene["quats"], scene["opacity_logits"],
                             scene["features_dc"], scene["features_rest"])

params, buffers = init()
state, tx = train_step.init_state(cfg, optim.OptimConfig(), params, buffers,
                                  jax.random.key(1))
step_fn = train_step.make_train_step(cfg, tx)

def timeit(name, fn, iters=8):
    r = fn(); float(jax.tree.leaves(r)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(); float(jax.tree.leaves(r)[0].ravel()[0])
    print(f"{name:22s} {1000*(time.perf_counter()-t0)/iters:8.1f} ms",
          flush=True)

# 1. render forward only (binning + records + fwd kernel + untile)
@jax.jit
def render_fwd(params, buffers):
    out = model.render(cfg, params, buffers, cam, jnp.int32(3000),
                       jnp.zeros(3))
    return out["rgb"]

def loss_of(params, buffers):
    outputs = model.render(cfg, params, buffers, cam, jnp.int32(3000),
                           jnp.zeros(3))
    total, parts = model.loss_fn(cfg, outputs, gt, jnp.int32(3000))
    return total

# 2. loss forward (render + composite + l1/ssim)
@jax.jit
def loss_fwd(params, buffers):
    return loss_of(params, buffers)

# 3. loss + full vjp
@jax.jit
def loss_grad(params, buffers):
    loss, grads = jax.value_and_grad(
        lambda p: loss_of(p, buffers))(params)
    return grads.means

# 4. full train step (loss + vjp + optimizer + metrics)
def full():
    global state
    s2, metrics = step_fn(state, cam, gt)
    return metrics["loss"]

timeit("render fwd", lambda: render_fwd(state.params, state.buffers))
timeit("loss fwd", lambda: loss_fwd(state.params, state.buffers))
timeit("loss+vjp", lambda: loss_grad(state.params, state.buffers))
timeit("full step", full)
