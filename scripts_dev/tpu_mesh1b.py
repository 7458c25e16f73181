"""Bisect the mesh-of-1 shard_map slowdown: renderer tier x fwd/train."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, surface_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.parallel import shard
from gstex_tpu.train import optim, step as train_step

N = 50_000
H = W = 800
RENDERER = os.environ.get("RENDERER", "pallas")
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=393216, s_max=1536, pixel_num=1e6,
                        background_color="black", renderer=RENDERER)
cam = orbit_camera(H, W, dist=4.0)


@jax.jit
def init():
    scene = surface_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad)
    return model.init_params(cfg, scene["means"], scene["log_scales"],
                             scene["quats"], scene["opacity_logits"],
                             scene["features_dc"], scene["features_rest"])


params, buffers = init()
state, tx = train_step.init_state(cfg, optim.OptimConfig(), params, buffers,
                                  jax.random.key(1))
mesh1 = Mesh(np.array(jax.devices()[:1]), ("tile",))


@jax.jit
def plain_fwd(p):
    out = model.render(cfg, p, buffers, cam, jnp.int32(3000), jnp.zeros(3),
                       eval_only=True)
    return out["rgb"]


sh_render = shard.make_sharded_render(cfg, mesh1, H, W)


def timeit(name, fn, iters=5):
    r = fn()
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
        float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    print(f"[{RENDERER}] {name:22s} "
          f"{1000 * (time.perf_counter() - t0) / iters:8.1f} ms", flush=True)


timeit("plain fwd", lambda: plain_fwd(state.params))
timeit("sharded fwd (mesh1)", lambda: sh_render(state, cam, jnp.zeros(3)))

gt = jnp.zeros((H, W, 3), jnp.float32)
single = train_step.make_train_step(cfg, tx)
sharded = shard.make_sharded_train_step(cfg, tx, mesh1, H, W)
fresh = lambda: jax.tree.map(jnp.copy, state)

st1 = fresh()
def run_single():
    global st1
    st1, m = single(st1, cam, gt, None)
    return m["loss"]

st2 = fresh()
def run_sharded():
    global st2
    st2, m = sharded(st2, cam, gt)
    return m["loss"]

timeit("plain train", run_single)
timeit("sharded train (mesh1)", run_sharded)
