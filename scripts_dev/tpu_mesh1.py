"""Sharding overhead proxy on one real chip: unsharded step vs mesh-of-1
shard_map step (same scene, same renderer). The banding machinery, halo
ppermute, psums and band loss all run with world size 1 — the measured
delta is the pure overhead the sharded formulation adds."""
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

single = train_step.make_train_step(cfg, tx)
mesh1 = Mesh(np.array(jax.devices()[:1]), ("tile",))
sharded = shard.make_sharded_train_step(cfg, tx, mesh1, H, W)


def timeit(name, fn, state, iters=10):
    # TWO threaded warmups: the first call compiles for uncommitted inputs,
    # the second for mesh-committed state (the steady-state executable)
    state2, m = fn(state, cam, gt)
    float(m["loss"])
    state2, m = fn(state2, cam, gt)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state2, m = fn(state2, cam, gt)
        float(m["loss"])
    dt = 1000 * (time.perf_counter() - t0) / iters
    print(f"{name:22s} {dt:8.1f} ms/step  loss {float(m['loss']):.5f}",
          flush=True)
    return dt


fresh = lambda: jax.tree.map(jnp.copy, state)   # steps donate their state
d1 = timeit("unsharded", lambda s, c, g: single(s, c, g, None), fresh())
d2 = timeit("mesh-of-1 shard_map", sharded, fresh())
print(f"sharding overhead: {d2 - d1:+.1f} ms ({100 * (d2 / d1 - 1):+.1f}%)")
