"""Is the threaded sharded step recompiling every call?"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

jax.config.update("jax_log_compiles", True)

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, surface_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.parallel import shard
from gstex_tpu.train import optim, step as train_step

N = 5_000
H = W = 256
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=1 << 16, s_max=512, pixel_num=1e5,
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
mesh1 = Mesh(np.array(jax.devices()[:1]), ("tile",))
step_fn = shard.make_sharded_train_step(cfg, tx, mesh1, H, W)

st = state
for i in range(5):
    t0 = time.perf_counter()
    st, m = step_fn(st, cam, gt)
    float(m["loss"])
    print(f"iter {i}: {1000 * (time.perf_counter() - t0):.0f} ms",
          flush=True)
    for leaf, name in ((st.params.means, "means"), (st.step, "step"),
                       (st.key, "key")):
        print(f"   {name}: sharding={leaf.sharding}", flush=True)
