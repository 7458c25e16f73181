"""Tile size sweep with the alpha cull on: train-step time at 800^2/50k."""
import time
import jax
import jax.numpy as jnp
from gstex_tpu.utils.tpu import enable_compilation_cache
enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.train import optim, step as train_step

H = W = 800
N = 50_000
cam = orbit_camera(H, W, dist=4.0)
gt = jnp.zeros((H, W, 3), jnp.float32)

def measure(tile, s_max, cull):
    th, tw = tile if isinstance(tile, tuple) else (tile, tile)
    cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=th, tile_w=tw,
                            pair_cap=1 << 20, s_max=s_max, pixel_num=1e6,
                            background_color="black", renderer="pallas",
                            pair_cull=cull)
    @jax.jit
    def init():
        scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad,
                             spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
        return model.init_params(cfg, scene["means"], scene["log_scales"],
                                 scene["quats"], scene["opacity_logits"],
                                 scene["features_dc"], scene["features_rest"])
    params, buffers = init()
    state, tx = train_step.init_state(cfg, optim.OptimConfig(), params,
                                      buffers, jax.random.key(1))
    step_fn = train_step.make_train_step(cfg, tx)
    state, metrics = step_fn(state, cam, gt)
    print(f"tile={tile} s_max={s_max} cull={cull} overflow="
          f"{int(metrics.get('overflow', -1))}", flush=True)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, cam, gt)
        float(metrics["loss"])
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"  step {dt*1e3:.1f} ms  {(H*W/1e6)/dt:.2f} Mpix/s", flush=True)

for tile, s_max in ((32, 512), ((16, 32), 384), ((32, 16), 384),
                    (16, 256), (16, 384)):
    try:
        measure(tile, s_max, True)
    except Exception as e:
        print(f"tile={tile}: {type(e).__name__}: {e}", flush=True)
