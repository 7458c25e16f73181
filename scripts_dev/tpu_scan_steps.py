"""Scanned multi-step training vs per-step dispatch: amortized step time."""
import time
import jax
import jax.numpy as jnp
from gstex_tpu.utils.tpu import enable_compilation_cache
enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.ops.camera import stack_cameras
from gstex_tpu.train import optim, step as train_step

H = W = 800
N = 50_000
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=1 << 19, s_max=512, pixel_num=1e6,
                        background_color="black", renderer="pallas")

@jax.jit
def init():
    scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad,
                         spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
    return model.init_params(cfg, scene["means"], scene["log_scales"],
                             scene["quats"], scene["opacity_logits"],
                             scene["features_dc"], scene["features_rest"])

params, buffers = init()
state, tx = train_step.init_state(cfg, optim.OptimConfig(), params, buffers,
                                  jax.random.key(1))
gt = jnp.zeros((H, W, 3), jnp.float32)

CHUNK = 8
cams = [orbit_camera(H, W, dist=4.0, azimuth=0.03 * i) for i in range(CHUNK)]
cams_st = stack_cameras(cams)
gts = jnp.zeros((CHUNK, H, W, 3), jnp.float32)

# single-step path
step_fn = train_step.make_train_step(cfg, tx)
state, metrics = step_fn(state, cams[0], gt)
float(metrics["loss"])
t0 = time.perf_counter()
iters = 16
for i in range(iters):
    state, metrics = step_fn(state, cams[i % CHUNK], gt)
    float(metrics["loss"])
dt1 = (time.perf_counter() - t0) / iters
print(f"single-step: {1000*dt1:.1f} ms/step  "
      f"({(H*W/1e6)/dt1:.2f} Mpix/s)", flush=True)

# scanned path
scan_fn = train_step.make_train_scan(cfg, tx)
state, ms = scan_fn(state, cams_st, gts)
float(ms["loss"][0])
t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    state, ms = scan_fn(state, cams_st, gts)
    float(ms["loss"][0])
dt2 = (time.perf_counter() - t0) / (reps * CHUNK)
print(f"scan[{CHUNK}]:     {1000*dt2:.1f} ms/step  "
      f"({(H*W/1e6)/dt2:.2f} Mpix/s)", flush=True)
print("loss evolves:", [round(float(x), 5) for x in ms["loss"]], flush=True)
