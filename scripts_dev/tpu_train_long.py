"""Sustained on-chip training at bench scale: scanned steps + recharts.

1200 steps at 800^2 / 50k gaussians / 1e6 texels, pallas renderer,
steps fused 4-per-dispatch (the trainer's scan path), rechart every 100.
Asserts the loss drops and reports wall throughput.
"""
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
STEPS = 1200
SCAN = 4
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=1 << 20, s_max=512, pixel_num=1e6,
                        background_color="black", renderer="pallas")

@jax.jit
def init():
    scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad,
                         spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
    return model.init_params(cfg, scene["means"], scene["log_scales"],
                             scene["quats"], scene["opacity_logits"],
                             scene["features_dc"], scene["features_rest"])

params, buffers = init()
cams = [orbit_camera(H, W, dist=4.0, azimuth=a) for a in (0.0, 1.0, 2.0, 3.0)]
tgt_params = params._replace(texture=params.texture + 0.3)

@jax.jit
def render_gt(p):
    return jnp.stack([model.render(cfg, p, buffers, c, jnp.int32(0),
                                   jnp.zeros(3))["rgb"] for c in cams])

gts = render_gt(tgt_params)
state, tx = train_step.init_state(cfg, optim.OptimConfig(max_steps=STEPS),
                                  params, buffers, jax.random.key(1))
scan_fn = train_step.make_train_scan(cfg, tx)
rfn = train_step.make_rechart_step(cfg)
cams_st = stack_cameras(cams)

# warmup / compile outside timing
state, ms = scan_fn(state, cams_st, gts)
float(ms["loss"][0])
t0 = time.time()
losses = [(0, float(ms["loss"][0]), float(ms["psnr"][0]))]
step = SCAN
while step < STEPS:
    state, ms = scan_fn(state, cams_st, gts)
    step += SCAN
    if step % 200 == 0:
        l, p = float(ms["loss"][-1]), float(ms["psnr"][-1])
        losses.append((step, l, p))
        print(f"step {step}: loss {l:.5f} psnr {p:.2f}", flush=True)
    if step % 100 == 0:
        state = rfn(state)
dt = time.time() - t0
print(f"{STEPS - SCAN} steps in {dt:.0f}s = {1000 * dt / (STEPS - SCAN):.0f}"
      f" ms/step ({(H * W / 1e6) * (STEPS - SCAN) / dt:.2f} Mpix/s"
      f" sustained incl. recharts)", flush=True)
print(f"psnr {losses[0][2]:.2f} -> {losses[-1][2]:.2f}", flush=True)
assert losses[-1][1] < losses[0][1]
print("SUSTAINED OK", flush=True)
