"""Scan-vs-single-step timing on the trained scene (bench harness shapes)."""
import time
import jax
import jax.numpy as jnp
from gstex_tpu.utils.tpu import enable_compilation_cache
enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, surface_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.ops.camera import stack_cameras
from gstex_tpu.train import optim, step as train_step

N = 50_000
H = W = 800
SCAN = 8
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=393216, s_max=1536, pixel_num=1e6,
                        background_color="black", renderer="pallas")

@jax.jit
def init():
    s = surface_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad)
    return model.init_params(cfg, s["means"], s["log_scales"], s["quats"],
                             s["opacity_logits"], s["features_dc"],
                             s["features_rest"])

params, buffers = init()
state, tx = train_step.init_state(cfg, optim.OptimConfig(), params, buffers,
                                  jax.random.key(1))
cams = stack_cameras([orbit_camera(H, W, dist=4.0, azimuth=0.03 * i)
                      for i in range(SCAN)])
gts = jnp.zeros((SCAN, H, W, 3), jnp.float32)
# device-resident gt (rule out host->device transfer per chunk)
gts = jax.device_put(gts)

scan_fn = train_step.make_train_scan(cfg, tx)
state, ms = scan_fn(state, cams, gts)
float(ms["loss"][0])
t0 = time.perf_counter()
for _ in range(5):
    state, ms = scan_fn(state, cams, gts)
    float(ms["loss"][0])
dt = (time.perf_counter() - t0) / 5
print(f"scan chunk: {dt*1000:.1f} ms = {dt/SCAN*1000:.1f} ms/step")

single = train_step.make_train_step(cfg, tx)
cam0 = orbit_camera(H, W, dist=4.0)
gt0 = jnp.zeros((H, W, 3), jnp.float32)
state, m = single(state, cam0, gt0, None)
float(m["loss"])
t0 = time.perf_counter()
for _ in range(10):
    state, m = single(state, cam0, gt0, None)
    float(m["loss"])
print(f"single step: {(time.perf_counter()-t0)/10*1000:.1f} ms incl floor")
