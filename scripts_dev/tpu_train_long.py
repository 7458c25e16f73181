"""300-step on-chip training smoke: pallas renderer, rechart every 100."""
import time, jax, jax.numpy as jnp
from gstex_tpu.utils.tpu import enable_compilation_cache
enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.train import optim, step as train_step

H=W=800; N=50_000
cfg = model.GStexConfig(chart_pad=(8,8), tile_h=32, tile_w=32, pair_cap=1<<20, s_max=512, pixel_num=1e6, background_color="black", renderer="pallas")
@jax.jit
def init():
    scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad, spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
    return model.init_params(cfg, scene["means"], scene["log_scales"], scene["quats"], scene["opacity_logits"], scene["features_dc"], scene["features_rest"])
params, buffers = init()
# target: render of a perturbed variant (recoverable signal)
cams = [orbit_camera(H, W, dist=4.0, azimuth=a) for a in (0.0, 1.0, 2.0, 3.0)]
tgt_params = params._replace(texture=params.texture + 0.3)
@jax.jit
def render_gt(p, i):
    outs = [model.render(cfg, p, buffers, c, jnp.int32(0), jnp.zeros(3))["rgb"] for c in cams]
    return jnp.stack(outs)
gts = render_gt(tgt_params, 0)
state, tx = train_step.init_state(cfg, optim.OptimConfig(max_steps=1200), params, buffers, jax.random.key(1))
sfn = train_step.make_train_step(cfg, tx)
rfn = train_step.make_rechart_step(cfg)
t0=time.time(); losses=[]
for step in range(1200):
    i = step % 4
    state, m = sfn(state, cams[i], gts[i])
    if step % 200 == 0:
        losses.append((step, float(m['loss']), float(m['psnr'])))
        print(f"step {step}: loss {losses[-1][1]:.5f} psnr {losses[-1][2]:.2f}", flush=True)
    if step and step % 100 == 0:
        state = rfn(state)
        print(f"step {step}: recharted, texels {int(model.texel_count(state.buffers))}", flush=True)
print(f"300 steps in {time.time()-t0:.0f}s; first/last psnr {losses[0][2]:.2f} -> {losses[-1][2]:.2f}", flush=True)
assert losses[-1][1] < losses[0][1]
print("SMOKE OK", flush=True)
