import time, jax, jax.numpy as jnp, sys
from gstex_tpu.utils.tpu import enable_compilation_cache
enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.train import optim, step as train_step

H=W=800; N=50_000
def cfg_s(s):
    return model.GStexConfig(chart_pad=(8,8), tile_h=32, tile_w=32, pair_cap=1<<20, s_max=s, pixel_num=1e6, background_color="black")
cfg = cfg_s(512)
@jax.jit
def init():
    scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad, spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
    return model.init_params(cfg, scene["means"], scene["log_scales"], scene["quats"], scene["opacity_logits"], scene["features_dc"], scene["features_rest"])
params, buffers = init()
cam = orbit_camera(H, W, dist=4.0)
outs = {}
for s in (512, 128, 64):
    c = cfg_s(s)
    fn = jax.jit(lambda p, _c=c: model.render(_c, p, buffers, cam, jnp.int32(3000), jnp.zeros(3)))
    o = fn(params)
    outs[s] = o
    print(s, 'overflow', int(o['overflow']), flush=True)
for s in (128, 64):
    d = float(jnp.abs(outs[512]['rgb'] - outs[s]['rgb']).max())
    dm = float(jnp.abs(outs[512]['rgb'] - outs[s]['rgb']).mean())
    print(f's_max={s}: rgb maxdiff {d:.2e} meandiff {dm:.2e}', flush=True)
# timing at s_max=128
c = cfg_s(128)
state, tx = train_step.init_state(c, optim.OptimConfig(), params, buffers, jax.random.key(1))
sfn = train_step.make_train_step(c, tx)
gt = jnp.zeros((H,W,3))
state, m = sfn(state, cam, gt); _=float(m['loss'])
t0=time.perf_counter()
for _ in range(8):
    state, m = sfn(state, cam, gt); _=float(m['loss'])
ms = 1000*(time.perf_counter()-t0)/8
print(f's_max=128 train: {ms:.1f} ms/step ({H*W/1e6/(ms/1000):.2f} Mpix/s)', flush=True)
