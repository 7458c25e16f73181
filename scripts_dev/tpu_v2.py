import time, jax, jax.numpy as jnp, sys
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
cam = orbit_camera(H, W, dist=4.0)
mode = sys.argv[1] if len(sys.argv)>1 else "fwd"
if mode == "fwd":
    fn = jax.jit(lambda p: model.render(cfg, p, buffers, cam, jnp.int32(3000), jnp.zeros(3)))
    out = fn(params); _=float(out['alpha'].mean())
    t0=time.perf_counter()
    for _ in range(10):
        out = fn(params); _=float(out['alpha'][0,0])
    ms = 1000*(time.perf_counter()-t0)/10
    print(f"v2 fwd {ms:.2f} ms ({H*W/1e6/(ms/1000):.1f} Mpix/s) alpha={float(out['alpha'].mean()):.4f}", flush=True)
else:
    state, tx = train_step.init_state(cfg, optim.OptimConfig(), params, buffers, jax.random.key(1))
    sfn = train_step.make_train_step(cfg, tx)
    gt = jnp.zeros((H,W,3))
    state, m = sfn(state, cam, gt); _=float(m['loss'])
    t0=time.perf_counter()
    losses=[]
    for _ in range(8):
        state, m = sfn(state, cam, gt); losses.append(float(m['loss']))
    ms = 1000*(time.perf_counter()-t0)/8
    print(f"v2 train {ms:.1f} ms/step ({H*W/1e6/(ms/1000):.2f} Mpix/s) losses {losses[:2]}..{losses[-1]:.5f}", flush=True)
