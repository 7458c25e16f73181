"""Decompose the current v4 train step on-chip (post-cull)."""
import time
import jax
import jax.numpy as jnp
from gstex_tpu.utils.tpu import enable_compilation_cache
enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.ops.binning import build_tile_bins
from gstex_tpu.ops.cull import make_pair_cull
from gstex_tpu.ops.prepare import prepare_splats
from gstex_tpu.ops import sh as sh_ops
from gstex_tpu.ops import rasterize_pallas as rp
from gstex_tpu.ops import rasterize_pallas3 as rp3
from gstex_tpu.ops import rasterize_pallas_api as api
from gstex_tpu.train import optim, step as train_step

N = 50_000
H = W = 800
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=1 << 20, s_max=1024, pixel_num=1e6,
                        background_color="black", renderer="pallas")

@jax.jit
def init():
    scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad,
                         spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
    return model.init_params(cfg, scene["means"], scene["log_scales"],
                             scene["quats"], scene["opacity_logits"],
                             scene["features_dc"], scene["features_rest"])

params, buffers = init()
cam = orbit_camera(H, W, dist=4.0)
grid = cfg.grid(H, W)

def sync(x):
    return float(jnp.asarray(x).ravel()[0])

def timeit(name, fn, *args, iters=6):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        sync(jax.tree.leaves(out)[0])
    ms = 1000 * (time.perf_counter() - t0) / iters
    print(f"{name:30s} {ms:8.2f} ms", flush=True)
    return out, ms

def f_prep(p):
    return prepare_splats(p.means, p.log_scales, p.quats, p.opacity_logits,
                          p.features_dc, p.features_rest, buffers.mappings,
                          cam, active_sh_degree=3)

def f_bins(p):
    prep = f_prep(p)
    cf = make_pair_cull(prep.geom, cam, grid)
    return build_tile_bins(prep.centers, prep.extents, prep.depths,
                           prep.valid, grid, pair_cap=cfg.pair_cap,
                           s_max=cfg.s_max, cull_fn=cf)

def f_inputs(p):
    prep = f_prep(p)
    bins = f_bins(p)
    texture = sh_ops.sh_to_rgb(p.texture)
    packed = rp3.pack_charts_cmajor(texture)
    table = packed.reshape(-1, packed.shape[-1])
    records = rp.assemble_records(prep.geom, cam.c2w[:3, 3],
                                  buffers.texture_hw)
    rec_pairs = records[bins.ids]
    counts = jnp.minimum(bins.counts, bins.ids.shape[1])
    cam_info = rp._cam_info(cam, jnp.zeros((2,), jnp.float32))
    return rec_pairs, bins.ids, table, counts, cam_info

_, t_prep = timeit("prepare", jax.jit(f_prep), params)
bins, t_bins = timeit("prepare+binning(cull)", jax.jit(f_bins), params)
print("  kept pairs:", int(jnp.sum(bins.counts)), "overflow:",
      int(bins.overflow), flush=True)
inputs, t_inputs = timeit("...+records/charts pack", jax.jit(f_inputs), params)
rec_pairs, ids, table, counts, cam_info = inputs

chart_pad = cfg.chart_pad
def f_fwd(rec_pairs, ids, table, counts, cam_info):
    return api._core4(grid, chart_pad, False, rec_pairs, ids, table, counts,
                      cam_info)
_, t_fwd = timeit("fwd kernel", jax.jit(f_fwd), *inputs)

def f_fwdbwd(rec_pairs, ids, table, counts, cam_info):
    def loss(rt, tb):
        out = api._core4(grid, chart_pad, False, rt, ids, tb, counts,
                         cam_info)
        return jnp.sum(out * 1e-6)
    return jax.grad(loss, argnums=(0, 1))(rec_pairs, table)
_, t_fb = timeit("fwd+bwd kernels+segsum", jax.jit(f_fwdbwd), *inputs)

def f_render(p):
    out = model.render(cfg, p, buffers, cam, jnp.int32(3000), jnp.zeros(3))
    return out["rgb"]
_, t_render = timeit("full render fwd", jax.jit(f_render), params)

gt = jnp.zeros((H, W, 3), jnp.float32)
def f_lossgrad(p):
    def loss(p):
        out = model.render(cfg, p, buffers, cam, jnp.int32(3000),
                           jnp.zeros(3))
        total, parts = model.loss_fn(cfg, out, gt, jnp.int32(3000))
        return total
    return jax.grad(loss)(p)
_, t_lg = timeit("render+loss grad", jax.jit(f_lossgrad), params)

state, tx = train_step.init_state(cfg, optim.OptimConfig(), params, buffers,
                                  jax.random.key(1))
step_fn = train_step.make_train_step(cfg, tx)
def f_step(state):
    s2, m = step_fn(state, cam, gt)
    return m["loss"]
_, t_step = timeit("full train step", f_step, state)
