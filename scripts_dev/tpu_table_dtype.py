"""A/B the chart-table storage dtype (f32 vs bf16): step timing + grad diffs.

The packed chart table is the per-splat DMA stream of both v4 kernels
(rasterize_pallas4.py TABLE_DTYPE). bf16 halves those DMA bytes and the
chart VMEM slots; the fetch dots already run as bf16 MXU passes either way
(MXU_DOT_PRECISION emulation), so the measurable questions are (a) does the
DMA saving show up at step level, (b) how much do outputs/grads move.
Feeds the DESIGN.md precision study (VERDICT r1 item 10).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.ops import rasterize_pallas4 as rp4

N = 50_000
H = W = 800
cam = orbit_camera(H, W, dist=4.0)
gt = jnp.zeros((H, W, 3), jnp.float32)


def run(dtype):
    prev = rp4.TABLE_DTYPE
    rp4.TABLE_DTYPE = dtype
    try:
        return _run_inner(dtype)
    finally:
        rp4.TABLE_DTYPE = prev


def _run_inner(dtype):
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

    def loss_of(params):
        out = model.render(cfg, params, buffers, cam, jnp.int32(3000),
                           jnp.zeros(3))
        total, _ = model.loss_fn(cfg, out, gt, jnp.int32(3000))
        return total

    grad_fn = jax.jit(jax.value_and_grad(loss_of))

    @jax.jit
    def fwd(params):
        out = model.render(cfg, params, buffers, cam, jnp.int32(3000),
                           jnp.zeros(3))
        return out["rgb"]

    # warmup + timing (host sync per iter: axon block_until_ready lies)
    loss, grads = grad_fn(params)
    float(loss)
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        loss, grads = grad_fn(params)
        float(loss)
    dt = (time.perf_counter() - t0) / iters
    rgb = np.asarray(fwd(params))
    g_np = {jax.tree_util.keystr(p): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(grads)[0]}
    return dt, rgb, g_np


dt32, rgb32, g32 = run(jnp.float32)
dt16, rgb16, g16 = run(jnp.bfloat16)
print(f"step f32  {1000*dt32:7.1f} ms")
print(f"step bf16 {1000*dt16:7.1f} ms   speedup {dt32/dt16:5.3f}x")
d = np.abs(rgb32 - rgb16)
print(f"rgb diff: max {d.max():.3e}  mean {d.mean():.3e}  "
      f"n>1e-3 {(d>1e-3).sum()}/{d.size}")
for k in sorted(g32):
    a, b = g32[k], g16[k]
    den = np.abs(a).max() + 1e-12
    d = np.abs(a - b)
    print(f"grad {k:28s} max {d.max():.3e}  rel {d.max()/den:.3e}")
