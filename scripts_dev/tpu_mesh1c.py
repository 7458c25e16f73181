"""Bisect WHAT inside the mesh-of-1 sharded train body costs ~14 s."""
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, surface_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.parallel import shard
from gstex_tpu.train import optim, step as train_step

N = 50_000
H = W = 800
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=393216, s_max=1536, pixel_num=1e6,
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
axis = "tile"
bgrid, band_h = shard.band_grid(cfg, H, W, 1)
cam_tuple = (cam.fx, cam.fy, cam.cx, cam.cy, cam.c2w)
bg = jnp.zeros(3)


def band_loss(p):
    return shard._band_loss(cfg, p, buffers, jnp.int32(3000), axis, 1,
                            bgrid, band_h, H, W, cam_tuple, gt, bg)


def mk(fn):
    return jax.jit(shard_map(fn, mesh=mesh1, in_specs=(P(),),
                             out_specs=P(), check_vma=False))


loss_fwd = mk(lambda p: band_loss(p)[0])
loss_grad = mk(lambda p: jax.value_and_grad(
    lambda q: band_loss(q)[0])(p)[1].means)


def grad_psum(p):
    g = jax.value_and_grad(lambda q: band_loss(q)[0])(p)[1]
    g = jax.lax.psum(g, axis)
    return g.means


loss_grad_psum = mk(grad_psum)


def timeit(name, fn, *a, iters=4):
    r = fn(*a)
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
        float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    print(f"{name:26s} {1000 * (time.perf_counter() - t0) / iters:9.1f} ms",
          flush=True)


timeit("shard loss fwd", loss_fwd, state.params)
timeit("shard loss grad", loss_grad, state.params)
timeit("shard loss grad+psum", loss_grad_psum, state.params)

import optax


def with_opt(p, opt_state):
    g = jax.value_and_grad(lambda q: band_loss(q)[0])(p)[1]
    g = jax.lax.psum(g, axis)
    updates, opt_state2 = tx.update(g, opt_state, p)
    p2 = optax.apply_updates(p, updates)
    return p2.means


opt_fn = jax.jit(shard_map(with_opt, mesh=mesh1, in_specs=(P(), P()),
                           out_specs=P(), check_vma=False))


def with_rng(p, key):
    key, bg_key = jax.random.split(key)
    background = model.sample_background(cfg, bg_key)
    g = jax.value_and_grad(lambda q: band_loss(q)[0])(p)[1]
    return g.means + background[0]


rng_fn = jax.jit(shard_map(with_rng, mesh=mesh1, in_specs=(P(), P()),
                           out_specs=P(), check_vma=False))

timeit("  +optimizer", opt_fn, state.params, state.opt_state)
timeit("  +rng/background", rng_fn, state.params, state.key)


def full_shard_fn(params, buffers_, opt_state, step, key, cam_tuple_, image):
    key, bg_key = jax.random.split(key)
    background = model.sample_background(cfg, bg_key)

    def loss_of(p):
        return shard._band_loss(cfg, p, buffers_, step, axis, 1, bgrid,
                                band_h, H, W, cam_tuple_, image, background)

    (loss, (mse_sum, overflow, tpairs, maxtc)), grads = \
        jax.value_and_grad(loss_of, has_aux=True)(params)
    grads = jax.lax.psum(grads, axis)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    mse = jax.lax.psum(mse_sum, axis) / (H * W * 3)
    metrics = {
        "loss": loss,
        "overflow": jax.lax.psum(overflow, axis),
        "total_pairs": jax.lax.pmax(tpairs, axis),
        "max_tile_count": jax.lax.pmax(maxtc, axis),
        "psnr": 10.0 * -jnp.log10(jnp.maximum(mse, 1e-12)),
    }
    return params, opt_state, step + 1, key, metrics


full_fn = jax.jit(shard_map(
    full_shard_fn, mesh=mesh1,
    in_specs=(P(), P(), P(), P(), P(), P(), P()),
    out_specs=(P(), P(), P(), P(), P()), check_vma=False))


def run_full():
    out = full_fn(state.params, buffers, state.opt_state, state.step,
                  state.key, cam_tuple, gt)
    return out[4]["loss"]


timeit("full shard_fn replica", run_full)


real_step = shard.make_sharded_train_step(cfg, tx, mesh1, H, W)
from gstex_tpu.train.step import TrainState

st_fixed = jax.tree.map(jnp.copy, state)
timeit("real step, no threading", lambda: real_step(st_fixed, cam, gt)[1]["loss"])

st_thread = jax.tree.map(jnp.copy, state)
def threaded():
    global st_thread
    st_thread, m = real_step(st_thread, cam, gt)
    return m["loss"]
timeit("real step, threaded", threaded)
