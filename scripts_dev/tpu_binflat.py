"""Binning cost decomposition on the trained scene: where do the ~40 ms go?

Stages (each jitted separately, cumulative): prepare | +cull-table |
+expansion (owner/local/tile) | +cull-eval | +sort | +scatter (full flat
bins). Also: pair_cap sensitivity and 2-key-stable vs 3-key sort.
"""
import os
import time

import jax
import jax.numpy as jnp

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, surface_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.ops.binning import build_tile_bins_flat, tile_ranges
from gstex_tpu.ops.cull import make_pair_cull
from gstex_tpu.ops.prepare import prepare_splats

N = 50_000
H = W = 800
PAIR_CAP = int(os.environ.get("PAIR_CAP", str(1 << 19)))
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=PAIR_CAP, s_max=2048, pixel_num=1e6,
                        background_color="black")


@jax.jit
def init():
    scene = surface_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad)
    return model.init_params(cfg, scene["means"], scene["log_scales"],
                             scene["quats"], scene["opacity_logits"],
                             scene["features_dc"], scene["features_rest"])


params, buffers = init()
cam = orbit_camera(H, W, dist=4.0)
grid = cfg.grid(H, W)


def prep_of(p):
    return prepare_splats(p.means, p.log_scales, p.quats, p.opacity_logits,
                          p.features_dc, p.features_rest, buffers.mappings,
                          cam, active_sh_degree=3)


def expansion(prep, cull=True):
    from gstex_tpu.ops.binning import _pair_owner

    tx0, ty0, tw, counts = tile_ranges(prep.centers, prep.extents, grid,
                                       prep.valid)
    counts = jnp.where(prep.depths > 1e-6, counts, 0)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]
    k = jnp.arange(PAIR_CAP, dtype=jnp.int32)
    gid = _pair_owner(counts, offsets, PAIR_CAP)
    local = k - offsets[gid]
    w_g = jnp.maximum(tw[gid], 1)
    ty = ty0[gid] + local // w_g
    tx = tx0[gid] + local % w_g
    tile = ty * grid.ntx + tx
    pair_valid = k < total
    if cull:
        cf = make_pair_cull(prep.geom, cam, grid)
        pair_valid = jnp.logical_and(pair_valid, cf(gid, tx, ty))
    tile = jnp.where(pair_valid, tile, grid.num_tiles)
    return tile, prep.depths[gid], gid


@jax.jit
def s_prep(p):
    return prep_of(p).centers


@jax.jit
def s_exp_nocull(p):
    t, d, g = expansion(prep_of(p), cull=False)
    return t


@jax.jit
def s_exp(p):
    t, d, g = expansion(prep_of(p))
    return t


@jax.jit
def s_sort3(p):
    t, d, g = expansion(prep_of(p))
    ts, _, gs = jax.lax.sort((t, d, g), num_keys=3)
    return ts, gs


@jax.jit
def s_sort2(p):
    t, d, g = expansion(prep_of(p))
    ts, _, gs = jax.lax.sort((t, d, g), num_keys=2, is_stable=True)
    return ts, gs


@jax.jit
def s_full(p):
    prep = prep_of(p)
    cf = make_pair_cull(prep.geom, cam, grid)
    fb = build_tile_bins_flat(prep.centers, prep.extents, prep.depths,
                              prep.valid, grid, pair_cap=PAIR_CAP,
                              s_cap=cfg.s_max, cull_fn=cf)
    return fb.gids, fb.overflow, fb.total_pairs


def timeit(name, fn, iters=10):
    r = fn()
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
        float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    print(f"{name:20s} {1000 * (time.perf_counter() - t0) / iters:8.1f} ms",
          flush=True)
    return r


print(f"pair_cap {PAIR_CAP}")
timeit("prep", lambda: s_prep(params))
timeit("+expansion", lambda: s_exp_nocull(params))
timeit("+cull", lambda: s_exp(params))
timeit("+sort3", lambda: s_sort3(params))
timeit("+sort2stable", lambda: s_sort2(params))
_, ovf, tot = timeit("full flat bins", lambda: s_full(params))
print(f"total pairs {int(tot)}  overflow {int(ovf)}")
