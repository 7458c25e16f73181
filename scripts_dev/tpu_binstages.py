"""Isolated binning stage timings (each stage jitted alone on materialized
inputs — no cumulative-DCE ambiguity)."""
import os
import time

import jax
import jax.numpy as jnp

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, surface_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.ops.binning import (SLOT_ALIGN, _pair_owner, flat_slot_cap,
                                   tile_ranges)
from gstex_tpu.ops.cull import make_pair_cull
from gstex_tpu.ops.prepare import prepare_splats

N = 50_000
H = W = 800
PAIR_CAP = int(os.environ.get("PAIR_CAP", str(1 << 19)))
S_CAP = 2048
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=PAIR_CAP, s_max=S_CAP, pixel_num=1e6,
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

prep = jax.jit(lambda p: prepare_splats(
    p.means, p.log_scales, p.quats, p.opacity_logits, p.features_dc,
    p.features_rest, buffers.mappings, cam, active_sh_degree=3))(params)
prep = jax.block_until_ready(prep)


def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    r = f(*args)
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
        float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    print(f"{name:24s} {1000 * (time.perf_counter() - t0) / iters:8.1f} ms",
          flush=True)
    return jax.tree.map(jnp.asarray, r)


# stage 1: ranges + owner + tile computation
def expand(centers, extents, depths, valid):
    tx0, ty0, tw, counts = tile_ranges(centers, extents, grid, valid)
    counts = jnp.where(depths > 1e-6, counts, 0)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]
    k = jnp.arange(PAIR_CAP, dtype=jnp.int32)
    gid = _pair_owner(counts, offsets, PAIR_CAP)
    local = k - offsets[gid]
    w_g = jnp.maximum(tw[gid], 1)
    ty = ty0[gid] + local // w_g
    tx = tx0[gid] + local % w_g
    tile = (ty * grid.ntx + tx).astype(jnp.int32)
    pair_valid = k < total
    return tile, tx, ty, gid, pair_valid, total


tile, tx, ty, gid, pv, total = timeit(
    "expand", expand, prep.centers, prep.extents, prep.depths, prep.valid)

cull_fn = make_pair_cull(prep.geom, cam, grid)
keep = timeit("cull eval", lambda g, x, y: cull_fn(g, x, y), gid, tx, ty)

tile_culled = jnp.where(jnp.logical_and(pv, keep), tile, grid.num_tiles)
depth_k = prep.depths[gid]


def sort3(t, d, g):
    return jax.lax.sort((t, d, g), num_keys=3)


ts, _, gs = timeit("sort3", sort3, tile_culled, depth_k, gid)


def post(tile_s, gid_s):
    nt = grid.num_tiles
    tile_ids = jnp.arange(nt, dtype=jnp.int32)
    seg0 = jnp.searchsorted(tile_s, tile_ids, side="left").astype(jnp.int32)
    seg1 = jnp.searchsorted(tile_s, tile_ids, side="right").astype(jnp.int32)
    tile_counts = seg1 - seg0
    clamped = jnp.minimum(tile_counts, S_CAP)
    padded = -(-clamped // SLOT_ALIGN) * SLOT_ALIGN
    starts = (jnp.cumsum(padded) - padded).astype(jnp.int32)
    k = jnp.arange(PAIR_CAP, dtype=jnp.int32)
    rank = k - seg0[jnp.minimum(tile_s, nt - 1)]
    slot_cap = flat_slot_cap(PAIR_CAP, nt)
    in_range = jnp.logical_and(tile_s < nt, rank < S_CAP)
    slot = jnp.where(in_range, starts[jnp.minimum(tile_s, nt - 1)] + rank,
                     slot_cap)
    gids = jnp.zeros((slot_cap,), jnp.int32).at[slot].set(gid_s, mode="drop")
    sval = jnp.zeros((slot_cap,), bool).at[slot].set(True, mode="drop")
    return gids, sval, starts, tile_counts


timeit("post (scatter)", post, ts, gs)

# gather+pack stage (records wide gather at rec_rows)
from gstex_tpu.ops import rasterize_pallas as rp

records = jax.jit(lambda: jnp.pad(
    rp.assemble_records(prep.geom, cam.c2w[:3, 3], buffers.texture_hw),
    ((0, 0), (0, 96))))()
records = jax.block_until_ready(records)
gids, sval, starts, cnts = jax.block_until_ready(jax.jit(post)(ts, gs))


def gather(records, gids):
    return records[gids]


timeit("records gather", gather, records, gids)
print(f"total pairs {int(total)}")

# ---- expand sub-stages ----
tx0, ty0, tw, counts = jax.block_until_ready(jax.jit(
    lambda: tile_ranges(prep.centers, prep.extents, grid, prep.valid))())
counts = jax.block_until_ready(jnp.where(prep.depths > 1e-6, counts, 0))
offsets = jax.block_until_ready(jnp.cumsum(counts) - counts)


def owner_only(counts, offsets):
    return _pair_owner(counts, offsets, PAIR_CAP)


gid_m = jax.block_until_ready(jax.jit(owner_only)(counts, offsets))
timeit("  owner (scatter+cummax)", owner_only, counts, offsets)


def gathers_only(gid_m, tx0, ty0, tw, offsets):
    return tx0[gid_m] + ty0[gid_m] + tw[gid_m] + offsets[gid_m]


timeit("  4x gather", gathers_only, gid_m, tx0, ty0, tw, offsets)


def packed_gather(gid_m, packed):
    row = packed[gid_m]
    return row[:, 0] + row[:, 1] + row[:, 2] + row[:, 3]


packed = jax.block_until_ready(
    jnp.stack([tx0, ty0, tw, offsets], axis=1))
timeit("  1x (N,4) row gather", packed_gather, gid_m, packed)


def divmod_int(gid_m, tw, offsets):
    k = jnp.arange(PAIR_CAP, dtype=jnp.int32)
    local = k - offsets[gid_m]
    w_g = jnp.maximum(tw[gid_m], 1)
    return local // w_g + local % w_g


timeit("  divmod int", divmod_int, gid_m, tw, offsets)


def divmod_float(gid_m, tw, offsets):
    k = jnp.arange(PAIR_CAP, dtype=jnp.int32)
    local = k - offsets[gid_m]
    w_g = jnp.maximum(tw[gid_m], 1)
    q = jnp.floor(local.astype(jnp.float32) / w_g.astype(jnp.float32)
                  ).astype(jnp.int32)
    return q + (local - q * w_g)


timeit("  divmod float", divmod_float, gid_m, tw, offsets)


def scatter2(ts, gs):
    slot_cap = flat_slot_cap(PAIR_CAP, grid.num_tiles)
    k = jnp.arange(PAIR_CAP, dtype=jnp.int32)
    slot = jnp.where(ts < grid.num_tiles, k, slot_cap)
    gids = jnp.zeros((slot_cap,), jnp.int32).at[slot].set(gs, mode="drop")
    sval = jnp.zeros((slot_cap,), bool).at[slot].set(True, mode="drop")
    return gids, sval


def scatter1(ts, gs):
    slot_cap = flat_slot_cap(PAIR_CAP, grid.num_tiles)
    k = jnp.arange(PAIR_CAP, dtype=jnp.int32)
    slot = jnp.where(ts < grid.num_tiles, k, slot_cap)
    g1 = jnp.zeros((slot_cap,), jnp.int32).at[slot].set(gs + 1, mode="drop")
    return jnp.maximum(g1 - 1, 0), g1 > 0


timeit("  2 scatters", scatter2, ts, gs)
timeit("  1 scatter (+1 trick)", scatter1, ts, gs)
