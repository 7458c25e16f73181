"""Tile-size sweep for v5 on the trained scene: finer tiles = finer
early-exit granularity (the per-pixel-exit analog) vs more pairs."""
import os
import time

import jax
import jax.numpy as jnp

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene, surface_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.ops.binning import settle_caps
from gstex_tpu.train import optim, step as train_step

N = 50_000
H = W = 800
SCENE = os.environ.get("SCENE", "trained")
cam = orbit_camera(H, W, dist=4.0)
gt = jnp.zeros((H, W, 3), jnp.float32)


def scene_params(cfg):
    @jax.jit
    def init():
        if SCENE == "trained":
            s = surface_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad)
        else:
            s = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad,
                             spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
        return model.init_params(cfg, s["means"], s["log_scales"],
                                 s["quats"], s["opacity_logits"],
                                 s["features_dc"], s["features_rest"])

    return init()


def measure(th, tw):
    cfg0 = model.GStexConfig(chart_pad=(8, 8), tile_h=th, tile_w=tw,
                             pair_cap=1 << 21, s_max=4096, pixel_num=1e6,
                             background_color="black", renderer="pallas")
    params, buffers = scene_params(cfg0)
    # demand pass
    from gstex_tpu.ops.binning import build_tile_bins_flat
    from gstex_tpu.ops.cull import make_pair_cull
    from gstex_tpu.ops.prepare import prepare_splats

    grid = cfg0.grid(H, W)

    @jax.jit
    def demand(p):
        prep = prepare_splats(p.means, p.log_scales, p.quats,
                              p.opacity_logits, p.features_dc,
                              p.features_rest, buffers.mappings, cam,
                              active_sh_degree=3)
        cf = make_pair_cull(prep.geom, cam, grid)
        fb = build_tile_bins_flat(prep.centers, prep.extents, prep.depths,
                                  prep.valid, grid, pair_cap=1 << 21,
                                  s_cap=4096, cull_fn=cf)
        return fb.total_pairs, jnp.max(fb.counts), fb.overflow

    tp, mtc, ovf = demand(params)
    assert int(ovf) == 0
    pair_cap, s_cap = settle_caps(int(tp), int(mtc))
    print(f"tile {th}x{tw}: pairs {int(tp)} maxtile {int(mtc)} -> "
          f"caps ({pair_cap}, {s_cap})", flush=True)
    cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=th, tile_w=tw,
                            pair_cap=pair_cap, s_max=s_cap, pixel_num=1e6,
                            background_color="black", renderer="pallas")
    state, tx = train_step.init_state(cfg, optim.OptimConfig(), params,
                                      buffers, jax.random.key(1))
    step = train_step.make_train_step(cfg, tx)
    st, m = step(state, cam, gt, None)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(8):
        st, m = step(st, cam, gt, None)
        float(m["loss"])
    dt = 1000 * (time.perf_counter() - t0) / 8
    print(f"tile {th}x{tw}: {dt:8.1f} ms/step", flush=True)


import os as _os
_sizes = _os.environ.get("SIZES", "32x32,16x32,16x16,8x16")
for _s in _sizes.split(","):
    th, tw = (int(v) for v in _s.split("x"))
    measure(th, tw)
