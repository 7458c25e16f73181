"""Scanned multi-step training == the same sequence of single steps.

The scan body is the identical functional step (same key splits, same
optimizer), so fusing n steps under one dispatch must be bit-compatible
with n sequential dispatches.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.ops.camera import stack_cameras
from gstex_tpu.train import optim, step as train_step

H, W = 64, 96
N = 48


def setup():
    cfg = model.GStexConfig(chart_pad=(4, 4), tile_h=32, tile_w=32,
                            pair_cap=8192, s_max=64, pixel_num=5e3,
                            background_color="black", renderer="xla")
    scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad)
    params, buffers = model.init_params(
        cfg, scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"], scene["features_dc"],
        scene["features_rest"])
    state, tx = train_step.init_state(cfg, optim.OptimConfig(), params,
                                      buffers, jax.random.key(1))
    return cfg, state, tx


def test_scan_matches_single_steps():
    cfg, state0, tx = setup()
    n = 3
    cams = [orbit_camera(H, W, dist=3.0, azimuth=0.2 * i) for i in range(n)]
    gts = [jnp.full((H, W, 3), 0.2 + 0.1 * i) for i in range(n)]

    # both paths donate their input state — give each its own copy
    state_a = jax.tree.map(jnp.copy, state0)
    state_b = jax.tree.map(jnp.copy, state0)

    step_fn = train_step.make_train_step(cfg, tx)
    s_single = state_a
    losses = []
    for i in range(n):
        s_single, metrics = step_fn(s_single, cams[i], gts[i])
        losses.append(float(metrics["loss"]))

    scan_fn = train_step.make_train_scan(cfg, tx)
    s_scan, ms = scan_fn(state_b, stack_cameras(cams), jnp.stack(gts))

    assert ms["loss"].shape == (n,)
    np.testing.assert_allclose(np.asarray(ms["loss"]), np.asarray(losses),
                               rtol=1e-6)
    assert int(s_scan.step) == int(s_single.step) == n
    for a, b in zip(jax.tree.leaves(s_scan.params),
                    jax.tree.leaves(s_single.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # losses must differ across steps (training actually happened)
    assert len(set(losses)) == n


def test_2dgs_mode_trains():
    """BASELINE config 1: pixel_num=0 (untextured 2DGS) — one texel per
    gaussian; the full train step must run and optimize."""
    cfg = model.GStexConfig(chart_pad=(4, 4), tile_h=32, tile_w=32,
                            pair_cap=8192, s_max=64, pixel_num=0,
                            background_color="black", renderer="xla")
    scene = random_scene(jax.random.key(2), N, chart_pad=cfg.chart_pad)
    params, buffers = model.init_params(
        cfg, scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"], scene["features_dc"],
        scene["features_rest"])
    assert int(model.texel_count(buffers)) == N   # one texel per gaussian
    state, tx = train_step.init_state(cfg, optim.OptimConfig(), params,
                                      buffers, jax.random.key(3))
    step_fn = train_step.make_train_step(cfg, tx)
    cam = orbit_camera(H, W, dist=3.0)
    gt = jnp.full((H, W, 3), 0.3)
    losses = []
    for _ in range(3):
        state, metrics = step_fn(state, cam, gt)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_stack_cameras_rejects_mixed_resolution():
    import pytest

    cams = [orbit_camera(H, W, dist=3.0), orbit_camera(H, 2 * W, dist=3.0)]
    with pytest.raises(ValueError):
        stack_cameras(cams)
