"""Multi-chip sharding: the banded shard_map render/train must equal the
single-device path (virtual 8-device CPU mesh, SURVEY.md §4.4)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.parallel import shard
from gstex_tpu.train import optim, step as train_step

CFG = model.GStexConfig(chart_pad=(4, 4), tile_h=8, tile_w=16,
                        pair_cap=1 << 14, s_max=64, pixel_num=500,
                        background_color="black")
H, W = 64, 48


def setup(n=48):
    scene = random_scene(jax.random.key(0), n, chart_pad=CFG.chart_pad)
    params, buffers = model.init_params(
        CFG, scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"], scene["features_dc"], scene["features_rest"])
    ocfg = optim.OptimConfig(max_steps=100)
    state, tx = train_step.init_state(CFG, ocfg, params, buffers,
                                      jax.random.key(3))
    cam = orbit_camera(H, W, dist=3.0)
    return state, tx, cam


def test_sharded_render_matches_single():
    state, tx, cam = setup()
    mesh = Mesh(np.array(jax.devices()), ("tile",))
    rfn = shard.make_sharded_render(CFG, mesh, H, W)
    bg = jnp.zeros(3)
    rgb_sharded = rfn(state, cam, bg)
    rgb_single = model.render(CFG, state.params, state.buffers, cam,
                              state.step, bg)["rgb"]
    np.testing.assert_allclose(np.asarray(rgb_sharded),
                               np.asarray(rgb_single), atol=1e-5)


def test_sharded_train_matches_single():
    state, tx, cam = setup()
    mesh = Mesh(np.array(jax.devices()), ("tile",))
    gt = jnp.clip(
        model.render(CFG, state.params, state.buffers, cam, state.step,
                     jnp.zeros(3))["rgb"] + 0.03, 0, 1)

    sfn_single = train_step.make_train_step(CFG, tx)
    sfn_sharded = shard.make_sharded_train_step(CFG, tx, mesh, H, W)

    s1, m1 = sfn_single(state, cam, gt)
    state2, tx2, _ = setup()
    s2, m2 = sfn_sharded(state2, cam, gt)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    np.testing.assert_allclose(np.asarray(s1.params.means),
                               np.asarray(s2.params.means), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.params.texture),
                               np.asarray(s2.params.texture), atol=1e-5)


def test_trainer_multidevice(tmp_path):
    """End-to-end: Trainer with num_devices=8 runs the shard_map step."""
    from gstex_tpu.data.manager import FullImageCache
    from gstex_tpu.train.trainer import Trainer, TrainerConfig

    state, tx, cam = setup(n=32)
    img = np.zeros((H, W, 3), np.uint8)
    cache = FullImageCache(cameras=[cam], images=[img])
    tcfg = TrainerConfig(max_num_iterations=3, steps_per_save=0,
                         steps_per_eval_image=0, log_every=1,
                         output_dir=str(tmp_path), num_devices=8)
    tr = Trainer(tcfg, CFG, optim.OptimConfig(), state.params, state.buffers,
                 cache)
    tr.train()
    assert tr.mesh is not None
    assert int(tr.state.step) == 3
