"""Jitted training / eval steps (single-device path).

The functional replacement of ``Trainer.train_iteration`` (reference
``nerfstudio/engine/trainer.py:442-486``): one full-image camera per step,
loss = 0.8·L1 + 0.2·(1−SSIM) (+ optional regularizers), per-group Adam via
optax.multi_transform. The re-chart callback (every 100 steps,
``gstex.py:890-895``) is a separate jitted function — shapes never change.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import gstex as model
from ..ops.camera import Camera
from . import optim


class TrainState(NamedTuple):
    params: model.GStexParams
    buffers: model.GStexBuffers
    opt_state: optax.OptState
    step: jax.Array  # () int32
    key: jax.Array


def init_state(cfg: model.GStexConfig, ocfg: optim.OptimConfig,
               params: model.GStexParams, buffers: model.GStexBuffers,
               key) -> tuple[TrainState, optax.GradientTransformation]:
    tx = optim.make_optimizer(ocfg)
    opt_state = tx.init(params)
    return TrainState(params, buffers, opt_state,
                      jnp.int32(0), key), tx


def _train_body(cfg: model.GStexConfig, tx: optax.GradientTransformation,
                state: TrainState, cam: Camera, image: jax.Array,
                mask: jax.Array | None = None):
    """One functional train step (shared by the jitted single-step and the
    scanned multi-step paths)."""
    key, bg_key = jax.random.split(state.key)
    background = model.sample_background(cfg, bg_key)
    gt = model.composite_gt(image, background)

    def loss_of(params):
        outputs = model.render(cfg, params, state.buffers, cam,
                               state.step, background)
        total, parts = model.loss_fn(cfg, outputs, gt, state.step,
                                     mask=mask)
        return total, (parts, outputs)

    (loss, (parts, outputs)), grads = jax.value_and_grad(
        loss_of, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = dict(parts)
    metrics["loss"] = loss
    metrics["overflow"] = outputs["overflow"]
    metrics["total_pairs"] = outputs["total_pairs"]
    metrics["max_tile_count"] = outputs["max_tile_count"]
    metrics["psnr"] = 10.0 * -jnp.log10(
        jnp.maximum(jnp.mean((outputs["rgb"] - gt) ** 2), 1e-12))
    new_state = TrainState(params, state.buffers, opt_state,
                           state.step + 1, key)
    return new_state, metrics


def make_train_step(cfg: model.GStexConfig, tx: optax.GradientTransformation):
    """Returns jitted (state, cam, image) -> (state, metrics)."""

    def step_fn(state: TrainState, cam: Camera, image: jax.Array,
                mask: jax.Array | None = None):
        return _train_body(cfg, tx, state, cam, image, mask)

    return jax.jit(step_fn, donate_argnums=(0,), static_argnames=())


def make_train_scan(cfg: model.GStexConfig, tx: optax.GradientTransformation,
                    with_mask: bool = False):
    """Multi-step training under ONE dispatch: ``lax.scan`` over the step
    body.

    The reference dispatches one fused CUDA step per iteration and pays a
    host round-trip each time (``trainer.py:442-486``); under jit the whole
    chunk compiles once, XLA pipelines adjacent steps (optimizer update of
    step i overlaps binning of step i+1), and the host syncs once per chunk
    — which matters doubly on remote/tunneled TPU backends where each
    dispatch carries RPC latency. All cameras in a chunk must share (H, W)
    (static under jit); the trainer falls back to the single-step path
    otherwise.

    Returns jitted (state, cams, images[, masks]) -> (state, metrics) where
    ``cams`` is a Camera pytree with a leading chunk axis on array leaves,
    ``images`` is (n, H, W, 3), and metrics are stacked (n,) scalars.
    """

    def scan_fn(state: TrainState, cams: Camera, images: jax.Array,
                masks: jax.Array | None = None):
        xs = (cams, images, masks) if with_mask else (cams, images)

        def body(st, x):
            cam, image = x[0], x[1]
            mask = x[2] if with_mask else None
            return _train_body(cfg, tx, st, cam, image, mask)

        return jax.lax.scan(body, state, xs)

    return jax.jit(scan_fn, donate_argnums=(0,), static_argnames=())


class PoseState(NamedTuple):
    """Camera-optimizer state: (num_cameras, 6) tangent deltas + their
    optax state (``camera_optimizers.py:106-111``)."""

    delta: jax.Array
    opt_state: optax.OptState


def init_pose_state(num_cameras: int
                    ) -> tuple[PoseState, optax.GradientTransformation]:
    pose_tx = optim.make_pose_optimizer()
    delta = jnp.zeros((num_cameras, 6), jnp.float32)
    return PoseState(delta, pose_tx.init(delta)), pose_tx


def make_train_step_camopt(cfg: model.GStexConfig,
                           tx: optax.GradientTransformation,
                           pose_tx: optax.GradientTransformation,
                           mode: str):
    """Train step with joint pose optimization: the exp-mapped per-camera
    correction right-multiplies c2w inside the differentiated render, so
    pose gradients ride the model's backward pass; the camera_opt
    regularizer joins the loss (``camera_optimizers.py:113-170``)."""
    import dataclasses as _dc

    from ..ops import pose_opt

    def step_fn(state: TrainState, pose: PoseState, cam: Camera,
                cam_idx: jax.Array, image: jax.Array,
                mask: jax.Array | None = None):
        key, bg_key = jax.random.split(state.key)
        background = model.sample_background(cfg, bg_key)
        gt = model.composite_gt(image, background)

        def loss_of(params, delta):
            adj = pose_opt.exp_map(mode, delta[cam_idx])
            cam2 = _dc.replace(cam,
                               c2w=pose_opt.apply_correction(cam.c2w, adj))
            outputs = model.render(cfg, params, state.buffers, cam2,
                                   state.step, background)
            total, parts = model.loss_fn(cfg, outputs, gt, state.step,
                                         mask=mask)
            reg = pose_opt.regularizer(delta)
            return total + reg, (parts, outputs, reg)

        (loss, (parts, outputs, reg)), (grads, pose_grads) = \
            jax.value_and_grad(loss_of, argnums=(0, 1), has_aux=True)(
                state.params, pose.delta)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        p_updates, p_opt_state = pose_tx.update(pose_grads, pose.opt_state,
                                                pose.delta)
        delta = optax.apply_updates(pose.delta, p_updates)
        metrics = dict(parts)
        metrics["loss"] = loss
        metrics["camera_opt_regularizer"] = reg
        metrics.update(pose_opt.metrics(delta))
        metrics["overflow"] = outputs["overflow"]
        metrics["total_pairs"] = outputs["total_pairs"]
        metrics["max_tile_count"] = outputs["max_tile_count"]
        metrics["psnr"] = 10.0 * -jnp.log10(
            jnp.maximum(jnp.mean((outputs["rgb"] - gt) ** 2), 1e-12))
        new_state = TrainState(params, state.buffers, opt_state,
                               state.step + 1, key)
        return new_state, PoseState(delta, p_opt_state), metrics

    return jax.jit(step_fn, donate_argnums=(0, 1))


def make_rechart_step(cfg: model.GStexConfig):
    """Returns jitted re-chart: resize charts + zero texture Adam moments
    (``retexture_after``, ``gstex.py:890-895``)."""

    def fn(state: TrainState):
        params, buffers = model.rechart(cfg, state.params, state.buffers)
        opt_state = optim.reset_texture_moments(state.opt_state)
        return state._replace(params=params, buffers=buffers,
                              opt_state=opt_state)

    return jax.jit(fn, donate_argnums=(0,))


def make_eval_step(cfg: model.GStexConfig, extra: bool = False,
                   eval_only: bool = True):
    """Returns jitted (state, cam, background) -> outputs dict (no grad).

    ``eval_only`` (default) uses the forward-only pallas kernel when the
    renderer is pallas: rgb/depth/alpha only, no loss channels or backward
    residuals — the fps-metric fast path."""

    def fn(state: TrainState, cam: Camera, background):
        return model.render(cfg, state.params, state.buffers, cam,
                            state.step, background, extra=extra,
                            eval_only=eval_only and not extra)

    return jax.jit(fn, static_argnames=())
