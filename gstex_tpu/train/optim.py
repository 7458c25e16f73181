"""Per-parameter-group optimizers via optax.multi_transform.

The functional replacement for nerfstudio's ``Optimizers`` registry
(reference ``nerfstudio/engine/optimizers.py:73-114``) with the GStex group
LRs and schedules (``configs/gstex_configs.py:64-101``):

| group         | param leaf      | lr                     | schedule |
|---------------|-----------------|------------------------|----------|
| xyz           | means           | spatial_scale · 1.6e-5 | exp → /10 over max_steps |
| features_dc   | features_dc     | 2.5e-3                 | — |
| features_rest | features_rest   | 1.25e-4                | — |
| opacity       | opacity_logits  | 0.05                   | — |
| scaling       | log_scales      | 5e-3                   | — |
| rotation      | quats           | 1e-3                   | — |
| texture_dc    | texture         | 1e-3                   | — |

Adam with eps=1e-15 (torch betas 0.9/0.999). The camera_opt group (Adam
1e-3 -> 5e-5 over 30k steps, 100-step gradient accumulation,
``configs/method_configs.py:52,97-101``) lives in its own transform —
``make_pose_optimizer`` — since pose deltas are per-DATASET state, not
model params; the reference ships it with mode "off" and so do we.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..models.gstex import GStexParams


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Per-group optimizer settings (see module docstring)."""

    spatial_scale: float = 5.0      # Blender ≈5 (gstex_configs.py:66), COLMAP 2
    xyz_lr_mult: float = 1.0        # ×10 for the LOD configs (gstex_configs.py:355)
    max_steps: int = 15000
    features_dc_lr: float = 2.5e-3
    features_rest_lr: float = 2.5e-3 / 20
    opacity_lr: float = 0.05
    scaling_lr: float = 5e-3
    rotation_lr: float = 1e-3
    texture_lr: float = 1e-3
    adam_eps: float = 1e-15
    # per-group gradient accumulation, mirroring TrainerConfig.
    # gradient_accumulation_steps (engine/trainer.py:451-466); the reference
    # configs only set it for the inert camera_opt group
    gradient_accumulation: tuple = ()   # e.g. (("texture_dc", 4),)


GROUP_OF_LEAF = GStexParams(
    means="xyz",
    log_scales="scaling",
    quats="rotation",
    opacity_logits="opacity",
    features_dc="features_dc",
    features_rest="features_rest",
    texture="texture_dc",
)


def exp_decay_schedule(lr_init: float, lr_final: float, max_steps: int,
                       warmup_steps: int = 0, ramp: str = "cosine"):
    """Log-space interpolation with optional warmup, mirroring
    ``ExponentialDecayScheduler`` (``engine/schedulers.py:109-141``)."""

    def fn(step):
        if warmup_steps > 0:
            if ramp == "cosine":
                warm = lr_init * jnp.sin(
                    0.5 * jnp.pi * jnp.clip(step / warmup_steps, 0, 1))
            else:
                warm = lr_init * jnp.clip(step / warmup_steps, 0, 1)
        t = jnp.clip((step - warmup_steps) / (max_steps - warmup_steps),
                     0.0, 1.0)
        lr = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        if warmup_steps > 0:
            lr = jnp.where(step < warmup_steps, warm, lr)
        return lr

    return fn


def multi_step_schedule(lr_init: float, milestones, gamma: float = 0.33):
    """``MultiStepScheduler`` (``engine/schedulers.py:77``) analog."""

    def fn(step):
        k = sum((step >= m).astype(jnp.float32) if hasattr(step, "dtype")
                else float(step >= m) for m in milestones)
        return lr_init * gamma ** k

    return fn


def cosine_decay_schedule(lr_init: float, lr_final: float, max_steps: int,
                          warmup_steps: int = 0):
    """``CosineDecayScheduler`` (``engine/schedulers.py:158``) analog."""

    def fn(step):
        warm = lr_init * jnp.clip(step / jnp.maximum(warmup_steps, 1), 0, 1)
        t = jnp.clip((step - warmup_steps) / (max_steps - warmup_steps),
                     0.0, 1.0)
        cos = lr_final + 0.5 * (lr_init - lr_final) * (1 + jnp.cos(
            jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos) if warmup_steps \
            else cos

    return fn


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    def adam(lr) -> optax.GradientTransformation:
        return optax.adam(lr, b1=0.9, b2=0.999, eps=cfg.adam_eps)

    xyz_init = cfg.spatial_scale * 1.6e-5 * cfg.xyz_lr_mult
    xyz_final = cfg.spatial_scale * 1.6e-6
    transforms = {
        "xyz": adam(exp_decay_schedule(xyz_init, xyz_final, cfg.max_steps)),
        "features_dc": adam(cfg.features_dc_lr),
        "features_rest": adam(cfg.features_rest_lr),
        "opacity": adam(cfg.opacity_lr),
        "scaling": adam(cfg.scaling_lr),
        "rotation": adam(cfg.rotation_lr),
        "texture_dc": adam(cfg.texture_lr),
    }
    for group, every in dict(cfg.gradient_accumulation).items():
        transforms[group] = optax.MultiSteps(transforms[group],
                                             every_k_schedule=every)
    return optax.multi_transform(transforms, GROUP_OF_LEAF)


def make_pose_optimizer(adam_eps: float = 1e-15
                        ) -> optax.GradientTransformation:
    """camera_opt group: Adam(1e-3, eps=1e-15) with exponential decay to
    5e-5 over 30000 steps and 100-step gradient accumulation
    (``configs/method_configs.py:52,97-101``)."""
    tx = optax.adam(exp_decay_schedule(1e-3, 5e-5, 30000), b1=0.9,
                    b2=0.999, eps=adam_eps)
    return optax.MultiSteps(tx, every_k_schedule=100)


def reset_texture_moments(opt_state: Any) -> Any:
    """Zero the Adam moments of the texture group after re-charting, mirroring
    ``reshape_in_optim`` (``gstex.py:799-832``) which zeroes exp_avg/exp_avg_sq
    for the resized texture parameter."""

    def zero_adam(state):
        if isinstance(state, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=state.count,
                mu=jax.tree.map(jnp.zeros_like, state.mu),
                nu=jax.tree.map(jnp.zeros_like, state.nu),
            )
        return state

    inner = dict(opt_state.inner_states)
    tex_state = inner["texture_dc"]
    new_inner = jax.tree.map(zero_adam, tex_state,
                             is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
    inner["texture_dc"] = new_inner
    return opt_state._replace(inner_states=inner)
