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

Adam with eps=1e-15 (torch betas 0.9/0.999). The reference's camera_opt group
is inert (SURVEY.md §2.2) and intentionally absent.
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


GROUP_OF_LEAF = GStexParams(
    means="xyz",
    log_scales="scaling",
    quats="rotation",
    opacity_logits="opacity",
    features_dc="features_dc",
    features_rest="features_rest",
    texture="texture_dc",
)


def exp_decay_schedule(lr_init: float, lr_final: float, max_steps: int):
    """Log-space interpolation, mirroring ``ExponentialDecayScheduler``
    (``engine/schedulers.py:109-141``, no warmup)."""

    def fn(step):
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        return jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)

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
    return optax.multi_transform(transforms, GROUP_OF_LEAF)


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
