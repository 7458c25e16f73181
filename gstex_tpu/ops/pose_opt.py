"""Camera pose optimization: SO(3)xR3 / SE(3) exp maps + correction.

TPU-native equivalent of the reference camera optimizer
(``nerfstudio/cameras/camera_optimizers.py:86-190`` and
``cameras/lie_groups.py``): a learnable (num_cameras, 6) tangent array
whose exp map right-multiplies each camera-to-world, jointly optimized
with the model under the ``camera_opt`` param group (Adam 1e-3 -> 5e-5,
100-step gradient accumulation, ``configs/method_configs.py:52,97-101``).
The reference ships GStex with the optimizer present but mode "off"; the
default here matches.

Everything is batched jnp on (..., 6) tangents — no per-camera host
loops; the exp map runs inside the jitted train step so pose gradients
ride the same backward pass as the model's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# loss regularizer weights (camera_optimizers.py:50-55)
TRANS_L2_PENALTY = 1e-2
ROT_L2_PENALTY = 1e-3

MODES = ("off", "SO3xR3", "SE3")


def _skew(w):
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
        jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
        jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
    ], axis=-2)


def _so3_exp(w):
    """Rodrigues with the reference's 1e-4 squared-norm clamp
    (lie_groups.py:36-57): R = I + sin(t)/t K + (1-cos(t))/t^2 K^2."""
    nrm2 = jnp.maximum(jnp.sum(w * w, axis=-1), 1e-4)
    theta = jnp.sqrt(nrm2)
    fac1 = (jnp.sin(theta) / theta)[..., None, None]
    fac2 = ((1.0 - jnp.cos(theta)) / nrm2)[..., None, None]
    k = _skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    return eye + fac1 * k + fac2 * (k @ k)


def exp_map_SO3xR3(tangent):
    """(..., 6) [t | w] -> (..., 3, 4) [R|t]: rotation from the so(3)
    part, translation taken directly (the direct-product group)."""
    r = _so3_exp(tangent[..., 3:])
    return jnp.concatenate([r, tangent[..., :3, None]], axis=-1)


def exp_map_SE3(tangent):
    """(..., 6) se(3) -> (..., 3, 4): translation through the V matrix
    t = (I + (1-cos)/t^2 K + (t-sin)/t^3 K^2) rho, Taylor-guarded below
    theta < 1e-2 like the reference (lie_groups.py:63-120)."""
    rho, w = tangent[..., :3], tangent[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    near = theta2 < 1e-4
    # sqrt has an infinite VJP at 0; deltas init at exactly zero, so an
    # unguarded sqrt(theta2) poisons pose grads from step one (the
    # where-branches turn 0*inf into NaN in the backward pass — torch is
    # only safe because linalg.norm defines a zero subgradient). theta is
    # consumed exclusively in the non-near branches below, so guarding the
    # argument changes no primal value.
    theta = jnp.sqrt(jnp.where(near, 1.0, theta2))
    t_nz = jnp.where(near, 1.0, theta)
    t2_nz = jnp.where(near, 1.0, theta2)
    t3_nz = jnp.where(near, 1.0, theta2 * theta)

    sine = jnp.sin(theta)
    cosine = jnp.where(near, 8.0 / (4.0 + theta2) - 1.0, jnp.cos(theta))
    sin_t = jnp.where(near, 0.5 * cosine + 0.5, sine / t_nz)
    omc_t2 = jnp.where(near, 0.5 * sin_t, (1.0 - cosine) / t2_nz)

    k = _skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tangent.dtype), k.shape)
    r = (cosine[..., None, None] * eye + sin_t[..., None, None] * k
         + omc_t2[..., None, None] * (w[..., :, None] * w[..., None, :]))

    sin_t_v = jnp.where(near, 1.0 - theta2 / 6.0, sin_t)
    omc_t2_v = jnp.where(near, 0.5 - theta2 / 24.0, omc_t2)
    tms_t3 = jnp.where(near, 1.0 / 6.0 - theta2 / 120.0,
                       (theta - sine) / t3_nz)
    t = (sin_t_v[..., None] * rho
         + omc_t2_v[..., None] * jnp.cross(w, rho)
         + tms_t3[..., None] * w * jnp.sum(w * rho, axis=-1,
                                           keepdims=True))
    return jnp.concatenate([r, t[..., :, None]], axis=-1)


def exp_map(mode: str, tangent):
    if mode == "SO3xR3":
        return exp_map_SO3xR3(tangent)
    if mode == "SE3":
        return exp_map_SE3(tangent)
    raise ValueError(f"camera_opt mode {mode!r} (expected SO3xR3 | SE3)")


def apply_correction(c2w, adj):
    """c2w' = c2w @ [adj; 0 0 0 1] (camera_optimizers.py:154-162:
    corrections right-multiply camera_to_worlds). c2w: (3, 4)."""
    bottom = jnp.asarray([[0.0, 0.0, 0.0, 1.0]], dtype=adj.dtype)
    return jnp.matmul(c2w, jnp.concatenate([adj, bottom], axis=0),
                      precision=jax.lax.Precision.HIGHEST)


def _safe_norm(x, axis=-1):
    """Norm with zero (torch-style) subgradient at the origin —
    jnp.linalg.norm's gradient there is NaN, which would poison the very
    first step (deltas init at exactly zero)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-24)


def regularizer(delta):
    """mean ||t|| * 1e-2 + mean ||w|| * 1e-3
    (camera_optimizers.py:164-170)."""
    return (TRANS_L2_PENALTY * jnp.mean(_safe_norm(delta[:, :3]))
            + ROT_L2_PENALTY * jnp.mean(_safe_norm(delta[:, 3:])))


def metrics(delta):
    """camera_opt_translation / camera_opt_rotation norms
    (camera_optimizers.py:176-180)."""
    return {"camera_opt_translation": jnp.linalg.norm(delta[:, :3]),
            "camera_opt_rotation": jnp.linalg.norm(delta[:, 3:])}
