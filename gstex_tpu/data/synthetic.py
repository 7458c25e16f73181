"""Procedural test scenes (no dataset files required).

Used by unit tests and bench.py to build scenes with the same statistics as
trained 2DGS inits (the reference initializes from `init_nvs/point_cloud.ply`,
SURVEY.md §6) without shipping data.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.camera import Camera, make_camera
from ..ops.quat import random_quats


def random_scene(key, n: int, chart_pad: tuple[int, int] = (8, 8),
                 spread: float = 1.0, scale_lo: float = -3.5,
                 scale_hi: float = -2.0, sh_degree: int = 3):
    """Random raw parameters shaped like a small trained scene.

    Returns a dict of raw (pre-activation) parameter arrays plus dense
    padded charts and active dims.
    """
    ks = jax.random.split(key, 8)
    ch, cw = chart_pad
    dim_sh = (sh_degree + 1) ** 2
    means = spread * jax.random.normal(ks[0], (n, 3))
    log_scales = jax.random.uniform(ks[1], (n, 2), minval=scale_lo, maxval=scale_hi)
    quats = random_quats(ks[2], n)
    opacity_logits = jax.random.uniform(ks[3], (n, 1), minval=-1.0, maxval=3.0)
    features_dc = jax.random.normal(ks[4], (n, 3)) * 0.5
    features_rest = jax.random.normal(ks[5], (n, dim_sh - 1, 3)) * 0.05
    texture = jax.random.normal(ks[6], (n, ch, cw, 3)) * 0.3
    texture_hw = jax.random.randint(ks[7], (n, 2), minval=1, maxval=min(ch, cw) + 1)
    l0 = jnp.exp(log_scales[:, 0])
    l1 = jnp.exp(log_scales[:, 1])
    mappings = jnp.stack([1.0 / (6.0 * l0), 1.0 / (6.0 * l1)], axis=-1)
    return {
        "means": means,
        "log_scales": log_scales,
        "quats": quats,
        "opacity_logits": opacity_logits,
        "features_dc": features_dc,
        "features_rest": features_rest,
        "texture": texture,
        "texture_hw": texture_hw.astype(jnp.int32),
        "mappings": mappings,
    }


def surface_scene(key, n: int, chart_pad: tuple[int, int] = (8, 8),
                  radius: float = 1.2, opacity_mu: float = 4.0,
                  sh_degree: int = 3):
    """Raw parameters with TRAINED-scene statistics: surfels tiling a
    closed surface (fibonacci sphere), normals radial, scales matched to
    the local point spacing, opacities saturating (sigmoid(4)≈0.98 — what
    15k steps of training drive opacities to when densification is off).

    Unlike ``random_scene`` (a transparent volumetric cloud where every
    pair contributes — the adversarial no-early-exit case, DESIGN.md),
    rays here terminate at the first surfel layer: the front-to-back
    T<=1e-4 exit and the conservative pair cull actually bite, like on
    real trained scenes.
    """
    ks = jax.random.split(key, 6)
    ch, cw = chart_pad
    dim_sh = (sh_degree + 1) ** 2
    i = np.arange(n, dtype=np.float64)
    ga = np.pi * (3.0 - np.sqrt(5.0))          # golden angle
    z = 1.0 - 2.0 * (i + 0.5) / n
    r_xy = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    pts = np.stack([r_xy * np.cos(ga * i), r_xy * np.sin(ga * i), z], -1)
    normals = pts.astype(np.float32)
    means = jnp.asarray(radius * normals)
    # quat rotating +z to the normal: R columns (ax1, ax2, normal)
    w = 1.0 + normals[:, 2]
    quats = np.stack([w, -normals[:, 1], normals[:, 0],
                      np.zeros(n, np.float32)], -1)
    quats[w < 1e-6] = np.array([0.0, 1.0, 0.0, 0.0], np.float32)
    quats = jnp.asarray(quats / np.linalg.norm(quats, axis=-1,
                                               keepdims=True))
    spacing = radius * np.sqrt(4.0 * np.pi / n)
    log_scales = jnp.log(spacing * jax.random.uniform(
        ks[0], (n, 2), minval=0.8, maxval=1.8))
    opacity_logits = opacity_mu + 0.5 * jax.random.normal(ks[1], (n, 1))
    l0 = jnp.exp(log_scales[:, 0])
    l1 = jnp.exp(log_scales[:, 1])
    return {
        "means": means,
        "log_scales": log_scales,
        "quats": quats,
        "opacity_logits": opacity_logits,
        "features_dc": jax.random.normal(ks[2], (n, 3)) * 0.5,
        "features_rest": jax.random.normal(ks[3], (n, dim_sh - 1, 3)) * 0.05,
        "texture": jax.random.normal(ks[4], (n, ch, cw, 3)) * 0.3,
        "texture_hw": jax.random.randint(
            ks[5], (n, 2), minval=1,
            maxval=min(ch, cw) + 1).astype(jnp.int32),
        "mappings": jnp.stack([1.0 / (6.0 * l0), 1.0 / (6.0 * l1)], -1),
    }


def orbit_camera(height: int, width: int, dist: float = 4.0,
                 azimuth: float = 0.0, elevation: float = 0.3,
                 focal: float | None = None) -> Camera:
    """Camera on an orbit looking at the origin (nerfstudio convention)."""
    if focal is None:
        focal = 1.2 * max(height, width)
    eye = dist * np.array([
        np.cos(elevation) * np.sin(azimuth),
        np.sin(elevation),
        np.cos(elevation) * np.cos(azimuth),
    ])
    forward = -eye / np.linalg.norm(eye)          # camera looks along -z
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(forward, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, forward)
    c2w = np.stack([right, true_up, -forward], axis=-1)  # columns x,y,z(back)
    c2w = np.concatenate([c2w, eye[:, None]], axis=-1)
    return make_camera(focal, focal, width / 2, height / 2, height, width, c2w)
