"""Ray–surfel intersection, Gaussian falloff, and chart sampling (pure jnp).

This is the per-(pixel, splat) math at the heart of the rasterizer —
the inner loop of ``gstex_cuda.texture.texture_gaussians`` (reference
``nerfstudio/models/gstex.py:1132-1172``), shared by all renderer tiers
(oracle / XLA tile / Pallas). Semantics documented in DESIGN.md.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# 2DGS object-space low-pass filter: screen-space fallback Gaussian with
# sigma^2 = 0.5 px^2 (settings bit 9, "anti-aliasing blur" per gstex.py:194-197)
AA_SIGMA2 = 0.5
ALPHA_CLAMP = 0.999
ALPHA_CUTOFF = 1.0 / 255.0
T_EPS = 1e-4
# depth -> [0,1] mapping for the 2DGS distortion regularizer (settings bit 10)
REG_NEAR = 0.2
REG_FAR = 100.0
# hard support cutoff, in sigma units: the surfel response is zero beyond the
# ±EXTENT_SIGMA ellipse. This matches the chart extent (gstex.py:215-217) and
# makes every renderer tier consistent with the 3σ screen AABB used for tile
# binning (no tile-boundary-dependent tails).
EXTENT_SIGMA = 3.0


class SplatGeom(NamedTuple):
    """Activated per-splat fields consumed by the blend loop.

    All arrays have a leading splat axis (or none, for a single splat).
    """

    mean: jax.Array      # (..., 3) world
    ax1: jax.Array       # (..., 3) unit u axis (R[:,0])
    ax2: jax.Array       # (..., 3) unit v axis (R[:,1])
    normal: jax.Array    # (..., 3) unit normal (R[:,2])
    l0: jax.Array        # (...,) scale along ax1 (sigma)
    l1: jax.Array        # (...,) scale along ax2
    opacity: jax.Array   # (...,)
    rgb: jax.Array       # (..., 3) view-dependent SH color
    xy: jax.Array        # (..., 2) projected center, for the AA filter
    uv_scale: jax.Array  # (..., 2) detached chart mapping = 1/(2·σf·l) (gstex.py:882-883)


def intersect(
    geom: SplatGeom,
    origin: jax.Array,   # (3,) world camera center
    dirs: jax.Array,     # (..., 3) world ray dirs with unit view-space z
    px: jax.Array,       # (..., 2) continuous pixel coords (x, y)
):
    """Ray–surfel-plane intersection and Gaussian response.

    Broadcasts geom fields against pixel arrays. Returns a dict with
    ``t`` (view depth of hit), ``alpha`` (post-cutoff opacity), ``uv``
    (chart coordinates in [0,1], detached frame per gstex.py:975-990),
    and ``n_eff`` (normal flipped toward the camera).
    """
    om = origin - geom.mean                                    # (...,3)
    denom = jnp.sum(dirs * geom.normal, axis=-1)               # n·d
    safe_denom = jnp.where(jnp.abs(denom) < 1e-9,
                           jnp.where(denom < 0, -1e-9, 1e-9), denom)
    numer = -jnp.sum(om * geom.normal, axis=-1)                # n·(μ−o)
    t = numer / safe_denom

    # local coordinates of the hit point, in sigma units
    a1 = jnp.sum(om * geom.ax1, axis=-1)                       # (o−μ)·ax1
    a2 = jnp.sum(om * geom.ax2, axis=-1)
    b1 = jnp.sum(dirs * geom.ax1, axis=-1)
    b2 = jnp.sum(dirs * geom.ax2, axis=-1)
    du = a1 + t * b1                                           # Δ·ax1 (world units)
    dv = a2 + t * b2
    u_sig = du / geom.l0
    v_sig = dv / geom.l1
    r2_sig = u_sig * u_sig + v_sig * v_sig
    g_surf = jnp.exp(-0.5 * r2_sig)
    g_surf = jnp.where(r2_sig <= EXTENT_SIGMA * EXTENT_SIGMA, g_surf, 0.0)

    # screen-space low-pass fallback (2DGS AA, sigma^2 = 0.5)
    dpx = px - geom.xy
    r2 = jnp.sum(dpx * dpx, axis=-1)
    g_screen = jnp.exp(-0.5 * r2 / AA_SIGMA2)

    g = jnp.maximum(g_surf, g_screen)
    alpha = jnp.minimum(geom.opacity * g, ALPHA_CLAMP)
    alpha = jnp.where(alpha < ALPHA_CUTOFF, 0.0, alpha)
    # intersections behind the camera never contribute
    alpha = jnp.where(t > 1e-6, alpha, 0.0)

    # chart UV: uv0 + Δ·(detached axis · detached mapping)  (gstex.py:975-990)
    uv_u = 0.5 + jax.lax.stop_gradient(geom.uv_scale[..., 0]) * (
        jnp.sum(om * jax.lax.stop_gradient(geom.ax1), axis=-1)
        + t * jnp.sum(dirs * jax.lax.stop_gradient(geom.ax1), axis=-1))
    uv_v = 0.5 + jax.lax.stop_gradient(geom.uv_scale[..., 1]) * (
        jnp.sum(om * jax.lax.stop_gradient(geom.ax2), axis=-1)
        + t * jnp.sum(dirs * jax.lax.stop_gradient(geom.ax2), axis=-1))
    uv = jnp.stack([jnp.clip(uv_u, 0.0, 1.0), jnp.clip(uv_v, 0.0, 1.0)], axis=-1)

    # flip the normal toward the camera
    facing = jnp.where(denom > 0.0, -1.0, 1.0)
    n_eff = geom.normal * facing[..., None]

    return {"t": t, "alpha": alpha, "uv": uv, "n_eff": n_eff}


def reg_depth_map(t: jax.Array) -> jax.Array:
    """Map view depth to [0,1] for the distortion regularizer (2DGS NDC-style)."""
    tc = jnp.maximum(t, REG_NEAR)
    return (REG_FAR / (REG_FAR - REG_NEAR)) * (1.0 - REG_NEAR / tc)


def chart_sample_bilinear(chart: jax.Array, h, w, uv: jax.Array) -> jax.Array:
    """Bilinear sample of one dense padded chart.

    Texel (a, b) of an h×w chart sits at uv = (a/h, b/w)
    (``jagged_texture.py:23-34`` alignment). Samples are clamped into the
    active region, so padded texels are never read.

    Args:
        chart: (Ch, Cw, C) dense padded chart.
        h, w: scalar int active dims (may be traced).
        uv: (..., 2) in [0,1].
    Returns:
        (..., C) sampled values.
    """
    hf = jnp.asarray(h, jnp.float32)
    wf = jnp.asarray(w, jnp.float32)
    x = jnp.clip(uv[..., 0] * hf, 0.0, hf - 1.0)
    y = jnp.clip(uv[..., 1] * wf, 0.0, wf - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, jnp.asarray(h, jnp.int32) - 1)
    y1i = jnp.minimum(y0i + 1, jnp.asarray(w, jnp.int32) - 1)
    c00 = chart[x0i, y0i]
    c01 = chart[x0i, y1i]
    c10 = chart[x1i, y0i]
    c11 = chart[x1i, y1i]
    fx = fx[..., None]
    fy = fy[..., None]
    return ((1 - fx) * ((1 - fy) * c00 + fy * c01)
            + fx * ((1 - fy) * c10 + fy * c11))
