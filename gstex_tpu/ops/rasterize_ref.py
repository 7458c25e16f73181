"""Per-pixel oracle renderer (pure jnp, O(HW·N) — tiny scenes only).

The slow-but-exact reference implementation, playing the role of
``gstex_cuda._torch_impl`` in the reference's dual-implementation test
strategy (SURVEY.md §4.1). Every pixel blends over ALL splats globally
sorted by (depth, id) with the exact per-pixel break semantics of the
CUDA rasterizer inner loop. Differentiable by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import surfel
from .camera import Camera, camera_origin, pixel_ray_dirs, project_points, viewmat_from_c2w
from .surfel import SplatGeom, T_EPS


def render_oracle(
    geom: SplatGeom,
    texture: jax.Array,       # (N, Ch, Cw, C) dense padded charts
    texture_hw: jax.Array,    # (N, 2) int active dims
    cam: Camera,
    extra_channels: bool = False,
):
    """Render all output maps by per-pixel front-to-back blending.

    Returns a dict of (H, W, ...) maps: img, texture_rgb, depth, alpha,
    normal, reg (+ uv when extra_channels).
    """
    H, W = cam.height, cam.width
    viewmat = viewmat_from_c2w(cam.c2w)
    origin = camera_origin(cam.c2w)

    _, depths = project_points(geom.mean, viewmat, cam.intrins)
    n = geom.mean.shape[0]
    # global front-to-back order: (depth, id), culled (z<=0) pushed to the end
    sort_depth = jnp.where(depths > 1e-6, depths, jnp.inf)
    order = jnp.argsort(sort_depth, stable=True)

    px_y, px_x = jnp.mgrid[0:H, 0:W]
    px_x = px_x.astype(jnp.float32)
    px_y = px_y.astype(jnp.float32)
    px = jnp.stack([px_x, px_y], axis=-1)                      # (H,W,2)
    dirs = pixel_ray_dirs(px_x, px_y, cam)                     # (H,W,3)

    tex_c = texture.shape[-1]
    dt = jnp.result_type(texture.dtype, jnp.float32)

    def step(carry, i):
        T, broken, acc = carry
        g = jax.tree.map(lambda a: a[i], geom)
        hit = surfel.intersect(g, origin, dirs, px)
        a = jnp.where(depths[i] > 1e-6, hit["alpha"], 0.0)
        texel = surfel.chart_sample_bilinear(
            texture[i], texture_hw[i, 0], texture_hw[i, 1], hit["uv"])

        considered = jnp.logical_and(~broken, a > 0.0)
        next_T = T * (1.0 - a)
        would_break = jnp.logical_and(considered, next_T <= T_EPS)
        applied = jnp.logical_and(considered, ~would_break)
        w = jnp.where(applied, a * T, 0.0)

        m = surfel.reg_depth_map(hit["t"])
        new_acc = {
            "img": acc["img"] + w[..., None] * g.rgb,
            "tex": acc["tex"] + w[..., None] * texel,
            "depth": acc["depth"] + w * hit["t"],
            "alpha": acc["alpha"] + w,
            "normal": acc["normal"] + w[..., None] * hit["n_eff"],
            "reg": acc["reg"] + 2.0 * w * (m * acc["m0"] - acc["m1"]),
            "m0": acc["m0"] + w,
            "m1": acc["m1"] + w * m,
            "uv": acc["uv"] + w[..., None] * jnp.concatenate(
                [hit["uv"], jnp.full_like(hit["uv"][..., :1], 0.5)], axis=-1),
        }
        T = jnp.where(applied, next_T, T)
        broken = jnp.logical_or(broken, would_break)
        return (T, broken, new_acc), None

    acc0 = {
        "img": jnp.zeros((H, W, 3), dt),
        "tex": jnp.zeros((H, W, tex_c), dt),
        "depth": jnp.zeros((H, W), dt),
        "alpha": jnp.zeros((H, W), dt),
        "normal": jnp.zeros((H, W, 3), dt),
        "reg": jnp.zeros((H, W), dt),
        "m0": jnp.zeros((H, W), dt),
        "m1": jnp.zeros((H, W), dt),
        "uv": jnp.zeros((H, W, 3), dt),
    }
    init = (jnp.ones((H, W), dt), jnp.zeros((H, W), bool), acc0)
    (T, _, acc), _ = jax.lax.scan(step, init, order)

    out = {
        "img": acc["img"],
        "texture_rgb": acc["tex"],
        "depth": acc["depth"],
        "alpha": acc["alpha"],
        "normal": acc["normal"],
        "reg": acc["reg"],
    }
    if extra_channels:
        out["uv"] = acc["uv"]
    return out
