"""Conservative per-(gaussian, tile) alpha culling — output-identical.

The binning stage pairs every gaussian with every tile its screen AABB
touches (`binning.build_tile_bins`, mirroring the reference's
``get_num_tiles_hit_2d`` expansion, ``gstex.py:1080``). Thin rotated surfels
over-bin 2-4x: most AABB tiles never see alpha >= 1/255, yet the blend
kernels still walk them. This module drops exactly those dead pairs.

Why it is output- AND gradient-identical (not an approximation):

- ``surfel.intersect`` hard-zeroes contributions via
  ``alpha = where(alpha < ALPHA_CUTOFF, 0, alpha)``, the 3-sigma ellipse
  support cutoff on ``g_surf``, and ``where(t > 1e-6, alpha, 0)``. A pair
  whose alpha bound over the whole tile falls below the cutoff contributes
  weight exactly 0 to every pixel and carries exactly zero gradient (the
  ``where`` kills the chain rule). Removing it from the tile list leaves
  the transmittance recurrence bitwise unchanged.
- ``u(p)``, ``v(p)`` (sigma-unit surfel coordinates of the ray-plane hit)
  and ``t(p)`` (hit depth) are linear-fractional in continuous pixel
  coordinates: rays ``d(p)`` are affine in p, so ``n.d(p)`` is affine,
  ``t = n.(mu-o)/n.d`` is const/affine, and
  ``u = ((o-mu).ax1 + t d.ax1)/l0`` has affine numerator and denominator.
  A linear-fractional function on a rectangle with a sign-constant
  denominator attains its extrema at the 4 corners (its level sets are
  lines), so corner evaluation yields rigorous intervals for u, v, t.
- The screen-space AA term depends only on pixel distance to the projected
  center; the point-to-rect distance bounds it exactly.

When the denominator changes sign across the tile (edge-on surfel horizon)
the pair is kept — never cull without a proof.

Reference parity note: the CUDA rasterizer (`texture_gaussians`) walks all
AABB pairs and relies on the same 1/255 cutoff inside the kernel
(``gstex.py:194-197`` alpha threshold semantics); dropping dead pairs is an
internal scheduling change with identical rendered output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .binning import TileGrid
from .camera import Camera, camera_origin, camera_rotation_gsplat
from .surfel import AA_SIGMA2, ALPHA_CUTOFF, EXTENT_SIGMA, SplatGeom

# safety margin on squared-radius comparisons: corner math here and the
# kernel's per-pixel math may differ by float rounding; only cull when the
# bound clears the threshold by this much.
_R2_MARGIN = 1e-3


def make_pair_cull(geom: SplatGeom, cam: Camera, grid: TileGrid,
                   px_offset=(0.0, 0.0)):
    """Build a ``cull_fn(gid, tx, ty) -> keep`` for ``build_tile_bins``.

    Args:
        geom: activated per-splat geometry (``prepare_splats``).
        cam: the render camera (pinhole; ray dirs have unit view z).
        grid: tile grid.
        px_offset: (x, y) global pixel offset of this grid's origin —
            nonzero for sharded band rendering (``parallel/shard.py``).
    Returns:
        callable mapping per-pair gaussian ids + tile coords (int32 arrays
        of any shape) to a bool keep mask of the same shape.
    """
    origin = camera_origin(cam.c2w)
    rot = camera_rotation_gsplat(cam.c2w)  # (3,3) cam->world
    off_x, off_y = px_offset

    # Per-gaussian precompute, packed into ONE (N, 18) table so the binning
    # stage does a single row gather per pair instead of ~18 scalar gathers
    # (measured ~2x cheaper at 512k pairs). Corner ray dirs are
    # d = dxc*rot[:,0] + dyc*rot[:,1] + rot[:,2] with per-corner scalars
    # (dxc, dyc), so every dot against a gaussian vector is affine in
    # (dxc, dyc) with per-gaussian coefficients.
    om = origin - geom.mean                                   # (N,3)
    hp = jax.lax.Precision.HIGHEST  # bf16 MXU default skews cull planes
    nd_coef = jnp.matmul(geom.normal, rot, precision=hp)      # (N,3): n.r_i
    b1_coef = jnp.matmul(geom.ax1, rot, precision=hp)
    b2_coef = jnp.matmul(geom.ax2, rot, precision=hp)
    numer = -jnp.sum(om * geom.normal, axis=-1)
    a1 = jnp.sum(om * geom.ax1, axis=-1)
    a2 = jnp.sum(om * geom.ax2, axis=-1)
    # alpha cutoff radii (sigma^2 units): op*exp(-r2/2) < 1/255
    # <=> r2 > 2*ln(op*255); the kernel also zeroes g_surf past the
    # EXTENT_SIGMA ellipse.
    log_term = 2.0 * jnp.log(
        jnp.maximum(geom.opacity, 1e-12) / ALPHA_CUTOFF)
    surf_th = jnp.minimum(EXTENT_SIGMA * EXTENT_SIGMA, log_term)
    screen_th = AA_SIGMA2 * log_term
    table = jnp.stack([
        nd_coef[:, 0], nd_coef[:, 1], nd_coef[:, 2],
        b1_coef[:, 0], b1_coef[:, 1], b1_coef[:, 2],
        b2_coef[:, 0], b2_coef[:, 1], b2_coef[:, 2],
        numer, a1, a2,
        1.0 / geom.l0, 1.0 / geom.l1,
        surf_th, screen_th,
        geom.xy[:, 0], geom.xy[:, 1],
    ], axis=1)                                                # (N, 18)

    def eval_rows_t(rowT: jax.Array, tx2: jax.Array,
                    ty2: jax.Array) -> jax.Array:
        """Evaluate the cull on TRANSPOSED pre-gathered rows (18, P) with
        (1, P) tile coords; returns a (1, P) keep mask. Exposed so the
        binning stage can fuse this table into its single per-pair row
        gather and keep every per-pair quantity in quantities-on-rows 2-D
        form (P-major column slices each pay an (8,128)->(1024) relayout —
        6.5 ms/step at 393k pairs in the round-3 trace)."""
        # Lane layout: pairs ride the LANE axis, the 4 rect corners the
        # sublane axis — (4, P) arrays. The transposed form ((P, 4),
        # corners minor) runs every corner op at 4/128 lane utilization on
        # TPU (~30x slower at 512k pairs; measured, scripts_dev/tpu_binflat)

        def coef(c):
            return rowT[c:c + 1]                              # (1, P)

        # pixel-center rect covered by the tile: columns/rows
        # [t*tile - 0.5, t*tile + tile - 0.5] in continuous px coords
        # (pixel centers sit at integer px; +0.5 enters in the ray dirs).
        # Using the full half-open rect (not just center points) is
        # conservative for edge tiles.
        x0 = tx2.astype(jnp.float32) * grid.tile_w - 0.5 + off_x
        x1 = x0 + grid.tile_w
        y0 = ty2.astype(jnp.float32) * grid.tile_h - 0.5 + off_y
        y1 = y0 + grid.tile_h

        # camera-frame corner dir scalars ((px+0.5-c)/f)
        cxs = jnp.concatenate([x0, x1, x0, x1], axis=0)       # (4, P)
        cys = jnp.concatenate([y0, y0, y1, y1], axis=0)
        dxc = (cxs + 0.5 - cam.cx) / cam.fx
        dyc = (cys + 0.5 - cam.cy) / cam.fy

        def affine(c0, c1, c2):
            return coef(c0) * dxc + coef(c1) * dyc + coef(c2)

        denom = affine(0, 1, 2)                               # (4, P) n.d
        same_sign = jnp.logical_or(
            jnp.all(denom > 1e-9, axis=0, keepdims=True),
            jnp.all(denom < -1e-9, axis=0, keepdims=True))    # (1, P)
        safe_denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        t = coef(9) / safe_denom                              # (4, P)
        u = (coef(10) + t * affine(3, 4, 5)) * coef(12)
        v = (coef(11) + t * affine(6, 7, 8)) * coef(13)

        def interval_dist0(c):
            lo = jnp.min(c, axis=0, keepdims=True)
            hi = jnp.max(c, axis=0, keepdims=True)
            return jnp.maximum(jnp.maximum(lo, -hi), 0.0)

        r2_min = interval_dist0(u) ** 2 + interval_dist0(v) ** 2
        surf_dead = r2_min > coef(14) + _R2_MARGIN

        # screen-space AA term: distance from projected center to the rect
        xyx = coef(16)
        xyy = coef(17)
        ddx = jnp.maximum(jnp.maximum(x0 - xyx, xyx - x1), 0.0)
        ddy = jnp.maximum(jnp.maximum(y0 - xyy, xyy - y1), 0.0)
        r2_screen = ddx * ddx + ddy * ddy
        screen_dead = r2_screen > coef(15) + _R2_MARGIN

        # t <= 1e-6 zeroes both terms (surfel.intersect); t extrema are at
        # corners under the same-sign guarantee.
        t_dead = jnp.max(t, axis=0, keepdims=True) <= 1e-6

        dead = jnp.logical_or(t_dead, jnp.logical_and(surf_dead,
                                                      screen_dead))
        return jnp.logical_not(jnp.logical_and(same_sign, dead))

    def eval_rows(row: jax.Array, tx: jax.Array, ty: jax.Array) -> jax.Array:
        """P-major compatibility wrapper over ``eval_rows_t``."""
        return eval_rows_t(row.T, tx[None, :], ty[None, :])[0]

    def cull_fn(gid: jax.Array, tx: jax.Array, ty: jax.Array) -> jax.Array:
        shape = gid.shape
        row = table[gid.reshape(-1)]                          # (P, 18)
        keep = eval_rows(row, tx.reshape(-1), ty.reshape(-1))
        return keep.reshape(shape)

    # the binning stage fuses this table into its own per-pair row gather
    cull_fn.table = table
    cull_fn.eval_rows = eval_rows
    cull_fn.eval_rows_t = eval_rows_t
    return cull_fn
