"""Conservative pair culling (ops/cull.py): output- and gradient-identical.

The cull may only drop (gaussian, tile) pairs whose alpha the blend kernel's
1/255 cutoff already zeroes (surfel.py ALPHA_CUTOFF / EXTENT_SIGMA / t>1e-6
gates), so rendering with the cull must match rendering without it exactly
— outputs and all parameter/texel gradients — while dropping a nonzero
number of pairs on anisotropic scenes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.ops.binning import TileGrid, build_tile_bins
from gstex_tpu.ops.cull import make_pair_cull
from gstex_tpu.ops.prepare import prepare_splats
from gstex_tpu.ops.rasterize import rasterize

H, W = 40, 48
GRID = TileGrid(height=H, width=W, tile_h=8, tile_w=16)


def _make(n=64, seed=3, stretch=True):
    scene = random_scene(jax.random.key(seed), n, chart_pad=(4, 4))
    if stretch:
        # anisotropic surfels: the AABB over-bins, giving the cull real work
        scene["log_scales"] = scene["log_scales"] + jnp.array([1.2, -0.8])
    cam = orbit_camera(H, W, dist=3.0)
    prep = prepare_splats(
        scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"], scene["features_dc"], scene["features_rest"],
        scene["mappings"], cam, active_sh_degree=3)
    return scene, cam, prep


def _bins(prep, cam, cull):
    cull_fn = make_pair_cull(prep.geom, cam, GRID) if cull else None
    return build_tile_bins(prep.centers, prep.extents, prep.depths,
                           prep.valid, GRID, pair_cap=16384, s_max=96,
                           cull_fn=cull_fn)


def test_cull_drops_pairs_and_output_identical():
    scene, cam, prep = _make()
    bins_off = _bins(prep, cam, cull=False)
    bins_on = _bins(prep, cam, cull=True)
    kept_off = int(bins_off.counts.sum())
    kept_on = int(bins_on.counts.sum())
    assert kept_on < kept_off, "cull should fire on anisotropic scenes"
    assert kept_on > 0

    out_off = rasterize(prep.geom, scene["texture"], scene["texture_hw"],
                        bins_off, cam, GRID)
    out_on = rasterize(prep.geom, scene["texture"], scene["texture_hw"],
                       bins_on, cam, GRID)
    for k in ["img", "texture_rgb", "depth", "alpha", "normal", "reg"]:
        np.testing.assert_allclose(np.asarray(out_off[k]),
                                   np.asarray(out_on[k]),
                                   atol=1e-7, rtol=1e-6, err_msg=k)
    assert float(out_on["alpha"].max()) > 0.3


@pytest.mark.slow
def test_cull_gradients_identical():
    scene, cam, prep = _make(seed=7)

    def loss(leaves, cull):
        means, log_scales, quats, op, tex = leaves
        prep2 = prepare_splats(
            means, log_scales, quats, op, scene["features_dc"],
            scene["features_rest"], scene["mappings"], cam,
            active_sh_degree=3)
        cull_fn = (make_pair_cull(jax.lax.stop_gradient(prep2.geom), cam,
                                  GRID) if cull else None)
        bins = build_tile_bins(prep2.centers, prep2.extents, prep2.depths,
                               prep2.valid, GRID, pair_cap=16384, s_max=96,
                               cull_fn=cull_fn)
        out = rasterize(prep2.geom, tex, scene["texture_hw"], bins, cam, GRID)
        return (jnp.sum(out["img"] * 0.7) + jnp.sum(out["texture_rgb"])
                + jnp.sum(out["depth"] * 0.1) + jnp.sum(out["alpha"]))

    leaves = (scene["means"], scene["log_scales"], scene["quats"],
              scene["opacity_logits"], scene["texture"])
    g_off = jax.grad(lambda l: loss(l, False))(leaves)
    g_on = jax.grad(lambda l: loss(l, True))(leaves)
    for a, b, name in zip(g_off, g_on,
                          ["means", "log_scales", "quats", "op", "texture"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5, err_msg=name)


@pytest.mark.slow
def test_cull_never_drops_live_pairs_bruteforce():
    """Every pair the cull drops has zero alpha at every pixel of its tile."""
    from gstex_tpu.ops.camera import camera_origin, pixel_ray_dirs
    from gstex_tpu.ops.surfel import intersect

    scene, cam, prep = _make(n=48, seed=11)
    tx0 = jnp.arange(GRID.ntx)
    ty0 = jnp.arange(GRID.nty)
    n = scene["means"].shape[0]
    # all (gaussian, tile) combos
    gid, tyy, txx = jnp.meshgrid(jnp.arange(n), ty0, tx0, indexing="ij")
    cull_fn = make_pair_cull(prep.geom, cam, GRID)
    keep = np.asarray(cull_fn(gid.reshape(-1), txx.reshape(-1),
                              tyy.reshape(-1))).reshape(n, GRID.nty, GRID.ntx)

    ys, xs = jnp.mgrid[0:H, 0:W]
    dirs = pixel_ray_dirs(xs.astype(jnp.float32), ys.astype(jnp.float32), cam)
    origin = camera_origin(cam.c2w)
    px = jnp.stack([xs, ys], -1).astype(jnp.float32)
    for g in range(n):
        geom_g = jax.tree.map(lambda a: a[g], prep.geom)
        res = intersect(geom_g, origin, dirs, px)
        alpha = np.asarray(res["alpha"])  # (H, W)
        for tyi in range(GRID.nty):
            for txi in range(GRID.ntx):
                if keep[g, tyi, txi]:
                    continue
                band = alpha[tyi * GRID.tile_h:(tyi + 1) * GRID.tile_h,
                             txi * GRID.tile_w:(txi + 1) * GRID.tile_w]
                assert band.max() == 0.0, (g, tyi, txi, band.max())
