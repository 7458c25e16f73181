import jax
import jax.numpy as jnp
import numpy as np

from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.ops.binning import TileGrid, build_tile_bins, get_num_tiles_hit
from gstex_tpu.ops.camera import viewmat_from_c2w
from gstex_tpu.ops.prepare import prepare_splats


def _prepared(n=64, h=48, w=64):
    scene = random_scene(jax.random.key(0), n)
    cam = orbit_camera(h, w)
    prep = prepare_splats(
        scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"], scene["features_dc"], scene["features_rest"],
        scene["mappings"], cam, active_sh_degree=3)
    return scene, cam, prep


def test_bins_reference_bruteforce():
    scene, cam, prep = _prepared()
    grid = TileGrid(height=48, width=64, tile_h=16, tile_w=16)
    bins = build_tile_bins(prep.centers, prep.extents, prep.depths, prep.valid,
                           grid, pair_cap=4096, s_max=64)

    centers = np.asarray(prep.centers)
    extents = np.asarray(prep.extents)
    depths = np.asarray(prep.depths)
    valid = np.asarray(prep.valid) & (depths > 1e-6)

    # brute-force expected per-tile lists
    expected = {t: [] for t in range(grid.num_tiles)}
    for g in range(centers.shape[0]):
        if not valid[g]:
            continue
        tx0 = int(np.clip(np.floor((centers[g, 0] - extents[g, 0]) / 16), 0, grid.ntx))
        tx1 = int(np.clip(np.floor((centers[g, 0] + extents[g, 0]) / 16) + 1, 0, grid.ntx))
        ty0 = int(np.clip(np.floor((centers[g, 1] - extents[g, 1]) / 16), 0, grid.nty))
        ty1 = int(np.clip(np.floor((centers[g, 1] + extents[g, 1]) / 16) + 1, 0, grid.nty))
        for ty in range(ty0, ty1):
            for tx in range(tx0, tx1):
                expected[ty * grid.ntx + tx].append(g)
    for t in expected:
        expected[t].sort(key=lambda g: (depths[g], g))

    ids = np.asarray(bins.ids)
    mask = np.asarray(bins.mask)
    assert int(bins.overflow) == 0
    for t in range(grid.num_tiles):
        got = list(ids[t][mask[t]])
        assert got == expected[t], f"tile {t}"
    total_expected = sum(len(v) for v in expected.values())
    assert int(bins.total_pairs) == total_expected


def test_num_tiles_hit_matches_counts():
    scene, cam, prep = _prepared()
    grid = TileGrid(height=48, width=64, tile_h=16, tile_w=16)
    hits = get_num_tiles_hit(prep.centers, prep.extents, grid, prep.valid)
    bins = build_tile_bins(prep.centers, prep.extents, prep.depths, prep.valid,
                           grid, pair_cap=4096, s_max=64)
    assert int(hits.sum()) == int(bins.total_pairs)


def test_overflow_counted():
    scene, cam, prep = _prepared()
    grid = TileGrid(height=48, width=64, tile_h=16, tile_w=16)
    full = build_tile_bins(prep.centers, prep.extents, prep.depths, prep.valid,
                           grid, pair_cap=4096, s_max=64)
    cap_pairs = build_tile_bins(prep.centers, prep.extents, prep.depths,
                                prep.valid, grid, pair_cap=64, s_max=64)
    assert int(cap_pairs.overflow) > 0
    # s_max truncation keeps the front-to-back prefix of each tile list
    trunc = build_tile_bins(prep.centers, prep.extents, prep.depths, prep.valid,
                            grid, pair_cap=4096, s_max=4)
    assert int(trunc.overflow) > 0
    for t in range(grid.num_tiles):
        got = np.asarray(trunc.ids[t])[np.asarray(trunc.mask[t])]
        ref = np.asarray(full.ids[t])[np.asarray(full.mask[t])][: len(got)]
        np.testing.assert_array_equal(got, ref)


def test_coverage_matches_sort_path():
    scene, cam, prep = _prepared(n=200, h=96, w=128)
    grid = TileGrid(height=96, width=128, tile_h=16, tile_w=16)
    args = (prep.centers, prep.extents, prep.depths, prep.valid, grid)
    a = build_tile_bins(*args, pair_cap=8192, s_max=64, method="coverage")
    b = build_tile_bins(*args, pair_cap=8192, s_max=64, method="sort")
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    assert int(a.total_pairs) == int(b.total_pairs)
    assert int(a.overflow) == int(b.overflow)
    # truncation semantics also agree
    at = build_tile_bins(*args, pair_cap=8192, s_max=4, method="coverage")
    bt = build_tile_bins(*args, pair_cap=8192, s_max=4, method="sort")
    np.testing.assert_array_equal(np.asarray(at.ids), np.asarray(bt.ids))
    np.testing.assert_array_equal(np.asarray(at.mask), np.asarray(bt.mask))


def test_flat_bins_match_dense():
    """The flat pair-major layout holds exactly the dense lists' pairs, at
    SLOT_ALIGN-aligned per-tile segments, same order, same overflow."""
    from gstex_tpu.ops.binning import SLOT_ALIGN, build_tile_bins_flat

    scene, cam, prep = _prepared(n=200, h=96, w=128)
    grid = TileGrid(height=96, width=128, tile_h=16, tile_w=16)
    args = (prep.centers, prep.extents, prep.depths, prep.valid, grid)
    for s_cap in (64, 8):   # uncapped and truncating
        dense = build_tile_bins(*args, pair_cap=8192, s_max=s_cap)
        flat = build_tile_bins_flat(*args, pair_cap=8192, s_cap=s_cap)
        np.testing.assert_array_equal(np.asarray(flat.counts),
                                      np.asarray(dense.counts))
        assert int(flat.overflow) == int(dense.overflow)
        assert int(flat.total_pairs) == int(dense.total_pairs)
        starts = np.asarray(flat.starts)
        counts = np.minimum(np.asarray(flat.counts), s_cap)
        gids = np.asarray(flat.gids)
        sval = np.asarray(flat.slot_valid)
        d_ids = np.asarray(dense.ids)
        d_mask = np.asarray(dense.mask)
        assert (starts % SLOT_ALIGN == 0).all()
        end = 0
        for t in range(grid.num_tiles):
            assert starts[t] == end, "segments must be gap-free"
            c = counts[t]
            np.testing.assert_array_equal(gids[starts[t]:starts[t] + c],
                                          d_ids[t][d_mask[t]])
            assert sval[starts[t]:starts[t] + c].all()
            pad_end = starts[t] + -(-c // SLOT_ALIGN) * SLOT_ALIGN
            assert not sval[starts[t] + c:pad_end].any()
            end = pad_end
        assert not sval[end:].any()


def test_flat_bins_fused_cull_matches_legacy():
    """The fused-gather cull path (cull table folded into the binning row
    gather) drops exactly the pairs the standalone cull_fn would."""
    from gstex_tpu.ops.binning import build_tile_bins_flat
    from gstex_tpu.ops.cull import make_pair_cull

    scene, cam, prep = _prepared(n=200, h=96, w=128)
    grid = TileGrid(height=96, width=128, tile_h=16, tile_w=16)
    args = (prep.centers, prep.extents, prep.depths, prep.valid, grid)
    cf = make_pair_cull(prep.geom, cam, grid)

    class Legacy:   # cull_fn without .table -> per-pair gather path
        def __call__(self, gid, tx, ty):
            return cf(gid, tx, ty)

    fused = build_tile_bins_flat(*args, pair_cap=8192, s_cap=64, cull_fn=cf)
    legacy = build_tile_bins_flat(*args, pair_cap=8192, s_cap=64,
                                  cull_fn=Legacy())
    np.testing.assert_array_equal(np.asarray(fused.gids),
                                  np.asarray(legacy.gids))
    np.testing.assert_array_equal(np.asarray(fused.slot_valid),
                                  np.asarray(legacy.slot_valid))
    np.testing.assert_array_equal(np.asarray(fused.counts),
                                  np.asarray(legacy.counts))
    # and the cull actually dropped something on this scene
    nocull = build_tile_bins_flat(*args, pair_cap=8192, s_cap=64)
    assert int(fused.counts.sum()) < int(nocull.counts.sum())
