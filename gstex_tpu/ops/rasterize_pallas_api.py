"""Public Pallas rasterizer API: custom_vjp over the fused kernels.

Drop-in replacement for ``rasterize.rasterize`` (same output dict), with the
forward/backward implemented by the Pallas kernels. Gradients wrt geom and
the dense chart tensor flow through the differentiable record builder /
chart gather (XLA turns the pair-grad outputs into parameter scatter-adds).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .binning import FlatBins, TileBins, TileGrid, flat_slot_cap
from .camera import Camera
from .surfel import SplatGeom
from . import rasterize_pallas as rp
from . import rasterize_pallas_bwd as rpb
from . import rasterize_pallas2 as rp2
from . import rasterize_pallas3 as rp3
from . import rasterize_pallas4 as rp4
from . import rasterize_pallas5 as rp5


def _impls(version):
    if version == 3:
        return rp3.rasterize_pallas3_fwd, rp3.rasterize_pallas3_bwd
    if version == 2:
        return rp2.rasterize_pallas2_fwd, rp2.rasterize_pallas2_bwd
    return rp.rasterize_pallas_fwd, rpb.rasterize_pallas_bwd


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _core(grid: TileGrid, chart_pad, interpret, version, records_t, charts_g,
          counts, cam_info):
    fwd, _ = _impls(version)
    maps, _ = fwd(
        grid, chart_pad,
        rp.PallasInputs(records_t, charts_g, counts, cam_info),
        interpret=interpret)
    return _repack(maps)


def _repack(maps):
    return jnp.concatenate([maps[n] for n in rp.CH_NAMES], axis=1)


def _core_fwd(grid, chart_pad, interpret, version, records_t, charts_g,
              counts, cam_info):
    fwd, _ = _impls(version)
    maps, ncontrib = fwd(
        grid, chart_pad,
        rp.PallasInputs(records_t, charts_g, counts, cam_info),
        interpret=interpret)
    out = _repack(maps)
    return out, (records_t, charts_g, counts, cam_info, out, ncontrib)


def _core_bwd(grid, chart_pad, interpret, version, res, g_out):
    records_t, charts_g, counts, cam_info, out, ncontrib = res
    _, bwd = _impls(version)
    gmaps = g_out[:, : rpb.NG * 8, :]   # cotangents of the 12 real channels
    d_records, d_charts = bwd(
        grid, chart_pad, counts, cam_info, records_t, charts_g, out,
        ncontrib, gmaps, interpret=interpret)
    return (d_records, d_charts,
            np.zeros(counts.shape, jax.dtypes.float0),
            jnp.zeros_like(cam_info))


_core.defvjp(_core_fwd, _core_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _core4(grid: TileGrid, chart_pad, interpret, records_t, ids, table,
           counts, cam_info):
    maps, _ = rp4.rasterize_pallas4_fwd(
        grid, chart_pad, rp4.PallasInputs4(records_t, ids, counts, cam_info),
        table, interpret=interpret)
    return _repack(maps)


def _core4_fwd(grid, chart_pad, interpret, records_t, ids, table, counts,
               cam_info):
    maps, ncontrib = rp4.rasterize_pallas4_fwd(
        grid, chart_pad, rp4.PallasInputs4(records_t, ids, counts, cam_info),
        table, interpret=interpret)
    out = _repack(maps)
    return out, (records_t, ids, table, counts, cam_info, out, ncontrib)


# working-set cap for the pair-space d_charts buffer: above this the bwd
# runs in tile batches under lax.scan with the segment reduction folded in
# (big charts make T*s_max*chart_bytes explode — LOD scenes at 88x88 charts
# would need ~10 GB in one shot)
D_CHARTS_BYTES_CAP = 1 << 29   # 512 MB


def _reduce_d_charts(d_charts, ids, chart_pad, num_seg):
    """Pair-space chart grads -> per-gaussian (N, n_hb*cw_blk*cg) grads.

    One segment sum over the tile id lists (conflict-free within a tile by
    construction). Each (splat, h-block) unit is a (cw, cg) block; d_charts
    packs pack_n consecutive units per 128-lane block: lane l = i*cg + j
    holds unit i's channel-lane j. (A transpose-free per-lane-slot reduction
    was measured 6x SLOWER: scatter cost scales with scattered-row count,
    and 4 passes of (T*G*cw, 32) rows lose to one pass of wide (T*S, cw*cg)
    rows despite the 330 MB pack relayout.)
    """
    tt, ss = ids.shape
    ch_blk = rp4._ch_blk_of(chart_pad[0])
    hsub, n_hb = rp4._chart_blocks(ch_blk)
    cg = rp4._cg_lanes(hsub)
    pack_n = d_charts.shape[2] // cg
    units = ss * n_hb
    cw_blk = d_charts.shape[1] // (units // pack_n)
    d_charts = d_charts[..., :pack_n * cg]   # drop flush padding lanes
    d = d_charts.reshape(tt, units // pack_n, cw_blk, pack_n, cg)
    # unit-major rows: each splat's n_hb h-block units are consecutive
    d = d.transpose(0, 1, 3, 2, 4).reshape(tt * ss, n_hb * cw_blk * cg)
    return jax.ops.segment_sum(d, ids.reshape(-1), num_segments=num_seg)


def _core4_bwd(grid, chart_pad, interpret, res, g_out):
    records_t, ids, table, counts, cam_info, out, ncontrib = res
    pr = grid.tile_h * grid.tile_w // 128
    gmaps = g_out[:, : rpb.NG * pr, :]  # cotangents of the 12 real channels
    tt, ss = ids.shape
    ch_blk = rp4._ch_blk_of(chart_pad[0])
    hsub, n_hb = rp4._chart_blocks(ch_blk)
    cg = rp4._cg_lanes(hsub)
    pack_n = rp.CH3_PAD // cg
    cw_blk = -(-chart_pad[1] // 8) * 8
    num_seg = table.shape[0] // (n_hb * cw_blk)
    per_tile = ss * n_hb // pack_n * cw_blk * rp.CH3_PAD * 4
    n_batch = min(tt, max(1, -(-tt * per_tile // D_CHARTS_BYTES_CAP)))

    if n_batch == 1:
        d_records, d_charts = rp4.rasterize_pallas4_bwd(
            grid, chart_pad, counts, cam_info, records_t, ids, table, out,
            ncontrib, gmaps, interpret=interpret)
        d_g = _reduce_d_charts(d_charts, ids, chart_pad, num_seg)
    else:
        # tile-batched: bound the pair-space d_charts working set; padded
        # tiles have count=0 (the kernel zero-inits its outputs) so they
        # contribute nothing to the reduction
        tb = -(-tt // n_batch)
        pad_t = n_batch * tb - tt
        batch = lambda x: jnp.pad(
            x, ((0, pad_t),) + ((0, 0),) * (x.ndim - 1)).reshape(
                (n_batch, tb) + x.shape[1:])
        b_rec, b_ids, b_cnt = batch(records_t), batch(ids), batch(counts)
        b_out, b_ncon, b_gm = batch(out), batch(ncontrib), batch(gmaps)

        t0s = jnp.arange(n_batch, dtype=jnp.int32) * tb

        def body(acc, xs):
            t0, rec_b, ids_b, cnt_b, out_b, ncon_b, gm_b = xs
            d_rec_b, d_ch_b = rp4.rasterize_pallas4_bwd(
                grid, chart_pad, cnt_b, cam_info, rec_b, ids_b, table,
                out_b, ncon_b, gm_b, interpret=interpret,
                tile0=t0.reshape(1))
            return (acc + _reduce_d_charts(d_ch_b, ids_b, chart_pad,
                                           num_seg), d_rec_b)

        acc0 = jnp.zeros((num_seg, n_hb * cw_blk * cg), jnp.float32)
        d_g, d_rec_s = jax.lax.scan(
            body, acc0, (t0s, b_rec, b_ids, b_cnt, b_out, b_ncon, b_gm))
        d_records = d_rec_s.reshape((n_batch * tb,) + d_rec_s.shape[2:])
        d_records = d_records[:tt]

    d_g = d_g.reshape(-1, cw_blk, cg)
    d_table = jnp.pad(d_g, ((0, 0), (0, 0), (0, table.shape[1] - cg)))
    d_table = d_table.reshape(table.shape)
    return (d_records,
            np.zeros(ids.shape, jax.dtypes.float0),
            d_table,
            np.zeros(counts.shape, jax.dtypes.float0),
            jnp.zeros_like(cam_info))


_core4.defvjp(_core4_fwd, _core4_bwd)


# ---------------------------------------------------------------------------
# v5: flat pair-major path — every pair buffer count-limited (no T*s_max)
# ---------------------------------------------------------------------------

# The flat backward materializes pair-space chart grads for ALL slots in one
# buffer (slot_cap × per-pair chart block). For the production texel budgets
# (chart pads ≲ 16) that is a few hundred MB — far below the dense path's
# T·s_max equivalent. But auto-resolved LOD pads (~90x90 charts on tiny
# scenes) make the per-pair block enormous; above this cap the caller
# falls back to the dense v4 path, whose tile-batched scan bounds the
# working set (D_CHARTS_BYTES_CAP) at the cost of s_max-shaped buffers.
FLAT_DCHARTS_BYTES_CAP = 1 << 31   # 2 GB


def flat_dcharts_bytes(chart_pad, pair_cap: int, num_tiles: int) -> int:
    """Static size of the v5 backward's pair-space chart-grad buffer."""
    slot_cap = flat_slot_cap(pair_cap, num_tiles)
    ch_blk = rp4._ch_blk_of(chart_pad[0])
    hsub, n_hb = rp4._chart_blocks(ch_blk)
    cw_blk = -(-chart_pad[1] // 8) * 8
    return slot_cap * rp5.dall_row_lanes(n_hb, cw_blk, hsub)[2] * 4


def use_flat_path(renderer: str, chart_pad, pair_cap: int,
                  num_tiles: int) -> bool:
    """Route ``renderer="pallas"`` to the flat v5 path unless its backward
    buffer would blow the memory cap (huge auto-resolved chart pads)."""
    if renderer not in ("pallas", "pallas5", "pallas_interpret",
                        "pallas5_interpret"):
        return False
    return (flat_dcharts_bytes(chart_pad, pair_cap, num_tiles)
            <= FLAT_DCHARTS_BYTES_CAP)


# The v4 dense tier's backward emits a per-tile (s_max * g_rows, 128)
# chart-grad block whose double-buffered VMEM output window must fit the
# 128 MB v5e VMEM alongside the chart scratch + spills. 32 MB windows
# leave comfortable headroom (the (8,8)-chart production config uses
# ~17 MB at s_max 2048).
V4_BWD_WINDOW_ROWS_CAP = 1 << 15


def dense_pallas_fits(chart_pad, s_max: int) -> bool:
    """Can the v4 dense tier's backward compile for these shapes?"""
    ch_blk = rp4._ch_blk_of(chart_pad[0])
    hsub, n_hb = rp4._chart_blocks(ch_blk)
    cw_blk = -(-chart_pad[1] // 8) * 8
    return s_max * n_hb * cw_blk <= V4_BWD_WINDOW_ROWS_CAP


def _flat_inputs5(records_n, fbins: FlatBins, s_cap, cam_info):
    """Gather wide records into slot order (with one tile-window of end
    padding for the per-tile whole-window DMA) and pad the id list so any
    in-kernel SMEM window DMA stays in bounds."""
    slot_cap = fbins.gids.shape[0]
    ids_cap = rp5.ids_capacity(slot_cap, s_cap)
    gids_padded = jnp.pad(fbins.gids, (0, ids_cap - slot_cap))
    rec_flat = records_n[gids_padded[:rp5.rec_rows(slot_cap, s_cap)]]
    counts = jnp.minimum(fbins.counts, s_cap)
    return rp5.PallasInputs5(rec_flat, gids_padded, fbins.starts, counts,
                             cam_info)


def _tile_of_slot(starts, slot_cap):
    """Owning tile per slot. Consecutive empty tiles share a start; the
    scatter-max keeps the largest tile index there, which is the only one
    of the run whose segment can be non-empty.

    starts are SLOT_ALIGN-aligned, so the owning tile is constant within
    each SLOT_ALIGN block: the running max runs over slot_cap/SLOT_ALIGN
    block marks (16x fewer elements than the per-slot scan — XLA's 1-D
    cummax is serial) and broadcasts back out."""
    from .binning import SLOT_ALIGN

    nt = starts.shape[0]
    nb = -(-slot_cap // SLOT_ALIGN)
    t_idx = jnp.arange(nt, dtype=jnp.int32)
    mark = jnp.zeros((nb,), jnp.int32).at[starts // SLOT_ALIGN].max(
        t_idx + 1, mode="drop")
    blk = jnp.maximum(jax.lax.cummax(mark) - 1, 0)
    return jnp.repeat(blk, SLOT_ALIGN)[:slot_cap]


def _bwd_segments(fbins_gids, slot_valid, starts, counts, ncontrib, s_cap,
                  num_seg):
    """Per-slot segment ids for the flat grad reductions: slots the
    count-limited backward walk never wrote (post-saturation chunks, tail
    padding) route to the sentinel segment ``num_seg`` and are dropped.

    One (nt, 2) ROW gather instead of two 1-D gathers: 1-D (T(1024))
    gathers from a small table cost ~2 ms each at 400k slots on-chip
    (round-3 trace, fusion.3/fusion.5) while row gathers are vectorized.
    """
    slot_cap = fbins_gids.shape[0]
    nt = starts.shape[0]
    ncon_max = jnp.max(ncontrib.reshape(nt, -1), axis=1)
    walked = jnp.minimum(jnp.minimum(counts, s_cap), ncon_max + 1)
    wchunks = -(-walked // rp5.CHUNK) * rp5.CHUNK        # aligned extent
    tile_of = _tile_of_slot(starts, slot_cap)
    swT = jnp.stack([starts, wchunks], axis=1)[tile_of].T   # (2, slot_cap)
    k2 = jax.lax.broadcasted_iota(jnp.int32, (1, slot_cap), 1)
    ok2 = jnp.logical_and((k2 - swT[0:1]) < swT[1:2],
                          slot_valid.reshape(1, -1))
    return jnp.where(ok2, fbins_gids.reshape(1, -1),
                     num_seg).reshape(slot_cap)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _core5(grid: TileGrid, chart_pad, interpret, s_cap, lean, records_n,
           gids, slot_valid, table, starts, counts, cam_info):
    fb = FlatBins(gids, slot_valid, starts, counts, None, None, None)
    maps, _ = rp5.rasterize_pallas5_fwd(
        grid, chart_pad, s_cap,
        _flat_inputs5(records_n, fb, s_cap, cam_info), table,
        interpret=interpret, lean=lean)
    return _repack(maps)


def _core5_fwd(grid, chart_pad, interpret, s_cap, lean, records_n, gids,
               slot_valid, table, starts, counts, cam_info):
    fb = FlatBins(gids, slot_valid, starts, counts, None, None, None)
    inputs = _flat_inputs5(records_n, fb, s_cap, cam_info)
    maps, ncontrib = rp5.rasterize_pallas5_fwd(
        grid, chart_pad, s_cap, inputs, table, interpret=interpret,
        lean=lean)
    out = _repack(maps)
    return out, (records_n, gids, slot_valid, table, starts, counts,
                 cam_info, inputs, out, ncontrib)


def _core5_bwd(grid, chart_pad, interpret, s_cap, lean, res, g_out):
    (records_n, gids, slot_valid, table, starts, counts, cam_info, inputs,
     out, ncontrib) = res
    pr = grid.tile_h * grid.tile_w // 128
    gmaps = g_out[:, : rpb.NG * pr, :]
    d_all_flat = rp5.rasterize_pallas5_bwd(
        grid, chart_pad, s_cap, inputs, table, out, ncontrib, gmaps,
        interpret=interpret, lean=lean)

    num_seg = records_n.shape[0]
    seg = _bwd_segments(gids, slot_valid, starts, counts, ncontrib, s_cap,
                        num_seg)
    # ONE segment_sum over the packed (slot_cap, dall_lp) rows: lanes
    # [0, F_REC) are the record grads, [DREC_L, DREC_L+dch_l) the
    # flattened per-slot (n_hb, cw_blk, cg_g) chart-grad blocks
    # (rasterize_pallas5.dall_row_lanes — 256 lanes for (8,8) charts vs
    # the 384 of separate 128-padded streams). The scatter's per-row
    # fixed cost dominates its lane cost — two scatters over the same
    # ids measured 2.2x the single merged one (round-4 probe, 403k
    # rows) — and fewer lanes shrink the per-row vector work too.
    d_all = jax.ops.segment_sum(d_all_flat, seg, num_segments=num_seg + 1)
    # pad back on the small (N, ·) result: the wide record rows are
    # 128-lane padding for the HBM tiling
    d_records_n = jnp.pad(d_all[:num_seg, :rp.F_REC],
                          ((0, 0), (0, rp5.REC_W - rp.F_REC)))

    ch_blk = rp4._ch_blk_of(chart_pad[0])
    hsub, n_hb = rp4._chart_blocks(ch_blk)
    cw_blk = -(-chart_pad[1] // 8) * 8
    cg_g, dch_l, _ = rp5.dall_row_lanes(n_hb, cw_blk, hsub)
    n_gauss = table.shape[0] // (n_hb * cw_blk)
    d_g = d_all[:n_gauss, rp5.DREC_L:rp5.DREC_L + dch_l]
    d_g = d_g.reshape(-1, cw_blk, cg_g)
    d_table = jnp.pad(d_g, ((0, 0), (0, 0), (0, table.shape[1] - cg_g)))
    d_table = d_table.reshape(table.shape)

    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (d_records_n, f0(gids), f0(slot_valid), d_table, f0(starts),
            f0(counts), jnp.zeros_like(cam_info))


_core5.defvjp(_core5_fwd, _core5_bwd)


def _wide_records(geom: SplatGeom, cam: Camera, texture_hw):
    records = rp.assemble_records(geom, cam.c2w[:3, 3], texture_hw)
    return jnp.pad(records, ((0, 0), (0, rp5.REC_W - records.shape[1])))


def rasterize_pl5(
    geom: SplatGeom,
    texture: jax.Array,
    texture_hw: jax.Array,
    fbins: FlatBins,
    cam: Camera,
    grid: TileGrid,
    s_cap: int,
    px_offset=None,
    interpret: bool = False,
    lean: bool = False,
    background=None,
    table_dtype=None,
):
    """Flat-path Pallas render; same outputs as ``rasterize.rasterize``.

    ``lean=True`` (only valid when the reg/normal loss terms are
    statically zero) skips the depth-distortion and normal compute chains
    in both kernels; the reg/normal output maps come back as zeros.

    ``background`` (3,), when given, composes the final ``rgb`` IN TILE
    SPACE so the training path untiles 3 channel maps instead of 7 — each
    packed->(H,W) untile is a ~0.5 ms relayout copy at 800² and its
    backward re-tiles the cotangent (round-3 trace, 12 copies ≈ 5.5 ms).
    The separate img/texture_rgb/alpha maps remain available and DCE away
    when unused."""
    chart_pad = (texture.shape[1], texture.shape[2])
    if (grid.tile_h * grid.tile_w) % 128 != 0:
        raise ValueError("pallas v5 needs tile_h*tile_w to be a multiple of "
                         "128 (pixels are packed onto 128 lanes)")
    pr = grid.tile_h * grid.tile_w // 128
    packed = rp4.pack_charts_v4(texture, dtype=table_dtype)
    table = packed.reshape(-1, packed.shape[-1])
    records_n = _wide_records(geom, cam, texture_hw)
    if px_offset is None:
        px_offset = jnp.zeros((2,), jnp.float32)
    out = _core5(grid, chart_pad, interpret, s_cap, lean, records_n,
                 fbins.gids, fbins.slot_valid, table, fbins.starts,
                 fbins.counts, rp._cam_info(cam, px_offset))

    def ch_t(name):
        i = rp.CH_NAMES.index(name)
        return out[:, i * pr:(i + 1) * pr, :]

    def ch(name):
        return rp.untile_packed(ch_t(name), grid)

    maps = {
        "img": jnp.stack([ch("img0"), ch("img1"), ch("img2")], axis=-1),
        "texture_rgb": jnp.stack([ch("tex0"), ch("tex1"), ch("tex2")],
                                 axis=-1),
        "depth": ch("depth"),
        "alpha": ch("alpha"),
        "normal": jnp.stack([ch("n0"), ch("n1"), ch("n2")], axis=-1),
        "reg": ch("reg"),
    }
    if background is not None:
        one_m_a = 1.0 - ch_t("alpha")
        rgb_t = [ch_t(f"img{i}") + ch_t(f"tex{i}") + one_m_a * background[i]
                 for i in range(3)]
        maps["rgb"] = jnp.clip(jnp.stack(
            [rp.untile_packed(c, grid) for c in rgb_t], axis=-1), 0.0, 1.0)
    return maps


def rasterize_pl5_eval(
    geom: SplatGeom,
    texture: jax.Array,
    texture_hw: jax.Array,
    fbins: FlatBins,
    cam: Camera,
    grid: TileGrid,
    s_cap: int,
    px_offset=None,
    interpret: bool = False,
    table_dtype=None,
    background=None,
):
    """Flat-path forward-only render (no VJP, no residuals).

    ``background`` (3,) composes ``rgb`` in tile space (one untile
    instead of seven — the eval/viewer fps path)."""
    chart_pad = (texture.shape[1], texture.shape[2])
    if (grid.tile_h * grid.tile_w) % 128 != 0:
        raise ValueError("pallas v5 needs tile_h*tile_w to be a multiple of "
                         "128 (pixels are packed onto 128 lanes)")
    packed = rp4.pack_charts_v4(texture, dtype=table_dtype)
    table = packed.reshape(-1, packed.shape[-1])
    records_n = _wide_records(geom, cam, texture_hw)
    if px_offset is None:
        px_offset = jnp.zeros((2,), jnp.float32)
    inputs = _flat_inputs5(records_n, fbins, s_cap,
                           rp._cam_info(cam, px_offset))
    tmaps = rp5.rasterize_pallas5_eval(grid, chart_pad, s_cap, inputs,
                                       table, interpret=interpret)

    def ch(name):
        return rp.untile_packed(tmaps[name], grid)

    out = {
        "img": jnp.stack([ch("img0"), ch("img1"), ch("img2")], axis=-1),
        "texture_rgb": jnp.stack([ch("tex0"), ch("tex1"), ch("tex2")],
                                 axis=-1),
        "depth": ch("depth"),
        "alpha": ch("alpha"),
    }
    if background is not None:
        one_m_a = 1.0 - tmaps["alpha"]
        rgb_t = [tmaps[f"img{i}"] + tmaps[f"tex{i}"]
                 + one_m_a * background[i] for i in range(3)]
        out["rgb"] = jnp.clip(jnp.stack(
            [rp.untile_packed(c, grid) for c in rgb_t], axis=-1), 0.0, 1.0)
    return out


def rasterize_pl_eval(
    geom: SplatGeom,
    texture: jax.Array,
    texture_hw: jax.Array,
    bins: TileBins,
    cam: Camera,
    grid: TileGrid,
    px_offset=None,
    interpret: bool = False,
):
    """Forward-only render (no VJP, no residuals): img/texture_rgb/depth/alpha.

    Backs the fps eval metric and the viewer/video paths — inference needs
    only the rgb compositing maps, so the training forward's loss channels
    and backward replay state are skipped entirely.
    """
    chart_pad = (texture.shape[1], texture.shape[2])
    if (grid.tile_h * grid.tile_w) % 128 != 0:
        raise ValueError("pallas v4 needs tile_h*tile_w to be a multiple of "
                         "128 (pixels are packed onto 128 lanes)")
    pr = grid.tile_h * grid.tile_w // 128
    packed = rp4.pack_charts_v4(texture)
    table = packed.reshape(-1, packed.shape[-1])
    origin = cam.c2w[:3, 3]
    records = rp.assemble_records(geom, origin, texture_hw)
    rec_pairs = records[bins.ids]
    counts = jnp.minimum(bins.counts, bins.ids.shape[1])
    if px_offset is None:
        px_offset = jnp.zeros((2,), jnp.float32)
    maps = rp4.rasterize_pallas4_eval(
        grid, chart_pad,
        rp4.PallasInputs4(rec_pairs, bins.ids, counts,
                          rp._cam_info(cam, px_offset)),
        table, interpret=interpret)

    def ch(name):
        return rp.untile_packed(maps[name], grid)

    return {
        "img": jnp.stack([ch("img0"), ch("img1"), ch("img2")], axis=-1),
        "texture_rgb": jnp.stack([ch("tex0"), ch("tex1"), ch("tex2")],
                                 axis=-1),
        "depth": ch("depth"),
        "alpha": ch("alpha"),
    }


def rasterize_pl(
    geom: SplatGeom,
    texture: jax.Array,
    texture_hw: jax.Array,
    bins: TileBins,
    cam: Camera,
    grid: TileGrid,
    px_offset=None,
    interpret: bool = False,
    version: int = 4,
):
    """Pallas-path render; same outputs as ``rasterize.rasterize``."""
    chart_pad = (texture.shape[1], texture.shape[2])
    pr = grid.tile_h * grid.tile_w // 128 if version == 4 else 8
    if version != 4 and (grid.tile_h, grid.tile_w) != (32, 32):
        raise ValueError("pallas v1-v3 kernels require 32x32 tiles; "
                         "use version=4 for other tile sizes")
    if version == 4 and (grid.tile_h * grid.tile_w) % 128 != 0:
        raise ValueError("pallas v4 needs tile_h*tile_w to be a multiple of "
                         "128 (pixels are packed onto 128 lanes)")
    if version == 4:
        packed = rp4.pack_charts_v4(texture)
        table = packed.reshape(-1, packed.shape[-1])    # (N*n_hb*Cw', 128)
        origin = cam.c2w[:3, 3]
        records = rp.assemble_records(geom, origin, texture_hw)
        rec_pairs = records[bins.ids]
        counts = jnp.minimum(bins.counts, bins.ids.shape[1])
        if px_offset is None:
            px_offset = jnp.zeros((2,), jnp.float32)
        out = _core4(grid, chart_pad, interpret, rec_pairs, bins.ids,
                     table, counts, rp._cam_info(cam, px_offset))
    else:
        packed = (rp3.pack_charts_cmajor(texture) if version == 3
                  else rp.pack_charts(texture))
        inputs = rp.prepare_pallas_inputs(geom, packed, texture_hw, bins,
                                          cam, px_offset)
        out = _core(grid, chart_pad, interpret, version, inputs.records_t,
                    inputs.charts_g, inputs.counts, inputs.cam_info)

    def ch(name):
        i = rp.CH_NAMES.index(name)
        return rp.untile_packed(out[:, i * pr:(i + 1) * pr, :], grid)

    return {
        "img": jnp.stack([ch("img0"), ch("img1"), ch("img2")], axis=-1),
        "texture_rgb": jnp.stack([ch("tex0"), ch("tex1"), ch("tex2")],
                                 axis=-1),
        "depth": ch("depth"),
        "alpha": ch("alpha"),
        "normal": jnp.stack([ch("n0"), ch("n1"), ch("n2")], axis=-1),
        "reg": ch("reg"),
    }
