"""Pallas rasterizer v5 — flat pair-major streaming (no dense tile lists).

v4 still shaped every HBM buffer around the dense ``(T, s_max)`` tile
lists: the pair-record gather, the in-kernel record stream, the pair-space
``d_records`` / ``d_charts`` outputs and their segment reductions all paid
``T·s_max`` (mean-count tiles padded to the max) — on trained-statistics
scenes s_max runs ~6x the mean tile count, so most of that traffic was
padding. v5 switches every pair buffer to the FLAT layout the binning sort
already produces (``binning.build_tile_bins_flat``): one pair-major array
ordered (tile, depth, id), each tile's segment start aligned to
``SLOT_ALIGN``, every buffer sized by the true pair count. This matches
the CUDA reference's own data shape (sorted intersection list +
``isect_offsets`` per tile; inferred stages 3-4 of
``gstex_cuda.texture.texture_gaussians``, SURVEY.md §2.1) — the dense
matrix was only ever a BlockSpec convenience.

Mechanics (validated by scripts_dev/tpu_flatrec_probe.py):

- records stream per chunk with double-buffered dynamic-offset DMA
  (``records.at[astart + c*CHUNK]``); HBM 2-D f32 arrays are tiled
  (1, 128), so records are stored WIDE — (slot_cap, 128) with the F_REC
  fields in lanes 0-31 (a (R, 32) array physically occupies 128 lanes per
  row anyway, so wide storage costs nothing and makes the slices legal).
- gaussian ids for the per-splat chart DMAs arrive via a fixed SMEM window
  DMA'd from the 1024-aligned base below the tile's segment start; the
  in-window offset is a scalar add.
- the backward writes ``d_records`` / pair-space ``d_charts`` straight to
  flat HBM outputs with per-chunk DMAs — count-limited, conflict-free by
  slot. Chunks the count-limited walk never visits leave garbage in their
  slots; the API layer routes those slots to a sentinel segment in the
  reductions (see ``rasterize_pallas_api``), so nothing is zero-initialized.

Blend math, record layout, chart packing (``pack_charts_v4``) and output
maps are identical to v4. Replaces the CUDA ``texture_gaussians`` fused
kernels (SURVEY.md §2.1 stages 5-6, reference call site
``nerfstudio/models/gstex.py:1165``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import SLOT_ALIGN, TileGrid
from .surfel import REG_FAR, REG_NEAR, T_EPS
from .rasterize_pallas import CH3_PAD, CH_NAMES, F_REC, NCH
from .rasterize_pallas2 import G_NAMES, NG, _pixel_rows, _rep, _response2
from .rasterize_pallas3 import (_bil_weights, _cumprod_incl, _cumsum_excl,
                                _dot_cols, _row_iota, _sufprod_incl,
                                _sufsum_excl, _sum_rows)
from .rasterize_pallas4 import (ECH_NAMES, H_SUB, MXU_LEVEL, NECH,
                                TABLE_DTYPE, _block_ones, _cg_lanes,
                                _ch_blk_of, _chart_blocks, _mx,
                                _tri_excl_lower, _tri_excl_upper,
                                pack_charts_v4)
from .surfel import AA_SIGMA2, ALPHA_CLAMP, ALPHA_CUTOFF

import os as _os

# dev perf-isolation hooks (same contract as v4's GSTEX_PALLAS_SKIP)
_DEBUG_SKIP = _os.environ.get("GSTEX_PALLAS_SKIP", "")

CHUNK = 16
assert SLOT_ALIGN % CHUNK == 0

IDS_TILE = 1024  # int32 1-D HBM tiling: DMA slices must be 1024-aligned
REC_W = 128      # wide record rows (F_REC fields in lanes 0..F_REC-1)


def rec_rows(slot_cap: int, s_cap: int) -> int:
    """Flat record-array rows: slot_cap plus one tile window of end padding
    so the per-tile whole-window DMA never reads out of bounds."""
    return slot_cap + -(-s_cap // SLOT_ALIGN) * SLOT_ALIGN


def ids_window(s_cap: int) -> int:
    """SMEM id-window length: covers [1024-aligned base, astart + s_cap)."""
    return -(-s_cap // IDS_TILE) * IDS_TILE + IDS_TILE


def ids_capacity(slot_cap: int, s_cap: int) -> int:
    """Required flat-ids length: any window fits inside the array."""
    return -(-slot_cap // IDS_TILE) * IDS_TILE + ids_window(s_cap)


class PallasInputs5(NamedTuple):
    records: jax.Array   # (slot_cap, REC_W) f32 flat wide records
    gids: jax.Array      # (ids_capacity,) int32 flat pair gaussian ids
    starts: jax.Array    # (T,) int32 SLOT_ALIGN-aligned segment starts
    counts: jax.Array    # (T,) int32 per-tile counts, clamped to s_cap
    cam_info: jax.Array  # (18,)


def _splat_dma(table_ref, ids_smem, woff, g_rows, chart_buf, chart_sem, c, k,
               slot):
    gid = ids_smem[woff + c * CHUNK + k]
    return pltpu.make_async_copy(
        table_ref.at[pl.ds(gid * g_rows, g_rows)],
        chart_buf.at[slot, pl.ds(k * g_rows, g_rows)],
        chart_sem.at[slot])


def _chunk_charts_start(table_ref, ids_smem, woff, g_rows, chart_buf,
                        chart_sem, c, slot):
    for k in range(CHUNK):
        _splat_dma(table_ref, ids_smem, woff, g_rows, chart_buf, chart_sem,
                   c, k, slot).start()


def _chunk_charts_wait(table_ref, ids_smem, woff, g_rows, chart_buf,
                       chart_sem, c, slot):
    for k in range(CHUNK):
        _splat_dma(table_ref, ids_smem, woff, g_rows, chart_buf, chart_sem,
                   c, k, slot).wait()


def _rec_window_dma(rec_ref, astart, s_cap, rec_win, rec_sem):
    """One DMA per tile: the tile's records are contiguous in the flat
    layout, so the whole (clamped) segment streams in a single burst
    (bandwidth ~0.5 GB/frame at production scales — cheap; the per-chunk
    start/wait pairs it replaces are not)."""
    return pltpu.make_async_copy(
        rec_ref.at[pl.ds(pl.multiple_of(astart, SLOT_ALIGN), s_cap)],
        rec_win, rec_sem)


def _ids_window_dma(ids_ref, astart, s_cap, ids_smem, ids_sem):
    base = (astart // IDS_TILE) * IDS_TILE
    cp = pltpu.make_async_copy(
        ids_ref.at[pl.ds(pl.multiple_of(base, IDS_TILE), ids_window(s_cap))],
        ids_smem, ids_sem)
    return cp, astart - base


def _fwd_kernel5(grid: TileGrid, s_cap: int, ch_blk, cw_blk, lean,
                 starts_ref,
                 counts_ref, cam_ref, records_ref, ids_ref, table_ref,
                 out_ref, ncontrib_ref, ids_smem, rec_win, chart_buf,
                 rec_sem, chart_sem, ids_sem):
    t = pl.program_id(0)
    hsub, n_hb = _chart_blocks(ch_blk)
    g_rows = n_hb * cw_blk
    pix = grid.tile_h * grid.tile_w
    pr = pix // 128
    astart = starts_ref[t]
    count = counts_ref[t]
    n_chunks = (count + CHUNK - 1) // CHUNK
    gx, gy, dirs = _pixel_rows(grid, t, cam_ref)
    k_iota = _row_iota((CHUNK, pix))

    ids_cp, woff = _ids_window_dma(ids_ref, astart, s_cap, ids_smem, ids_sem)
    ids_cp.start()
    rec_cp = _rec_window_dma(records_ref, astart, s_cap, rec_win, rec_sem)
    ids_cp.wait()

    @pl.when(n_chunks > 0)
    def _():
        rec_cp.start()
        _chunk_charts_start(table_ref, ids_smem, woff, g_rows, chart_buf,
                            chart_sem, jnp.int32(0), jnp.int32(0))
        rec_cp.wait()

    zrow = jnp.zeros((1, pix), jnp.float32)
    acc0 = {name: zrow for name in CH_NAMES if name != "t_final"}
    acc0["t_final"] = jnp.ones((1, pix), jnp.float32)  # frozen T
    carry0 = (jnp.int32(0), jnp.full((1, pix), s_cap, jnp.int32),
              jnp.ones((1, pix), jnp.float32), acc0)

    def cond(carry):
        c, ncon, t_plain, acc = carry
        return jnp.logical_and(c < n_chunks, jnp.max(ncon) == s_cap)

    def body(carry):
        c, ncon, t_plain, acc = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            _chunk_charts_start(table_ref, ids_smem, woff, g_rows, chart_buf,
                                chart_sem, c + 1, jax.lax.rem(c + 1, 2))

        _chunk_charts_wait(table_ref, ids_smem, woff, g_rows, chart_buf,
                           chart_sem, c, slot)

        base = pl.multiple_of(c * CHUNK, CHUNK)
        chunk = rec_win[pl.ds(base, CHUNK), 0:F_REC]         # (K, F)
        valid = (c * CHUNK + k_iota < count).astype(jnp.float32)
        r = _response2(chunk, valid, dirs, gx, gy,
                       mxu=bool(MXU_LEVEL & 4))
        cb = chart_buf[slot]                                 # (K*g_rows, 128)

        a = r["alpha"]                                       # (K, P)
        incl = _cumprod_incl(1.0 - a) * t_plain
        excl = jnp.where(k_iota == 0, t_plain, pltpu.roll(incl, 1, axis=0))
        applied = jnp.logical_and(a > 0.0, incl > T_EPS)
        w = jnp.where(applied, a * excl, 0.0)

        # break bookkeeping: the first (and only) k with excl>eps>=incl
        brk = jnp.logical_and(a > 0.0,
                              jnp.logical_and(incl <= T_EPS, excl > T_EPS))
        s_glob = c * CHUNK + k_iota
        ncon = jnp.minimum(
            ncon, jnp.min(jnp.where(brk, s_glob, s_cap), axis=0,
                          keepdims=True))
        t_froz = jnp.minimum(
            acc["t_final"],
            jnp.min(jnp.where(incl > T_EPS, incl, 2.0), axis=0,
                    keepdims=True))

        # lean mode: the reg (2DGS depth-distortion) and normal channels
        # are statically dead when both loss lambdas are 0 (the headline
        # NVS config) — skip their whole compute chain; the channels stay
        # in the output layout as zeros. Mosaic DCEs the response's m path.
        if lean:
            if MXU_LEVEL & 2:
                sums = _mx(_block_ones(CHUNK, 2),
                           jnp.concatenate([w * r["t"], w], axis=0))
                depth_add, alpha_add = sums[0:1], sums[1:2]
            else:
                depth_add = _sum_rows(w * r["t"])
                alpha_add = _sum_rows(w)
            reg_add = m1_add = None
        else:
            m = r["m"]
            wm = w * m
            if MXU_LEVEL & 1:
                pwpwm = _mx(_tri_excl_lower(CHUNK, 2),
                            jnp.concatenate([w, wm], axis=0))
                pw, pwm = pwpwm[:CHUNK], pwpwm[CHUNK:]
            else:
                pw = _cumsum_excl(w)
                pwm = _cumsum_excl(wm)
            reg_term = 2.0 * w * (m * (acc["alpha"] + pw)
                                  - (acc["m1"] + pwm))
            if MXU_LEVEL & 2:
                sums = _mx(_block_ones(CHUNK, 4),
                           jnp.concatenate([reg_term, w * r["t"], w, wm],
                                           axis=0))
                reg_add, depth_add = sums[0:1], sums[1:2]
                alpha_add, m1_add = sums[2:3], sums[3:4]
            else:
                reg_add = _sum_rows(reg_term)
                depth_add = _sum_rows(w * r["t"])
                alpha_add = _sum_rows(w)
                m1_add = _sum_rows(wm)

        img_d = _dot_cols(chunk[:, 21:24], w)                # (3, P)
        nrm_d = (None if lean
                 else _dot_cols(chunk[:, 0:3], w * r["flip"]))  # (3, P)

        # texel fetch: blend weight folded into the x-axis bilinear
        # weights, full (hsub, P) accumulation, one row reduction per
        # channel per CHUNK (v4 note: (1,P) rows run at 1/8 sublane
        # utilization — keep them out of the loop)
        h_c = _rep(chunk[:, 26:27], pix)
        w_c = _rep(chunk[:, 27:28], pix)
        cg = _cg_lanes(hsub)
        tex = [jnp.zeros((hsub, pix), jnp.float32) for _ in range(3)]
        for k in range(CHUNK):
            wy = _bil_weights(r["uv_v"][k:k + 1, :] * w_c[k:k + 1, :],
                              w_c[k:k + 1, :], cw_blk)
            for b in range(n_hb):
                wx = _bil_weights(r["uv_u"][k:k + 1, :] * h_c[k:k + 1, :],
                                  h_c[k:k + 1, :], hsub,
                                  off=b * hsub) * w[k:k + 1, :]
                u = k * n_hb + b
                chart_kb = cb[u * cw_blk:(u + 1) * cw_blk,
                              0:cg].astype(jnp.float32)   # (cw, cg)
                tmp = _dot_cols(chart_kb, wy)                     # (cg, P)
                for ci in range(3):
                    tex[ci] = tex[ci] + wx * tmp[ci * hsub:(ci + 1) * hsub, :]

        new_acc = dict(acc)
        new_acc["img0"] = acc["img0"] + img_d[0:1, :]
        new_acc["img1"] = acc["img1"] + img_d[1:2, :]
        new_acc["img2"] = acc["img2"] + img_d[2:3, :]
        new_acc["tex0"] = acc["tex0"] + _sum_rows(tex[0])
        new_acc["tex1"] = acc["tex1"] + _sum_rows(tex[1])
        new_acc["tex2"] = acc["tex2"] + _sum_rows(tex[2])
        new_acc["depth"] = acc["depth"] + depth_add
        if not lean:
            new_acc["n0"] = acc["n0"] + nrm_d[0:1, :]
            new_acc["n1"] = acc["n1"] + nrm_d[1:2, :]
            new_acc["n2"] = acc["n2"] + nrm_d[2:3, :]
            new_acc["reg"] = acc["reg"] + reg_add
            new_acc["m1"] = acc["m1"] + m1_add
        new_acc["alpha"] = acc["alpha"] + alpha_add
        new_acc["t_final"] = t_froz
        return (c + 1, ncon, incl[CHUNK - 1:CHUNK, :], new_acc)

    c_final, ncontrib, _, acc = jax.lax.while_loop(cond, body, carry0)

    @pl.when(c_final < n_chunks)
    def _():
        _chunk_charts_wait(table_ref, ids_smem, woff, g_rows, chart_buf,
                           chart_sem, c_final, jax.lax.rem(c_final, 2))

    for i, name in enumerate(CH_NAMES):
        out_ref[0, pl.ds(i * pr, pr), :] = acc[name].reshape(pr, 128)
    ncontrib_ref[0] = ncontrib.reshape(pr, 128)


def rasterize_pallas5_fwd(grid: TileGrid, chart_pad, s_cap: int,
                          inputs: PallasInputs5, table: jax.Array,
                          interpret: bool = False, lean: bool = False):
    num_tiles = inputs.starts.shape[0]
    ch_blk = _ch_blk_of(chart_pad[0])
    cw_blk = -(-chart_pad[1] // 8) * 8
    g_rows = _chart_blocks(ch_blk)[1] * cw_blk
    pr = grid.tile_h * grid.tile_w // 128
    kernel = functools.partial(_fwd_kernel5, grid, s_cap, ch_blk, cw_blk,
                               lean)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, NCH * pr, 128), lambda t, s, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, pr, 128), lambda t, s, c, cam: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((ids_window(s_cap),), jnp.int32),
            pltpu.VMEM((s_cap, REC_W), jnp.float32),
            pltpu.VMEM((2, CHUNK * g_rows, CH3_PAD), table.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, NCH * pr, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, pr, 128), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    out, ncontrib = out_call(inputs.starts, inputs.counts, inputs.cam_info,
                             inputs.records, inputs.gids, table)
    maps = {name: out[:, i * pr:(i + 1) * pr, :]
            for i, name in enumerate(CH_NAMES)}
    return maps, ncontrib


# ---------------------------------------------------------------------------
# forward-only eval kernel (rgb compositing channels; see v4 note)
# ---------------------------------------------------------------------------


def _eval_kernel5(grid: TileGrid, s_cap: int, ch_blk, cw_blk, starts_ref,
                  counts_ref, cam_ref, records_ref, ids_ref, table_ref,
                  out_ref, ids_smem, rec_win, chart_buf, rec_sem, chart_sem,
                  ids_sem):
    t = pl.program_id(0)
    hsub, n_hb = _chart_blocks(ch_blk)
    g_rows = n_hb * cw_blk
    pix = grid.tile_h * grid.tile_w
    pr = pix // 128
    astart = starts_ref[t]
    count = counts_ref[t]
    n_chunks = (count + CHUNK - 1) // CHUNK
    gx, gy, dirs = _pixel_rows(grid, t, cam_ref)
    k_iota = _row_iota((CHUNK, pix))

    ids_cp, woff = _ids_window_dma(ids_ref, astart, s_cap, ids_smem, ids_sem)
    ids_cp.start()
    rec_cp = _rec_window_dma(records_ref, astart, s_cap, rec_win, rec_sem)
    ids_cp.wait()

    @pl.when(n_chunks > 0)
    def _():
        rec_cp.start()
        _chunk_charts_start(table_ref, ids_smem, woff, g_rows, chart_buf,
                            chart_sem, jnp.int32(0), jnp.int32(0))
        rec_cp.wait()

    zrow = jnp.zeros((1, pix), jnp.float32)
    acc0 = {name: zrow for name in ECH_NAMES}
    carry0 = (jnp.int32(0), jnp.ones((1, pix), jnp.float32), acc0)

    def cond(carry):
        c, t_plain, acc = carry
        return jnp.logical_and(c < n_chunks, jnp.max(t_plain) > T_EPS)

    def body(carry):
        c, t_plain, acc = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            _chunk_charts_start(table_ref, ids_smem, woff, g_rows, chart_buf,
                                chart_sem, c + 1, jax.lax.rem(c + 1, 2))

        _chunk_charts_wait(table_ref, ids_smem, woff, g_rows, chart_buf,
                           chart_sem, c, slot)

        base = pl.multiple_of(c * CHUNK, CHUNK)
        chunk = rec_win[pl.ds(base, CHUNK), 0:F_REC]         # (K, F)
        valid = (c * CHUNK + k_iota < count).astype(jnp.float32)
        r = _response2(chunk, valid, dirs, gx, gy,
                       mxu=bool(MXU_LEVEL & 4))
        cb = chart_buf[slot]

        a = r["alpha"]                                       # (K, P)
        incl = _cumprod_incl(1.0 - a) * t_plain
        excl = jnp.where(k_iota == 0, t_plain, pltpu.roll(incl, 1, axis=0))
        applied = jnp.logical_and(a > 0.0, incl > T_EPS)
        w = jnp.where(applied, a * excl, 0.0)

        if MXU_LEVEL & 2:
            sums = _mx(_block_ones(CHUNK, 2),
                       jnp.concatenate([w * r["t"], w], axis=0))
            depth_add, alpha_add = sums[0:1], sums[1:2]
        else:
            depth_add = _sum_rows(w * r["t"])
            alpha_add = _sum_rows(w)

        img_d = _dot_cols(chunk[:, 21:24], w)                # (3, P)

        h_c = _rep(chunk[:, 26:27], pix)
        w_c = _rep(chunk[:, 27:28], pix)
        cg = _cg_lanes(hsub)
        tex = [jnp.zeros((hsub, pix), jnp.float32) for _ in range(3)]
        for k in range(CHUNK):
            wy = _bil_weights(r["uv_v"][k:k + 1, :] * w_c[k:k + 1, :],
                              w_c[k:k + 1, :], cw_blk)
            for b in range(n_hb):
                wx = _bil_weights(r["uv_u"][k:k + 1, :] * h_c[k:k + 1, :],
                                  h_c[k:k + 1, :], hsub,
                                  off=b * hsub) * w[k:k + 1, :]
                u = k * n_hb + b
                chart_kb = cb[u * cw_blk:(u + 1) * cw_blk,
                              0:cg].astype(jnp.float32)   # (cw, cg)
                tmp = _dot_cols(chart_kb, wy)                     # (cg, P)
                for ci in range(3):
                    tex[ci] = tex[ci] + wx * tmp[ci * hsub:(ci + 1) * hsub, :]

        new_acc = dict(acc)
        new_acc["img0"] = acc["img0"] + img_d[0:1, :]
        new_acc["img1"] = acc["img1"] + img_d[1:2, :]
        new_acc["img2"] = acc["img2"] + img_d[2:3, :]
        new_acc["tex0"] = acc["tex0"] + _sum_rows(tex[0])
        new_acc["tex1"] = acc["tex1"] + _sum_rows(tex[1])
        new_acc["tex2"] = acc["tex2"] + _sum_rows(tex[2])
        new_acc["depth"] = acc["depth"] + depth_add
        new_acc["alpha"] = acc["alpha"] + alpha_add
        return (c + 1, incl[CHUNK - 1:CHUNK, :], new_acc)

    c_final, _, acc = jax.lax.while_loop(cond, body, carry0)

    @pl.when(c_final < n_chunks)
    def _():
        _chunk_charts_wait(table_ref, ids_smem, woff, g_rows, chart_buf,
                           chart_sem, c_final, jax.lax.rem(c_final, 2))

    for i, name in enumerate(ECH_NAMES):
        out_ref[0, pl.ds(i * pr, pr), :] = acc[name].reshape(pr, 128)


def rasterize_pallas5_eval(grid: TileGrid, chart_pad, s_cap: int,
                           inputs: PallasInputs5, table: jax.Array,
                           interpret: bool = False):
    """Forward-only render: {img,tex}x3 + depth + alpha maps, no residuals."""
    num_tiles = inputs.starts.shape[0]
    ch_blk = _ch_blk_of(chart_pad[0])
    cw_blk = -(-chart_pad[1] // 8) * 8
    g_rows = _chart_blocks(ch_blk)[1] * cw_blk
    pr = grid.tile_h * grid.tile_w // 128
    kernel = functools.partial(_eval_kernel5, grid, s_cap, ch_blk, cw_blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, NECH * pr, 128), lambda t, s, c, cam: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((ids_window(s_cap),), jnp.int32),
            pltpu.VMEM((s_cap, REC_W), jnp.float32),
            pltpu.VMEM((2, CHUNK * g_rows, CH3_PAD), table.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, NECH * pr, 128), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    (out,) = out_call(inputs.starts, inputs.counts, inputs.cam_info,
                      inputs.records, inputs.gids, table)
    return {name: out[:, i * pr:(i + 1) * pr, :]
            for i, name in enumerate(ECH_NAMES)}


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dch_rows(n_hb, pack_n, cw_blk):
    """d_charts rows per chunk: CHUNK splats × n_hb blocks / pack_n packed
    units per 128-lane block, cw_blk rows each."""
    assert (CHUNK * n_hb) % pack_n == 0
    return CHUNK * n_hb // pack_n * cw_blk


DREC_L = 32      # packed grad-row record region: lanes [0, DREC_L)


def dall_row_lanes(n_hb, cw_blk, hsub):
    """Packed per-slot grad-row layout: lanes [0, DREC_L) hold the F_REC
    record grads, [DREC_L, DREC_L + dch_l) the flattened (n_hb, cw_blk,
    cg_g) chart-grad block with cg_g = 3*hsub REAL channel lanes (no
    32-lane rounding — the grad block never feeds an MXU contraction, so
    the table's _cg_lanes padding would only widen the segment scatter's
    rows). One row per slot; the segment reduction consumes rows
    directly. Returns (cg_g, dch_l, dall_lp)."""
    cg_g = 3 * hsub
    dch_l = n_hb * cw_blk * cg_g
    dall_lp = -(-(DREC_L + dch_l) // 128) * 128
    return cg_g, dch_l, dall_lp


def _flatten_unit(dcg, cw_blk, cg, lane_mask):
    """(cw, cg) unit block -> (1, cw*cg) row-major flattened row.

    Mosaic supports neither the (cw,cg)->(1,cw*cg) shape cast nor
    lane-concat of sublane-offset slices; an MXU ones-dot is bf16-rounded.
    This exact formulation tiles the block along lanes and reduces over
    sublanes under a one-hot mask (~0.5 us per 16-splat chunk on-chip,
    scripts_dev fatten probe)."""
    rep = jnp.concatenate([dcg] * cw_blk, axis=1)        # (cw, cw*cg)
    return jnp.sum(rep * lane_mask, axis=0, keepdims=True)


def _bwd_kernel5(grid: TileGrid, s_cap: int, ch_blk, cw_blk, lean,
                 starts_ref,
                 counts_ref, cam_ref, records_ref, ids_ref, table_ref,
                 fwdout_ref, ncon_ref, gmaps_ref, dall_ref,
                 ids_smem, tex_s, dx_s, dy_s, rec_win, chart_buf, dall_buf,
                 rec_sem, chart_sem, dall_sem, ids_sem):
    t = pl.program_id(0)
    pix = grid.tile_h * grid.tile_w
    pr = pix // 128
    astart = starts_ref[t]
    count = counts_ref[t]
    gx, gy, dirs = _pixel_rows(grid, t, cam_ref)
    d0, d1, d2 = dirs
    k_iota = _row_iota((CHUNK, pix))

    ids_cp, woff = _ids_window_dma(ids_ref, astart, s_cap, ids_smem, ids_sem)
    ids_cp.start()
    rec_cp = _rec_window_dma(records_ref, astart, s_cap, rec_win, rec_sem)
    rec_cp.start()

    hsub, n_hb = _chart_blocks(ch_blk)
    g_rows = n_hb * cw_blk
    cg = _cg_lanes(hsub)
    cg_g, dch_l, dall_lp = dall_row_lanes(n_hb, cw_blk, hsub)

    def fwd_ch(name):
        i = CH_NAMES.index(name)
        return fwdout_ref[0, pl.ds(i * pr, pr), :].reshape(1, pix)

    def g_ch(name):
        i = G_NAMES.index(name)
        return gmaps_ref[0, pl.ds(i * pr, pr), :].reshape(1, pix)

    m0_tot = fwd_ch("alpha")
    m1_tot = fwd_ch("m1")
    t_final = fwd_ch("t_final")
    ncon = ncon_ref[0].reshape(1, pix)

    g_img = (g_ch("img0"), g_ch("img1"), g_ch("img2"))
    g_tex = (g_ch("tex0"), g_ch("tex1"), g_ch("tex2"))
    g_depth = g_ch("depth")
    g_alpha = g_ch("alpha")
    g_norm = (g_ch("n0"), g_ch("n1"), g_ch("n2"))
    g_reg = g_ch("reg")
    # MXU bit 3: the per-splat-constant part of s_direct
    # (rgb·g_img + 1·g_alpha [+ n·g_norm]) is rank-1 per channel — one
    # stacked (K, m)@(m, P) dot replaces m broadcast-FMA chains and the
    # (K,1)->(K,P) lane reps feeding them. The cotangent matrix is
    # loop-invariant: built once per tile.
    gmat = None
    if MXU_LEVEL & 8:
        rows = [g_img[0], g_img[1], g_img[2], g_alpha]
        if not lean:
            rows += [g_norm[0], g_norm[1], g_norm[2]]
        gmat = jnp.concatenate(rows, axis=0)              # (m, P)

    start = jnp.minimum(count, jnp.max(ncon) + 1)
    n_chunks = (start + CHUNK - 1) // CHUNK

    ids_cp.wait()

    # d_rec and d_chart rows land in ONE (slot_cap, dall_lp) HBM buffer
    # (dall_row_lanes: record grads in lanes [0, 32), REAL cg_g=3*hsub
    # chart-grad lanes after — 256 total for (8,8) charts vs 384 when the
    # two streams lived in separate 128-padded buffers). One DMA per
    # chunk, and the API reduces record+chart grads with a single
    # segment_sum: the scatter's per-row fixed cost dominates its lane
    # cost (two scatters measured 2.2x one merged scatter, round-4
    # probe), and fewer lanes shrink both the scatter pass and the HBM
    # round-trip.
    def dall_cp(c, slot):
        return pltpu.make_async_copy(
            dall_buf.at[slot],
            dall_ref.at[pl.ds(pl.multiple_of(astart + c * CHUNK, CHUNK),
                              CHUNK)],
            dall_sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        c0 = n_chunks - 1
        _chunk_charts_start(table_ref, ids_smem, woff, g_rows, chart_buf,
                            chart_sem, c0, jax.lax.rem(c0, 2))
    rec_cp.wait()

    zrow = jnp.zeros((1, pix), jnp.float32)
    carry0 = (n_chunks - 1, t_final, zrow, zrow, zrow)

    def cond(carry):
        return carry[0] >= 0

    def body(carry):
        c, t_end, bs_c, e_c, d_c = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c - 1 >= 0)
        def _():
            _chunk_charts_start(table_ref, ids_smem, woff, g_rows, chart_buf,
                                chart_sem, c - 1, jax.lax.rem(c - 1, 2))

        # before overwriting this slot's grad scratches, drain the write
        # DMAs issued two iterations ago (walk is descending: c+2)
        if "dwrite" not in _DEBUG_SKIP:
            @pl.when(c + 2 <= n_chunks - 1)
            def _():
                dall_cp(c + 2, slot).wait()

        _chunk_charts_wait(table_ref, ids_smem, woff, g_rows, chart_buf,
                           chart_sem, c, slot)

        base = pl.multiple_of(c * CHUNK, CHUNK)
        chunk = rec_win[pl.ds(base, CHUNK), 0:F_REC]         # (K, F)
        valid = (c * CHUNK + k_iota < count).astype(jnp.float32)
        r = _response2(chunk, valid, dirs, gx, gy,
                       mxu=bool(MXU_LEVEL & 4))
        cb = chart_buf[slot]

        a = r["alpha"]
        t_hit = r["t"]
        fl = r["flip"]
        s_glob = c * CHUNK + k_iota
        applied = jnp.logical_and(a > 0.0, s_glob < ncon)
        one_minus = 1.0 - a
        inv_q = 1.0 / jnp.where(applied, one_minus, 1.0)
        s_inv = _sufprod_incl(inv_q)
        t_k = t_end * s_inv                                  # T before splat k
        w = jnp.where(applied, a * t_k, 0.0)
        if lean:
            # reg chain statically dead: no m/wm, no E/D suffix state
            m = wm = e_k = d_k = big_a = big_c = d_m = None
        else:
            m = r["m"]
            wm = w * m

            if MXU_LEVEL & 1:
                sufs = _mx(_tri_excl_upper(CHUNK, 2),
                           jnp.concatenate([w, wm], axis=0))
                e_k = e_c + sufs[:CHUNK]
                d_k = d_c + sufs[CHUNK:]
            else:
                e_k = e_c + _sufsum_excl(w)
                d_k = d_c + _sufsum_excl(wm)
            big_a = m0_tot - w - e_k
            big_c = m1_tot - wm - d_k
            d_m = 2.0 * g_reg * w * (big_a - e_k)

        # --- per-splat texel fetch + chart grads ---
        h_c = _rep(chunk[:, 26:27], pix)
        w_c = _rep(chunk[:, 27:28], pix)
        x_raw_all = r["uv_u"] * h_c
        y_raw_all = r["uv_v"] * w_c
        a_io = _row_iota((hsub, pix)).astype(jnp.float32)
        b_io = _row_iota((cw_blk, pix)).astype(jnp.float32)
        pad_rows = cg - 3 * hsub
        lm_flat = (jax.lax.broadcasted_iota(
            jnp.int32, (cw_blk, cw_blk * cg_g), 1) // cg_g
            == jax.lax.broadcasted_iota(
                jnp.int32, (cw_blk, cw_blk * cg_g), 0)).astype(jnp.float32)
        # MXU bit 16: batch the CHUNK per-splat chart-grad dots
        # (cw,P)@(P,cg) into ONE (K*cw,P)@(P,K*cg) dot and slice the
        # block diagonal — 16 tiny-output MXU contractions become 32
        # full-utilization passes (n_hb==1 path only)
        batch_dcg = bool(MXU_LEVEL & 16) and n_hb == 1 \
            and "dchart" not in _DEBUG_SKIP
        wy_rows, m2_rows = [], []
        ks_fetch = [] if "fetch" in _DEBUG_SKIP else list(range(CHUNK))
        for k in ks_fetch:
            h_g = h_c[k:k + 1, :]
            w_g = w_c[k:k + 1, :]
            x_raw = x_raw_all[k:k + 1, :]
            y_raw = y_raw_all[k:k + 1, :]
            xg = jnp.clip(x_raw, 0.0, h_g - 1.0)
            yg = jnp.clip(y_raw, 0.0, w_g - 1.0)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(yg - b_io))  # (cw, P)
            dfy = yg - b_io
            dwy_dy = jnp.where(jnp.abs(dfy) <= 1.0, -jnp.sign(dfy), 0.0)
            wk = w[k:k + 1, :]
            coeff_dx = jnp.zeros((1, pix), jnp.float32)
            d_wy = jnp.zeros((cw_blk, pix), jnp.float32)
            texk = [jnp.zeros((1, pix), jnp.float32) for _ in range(3)]
            row_units = []
            for b in range(n_hb):
                a_b = a_io + b * hsub
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(xg - a_b))   # (hsub, P)
                u = k * n_hb + b
                chart_kb = cb[u * cw_blk:(u + 1) * cw_blk,
                              0:cg].astype(jnp.float32)   # (cw, cg)
                tmp = _dot_cols(chart_kb, wy)                     # (cg, P)

                wxk = wx * wk      # blend weight folded once, (hsub, P)
                # real channel rows only (cg_g = 3*hsub) for the grad
                # dot; the d_wy dot below needs the table's cg=32 lane
                # layout, so it gets the zero-padded version
                m2r = jnp.concatenate(
                    [wxk * g_tex[ci] for ci in range(3)], axis=0)
                # pad_rows == 0 at hsub = 32 (cg = 3*hsub exactly) —
                # a (0, P) vector is an invalid Mosaic type
                m2 = (m2r if pad_rows == 0 else jnp.concatenate(
                    [m2r, jnp.zeros((pad_rows, pix), jnp.float32)], axis=0))
                if batch_dcg:
                    wy_rows.append(wy)
                    m2_rows.append(m2r)
                elif "dchart" not in _DEBUG_SKIP:
                    dcg = jax.lax.dot_general(
                        wy, m2r, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)     # (cw, cg_g)
                    row_units.append(_flatten_unit(dcg, cw_blk, cg_g,
                                                   lm_flat))

                coeff = (g_tex[0] * tmp[0 * hsub:1 * hsub, :]
                         + g_tex[1] * tmp[1 * hsub:2 * hsub, :]
                         + g_tex[2] * tmp[2 * hsub:3 * hsub, :])
                dfx = xg - a_b
                dwx_dx = jnp.where(jnp.abs(dfx) <= 1.0, -jnp.sign(dfx), 0.0)
                coeff_dx = coeff_dx + _sum_rows(coeff * dwx_dx)

                d_wy = d_wy + jax.lax.dot_general(
                    chart_kb, m2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)           # (cw, P)
                for ci in range(3):
                    prod = wx * tmp[ci * hsub:(ci + 1) * hsub, :]
                    texk[ci] = texk[ci] + _sum_rows(prod)

            if "dchart" not in _DEBUG_SKIP and not batch_dcg:
                # packed row: [DREC_L zeros | chart-grad block | pad];
                # the record grads are added into lanes [0, 128) at chunk
                # granularity after this loop
                parts = [jnp.zeros((1, DREC_L), jnp.float32)] + row_units
                if dall_lp > DREC_L + dch_l:
                    parts.append(jnp.zeros((1, dall_lp - DREC_L - dch_l),
                                           jnp.float32))
                dall_buf[slot, k:k + 1, :] = jnp.concatenate(parts, axis=1)

            dx_s[k:k + 1, :] = wk * coeff_dx
            dy_s[k:k + 1, :] = _sum_rows(d_wy * dwy_dy)
            for ci in range(3):
                tex_s[ci, k:k + 1, :] = texk[ci]

        if batch_dcg and ks_fetch:
            wy_all = jnp.concatenate(wy_rows, axis=0)      # (K*cw, P)
            m2_all = jnp.concatenate(m2_rows, axis=0)      # (K*cg_g, P)
            dcg_all = jax.lax.dot_general(
                wy_all, m2_all, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (K*cw, K*cg_g)
            rows_all = []
            for k2 in range(CHUNK):
                dcg = dcg_all[k2 * cw_blk:(k2 + 1) * cw_blk,
                              k2 * cg_g:(k2 + 1) * cg_g]
                rowk = _flatten_unit(dcg, cw_blk, cg_g, lm_flat)
                parts = [jnp.zeros((1, DREC_L), jnp.float32), rowk]
                if dall_lp > DREC_L + dch_l:
                    parts.append(jnp.zeros((1, dall_lp - DREC_L - dch_l),
                                           jnp.float32))
                rows_all.append(jnp.concatenate(parts, axis=1))
            dall_buf[slot] = jnp.concatenate(rows_all, axis=0)
        if "fetch" in _DEBUG_SKIP:
            zkp = jnp.zeros((CHUNK, pix), jnp.float32)
            tex_s[0], tex_s[1], tex_s[2] = zkp, zkp, zkp
            dx_s[:], dy_s[:] = zkp, zkp
        tex0, tex1, tex2 = tex_s[0], tex_s[1], tex_s[2]      # (K, P)
        op_c = _rep(chunk[:, 20:21], pix)

        if MXU_LEVEL & 8:
            ones_col = jnp.ones((CHUNK, 1), jnp.float32)
            if lean:
                cmat = jnp.concatenate([chunk[:, 21:24], ones_col], axis=1)
                s_const = _mx(cmat, gmat)                    # (K, P)
            else:
                cmat = jnp.concatenate([chunk[:, 21:24], ones_col],
                                       axis=1)
                s_const = _mx(cmat, gmat[:4])
                s_const = s_const + fl * _mx(chunk[:, 0:3], gmat[4:7])
            s_direct = (s_const
                        + tex0 * g_tex[0] + tex1 * g_tex[1]
                        + tex2 * g_tex[2] + t_hit * g_depth)
        else:
            rgb0 = _rep(chunk[:, 21:22], pix)
            rgb1 = _rep(chunk[:, 22:23], pix)
            rgb2 = _rep(chunk[:, 23:24], pix)
            s_direct = (rgb0 * g_img[0] + rgb1 * g_img[1] + rgb2 * g_img[2]
                        + tex0 * g_tex[0] + tex1 * g_tex[1]
                        + tex2 * g_tex[2]
                        + t_hit * g_depth + g_alpha)
            if not lean:
                n0 = _rep(chunk[:, 0:1], pix)
                n1 = _rep(chunk[:, 1:2], pix)
                n2 = _rep(chunk[:, 2:3], pix)
                s_direct = s_direct + fl * (n0 * g_norm[0]
                                            + n1 * g_norm[1]
                                            + n2 * g_norm[2])
        s_k = (s_direct if lean
               else s_direct + 2.0 * g_reg * ((m * big_a - big_c)
                                              + (d_k - m * e_k)))
        sw = s_k * w
        if MXU_LEVEL & 1:
            bs_k = bs_c + _mx(_tri_excl_upper(CHUNK), sw)
        else:
            bs_k = bs_c + _sufsum_excl(sw)
        d_alpha = jnp.where(applied, t_k * s_k - bs_k * inv_q, 0.0)

        x_pass = jnp.logical_and(x_raw_all >= 0.0,
                                 x_raw_all <= h_c - 1.0)
        y_pass = jnp.logical_and(y_raw_all >= 0.0,
                                 y_raw_all <= w_c - 1.0)
        d_x = jnp.where(x_pass, dx_s[:], 0.0)
        d_y = jnp.where(y_pass, dy_s[:], 0.0)

        # chain rule (mirrors the XLA tier's autodiff subgradients)
        opg = op_c * r["g"]
        interior = jnp.logical_and(opg <= ALPHA_CLAMP, opg >= ALPHA_CUTOFF)
        interior = jnp.logical_and(interior, t_hit > 1e-6)
        dag = jnp.where(interior, d_alpha, 0.0)
        d_op = r["g"] * dag
        d_g = op_c * d_op
        surf_sel = r["surf_sel"]
        dgs_eff = jnp.where(surf_sel, d_g, 0.0)
        d_u = -r["u"] * dgs_eff
        d_v = -r["v"] * dgs_eff
        dgc_eff = jnp.where(surf_sel, 0.0, d_g)
        d_xy0 = ((1.0 / AA_SIGMA2) * r["dpx"]) * dgc_eff
        d_xy1 = ((1.0 / AA_SIGMA2) * r["dpy"]) * dgc_eff

        u_pass = jnp.logical_and(r["uvu_raw"] >= 0.0, r["uvu_raw"] <= 1.0)
        v_pass = jnp.logical_and(r["uvv_raw"] >= 0.0, r["uvv_raw"] <= 1.0)
        d_uvu = jnp.where(u_pass, d_x * h_c, 0.0)
        d_uvv = jnp.where(v_pass, d_y * w_c, 0.0)

        kfac = REG_FAR / (REG_FAR - REG_NEAR)
        d_t = w * g_depth
        if not lean:
            d_t = d_t + jnp.where(t_hit >= REG_NEAR,
                                  d_m * (kfac * REG_NEAR)
                                  * r["invtc"] * r["invtc"], 0.0)
        d_t = d_t + d_u * r["b1d"] + d_v * r["b2d"]
        d_t = d_t + d_uvu * r["b1ud"] + d_uvv * r["b2ud"]

        nd_pass = jnp.abs(r["nd"]) >= 1e-9
        d_an = d_t * r["inv_nd"]
        d_nd = jnp.where(nd_pass, -t_hit * d_an, 0.0)

        wfl = None if lean else w * fl
        if MXU_LEVEL & 32:
            # MXU bit 5: the 22 per-field (K,P)->(K,1) pixel reductions
            # of the record-grad assembly become THREE shared-RHS MXU
            # dots — sum_P(x * d_i) rows factor as x @ [d0;d1;d2] with x
            # in {d_nd, d_u*t, d_v*t}, the img rows as w @ [g_img], and
            # the 8 plain rows as one ones-dot. HIGHEST precision keeps
            # the grads f32-exact like the tree adds they replace.
            # MEASURED DEAD END (round 5, default OFF): 131.6 vs 126.8
            # ms/step dense — the 6-pass f32-emulated dots with 1-3-lane
            # outputs are latency-bound and the 14-piece lane concat
            # relayouts eat the rest; the masked tree-add assembly it
            # replaces only costs ~10 ms total ("skip reduce" probe).
            # Kept behind the bit for provenance; gradchecks cover it.
            def dotpp(lhs, rhs):
                return jax.lax.dot_general(
                    lhs, rhs, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

            du_t = d_u * t_hit
            dv_t = d_v * t_hit
            b_d = jnp.concatenate([d0, d1, d2], axis=0)          # (3,P)
            sums3 = dotpp(jnp.concatenate([d_nd, du_t, dv_t], axis=0),
                          b_d)                                   # (3K,3)
            snd = sums3[0:CHUNK]
            if not lean:
                snd = snd + dotpp(wfl, jnp.concatenate(
                    [g_norm[0], g_norm[1], g_norm[2]], axis=0))
            sums_w = dotpp(w, jnp.concatenate(
                [g_img[0], g_img[1], g_img[2]], axis=0))         # (K,3)
            ones_row = jnp.ones((1, pix), jnp.float32)
            plain = jnp.concatenate(
                [d_an, d_u, d_v, d_uvu, d_uvv, d_op, d_xy0, d_xy1],
                axis=0)                                          # (8K,P)
            sums_p = dotpp(plain, ones_row)                      # (8K,1)
            (s_an, s_du, s_dv, s_uvu, s_uvv, s_op, s_xy0,
             s_xy1) = (sums_p[i * CHUNK:(i + 1) * CHUNK]
                       for i in range(8))
            z3 = jnp.zeros((CHUNK, 3), jnp.float32)
            grad_chunk = jnp.concatenate([
                snd, s_an, sums3[CHUNK:2 * CHUNK], s_du,
                sums3[2 * CHUNK:], s_dv, z3, s_uvu, z3, s_uvv, s_op,
                sums_w, s_xy0, s_xy1,
                jnp.zeros((CHUNK, REC_W - 26), jnp.float32)], axis=1)
            if ks_fetch and "dchart" not in _DEBUG_SKIP:
                dall_buf[slot, :, 0:128] = (dall_buf[slot, :, 0:128]
                                            + grad_chunk)
            else:
                dall_buf[slot, :, 0:128] = grad_chunk
            if "dwrite" not in _DEBUG_SKIP:
                dall_cp(c, slot).start()
            t_start = t_end * s_inv[0:1, :]
            if lean:
                bs_new = bs_c + (_mx(_block_ones(CHUNK, 1), sw)
                                 if MXU_LEVEL & 2 else _sum_rows(sw))
                return (c - 1, t_start, bs_new, e_c, d_c)
            if MXU_LEVEL & 2:
                sums = _mx(_block_ones(CHUNK, 3),
                           jnp.concatenate([sw, w, wm], axis=0))
                bs_new = bs_c + sums[0:1]
                e_new = e_c + sums[1:2]
                d_new = d_c + sums[2:3]
            else:
                bs_new = bs_c + _sum_rows(sw)
                e_new = e_c + _sum_rows(w)
                d_new = d_c + _sum_rows(wm)
            return (c - 1, t_start, bs_new, e_new, d_new)
        td0, td1, td2 = t_hit * d0, t_hit * d1, t_hit * d2
        # fields 12-14/16-18 are the detached uv direction coefficients
        # (stop_gradient upstream) — their record grads are skipped (v4)
        vals = [
            d_nd * d0 if lean else d_nd * d0 + wfl * g_norm[0],
            d_nd * d1 if lean else d_nd * d1 + wfl * g_norm[1],
            d_nd * d2 if lean else d_nd * d2 + wfl * g_norm[2],
            d_an,
            d_u * td0,
            d_u * td1,
            d_u * td2,
            d_u,
            d_v * td0,
            d_v * td1,
            d_v * td2,
            d_v,
            None,
            None,
            None,
            d_uvu,
            None,
            None,
            None,
            d_uvv,
            d_op,
            w * g_img[0],
            w * g_img[1],
            w * g_img[2],
            d_xy0,
            d_xy1,
        ]

        def lane_sum(v):
            width = pix
            while width > 128:
                width //= 2
                v = v[:, 0:width] + v[:, width:2 * width]
            return jnp.sum(v, axis=1, keepdims=True)         # (K, 1)

        f_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, REC_W), 1)
        grad_chunk = jnp.zeros((CHUNK, REC_W), jnp.float32)
        if "reduce" not in _DEBUG_SKIP:
            for f, v in enumerate(vals):
                if v is None:
                    continue
                grad_chunk = grad_chunk + jnp.where(
                    f_iota == f, _rep(lane_sum(v), REC_W), 0.0)
        if ks_fetch and "dchart" not in _DEBUG_SKIP:
            # lanes [32, 128) of grad_chunk are structural zeros (26
            # record fields), so the 128-wide tile-aligned add leaves the
            # chart-grad lanes intact
            dall_buf[slot, :, 0:128] = dall_buf[slot, :, 0:128] + grad_chunk
        else:
            dall_buf[slot, :, 0:128] = grad_chunk
        if "dwrite" not in _DEBUG_SKIP:
            dall_cp(c, slot).start()

        t_start = t_end * s_inv[0:1, :]
        if lean:
            bs_new = bs_c + (_mx(_block_ones(CHUNK, 1), sw)
                             if MXU_LEVEL & 2 else _sum_rows(sw))
            return (c - 1, t_start, bs_new, e_c, d_c)
        if MXU_LEVEL & 2:
            sums = _mx(_block_ones(CHUNK, 3),
                       jnp.concatenate([sw, w, wm], axis=0))
            bs_new = bs_c + sums[0:1]
            e_new = e_c + sums[1:2]
            d_new = d_c + sums[2:3]
        else:
            bs_new = bs_c + _sum_rows(sw)
            e_new = e_c + _sum_rows(w)
            d_new = d_c + _sum_rows(wm)
        return (c - 1, t_start, bs_new, e_new, d_new)

    jax.lax.while_loop(cond, body, carry0)

    # drain the last (up to) two outstanding grad-write DMAs
    if "dwrite" not in _DEBUG_SKIP:
        @pl.when(n_chunks >= 1)
        def _():
            dall_cp(0, jnp.int32(0)).wait()

        @pl.when(n_chunks >= 2)
        def _():
            dall_cp(1, jnp.int32(1)).wait()


def rasterize_pallas5_bwd(grid: TileGrid, chart_pad, s_cap, inputs, table,
                          fwd_out, ncontrib, gmaps, interpret: bool = False,
                          lean: bool = False):
    num_tiles = inputs.starts.shape[0]
    # records carry one tile-window of end padding (rec_rows); the flat
    # grad outputs are sized by the true slot capacity
    slot_cap = inputs.records.shape[0] - (rec_rows(0, s_cap))
    ch_blk = _ch_blk_of(chart_pad[0])
    cw_blk = -(-chart_pad[1] // 8) * 8
    hsub, n_hb = _chart_blocks(ch_blk)
    g_rows = n_hb * cw_blk
    _, _, dall_lp = dall_row_lanes(n_hb, cw_blk, hsub)
    pix = grid.tile_h * grid.tile_w
    pr = pix // 128
    kernel = functools.partial(_bwd_kernel5, grid, s_cap, ch_blk, cw_blk,
                               lean)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, NCH * pr, 128), lambda t, s, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, pr, 128), lambda t, s, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, NG * pr, 128), lambda t, s, c, cam: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        scratch_shapes=[
            pltpu.SMEM((ids_window(s_cap),), jnp.int32),
            pltpu.VMEM((3, CHUNK, pix), jnp.float32),
            pltpu.VMEM((CHUNK, pix), jnp.float32),
            pltpu.VMEM((CHUNK, pix), jnp.float32),
            pltpu.VMEM((s_cap, REC_W), jnp.float32),
            pltpu.VMEM((2, CHUNK * g_rows, CH3_PAD), table.dtype),
            pltpu.VMEM((2, CHUNK, dall_lp), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    bwd_call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((slot_cap, dall_lp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    (d_all,) = bwd_call(inputs.starts, inputs.counts,
                        inputs.cam_info, inputs.records,
                        inputs.gids, table, fwd_out, ncontrib,
                        gmaps)
    return d_all
