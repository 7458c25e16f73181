"""Pallas rasterizer v4 — gather-free chart streaming by gaussian id.

v3 consumed a pair-space chart buffer ``charts_g (T, S·Cw', 128)`` built by
an XLA gather (``texture_packed[bins.ids]``): 1.3 GB per 800² frame at
s_max=512, written once, read back by both kernels, and its autodiff
transpose scatter-added another 1.3 GB of pair-space texel grads.

v4 deletes the pair buffer: each tile's id row (``bins.ids``, int32) is
DMA'd into SMEM at tile start, and every splat's chart tile streams
directly from the *global* packed table ``(N·Cw', 128)`` with a per-splat
dynamic-index DMA (``table.at[gid·Cw']``, id read from SMEM scratch —
validated by scripts_dev/tpu_dma_probe.py). Chart HBM traffic becomes
count-limited (real pairs only, early-exit included) instead of
s_max-padded, and the forward residuals shrink by the full pair buffer.

The backward still emits pair-space ``d_charts`` (conflict-free per-slot
writes); the API layer reduces them to per-gaussian grads with one
``segment_sum`` over ``bins.ids`` (measured cheaper than the autodiff
scatter of the gather it replaces).

Blend math, record layout, and output maps are identical to v3
(chunk-vectorized prefix/suffix scans). Replaces the CUDA
``texture_gaussians`` fused kernels (SURVEY.md §2.1 stages 5-6, reference
call site ``nerfstudio/models/gstex.py:1165``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TileGrid
from .surfel import (AA_SIGMA2, ALPHA_CLAMP, ALPHA_CUTOFF, EXTENT_SIGMA,
                     REG_FAR, REG_NEAR, T_EPS)
from .rasterize_pallas import CH3_PAD, CH_NAMES, F_REC, NCH
from .rasterize_pallas2 import G_NAMES, NG, _pixel_rows, _rep, _response2
from .rasterize_pallas3 import (_bil_weights, _cumprod_incl, _cumsum_excl,
                                _dot_cols, _row_iota, _sufprod_incl,
                                _sufsum_excl, _sum_rows)

CHUNK = 16

# --------------------------------------------------------------------------
# multi-block chart packing: charts taller than 40 texels cannot pack their
# 3*ch channel-major lanes into one 128-lane tile, so the height axis is
# split into H_SUB-row blocks, each its own (cw_blk, 3*H_SUB lanes) slab in
# the table (h-block-major rows per gaussian). This is what makes the
# reference's arbitrary-size charts (``jagged_texture.py:36-43``; LOD
# configs need ~88x88) reachable — fetch/grad loops iterate the static
# n_hb block count, which is 1 for charts <= 40 tall (the common case,
# code path unchanged).
# --------------------------------------------------------------------------
H_SUB = 32   # h rows per block in multi-block mode (3*32=96 lanes of 128)

# Chart-table storage dtype. bf16 halves the per-splat chart DMA traffic
# (the table is read once per (pair, chunk-tile) by both kernels) and the
# fetch dots already run as bf16 MXU passes (MXU_DOT_PRECISION); texel
# VALUES quantize to ~3 decimal digits. f32 default until measured
# (see DESIGN.md precision study).
import os as _os0

TABLE_DTYPE = {"bf16": jnp.bfloat16, "f32": jnp.float32}[
    _os0.environ.get("GSTEX_TABLE_DTYPE", "f32")]


def _ch_blk_of(ch):
    """Storage-padded chart height: multiple of 8 while single-block,
    multiple of H_SUB beyond the one-lane-tile cap."""
    blk = -(-ch // 8) * 8
    if 3 * blk <= 128:
        return blk
    return -(-ch // H_SUB) * H_SUB


def _chart_blocks(ch_blk):
    """(hsub, n_hb): rows per h-block and block count."""
    if 3 * ch_blk <= 128:
        return ch_blk, 1
    assert ch_blk % H_SUB == 0
    return H_SUB, ch_blk // H_SUB


def pack_charts_v4(texture: jax.Array, dtype=None) -> jax.Array:
    """(N, Ch, Cw, 3) -> (N, n_hb*Cw', 128): per-gaussian h-block-major
    slabs, each (Cw', 3*hsub) c-major lanes padded to 128. Equals
    ``pack_charts_cmajor`` when the chart fits one lane tile (n_hb=1).

    ``dtype`` overrides the packed table dtype (the bf16 texel-stream
    mixed-precision knob, ``GStexConfig.texel_dtype``); defaults to the
    module-level TABLE_DTYPE env setting."""
    n, ch, cw, c = texture.shape
    ch_blk = _ch_blk_of(ch)
    hsub, n_hb = _chart_blocks(ch_blk)
    cw_blk = -(-cw // 8) * 8
    t = jnp.pad(texture,
                ((0, 0), (0, ch_blk - ch), (0, cw_blk - cw), (0, 0)))
    t = t.reshape(n, n_hb, hsub, cw_blk, 3).transpose(0, 1, 3, 4, 2)
    t = t.reshape(n, n_hb, cw_blk, 3 * hsub)
    from .rasterize_pallas import CH3_PAD as _pad128

    t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, _pad128 - 3 * hsub)))
    return t.reshape(n, n_hb * cw_blk,
                     _pad128).astype(dtype or TABLE_DTYPE)


import os as _os

_DEBUG_SKIP = _os.environ.get("GSTEX_PALLAS_SKIP", "")  # dev perf probes

# MXU offload bitmask for the chunk body (v5 experiments): the v5e VPU is
# ~1.9 TFLOP/s f32 while the MXU is ~25x that, so K-axis reductions/scans
# and the per-splat affine direction dots are cheaper as small matmuls.
# bit 0: prefix/suffix sums as triangular-matrix dots
# bit 1: row sums (K->1 accumulator reductions) as block-ones dots
# bit 2: response affine dots (n.d, b.d) as one stacked coefficient matmul
#
# Measured on a v5e chip (800p dense synthetic, ~256k pairs):
#   MXU=0: fwd 82.1 ms  bwd 103.9 ms
#   MXU=4: fwd 60.9 ms  bwd  83.5 ms   (response dots on the MXU)
#   MXU=7: fwd 58.8 ms  bwd  81.0 ms   (+ scans/reductions as tri/ones dots)
# Record-gradient diff vs the pure-VPU path is 7.4e-5; output diff is
# rounding-level (rgb max 2.1e-3 on 99/1.9M pixels, alpha max 1.4e-4 —
# grazing-incidence t_hit rounding through the HIGHEST-precision matmul),
# so all bits default on.
MXU_LEVEL = int(_os.environ.get("GSTEX_PALLAS_MXU", "7"))

def _iota2(shape):
    return (jax.lax.broadcasted_iota(jnp.int32, shape, 0),
            jax.lax.broadcasted_iota(jnp.int32, shape, 1))


def _tri_excl_lower(k, blocks=1):
    """Block-diag strictly-lower-triangular ones: L @ x = exclusive cumsum.
    Built from iotas (pallas kernels cannot capture host constants)."""
    r, c = _iota2((k * blocks, k * blocks))
    same = (r // k) == (c // k)
    return jnp.where(jnp.logical_and(same, (c % k) < (r % k)), 1.0, 0.0)


def _tri_excl_upper(k, blocks=1):
    """Block-diag strictly-upper-triangular ones: U @ x = exclusive sufsum."""
    r, c = _iota2((k * blocks, k * blocks))
    same = (r // k) == (c // k)
    return jnp.where(jnp.logical_and(same, (c % k) > (r % k)), 1.0, 0.0)


def _block_ones(k, blocks):
    """(blocks, blocks*k) selector: row b sums rows b*k..b*k+k-1."""
    r, c = _iota2((blocks, k * blocks))
    return jnp.where(r == c // k, 1.0, 0.0)


def _mx(mat, rhs):
    """(m, K) @ (K, P) on the MXU in f32 (emulated via bf16 passes)."""
    from .rasterize_pallas2 import MXU_DOT_PRECISION

    return jax.lax.dot_general(
        mat, rhs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=MXU_DOT_PRECISION)


class PallasInputs4(NamedTuple):
    records_t: jax.Array   # (T, S, F)
    ids: jax.Array         # (T, S) int32 — per-tile gaussian ids
    counts: jax.Array      # (T,) int32 (clamped to s_max)
    cam_info: jax.Array    # (18,)


def _splat_dma(table_ref, ids_smem, cw_blk, chart_buf, chart_sem, c, k,
               slot):
    gid = ids_smem[c * CHUNK + k]
    return pltpu.make_async_copy(
        table_ref.at[pl.ds(gid * cw_blk, cw_blk)],
        chart_buf.at[slot, pl.ds(k * cw_blk, cw_blk)],
        chart_sem.at[slot])


def _chunk_dma_start(table_ref, ids_smem, cw_blk, chart_buf, chart_sem, c,
                     slot):
    if "dma" in _DEBUG_SKIP:
        return
    for k in range(CHUNK):
        _splat_dma(table_ref, ids_smem, cw_blk, chart_buf, chart_sem, c, k,
                   slot).start()


def _chunk_dma_wait(table_ref, ids_smem, cw_blk, chart_buf, chart_sem, c,
                    slot):
    if "dma" in _DEBUG_SKIP:
        return
    for k in range(CHUNK):
        _splat_dma(table_ref, ids_smem, cw_blk, chart_buf, chart_sem, c, k,
                   slot).wait()


IDS_TILE = 1024  # int32 1-D HBM tiling: DMA slices must be 1024-aligned


def _cg_lanes(ch_blk):
    """Per-splat chart-grad lane block: 3*ch_blk channel lanes rounded up to
    a 32-lane boundary, so 128//cg splats pack into one (cw, 128) block."""
    return -(-3 * ch_blk // 32) * 32


def _ids_pad(s_max):
    return -(-s_max // IDS_TILE) * IDS_TILE


def _fwd_kernel4(grid: TileGrid, s_max: int, ch_blk, cw_blk, counts_ref,
                 cam_ref, records_ref, ids_ref, table_ref, out_ref,
                 ncontrib_ref, ids_smem, chart_buf, chart_sem, ids_sem):
    t = pl.program_id(0)
    hsub, n_hb = _chart_blocks(ch_blk)
    g_rows = n_hb * cw_blk
    pix = grid.tile_h * grid.tile_w
    pr = pix // 128
    count = counts_ref[t]
    n_chunks = (count + CHUNK - 1) // CHUNK
    gx, gy, dirs = _pixel_rows(grid, t, cam_ref)
    k_iota = _row_iota((CHUNK, pix))

    ids_cp = pltpu.make_async_copy(
        ids_ref.at[pl.ds(pl.multiple_of(t * _ids_pad(s_max), IDS_TILE),
                         _ids_pad(s_max))], ids_smem, ids_sem)
    ids_cp.start()
    ids_cp.wait()

    @pl.when(n_chunks > 0)
    def _():
        _chunk_dma_start(table_ref, ids_smem, g_rows, chart_buf, chart_sem,
                         jnp.int32(0), jnp.int32(0))

    zrow = jnp.zeros((1, pix), jnp.float32)
    acc0 = {name: zrow for name in CH_NAMES if name != "t_final"}
    acc0["t_final"] = jnp.ones((1, pix), jnp.float32)  # frozen T
    carry0 = (jnp.int32(0), jnp.full((1, pix), s_max, jnp.int32),
              jnp.ones((1, pix), jnp.float32), acc0)

    def cond(carry):
        c, ncon, t_plain, acc = carry
        return jnp.logical_and(c < n_chunks, jnp.max(ncon) == s_max)

    def body(carry):
        c, ncon, t_plain, acc = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            _chunk_dma_start(table_ref, ids_smem, g_rows, chart_buf,
                             chart_sem, c + 1, jax.lax.rem(c + 1, 2))

        _chunk_dma_wait(table_ref, ids_smem, g_rows, chart_buf, chart_sem,
                        c, slot)

        base = pl.multiple_of(c * CHUNK, CHUNK)
        chunk = records_ref[0, pl.ds(base, CHUNK), :]        # (K, F)
        valid = (c * CHUNK + k_iota < count).astype(jnp.float32)
        r = _response2(chunk, valid, dirs, gx, gy,
                       mxu=bool(MXU_LEVEL & 4))
        cb = chart_buf[slot]                                 # (K*cw, 128)

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
            ncon, jnp.min(jnp.where(brk, s_glob, s_max), axis=0,
                          keepdims=True))
        t_froz = jnp.minimum(
            acc["t_final"],
            jnp.min(jnp.where(incl > T_EPS, incl, 2.0), axis=0,
                    keepdims=True))

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
        nrm_d = _dot_cols(chunk[:, 0:3], w * r["flip"])      # (3, P)

        # texel fetch: fold the blend weight into the x-axis bilinear
        # weights and accumulate full (ch, P) blocks; ONE row reduction per
        # channel per CHUNK instead of per splat. (1,P)-shaped ops run at
        # 1/8 sublane utilization on the VPU — avoid them in the loop.
        h_c = _rep(chunk[:, 26:27], pix)
        w_c = _rep(chunk[:, 27:28], pix)
        cg = _cg_lanes(hsub)
        tex = [jnp.zeros((hsub, pix), jnp.float32) for _ in range(3)]
        ks_fetch = [] if "fetch" in _DEBUG_SKIP else list(range(CHUNK))
        for k in ks_fetch:
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
        new_acc["n0"] = acc["n0"] + nrm_d[0:1, :]
        new_acc["n1"] = acc["n1"] + nrm_d[1:2, :]
        new_acc["n2"] = acc["n2"] + nrm_d[2:3, :]
        new_acc["reg"] = acc["reg"] + reg_add
        new_acc["alpha"] = acc["alpha"] + alpha_add
        new_acc["m1"] = acc["m1"] + m1_add
        new_acc["t_final"] = t_froz
        return (c + 1, ncon, incl[CHUNK - 1:CHUNK, :], new_acc)

    c_final, ncontrib, _, acc = jax.lax.while_loop(cond, body, carry0)

    @pl.when(c_final < n_chunks)
    def _():
        _chunk_dma_wait(table_ref, ids_smem, g_rows, chart_buf, chart_sem,
                        c_final, jax.lax.rem(c_final, 2))

    for i, name in enumerate(CH_NAMES):
        out_ref[0, pl.ds(i * pr, pr), :] = acc[name].reshape(pr, 128)
    ncontrib_ref[0] = ncontrib.reshape(pr, 128)


def rasterize_pallas4_fwd(grid: TileGrid, chart_pad, inputs: PallasInputs4,
                          table: jax.Array, interpret: bool = False):
    num_tiles, s_max, f = inputs.records_t.shape
    ch_blk = _ch_blk_of(chart_pad[0])
    cw_blk = -(-chart_pad[1] // 8) * 8
    g_rows = _chart_blocks(ch_blk)[1] * cw_blk
    pr = grid.tile_h * grid.tile_w // 128
    kernel = functools.partial(_fwd_kernel4, grid, s_max, ch_blk, cw_blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, s_max, F_REC), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, NCH * pr, 128), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, pr, 128), lambda t, c, cam: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((_ids_pad(s_max),), jnp.int32),
            pltpu.VMEM((2, CHUNK * g_rows, CH3_PAD), TABLE_DTYPE),
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
    ids_flat = jnp.pad(
        inputs.ids, ((0, 0), (0, _ids_pad(s_max) - s_max))).reshape(-1)
    out, ncontrib = out_call(inputs.counts, inputs.cam_info,
                             inputs.records_t, ids_flat, table)
    maps = {name: out[:, i * pr:(i + 1) * pr, :]
            for i, name in enumerate(CH_NAMES)}
    return maps, ncontrib


# ---------------------------------------------------------------------------
# forward-only eval kernel: rgb compositing channels only
# ---------------------------------------------------------------------------

# The training forward must emit every loss map plus the backward's replay
# state (ncontrib, frozen T, m1). Inference needs none of that: the eval /
# viewer / video-render paths composite ``img + tex + (1-alpha)*bg`` and
# optionally show depth. This kernel drops the distortion prefix scans, the
# normal accumulation, and the per-pixel break bookkeeping (early exit tests
# the carried transmittance row directly), and writes an 8-channel block —
# the reference has no analogous fast path (its fused kernel always computes
# all maps); this exists for the fps eval metric (`base_pipeline.py:374-378`
# timing semantics) and interactive viewing.
ECH_NAMES = ["img0", "img1", "img2", "tex0", "tex1", "tex2", "depth",
             "alpha"]
NECH = len(ECH_NAMES)


def _eval_kernel4(grid: TileGrid, s_max: int, ch_blk, cw_blk, counts_ref,
                  cam_ref, records_ref, ids_ref, table_ref, out_ref,
                  ids_smem, chart_buf, chart_sem, ids_sem):
    t = pl.program_id(0)
    hsub, n_hb = _chart_blocks(ch_blk)
    g_rows = n_hb * cw_blk
    pix = grid.tile_h * grid.tile_w
    pr = pix // 128
    count = counts_ref[t]
    n_chunks = (count + CHUNK - 1) // CHUNK
    gx, gy, dirs = _pixel_rows(grid, t, cam_ref)
    k_iota = _row_iota((CHUNK, pix))

    ids_cp = pltpu.make_async_copy(
        ids_ref.at[pl.ds(pl.multiple_of(t * _ids_pad(s_max), IDS_TILE),
                         _ids_pad(s_max))], ids_smem, ids_sem)
    ids_cp.start()
    ids_cp.wait()

    @pl.when(n_chunks > 0)
    def _():
        _chunk_dma_start(table_ref, ids_smem, g_rows, chart_buf, chart_sem,
                         jnp.int32(0), jnp.int32(0))

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
            _chunk_dma_start(table_ref, ids_smem, g_rows, chart_buf,
                             chart_sem, c + 1, jax.lax.rem(c + 1, 2))

        _chunk_dma_wait(table_ref, ids_smem, g_rows, chart_buf, chart_sem,
                        c, slot)

        base = pl.multiple_of(c * CHUNK, CHUNK)
        chunk = records_ref[0, pl.ds(base, CHUNK), :]        # (K, F)
        valid = (c * CHUNK + k_iota < count).astype(jnp.float32)
        r = _response2(chunk, valid, dirs, gx, gy,
                       mxu=bool(MXU_LEVEL & 4))
        cb = chart_buf[slot]                                 # (K*cw, 128)

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

        # blend weight folded into wx; one row reduction per channel per
        # chunk (see the train kernel's fetch note)
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
        _chunk_dma_wait(table_ref, ids_smem, g_rows, chart_buf, chart_sem,
                        c_final, jax.lax.rem(c_final, 2))

    for i, name in enumerate(ECH_NAMES):
        out_ref[0, pl.ds(i * pr, pr), :] = acc[name].reshape(pr, 128)


def rasterize_pallas4_eval(grid: TileGrid, chart_pad, inputs: PallasInputs4,
                           table: jax.Array, interpret: bool = False):
    """Forward-only render: {img,tex}x3 + depth + alpha maps, no residuals."""
    num_tiles, s_max, f = inputs.records_t.shape
    ch_blk = _ch_blk_of(chart_pad[0])
    cw_blk = -(-chart_pad[1] // 8) * 8
    g_rows = _chart_blocks(ch_blk)[1] * cw_blk
    pr = grid.tile_h * grid.tile_w // 128
    kernel = functools.partial(_eval_kernel4, grid, s_max, ch_blk, cw_blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, s_max, F_REC), lambda t, c, cam: (t, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, NECH * pr, 128), lambda t, c, cam: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((_ids_pad(s_max),), jnp.int32),
            pltpu.VMEM((2, CHUNK * g_rows, CH3_PAD), TABLE_DTYPE),
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
    ids_flat = jnp.pad(
        inputs.ids, ((0, 0), (0, _ids_pad(s_max) - s_max))).reshape(-1)
    (out,) = out_call(inputs.counts, inputs.cam_info, inputs.records_t,
                      ids_flat, table)
    return {name: out[:, i * pr:(i + 1) * pr, :]
            for i, name in enumerate(ECH_NAMES)}


def _bwd_kernel4(grid: TileGrid, s_max: int, ch_blk, cw_blk, tile0_ref,
                 counts_ref, cam_ref, records_ref, ids_ref, table_ref,
                 fwdout_ref, ncon_ref, gmaps_ref, drec_ref, dchart_ref,
                 ids_smem, tex_s, dx_s, dy_s, chart_buf, chart_sem, ids_sem):
    t = pl.program_id(0)
    pix = grid.tile_h * grid.tile_w
    pr = pix // 128
    count = counts_ref[t]
    # tile0: global index of this batch's first tile (the tile-batched
    # backward slices the tile axis; pixel coords need the global tile)
    gx, gy, dirs = _pixel_rows(grid, t + tile0_ref[0], cam_ref)
    d0, d1, d2 = dirs
    k_iota = _row_iota((CHUNK, pix))

    ids_cp = pltpu.make_async_copy(
        ids_ref.at[pl.ds(pl.multiple_of(t * _ids_pad(s_max), IDS_TILE),
                         _ids_pad(s_max))], ids_smem, ids_sem)
    ids_cp.start()

    hsub, n_hb = _chart_blocks(ch_blk)
    g_rows = n_hb * cw_blk
    cg = _cg_lanes(hsub)
    pack_n = CH3_PAD // cg
    drec_ref[0] = jnp.zeros((s_max, F_REC), jnp.float32)
    dchart_ref[0] = jnp.zeros((s_max * n_hb // pack_n * cw_blk, CH3_PAD),
                              jnp.float32)

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

    start = jnp.minimum(count, jnp.max(ncon) + 1)
    n_chunks = (start + CHUNK - 1) // CHUNK

    ids_cp.wait()

    @pl.when(n_chunks > 0)
    def _():
        _chunk_dma_start(table_ref, ids_smem, g_rows, chart_buf, chart_sem,
                         n_chunks - 1, jax.lax.rem(n_chunks - 1, 2))

    zrow = jnp.zeros((1, pix), jnp.float32)
    carry0 = (n_chunks - 1, t_final, zrow, zrow, zrow)

    def cond(carry):
        return carry[0] >= 0

    def body(carry):
        c, t_end, bs_c, e_c, d_c = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c - 1 >= 0)
        def _():
            _chunk_dma_start(table_ref, ids_smem, g_rows, chart_buf,
                             chart_sem, c - 1, jax.lax.rem(c - 1, 2))

        _chunk_dma_wait(table_ref, ids_smem, g_rows, chart_buf, chart_sem,
                        c, slot)

        base = pl.multiple_of(c * CHUNK, CHUNK)
        chunk = records_ref[0, pl.ds(base, CHUNK), :]        # (K, F)
        valid = (c * CHUNK + k_iota < count).astype(jnp.float32)
        r = _response2(chunk, valid, dirs, gx, gy,
                       mxu=bool(MXU_LEVEL & 4))
        cb = chart_buf[slot]

        a = r["alpha"]
        m = r["m"]
        t_hit = r["t"]
        fl = r["flip"]
        s_glob = c * CHUNK + k_iota
        applied = jnp.logical_and(a > 0.0, s_glob < ncon)
        one_minus = 1.0 - a
        # ONE (K,P) reciprocal; suffix-product of 1/q so t_k, d_alpha's
        # 1/(1-a) term, and t_start below are all multiplies (was 3 divides)
        inv_q = 1.0 / jnp.where(applied, one_minus, 1.0)
        s_inv = _sufprod_incl(inv_q)
        t_k = t_end * s_inv                                  # T before splat k
        w = jnp.where(applied, a * t_k, 0.0)
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

        # --- per-splat texel fetch + chart grads (static python loop;
        # inner loop over the n_hb chart h-blocks, n_hb=1 for charts <= 40
        # tall) ---
        h_c = _rep(chunk[:, 26:27], pix)
        w_c = _rep(chunk[:, 27:28], pix)
        x_raw_all = r["uv_u"] * h_c
        y_raw_all = r["uv_v"] * w_c
        a_io = _row_iota((hsub, pix)).astype(jnp.float32)
        b_io = _row_iota((cw_blk, pix)).astype(jnp.float32)
        pad_rows = cg - 3 * hsub
        d_chart_grp = []
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
            for b in range(n_hb):
                a_b = a_io + b * hsub
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(xg - a_b))   # (hsub, P)
                u = k * n_hb + b
                chart_kb = cb[u * cw_blk:(u + 1) * cw_blk,
                              0:cg].astype(jnp.float32)   # (cw, cg)
                tmp = _dot_cols(chart_kb, wy)                     # (cg, P)

                wxk = wx * wk      # blend weight folded once, (hsub, P)
                # pad_rows == 0 at hsub = 32 — (0, P) is an invalid
                # Mosaic vector type
                m2 = jnp.concatenate(
                    [wxk * g_tex[ci] for ci in range(3)]
                    + ([jnp.zeros((pad_rows, pix), jnp.float32)]
                       if pad_rows else []), axis=0)
                d_chart_grp.append(jax.lax.dot_general(
                    wy, m2, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))          # (cw, cg)
                if len(d_chart_grp) == pack_n:
                    g_idx = u // pack_n
                    if pack_n * cg < CH3_PAD:   # e.g. cg=96 multi-block
                        d_chart_grp.append(jnp.zeros(
                            (cw_blk, CH3_PAD - pack_n * cg), jnp.float32))
                    blk = jnp.concatenate(d_chart_grp, axis=1)    # (cw, 128)
                    cbase = pl.multiple_of(
                        (c * CHUNK * n_hb // pack_n + g_idx) * cw_blk, 8)
                    dchart_ref[0, pl.ds(cbase, cw_blk), :] = blk
                    d_chart_grp = []

                # coeff without wk (row-independent): multiply wk after
                # the row reduction instead of on every (hsub, P) row
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

            # five per-splat sublane reductions; batching them into one
            # block-ones MXU dot measured 36% SLOWER (16 small 6-pass dots
            # + a 40-row concat per splat lose to the VPU reduces)
            dx_s[k:k + 1, :] = wk * coeff_dx
            dy_s[k:k + 1, :] = _sum_rows(d_wy * dwy_dy)
            for ci in range(3):
                tex_s[ci, k:k + 1, :] = texk[ci]

        if "fetch" in _DEBUG_SKIP:
            zkp = jnp.zeros((CHUNK, pix), jnp.float32)
            tex_s[0], tex_s[1], tex_s[2] = zkp, zkp, zkp
            dx_s[:], dy_s[:] = zkp, zkp
        tex0, tex1, tex2 = tex_s[0], tex_s[1], tex_s[2]      # (K, P)
        rgb0 = _rep(chunk[:, 21:22], pix)
        rgb1 = _rep(chunk[:, 22:23], pix)
        rgb2 = _rep(chunk[:, 23:24], pix)
        n0 = _rep(chunk[:, 0:1], pix)
        n1 = _rep(chunk[:, 1:2], pix)
        n2 = _rep(chunk[:, 2:3], pix)
        op_c = _rep(chunk[:, 20:21], pix)

        s_direct = (rgb0 * g_img[0] + rgb1 * g_img[1] + rgb2 * g_img[2]
                    + tex0 * g_tex[0] + tex1 * g_tex[1] + tex2 * g_tex[2]
                    + t_hit * g_depth + g_alpha
                    + fl * (n0 * g_norm[0] + n1 * g_norm[1]
                            + n2 * g_norm[2]))
        s_k = s_direct + 2.0 * g_reg * ((m * big_a - big_c)
                                        + (d_k - m * e_k))
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
        # the winner's gaussian value IS r["g"]; surf_sel already encodes
        # the ellipse mask (arg_s = -1e30 outside -> sel false)
        d_g = op_c * d_op
        surf_sel = r["surf_sel"]
        dgs_eff = jnp.where(surf_sel, d_g, 0.0)
        d_u = -r["u"] * dgs_eff
        d_v = -r["v"] * dgs_eff
        dgc_eff = jnp.where(surf_sel, 0.0, d_g)
        d_xy0 = ((1.0 / AA_SIGMA2) * r["dpx"]) * dgc_eff
        d_xy1 = ((1.0 / AA_SIGMA2) * r["dpy"]) * dgc_eff

        # uv raw coords come back from the response (computed for the clip
        # there anyway); 1/tc and 1/nd likewise (divide deletion)
        u_pass = jnp.logical_and(r["uvu_raw"] >= 0.0, r["uvu_raw"] <= 1.0)
        v_pass = jnp.logical_and(r["uvv_raw"] >= 0.0, r["uvv_raw"] <= 1.0)
        d_uvu = jnp.where(u_pass, d_x * h_c, 0.0)
        d_uvv = jnp.where(v_pass, d_y * w_c, 0.0)

        kfac = REG_FAR / (REG_FAR - REG_NEAR)
        d_t = w * g_depth
        d_t = d_t + jnp.where(t_hit >= REG_NEAR,
                              d_m * (kfac * REG_NEAR)
                              * r["invtc"] * r["invtc"], 0.0)
        d_t = d_t + d_u * r["b1d"] + d_v * r["b2d"]
        d_t = d_t + d_uvu * r["b1ud"] + d_uvv * r["b2ud"]

        nd_pass = jnp.abs(r["nd"]) >= 1e-9
        d_an = d_t * r["inv_nd"]
        d_nd = jnp.where(nd_pass, -t_hit * d_an, 0.0)

        wfl = w * fl
        td0, td1, td2 = t_hit * d0, t_hit * d1, t_hit * d2
        # record fields 12-14 / 16-18 are the DETACHED uv direction
        # coefficients b1u/b2u (build_records wraps them in stop_gradient —
        # the reference's detached UV frame, gstex.py:975-990), so their
        # record grads are zeroed by the XLA transpose; don't compute them.
        # Fields 15/19 stay live through om = origin - mean.
        vals = [
            d_nd * d0 + wfl * g_norm[0],
            d_nd * d1 + wfl * g_norm[1],
            d_nd * d2 + wfl * g_norm[2],
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
            # binary-tree fold to one 128-lane tile (log2 depth — the VPU
            # op latency is ~360 cycles, so a sequential fold chain would
            # serialize), then one short in-lane reduce
            width = pix
            while width > 128:
                width //= 2
                v = v[:, 0:width] + v[:, width:2 * width]
            return jnp.sum(v, axis=1, keepdims=True)         # (K, 1)

        f_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, F_REC), 1)
        grad_chunk = jnp.zeros((CHUNK, F_REC), jnp.float32)
        if "reduce" not in _DEBUG_SKIP:
            for f, v in enumerate(vals):
                if v is None:
                    continue
                grad_chunk = grad_chunk + jnp.where(
                    f_iota == f, _rep(lane_sum(v), F_REC), 0.0)
        drec_ref[0, pl.ds(base, CHUNK), :] = grad_chunk

        t_start = t_end * s_inv[0:1, :]
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


def rasterize_pallas4_bwd(grid: TileGrid, chart_pad, counts, cam_info,
                          records_t, ids, table, fwd_out, ncontrib, gmaps,
                          interpret: bool = False, tile0=None):
    num_tiles, s_max, f = records_t.shape
    ch_blk = _ch_blk_of(chart_pad[0])
    cw_blk = -(-chart_pad[1] // 8) * 8
    hsub, n_hb = _chart_blocks(ch_blk)
    g_rows = n_hb * cw_blk
    pack_n = CH3_PAD // _cg_lanes(hsub)
    assert (s_max * n_hb) % pack_n == 0
    pix = grid.tile_h * grid.tile_w
    pr = pix // 128
    kernel = functools.partial(_bwd_kernel4, grid, s_max, ch_blk, cw_blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, s_max, F_REC), lambda t, t0, c, cam: (t, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, NCH * pr, 128), lambda t, t0, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, pr, 128), lambda t, t0, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, NG * pr, 128), lambda t, t0, c, cam: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, s_max, F_REC), lambda t, t0, c, cam: (t, 0, 0)),
            pl.BlockSpec((1, s_max * n_hb // pack_n * cw_blk, CH3_PAD),
                         lambda t, t0, c, cam: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((_ids_pad(s_max),), jnp.int32),
            pltpu.VMEM((3, CHUNK, pix), jnp.float32),
            pltpu.VMEM((CHUNK, pix), jnp.float32),
            pltpu.VMEM((CHUNK, pix), jnp.float32),
            pltpu.VMEM((2, CHUNK * g_rows, CH3_PAD), TABLE_DTYPE),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    bwd_call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(records_t.shape, jnp.float32),
            jax.ShapeDtypeStruct(
                (num_tiles, s_max * n_hb // pack_n * cw_blk, CH3_PAD),
                jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    ids_flat = jnp.pad(ids, ((0, 0), (0, _ids_pad(s_max) - s_max))
                       ).reshape(-1)
    if tile0 is None:
        tile0 = jnp.zeros((1,), jnp.int32)
    d_records, d_charts = bwd_call(tile0, counts, cam_info, records_t,
                                   ids_flat, table, fwd_out, ncontrib, gmaps)
    return d_records, d_charts
