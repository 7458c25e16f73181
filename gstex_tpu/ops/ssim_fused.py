"""Fused SSIM loss + gradient as one Pallas TPU kernel.

The XLA-conv SSIM (``ops/ssim.py``) costs ~12.3 ms/step at 800² in the
train step (round-4 trace: 42 conv/elementwise slices across fwd+bwd).
The reference trains with a fused CUDA SSIM for the same reason
(``gstex/nerfstudio/models/gstex.py:351`` uses pytorch_msssim's windowed
formula; fused-ssim kernels are the standard replacement). This kernel
computes the scalar mean-SSIM AND its gradient w.r.t. the prediction in
a single pass over row bands — all five Gaussian blurs (mu1, mu2, x²,
y², xy), the SSIM rational map, and the three adjoint blurs stay in
VMEM; HBM traffic is one read of each image and one write of the
gradient.

Semantics match ``pytorch_msssim.SSIM(data_range=1.0)`` exactly as
``ops/ssim.py`` does: 11×11 Gaussian window (sigma=1.5), VALID padding,
K1/K2 = 0.01/0.03, mean over (H-10, W-10, C) window positions.

Layout: images are processed as (H, W*C) with channels interleaved on
lanes — the natural bitcast of an (H, W, C) row-major image — so the
x-axis blur is a lane-roll FMA chain with stride C and all channels ride
one pass. Lane wrap-around from the rolls lands exactly in the
C*(WIN-1) invalid-column margin (WC - C*(W-10) = 30 lanes for C=3), so
masking the map columns is sufficient; no padding copies are needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 11
R = WIN - 1          # valid-window margin (10)
HALO = 16            # 8-aligned DMA halo covering the R-row reach
K1, K2 = 0.01, 0.03


def _window(sigma: float = 1.5):
    x = np.arange(WIN, dtype=np.float64) - (WIN - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return tuple((g / g.sum()).astype(np.float32).tolist())


def _pick_band(h: int) -> int | None:
    """Output rows per program: multiple of 8 dividing H with H >= BH+32
    (the window must fit inside the image). None = shapes unsupported."""
    for bh in (80, 64, 96, 48, 112, 40, 56, 72, 88, 104, 32, 24, 16, 8):
        if h % bh == 0 and h >= bh + 2 * HALO:
            return bh
    return None


def fused_ssim_supported(shape) -> bool:
    h, w, c = shape
    return (_pick_band(h) is not None and w - R > 0
            and c * (w - R) >= 2 and h > R)


def _kernel(H, W, C, BH, WCP, taps, data_range, x_hbm, y_hbm, loss_ref,
            grad_ref, x_win, y_win, g_scr, sem_x, sem_y):
    WH = BH + 2 * HALO
    WC = WCP              # lane-padded working width (>= W*C, 128-aligned)
    t = pl.program_id(0)
    r0 = t * BH
    base = jnp.clip(r0 - HALO, 0, H - WH)
    local_r = r0 - base

    cx = pltpu.make_async_copy(x_hbm.at[pl.ds(pl.multiple_of(base, 8), WH)],
                               x_win, sem_x)
    cy = pltpu.make_async_copy(y_hbm.at[pl.ds(pl.multiple_of(base, 8), WH)],
                               y_win, sem_y)
    cx.start()
    cy.start()
    cx.wait()
    cy.wait()

    def blur_x(q, sign=-1):
        out = taps[0] * q
        for k in range(1, WIN):
            # roll(q, s)[i] = q[i - s]; negative shifts expressed modularly
            out = out + taps[k] * pltpu.roll(q, (sign * C * k) % WC, axis=1)
        return out

    def blur_y(q, sign=-1):
        out = taps[0] * q
        for k in range(1, WIN):
            out = out + taps[k] * pltpu.roll(q, (sign * k) % WH, axis=0)
        return out

    def blur(q):
        return blur_y(blur_x(q))

    def blur_t(q):          # adjoint: full-padding correlation
        return blur_y(blur_x(q, sign=1), sign=1)

    x = x_win[...]
    y = y_win[...]
    mu1 = blur(x)
    mu2 = blur(y)
    t1 = blur(x * x)
    t2 = blur(y * y)
    t12 = blur(x * y)

    c1 = jnp.float32((K1 * data_range) ** 2)
    c2 = jnp.float32((K2 * data_range) ** 2)
    s1 = t1 - mu1 * mu1
    s2 = t2 - mu2 * mu2
    s12 = t12 - mu1 * mu2
    a1 = 2.0 * mu1 * mu2 + c1
    b1 = mu1 * mu1 + mu2 * mu2 + c1
    a2 = 2.0 * s12 + c2
    b2 = s1 + s2 + c2
    inv_bb = 1.0 / (b1 * b2)
    s_map = a1 * a2 * inv_bb

    lr = jax.lax.broadcasted_iota(jnp.int32, (WH, WC), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (WH, WC), 1)
    gr = base + lr
    col_ok = lane < C * (W - R)
    map_ok = jnp.logical_and(col_ok, gr < H - R)
    in_band = jnp.logical_and(lr >= local_r, lr < local_r + BH)

    m = jnp.float32((H - R) * (W - R) * C)
    part = jnp.sum(
        jnp.where(jnp.logical_and(map_ok, in_band), s_map, 0.0)) / m
    loss_ref[...] = jnp.full((1, 8, 128), part, jnp.float32)

    # window-position partials of mean-SSIM (g rows outside
    # [local_r-R, local_r+BH) are zeroed so the circular rolls of the
    # adjoint only ever pull masked-zero values into used rows)
    g_ok = jnp.logical_and(
        map_ok, jnp.logical_and(lr >= local_r - R, lr < local_r + BH))
    ds_da2 = a1 * inv_bb
    ds_db2 = -s_map / b2
    ds_da1 = a2 * inv_bb
    ds_db1 = -s_map / b1
    g_t1 = jnp.where(g_ok, ds_db2, 0.0)
    g_t12 = jnp.where(g_ok, 2.0 * ds_da2, 0.0)
    g_mu1 = jnp.where(
        g_ok,
        2.0 * (mu2 * ds_da1 + mu1 * ds_db1 - mu1 * ds_db2 - mu2 * ds_da2),
        0.0)

    g_scr[...] = (blur_t(g_mu1) + 2.0 * x * blur_t(g_t1)
                  + y * blur_t(g_t12)) * (1.0 / m)
    grad_ref[...] = g_scr[pl.ds(pl.multiple_of(local_r, 8), BH), :]


@functools.partial(jax.jit, static_argnames=("data_range", "interpret"))
def _fused_ssim_run(pred, gt, data_range=1.0, interpret=False):
    h, w, c = pred.shape
    bh = _pick_band(h)
    wc = w * c
    # manual DMA windows require 128-aligned lane widths; the pad lanes
    # are zeros and live past the C*(WIN-1) invalid-column margin the
    # masks already exclude
    wcp = -(-wc // 128) * 128
    nb = h // bh
    x2 = jnp.pad(pred.reshape(h, wc), ((0, 0), (0, wcp - wc)))
    y2 = jnp.pad(gt.reshape(h, wc), ((0, 0), (0, wcp - wc)))
    kern = functools.partial(_kernel, h, w, c, bh, wcp, _window(),
                             data_range)
    loss_parts, grad = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0)),
            pl.BlockSpec((bh, wcp), lambda t: (t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((h, wcp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bh + 2 * HALO, wcp), jnp.float32),
            pltpu.VMEM((bh + 2 * HALO, wcp), jnp.float32),
            pltpu.VMEM((bh + 2 * HALO, wcp), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x2, y2)
    return jnp.sum(loss_parts[:, 0, 0]), grad[:, :wc].reshape(h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_ssim(pred, gt, data_range=1.0, interpret=False):
    """Mean SSIM over an (H, W, C) pair; gradient w.r.t. ``pred`` only
    (the training loss differentiates the render, never the GT)."""
    loss, _ = _fused_ssim_run(pred, gt, data_range, interpret)
    return loss


def _fwd(pred, gt, data_range, interpret):
    loss, grad = _fused_ssim_run(pred, gt, data_range, interpret)
    return loss, (grad, gt)


def _bwd(data_range, interpret, res, g):
    grad, gt = res
    return g * grad, jnp.zeros_like(gt)


fused_ssim.defvjp(_fwd, _bwd)
