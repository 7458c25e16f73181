"""Eval image metrics: PSNR / SSIM / LPIPS with uint8 quantization.

Mirrors ``get_image_metrics_and_images`` (reference
``nerfstudio/models/gstex.py:1337-1403``): the prediction is quantized to
uint8 before metrics (1380-1381). LPIPS is the exact AlexNet LPIPS v0.1
(``utils/lpips.py``, matching the reference's torchmetrics LPIPS); it
needs a pretrained-weight npz — in this zero-egress environment none can
be downloaded, so when no npz is found the key is reported as ``None``
(an explicit ``lpips: null`` in eval JSON keeps the schema stable for
downstream tables; never a stand-in number that would be incomparable to
the reference's metric).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.ssim import psnr as _psnr, ssim as _ssim

_lpips_model = None
_lpips_checked = False


def quantize_uint8(img):
    q = (255.0 * jnp.clip(img, 0.0, 1.0)).astype(jnp.uint8)
    return q.astype(jnp.float32) / 255.0


def image_metrics(pred, gt) -> dict:
    pred_q = quantize_uint8(pred)
    return {
        "psnr": float(_psnr(gt, pred_q)),
        "ssim": float(_ssim(gt, pred_q)),
        # None (JSON null) when no weight npz is available — stable schema
        "lpips": lpips(pred_q, gt),
    }


def lpips(pred, gt):
    """Real AlexNet LPIPS when a weight npz is available (GSTEX_LPIPS_NPZ
    or weights/lpips_alex.npz — see tools/export_lpips.py); else None."""
    global _lpips_model, _lpips_checked
    if not _lpips_checked:
        from . import lpips as lpips_mod

        _lpips_model = lpips_mod.find()
        _lpips_checked = True
    if _lpips_model is None:
        return None
    return float(_lpips_model(pred, gt))
