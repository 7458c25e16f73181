"""Eval image metrics: PSNR / SSIM / LPIPS with uint8 quantization.

Mirrors ``get_image_metrics_and_images`` (reference
``nerfstudio/models/gstex.py:1337-1403``): the prediction is quantized to
uint8 before metrics (1380-1381). LPIPS needs pretrained AlexNet weights;
in a zero-egress environment it degrades gracefully to None.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops.ssim import psnr as _psnr, ssim as _ssim

_lpips_model = None
_lpips_failed = False


def quantize_uint8(img):
    q = (255.0 * jnp.clip(img, 0.0, 1.0)).astype(jnp.uint8)
    return q.astype(jnp.float32) / 255.0


def image_metrics(pred, gt) -> dict:
    pred_q = quantize_uint8(pred)
    out = {
        "psnr": float(_psnr(gt, pred_q)),
        "ssim": float(_ssim(gt, pred_q)),
    }
    lp = lpips(pred_q, gt)
    if lp is not None:
        out["lpips"] = lp
    return out


def lpips(pred, gt):
    """AlexNet LPIPS via torch-cpu if pretrained weights are available
    locally; otherwise None (zero-egress gate)."""
    global _lpips_model, _lpips_failed
    if _lpips_failed:
        return None
    if _lpips_model is None:
        try:
            import torch
            from torchvision.models import alexnet

            net = alexnet(weights="IMAGENET1K_V1").features.eval()
            _lpips_model = ("alex_features", net, torch)
        except Exception:
            _lpips_failed = True
            return None
    _, net, torch = _lpips_model
    # Simplified perceptual distance on normalized AlexNet features
    # (unit-normalized channel differences averaged over layers — the LPIPS
    # structure with uniform linear weights; exact LPIPS lin weights are not
    # shipped offline).
    def prep(x):
        x = torch.from_numpy(np.asarray(x, np.float32)).permute(2, 0, 1)[None]
        mean = torch.tensor([0.485, 0.456, 0.406])[None, :, None, None]
        std = torch.tensor([0.229, 0.224, 0.225])[None, :, None, None]
        return (x - mean) / std

    layers = [1, 4, 7, 9, 11]
    with torch.no_grad():
        xa, xb = prep(pred), prep(gt)
        dist = 0.0
        for i, layer in enumerate(net):
            xa, xb = layer(xa), layer(xb)
            if i in layers:
                fa = xa / (xa.norm(dim=1, keepdim=True) + 1e-10)
                fb = xb / (xb.norm(dim=1, keepdim=True) + 1e-10)
                dist = dist + ((fa - fb) ** 2).sum(1).mean().item()
    return float(dist / len(layers))
