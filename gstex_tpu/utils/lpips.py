"""LPIPS (Learned Perceptual Image Patch Similarity), AlexNet variant.

Exact re-implementation of LPIPS v0.1 (Zhang et al., CVPR 2018) in JAX —
the eval metric the reference reports via ``torchmetrics``
(``nerfstudio/models/gstex.py:1337-1403``; logged by the experiment runner,
``scripts/utils.py:75``). Computation per the paper / reference repo:

1. inputs scaled to [-1, 1], then normalized by the fixed LPIPS
   shift/scale constants;
2. AlexNet feature stack (5 conv stages, taps after each ReLU);
3. per-tap unit-normalization over channels;
4. squared differences weighted by the learned non-negative 1x1 "lin"
   weights, spatially averaged, summed over taps.

Weights are loaded from an ``.npz`` (this is a zero-egress environment —
the pretrained AlexNet + lin weights cannot be downloaded here; export one
with ``tools/export_lpips.py`` on a machine that has ``torchvision`` and
``lpips`` installed, or point ``GSTEX_LPIPS_NPZ`` at an existing file).
The architecture itself is tested for exactness against a torch mirror
with random weights (``tests/test_lpips.py``), so a real weight file drops
in without code changes.
"""

from __future__ import annotations

import os
from functools import partial
from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

# fixed input normalization (lpips.ScalingLayer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature config: (out_ch, kernel, stride, pad, maxpool_before)
_ALEX_CFG = [
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]
CHANNELS = [c for c, *_ in _ALEX_CFG]


def _conv(x, w, b, stride, pad):
    # x (1, C, H, W), w (O, I, kh, kw) — torch layout
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b[None, :, None, None]


def _maxpool3x3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        padding="VALID")


def _features(weights, x):
    """The 5 unit-normalized feature taps for x (1, 3, H, W) in [-1, 1]."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / jnp.asarray(
        _SCALE)[None, :, None, None]
    taps = []
    for i, (_, _, stride, pad, pool_before) in enumerate(_ALEX_CFG):
        if pool_before:
            x = _maxpool3x3s2(x)
        x = _conv(x, weights[f"conv{i}_w"], weights[f"conv{i}_b"],
                  stride, pad)
        x = jax.nn.relu(x)
        norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
        taps.append(x / (norm + 1e-10))
    return taps


@partial(jax.jit, static_argnums=())
def _lpips_pair(weights, a, b):
    fa = _features(weights, a)
    fb = _features(weights, b)
    total = jnp.float32(0.0)
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        d2 = (xa - xb) ** 2                               # (1, C, h, w)
        lin = weights[f"lin{i}_w"]                        # (C,)
        val = jnp.sum(d2 * lin[None, :, None, None], axis=1)
        total = total + jnp.mean(val)
    return total


class LPIPS:
    """Callable LPIPS metric. ``weights`` maps conv{i}_w (O,I,kh,kw) f32,
    conv{i}_b (O,), lin{i}_w (C,) for i in 0..4."""

    def __init__(self, weights: dict):
        expect = {f"conv{i}_{s}" for i in range(5) for s in ("w", "b")}
        expect |= {f"lin{i}_w" for i in range(5)}
        missing = expect - set(weights)
        if missing:
            raise ValueError(f"LPIPS weights missing keys: {sorted(missing)}")
        self.weights = {k: jnp.asarray(v, jnp.float32)
                        for k, v in weights.items() if k in expect}

    def __call__(self, img0, img1) -> float:
        """LPIPS distance between two (H, W, 3) images in [0, 1]."""
        a = jnp.asarray(img0, jnp.float32).transpose(2, 0, 1)[None] * 2 - 1
        b = jnp.asarray(img1, jnp.float32).transpose(2, 0, 1)[None] * 2 - 1
        return float(_lpips_pair(self.weights, a, b))


def load(path) -> LPIPS:
    return LPIPS(dict(np.load(path)))


_DEFAULT_PATHS = [
    Path(__file__).resolve().parents[2] / "weights" / "lpips_alex.npz",
    Path.home() / ".cache" / "gstex_tpu" / "lpips_alex.npz",
]


def find() -> Optional[LPIPS]:
    """Locate an LPIPS weight npz (GSTEX_LPIPS_NPZ env var, then default
    paths). Returns None when no weights are available (zero-egress)."""
    cands = []
    env = os.environ.get("GSTEX_LPIPS_NPZ")
    if env:
        cands.append(Path(env))
    cands.extend(_DEFAULT_PATHS)
    for p in cands:
        if p.is_file():
            return load(p)
    return None
