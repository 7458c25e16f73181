"""LPIPS exactness: the JAX implementation must match a torch mirror of
the published LPIPS v0.1 (alex) computation to float tolerance.

The environment is zero-egress, so the PRETRAINED weights cannot exist
here; exactness is proven with random weights of the true shapes — the
real npz (tools/export_lpips.py) then drops in without code changes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gstex_tpu.utils import lpips as lpips_mod


def random_weights(rng):
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    w = {}
    for i, s in enumerate(shapes):
        w[f"conv{i}_w"] = rng.normal(size=s).astype(np.float32) * 0.05
        w[f"conv{i}_b"] = rng.normal(size=s[0]).astype(np.float32) * 0.1
        w[f"lin{i}_w"] = np.abs(
            rng.normal(size=s[0]).astype(np.float32)) * 0.01
    return w


def torch_lpips(w, img0, img1):
    """Literal torch transcription of LPIPS v0.1 alex (paper / reference
    torchmetrics semantics)."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
    scale = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]
    cfg = [(4, 2, False), (1, 2, True), (1, 1, True), (1, 1, False),
           (1, 1, False)]

    def feats(x):
        x = x.permute(2, 0, 1)[None] * 2 - 1
        x = (x - shift) / scale
        taps = []
        for i, (stride, pad, pool_before) in enumerate(cfg):
            if pool_before:
                x = F.max_pool2d(x, 3, stride=2)
            x = F.conv2d(x, torch.from_numpy(w[f"conv{i}_w"]),
                         torch.from_numpy(w[f"conv{i}_b"]),
                         stride=stride, padding=pad)
            x = F.relu(x)
            n = torch.sqrt((x * x).sum(1, keepdim=True))
            taps.append(x / (n + 1e-10))
        return taps

    a = feats(torch.from_numpy(img0))
    b = feats(torch.from_numpy(img1))
    total = 0.0
    for i, (xa, xb) in enumerate(zip(a, b)):
        lin = torch.from_numpy(w[f"lin{i}_w"])[None, :, None, None]
        total += ((xa - xb) ** 2 * lin).sum(1).mean().item()
    return total


def test_lpips_matches_torch_mirror():
    rng = np.random.default_rng(0)
    w = random_weights(rng)
    img0 = rng.random((64, 96, 3)).astype(np.float32)
    img1 = np.clip(img0 + 0.1 * rng.random((64, 96, 3)).astype(np.float32),
                   0, 1)
    ours = lpips_mod.LPIPS(w)(img0, img1)
    ref = torch_lpips(w, img0, img1)
    assert ours == pytest.approx(ref, rel=1e-4)
    assert ours > 0


def test_lpips_zero_for_identical():
    rng = np.random.default_rng(1)
    w = random_weights(rng)
    img = rng.random((35, 41, 3)).astype(np.float32)  # odd dims
    assert lpips_mod.LPIPS(w)(img, img) == pytest.approx(0.0, abs=1e-6)


def test_lpips_find_env(tmp_path, monkeypatch):
    rng = np.random.default_rng(2)
    w = random_weights(rng)
    p = tmp_path / "w.npz"
    np.savez(p, **w)
    monkeypatch.setenv("GSTEX_LPIPS_NPZ", str(p))
    model = lpips_mod.find()
    assert model is not None
    img = rng.random((32, 32, 3)).astype(np.float32)
    assert model(img, img * 0.5) > 0
