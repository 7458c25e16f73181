"""SSIM against an independent numpy implementation (pytorch_msssim parity
formula: 11×11 Gaussian σ=1.5, valid padding, K1/K2 = 0.01/0.03)."""

import numpy as np

import jax.numpy as jnp

from gstex_tpu.ops.ssim import psnr, ssim


def ssim_numpy(img1, img2, win_size=11, sigma=1.5, data_range=1.0):
    x = np.arange(win_size) - win_size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    win = np.outer(g, g)

    def blur(im):
        h, w, c = im.shape
        oh, ow = h - win_size + 1, w - win_size + 1
        out = np.zeros((oh, ow, c))
        for i in range(win_size):
            for j in range(win_size):
                out += win[i, j] * im[i:i + oh, j:j + ow]
        return out

    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    mu1, mu2 = blur(img1), blur(img2)
    s1 = blur(img1 * img1) - mu1 ** 2
    s2 = blur(img2 * img2) - mu2 ** 2
    s12 = blur(img1 * img2) - mu1 * mu2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)
         / ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2)))
    return m.mean()


def test_ssim_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (40, 52, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = ssim_numpy(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_ssim_identical_is_one():
    a = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (32, 32, 3)),
                    jnp.float32)
    assert abs(float(ssim(a, a)) - 1.0) < 1e-6


def test_psnr():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)


def test_fused_ssim_matches_xla_value_and_grad():
    """ops/ssim_fused.py (interpret mode) vs the XLA-conv ssim + autodiff:
    the training loss swaps implementations, so value AND gradient must
    agree to float roundoff."""
    import jax

    from gstex_tpu.ops.ssim_fused import fused_ssim, fused_ssim_supported

    rng = np.random.default_rng(2)
    for shape in ((120, 64, 3), (160, 40, 3)):
        assert fused_ssim_supported(shape)
        a = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
        b = jnp.asarray(np.clip(a + rng.normal(0, 0.1, shape), 0,
                                1).astype(np.float32))
        v0, g0 = jax.value_and_grad(lambda x: ssim(x, b))(a)
        v1, g1 = jax.value_and_grad(
            lambda x: fused_ssim(x, b, 1.0, True))(a)
        np.testing.assert_allclose(float(v0), float(v1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                   atol=1e-8)


def test_fused_ssim_unsupported_shapes():
    from gstex_tpu.ops.ssim_fused import fused_ssim_supported

    assert not fused_ssim_supported((30, 64, 3))   # H < BH + 32
    assert not fused_ssim_supported((41, 64, 3))   # no dividing band
