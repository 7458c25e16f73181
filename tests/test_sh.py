import jax
import jax.numpy as jnp
import numpy as np

from gstex_tpu.ops.sh import (
    eval_sh_bases,
    num_sh_bases,
    rgb_to_sh,
    sh_to_rgb,
    spherical_harmonics,
)


def test_num_sh_bases():
    assert [num_sh_bases(d) for d in range(4)] == [1, 4, 9, 16]


def test_rgb_sh_roundtrip():
    rgb = jnp.array([[0.1, 0.5, 0.9]])
    np.testing.assert_allclose(sh_to_rgb(rgb_to_sh(rgb)), rgb, atol=1e-6)


def test_sh_orthonormality():
    # Monte-Carlo: ∫ Y_i Y_j dΩ = δ_ij  (uniform sphere sampling, 4π measure)
    key = jax.random.key(0)
    dirs = jax.random.normal(key, (100000, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    b = eval_sh_bases(dirs)  # (M,16)
    gram = 4 * jnp.pi * (b.T @ b) / dirs.shape[0]
    np.testing.assert_allclose(np.asarray(gram), np.eye(16), atol=0.05)


def test_degree_masking():
    dirs = jnp.array([[0.0, 0.0, 1.0], [0.6, 0.8, 0.0]])
    coeffs = jax.random.normal(jax.random.key(1), (2, 16, 3))
    # degree 0 only: constant term
    out0 = spherical_harmonics(0, dirs, coeffs)
    expected0 = 0.28209479177387814 * coeffs[:, 0, :]
    np.testing.assert_allclose(np.asarray(out0), np.asarray(expected0), atol=1e-6)
    # full degree equals manual contraction
    out3 = spherical_harmonics(3, dirs, coeffs)
    manual = jnp.einsum("nk,nkc->nc", eval_sh_bases(dirs), coeffs)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(manual), atol=1e-6)
    # degree argument can be traced
    out_j = jax.jit(spherical_harmonics)(jnp.int32(3), dirs, coeffs)
    np.testing.assert_allclose(np.asarray(out_j), np.asarray(manual), atol=1e-6)
