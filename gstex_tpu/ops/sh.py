"""Real spherical harmonics for view-dependent color (pure jnp).

Covers ``gstex_cuda.sh.spherical_harmonics`` / ``num_sh_bases`` (call sites:
reference ``nerfstudio/models/gstex.py:32,307,1103-1111``). Constants follow
the 3DGS/gsplat convention. In GStex the SH *dc* coefficient is zeroed in the
view-dependent term — the albedo (including the +0.5 offset) lives in the
per-texel texture (``gstex.py:1100,1119``) — so no ``+0.5``/clamp is applied
here, matching ``gstex.py:1109-1112``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)

MAX_SH_DEGREE = 3


def num_sh_bases(degree: int) -> int:
    """(degree+1)^2, mirroring ``gstex_cuda.sh.num_sh_bases``."""
    return (degree + 1) ** 2


def rgb_to_sh(rgb: jax.Array) -> jax.Array:
    """RGB in [0,1] -> dc coefficient (``gstex.py:86-91``)."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jax.Array) -> jax.Array:
    """dc coefficient -> RGB (``gstex.py:94-99``)."""
    return sh * C0 + 0.5


def eval_sh_bases(dirs: jax.Array) -> jax.Array:
    """Evaluate all 16 real SH basis functions at unit directions.

    Args:
        dirs: (..., 3) unit vectors.
    Returns:
        (..., 16) basis values (degree 0..3, 3DGS sign convention).
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    b = [
        jnp.full_like(x, C0),
        -C1 * y,
        C1 * z,
        -C1 * x,
        C2[0] * xy,
        C2[1] * yz,
        C2[2] * (2.0 * zz - xx - yy),
        C2[3] * xz,
        C2[4] * (xx - yy),
        C3[0] * y * (3.0 * xx - yy),
        C3[1] * xy * z,
        C3[2] * y * (4.0 * zz - xx - yy),
        C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
        C3[4] * x * (4.0 * zz - xx - yy),
        C3[5] * z * (xx - yy),
        C3[6] * x * (xx - 3.0 * yy),
    ]
    return jnp.stack(b, axis=-1)


def spherical_harmonics(active_degree: jax.Array | int, dirs: jax.Array,
                        coeffs: jax.Array) -> jax.Array:
    """View-dependent color from SH coefficients.

    Args:
        active_degree: scalar int (may be traced) — degree schedule
            ``min(step // sh_degree_interval, sh_degree)`` (``gstex.py:1103``).
        dirs: (..., 3) unit view directions (``gstex.py:1101-1102``).
        coeffs: (..., K, 3) SH coefficients, K = num_sh_bases(max degree).
    Returns:
        (..., 3) color (unclamped, no offset — see module docstring).
    """
    k = coeffs.shape[-2]
    bases = eval_sh_bases(dirs)[..., :k]
    # mask out bases above the active degree (jit-friendly degree schedule)
    basis_degree = jnp.array(
        [d for d in range(MAX_SH_DEGREE + 1) for _ in range(2 * d + 1)],
        dtype=jnp.int32)[:k]
    mask = (basis_degree <= active_degree).astype(bases.dtype)
    bases = bases * mask
    return jnp.einsum("...k,...kc->...c", bases, coeffs)
