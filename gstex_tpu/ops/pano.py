"""Equirectangular / omnidirectional-stereo rendering via cubemap faces.

The reference generates per-pixel spherical rays for these camera types
(``nerfstudio/cameras/cameras.py:805-816``) and ray-marches them; our tile
rasterizer needs rays affine in pixel coordinates (one pinhole frustum per
tile). The TPU-native route: render SIX 90-degree pinhole faces with the
production kernels and resample them into the lat-long grid — exact up to
the bilinear resample (each equirect texel's ray is evaluated against the
face that contains it; face renders supersample at ``face_res``).

ODS (omni-directional stereo) is approximated per cube face: each face's
eye sits at ``±ipd/2`` along the face's tangential baseline (the cross of
view direction and up) — piecewise-constant viewpoint over 90-degree
sectors instead of the reference's per-ray circle offset. The deviation is
documented here; at typical ipd/scene-scale ratios the seam error is
sub-pixel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera, make_camera

# face rotations in the OpenCV-style camera frame (+z fwd, +y down, +x
# right): columns map face-local axes into the base camera frame; the face
# FORWARD is M[:, 2].
_FACES = np.array([
    [[1, 0, 0], [0, 1, 0], [0, 0, 1]],      # front  (+z)
    [[0, 0, 1], [0, 1, 0], [-1, 0, 0]],     # right  (+x)
    [[0, 0, -1], [0, 1, 0], [1, 0, 0]],     # left   (-x)
    [[1, 0, 0], [0, 0, -1], [0, 1, 0]],     # up     (-y is up in OpenCV)
    [[1, 0, 0], [0, 0, 1], [0, -1, 0]],     # down   (+y)
    [[-1, 0, 0], [0, 1, 0], [0, 0, -1]],    # back   (-z)
], np.float32)

_FLIP = np.diag([1.0, -1.0, -1.0]).astype(np.float32)


def face_cameras(c2w, face_res: int, ipd: float = 0.0):
    """Six 90-degree pinhole cameras covering the sphere around ``c2w``'s
    origin. ``ipd`` != 0 offsets each face's center by ipd/2 along its
    tangential baseline (ODS approximation; sign picks the eye)."""
    c2w = np.asarray(c2w, np.float32)
    r_cv = c2w[:3, :3] @ _FLIP        # world <- cam(cv)
    origin = c2w[:3, 3]
    f = face_res / 2.0
    cams = []
    for m in _FACES:
        r_face = r_cv @ m
        fwd_w = r_face[:, 2]
        # tangential baseline: view x world-up (degenerate at poles ->
        # fall back to the face's own x axis)
        up = np.array([0.0, 1.0, 0.0], np.float32)
        base = np.cross(fwd_w, up)
        nrm = np.linalg.norm(base)
        baseline = base / nrm if nrm > 1e-6 else r_face[:, 0]
        o = origin + 0.5 * ipd * baseline
        c2w_face = np.concatenate(
            [r_face @ _FLIP, o[:, None]], axis=1)
        cams.append(make_camera(f, f, face_res / 2, face_res / 2,
                                face_res, face_res, c2w_face))
    return cams


def equirect_dirs_cam(height: int, width: int):
    """Camera-frame (OpenCV) unit directions of the lat-long grid — the
    reference's spherical parameterization (``cameras.py:805-816``) with
    fx = fy = height = width/2."""
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32),
                          indexing="ij")
    fx = fy = width / 2.0
    x = (xs + 0.5 - width / 2.0) / fx
    y = (ys + 0.5 - height / 2.0) / fy
    theta = -jnp.pi * x
    phi = jnp.pi * (0.5 + y)
    return jnp.stack([
        -jnp.sin(theta) * jnp.sin(phi),
        -jnp.cos(phi),
        jnp.cos(theta) * jnp.sin(phi),
    ], axis=-1)                                       # (H, W, 3)


def compose_equirect(face_imgs, height: int, width: int):
    """Resample six (F, F, C) face images into the (height, width, C)
    lat-long panorama (bilinear, face chosen by dominant axis)."""
    d = equirect_dirs_cam(height, width)              # (H, W, 3)
    faces = jnp.asarray(_FACES)                       # (6, 3, 3)
    # face-local coords: p = M^T d  ->  p[f] = d @ M[f]
    p = jnp.einsum("hwc,fck->fhwk", d, faces,
                   precision=jax.lax.Precision.HIGHEST)  # (6,H,W,3)
    pz = p[..., 2]
    # dominant face: largest forward component
    sel = jnp.argmax(pz, axis=0)                      # (H, W)
    img = jnp.stack(face_imgs, axis=0).astype(jnp.float32)  # (6,F,F,C)
    fres = img.shape[1]
    f_half = fres / 2.0

    def sample(fi):
        u = p[fi, ..., 0] / jnp.maximum(pz[fi], 1e-9)
        v = p[fi, ..., 1] / jnp.maximum(pz[fi], 1e-9)
        px = jnp.clip(u * f_half + f_half - 0.5, 0.0, fres - 1.0)
        py = jnp.clip(v * f_half + f_half - 0.5, 0.0, fres - 1.0)
        x0 = jnp.floor(px).astype(jnp.int32)
        y0 = jnp.floor(py).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, fres - 1)
        y1 = jnp.minimum(y0 + 1, fres - 1)
        wx = (px - x0)[..., None]
        wy = (py - y0)[..., None]
        f = img[fi]
        return ((1 - wy) * ((1 - wx) * f[y0, x0] + wx * f[y0, x1])
                + wy * ((1 - wx) * f[y1, x0] + wx * f[y1, x1]))

    out = sample(0)
    for fi in range(1, 6):
        out = jnp.where((sel == fi)[..., None], sample(fi), out)
    return out


def render_equirect(render_one, c2w, height: int, width: int,
                    face_res: int | None = None, ipd: float = 0.0):
    """Full equirect panorama: ``render_one(cam) -> (F, F, C) image`` is
    called for the six faces (the production pinhole path); returns the
    (height, width, C) lat-long composite. ``ipd`` != 0 renders one ODS
    eye (sign = which eye)."""
    if face_res is None:
        # slight supersample of the equator so the resample never
        # minifies: equirect spans 4 faces horizontally
        face_res = -(-width // 4 // 8) * 8
    cams = face_cameras(c2w, face_res, ipd=ipd)
    faces = [render_one(c) for c in cams]
    return compose_equirect(faces, height, width)


def render_ods(render_one, c2w, height: int, width: int, ipd: float = 0.064,
               face_res: int | None = None):
    """Omni-directional stereo (top/bottom stacked, left eye on top) via
    the per-face viewpoint approximation described in the module
    docstring. Output (2*height, width, C)."""
    left = render_equirect(render_one, c2w, height, width, face_res,
                           ipd=-ipd)
    right = render_equirect(render_one, c2w, height, width, face_res,
                            ipd=+ipd)
    return jnp.concatenate([left, right], axis=0)
