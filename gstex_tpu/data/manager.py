"""Full-image data manager: upfront cache + undistortion + camera sampling.

Mirrors ``FullImageDatamanager`` (reference
``nerfstudio/data/datamanagers/full_images_datamanager.py``): all images are
loaded (threadpool), undistorted with cv2 where distortion params exist
(``_undistort_image``, 366-517), cached as uint8 on host, and cameras are
sampled randomly without replacement per epoch (316-363).
"""

from __future__ import annotations

import concurrent.futures
from dataclasses import dataclass, field

import numpy as np

from ..ops.camera import Camera, make_camera
from .blender import ParsedDataset


def _load_image(path) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGBA" if im.mode == "RGBA" else "RGB"))


@dataclass
class FullImageCache:
    cameras: list
    images: list  # uint8 (H,W,3|4)
    masks: list | None = None  # optional uint8 (H,W) binary masks
    rng: np.random.Generator = field(
        default_factory=lambda: np.random.default_rng(0))
    _unseen: list = field(default_factory=list)
    _device_images: dict = field(default_factory=dict)

    @classmethod
    def build(cls, parsed: ParsedDataset, seed: int = 0,
              max_workers: int = 8) -> "FullImageCache":
        dist = getattr(parsed, "distortion", None)
        mask_files = getattr(parsed, "mask_filenames", None)
        cam_type = getattr(parsed, "camera_type", "perspective")

        def load(i):
            img = _load_image(parsed.image_filenames[i])
            fx, fy = float(parsed.fx[i]), float(parsed.fy[i])
            cx, cy = float(parsed.cx[i]), float(parsed.cy[i])
            h, w = img.shape[:2]
            if cam_type == "fisheye624":
                # 16-param rad/tan/thin-prism rectification (reference
                # full_images_datamanager.py:421-517)
                from .fisheye624 import undistort_fisheye624

                params = np.concatenate(
                    [[fx, fy, cx, cy], np.asarray(dist[i], np.float64)])
                crop = float(getattr(parsed, "fisheye_crop_radius", 0.0)
                             or min(h, w) / 2.0)
                img, fmask, fx, fy, cx, cy = undistort_fisheye624(
                    img, params, crop)
                cam = make_camera(fx, fy, cx, cy, img.shape[0],
                                  img.shape[1], parsed.c2ws[i])
                return cam, np.ascontiguousarray(img), fmask
            if dist is not None and np.abs(dist[i]).sum() > 0:
                import cv2

                k1, k2, k3, k4, p1, p2 = [float(v) for v in dist[i]]
                K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
                if cam_type == "fisheye":
                    # equidistant model → rectified pinhole, mirroring the
                    # FISHEYE branch of _undistort_image
                    # (full_images_datamanager.py:439-470)
                    d = np.array([k1, k2, k3, k4])
                    newK = cv2.fisheye.estimateNewCameraMatrixForUndistortRectify(
                        K, d, (w, h), np.eye(3), balance=0.0)
                    m1, m2 = cv2.fisheye.initUndistortRectifyMap(
                        K, d, np.eye(3), newK, (w, h), cv2.CV_32FC1)
                    img = cv2.remap(img, m1, m2,
                                    interpolation=cv2.INTER_LINEAR)
                else:
                    d = np.array([k1, k2, p1, p2, k3])
                    newK, _ = cv2.getOptimalNewCameraMatrix(K, d, (w, h), 0)
                    img = cv2.undistort(img, K, d, newCameraMatrix=newK)
                fx, fy = float(newK[0, 0]), float(newK[1, 1])
                cx, cy = float(newK[0, 2]), float(newK[1, 2])
            cam = make_camera(fx, fy, cx, cy, img.shape[0], img.shape[1],
                              parsed.c2ws[i])
            return cam, np.ascontiguousarray(img), None

        n = len(parsed.image_filenames)
        with concurrent.futures.ThreadPoolExecutor(max_workers) as ex:
            results = list(ex.map(load, range(n)))
        cams = [r[0] for r in results]
        imgs = [r[1] for r in results]
        masks = None
        if any(r[2] is not None for r in results):
            masks = [r[2] for r in results]
        if mask_files is not None:
            from PIL import Image

            masks = []
            for mf in mask_files:
                if mf is None:
                    masks.append(None)
                else:
                    with Image.open(mf) as im:
                        masks.append(
                            (np.asarray(im.convert("L")) > 127)
                            .astype(np.uint8))
        return cls(cameras=cams, images=imgs, masks=masks,
                   rng=np.random.default_rng(seed))

    def __len__(self):
        return len(self.cameras)

    def next_train(self):
        """Random without-replacement camera sampling
        (``full_images_datamanager.py:316-363``).
        Returns (camera, image, mask-or-None)."""
        return self.next_train_idx()[1]

    def next_train_idx(self):
        """Like ``next_train`` but also returns the camera index (the key
        for ``device_image``)."""
        if not self._unseen:
            self._unseen = list(self.rng.permutation(len(self.cameras)))
        i = int(self._unseen.pop())
        m = self.masks[i] if self.masks is not None else None
        return i, (self.cameras[i], self.images[i], m)

    def get(self, i: int):
        m = self.masks[i] if self.masks is not None else None
        return self.cameras[i], self.images[i], m

    def device_image(self, i: int):
        """Index-keyed cache of device-side float images. Owned by the
        cache (which keeps every host image alive), replacing a trainer
        dict keyed by ``id(img)`` whose keys could alias after GC."""
        if i not in self._device_images:
            import jax.numpy as jnp

            self._device_images[i] = jnp.asarray(
                image_to_float(self.images[i]))
        return self._device_images[i]


def image_to_float(img: np.ndarray) -> np.ndarray:
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return img.astype(np.float32)
