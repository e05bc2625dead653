"""Pinhole camera model with MVE conventions.

Reimplements the camera math smvs consumes from MVE (external dependency of
the reference; see `/root/reference/Makefile.inc:1-2`):

- ``fill_calibration`` / ``fill_inverse_calibration``: normalized focal
  length ``flen`` is scaled by ``max(width, height)`` (verified against the
  bundle projection in reference `lib/surface.cc:103-120`, which uses
  ``pixel = flen * max(w, h) * x/z + w/2``).
- ``fill_reprojection``: the per-view-pair warp matrix/vector ``(M, t)``
  consumed by the Correspondence closed form
  (reference `lib/depth_optimizer.cc:680-699`, `lib/correspondence.cc:20-51`).
- MVE depth-map convention conversion: MVE embeddings store distance along
  the pixel ray, smvs internally uses z-depth
  (reference `lib/stereo_view.h:108-130`).

Everything here is plain numpy (host-side scene setup); the resulting
``(M, t)`` tensors are shipped to the device once per view pair.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Camera:
    """MVE-convention camera.

    Attributes:
      flen: focal length normalized by ``max(width, height)``.
      rot: 3x3 world-to-camera rotation (row-major, like ``mve::CameraInfo``).
      trans: camera translation; world point ``p`` maps to ``rot @ p + trans``
        in camera coordinates.
      ppoint: principal point in normalized [0,1] image coordinates.
      paspect: pixel aspect ratio.
    """

    flen: float
    rot: np.ndarray
    trans: np.ndarray
    ppoint: tuple[float, float] = (0.5, 0.5)
    paspect: float = 1.0

    def __post_init__(self):
        self.rot = np.asarray(self.rot, dtype=np.float64).reshape(3, 3)
        self.trans = np.asarray(self.trans, dtype=np.float64).reshape(3)

    # -- calibration ---------------------------------------------------------

    def calibration(self, width: int, height: int) -> np.ndarray:
        """Pixel-space intrinsic matrix K (MVE fill_calibration semantics)."""
        dim_aspect = width / height
        image_aspect = dim_aspect * self.paspect
        if image_aspect < 1.0:  # portrait
            ax = self.flen * height / self.paspect
            ay = self.flen * height
        else:
            ax = self.flen * width
            ay = self.flen * width * self.paspect
        return np.array(
            [
                [ax, 0.0, width * self.ppoint[0]],
                [0.0, ay, height * self.ppoint[1]],
                [0.0, 0.0, 1.0],
            ],
            dtype=np.float64,
        )

    def inverse_calibration(self, width: int, height: int) -> np.ndarray:
        K = self.calibration(width, height)
        return np.array(
            [
                [1.0 / K[0, 0], 0.0, -K[0, 2] / K[0, 0]],
                [0.0, 1.0 / K[1, 1], -K[1, 2] / K[1, 1]],
                [0.0, 0.0, 1.0],
            ],
            dtype=np.float64,
        )

    def flen_pixels(self, width: int, height: int) -> float:
        """Focal length in pixels (reference `lib/stereo_view.h:132-139`)."""
        return float(self.calibration(width, height)[0, 0])

    # -- world <-> camera ----------------------------------------------------

    def world_to_cam(self, points: np.ndarray) -> np.ndarray:
        """Map world points [N,3] into camera coordinates."""
        return points @ self.rot.T + self.trans

    def cam_position(self) -> np.ndarray:
        """Camera center in world coordinates (-R^T t)."""
        return -self.rot.T @ self.trans

    def viewing_direction(self) -> np.ndarray:
        """Optical axis in world coordinates (third row of R)."""
        return self.rot[2]

    def project(self, points_cam: np.ndarray, width: int, height: int) -> np.ndarray:
        """Project camera-space points [N,3] to pixel coords [N,2] (MVE-style,

        pixel centers at integer+0.5; matches reference `lib/surface.cc:114-122`
        which floors the result to address a pixel).
        """
        K = self.calibration(width, height)
        p = points_cam @ K.T
        return p[:, :2] / p[:, 2:3]

    # -- reprojection (view pair warp) --------------------------------------

    def resized_canvas(self, width: int, height: int, new_width: int,
                       new_height: int) -> "Camera":
        """Camera for a right/bottom padded (or cropped) image canvas.

        The pixel-space intrinsics K are preserved exactly: padding the
        image on the right/bottom keeps every original pixel's ray, so the
        adjusted camera satisfies
        ``adjusted.calibration(new_w, new_h) == self.calibration(w, h)``.
        Used by the shape-bucketing path (pad images to a small set of
        sizes so heterogeneous scenes don't recompile per size).
        """
        K = self.calibration(width, height)
        ax = K[0, 0]
        # MVE convention with square pixels: ax == ay == flen * max(w, h).
        new_flen = ax / max(new_width, new_height)
        return Camera(
            flen=new_flen,
            rot=self.rot.copy(),
            trans=self.trans.copy(),
            ppoint=(K[0, 2] / new_width, K[1, 2] / new_height),
            paspect=self.paspect,
        )

    def fill_reprojection(
        self,
        dst: "Camera",
        src_width: int,
        src_height: int,
        dst_width: int,
        dst_height: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Warp operator from this (source) view into ``dst``.

        A source pixel ``u = (x+0.5, y+0.5, 1)`` at z-depth ``w`` projects to
        ``h = w * M @ u + t`` in the destination; the destination pixel is
        ``(h0/h2, h1/h2)`` and the destination z-depth is ``h2``
        (consumed at reference `lib/correspondence.cc:20-51` and
        `lib/sgm_stereo.cc:163-189`).
        """
        Kd = dst.calibration(dst_width, dst_height)
        Ks_inv = self.inverse_calibration(src_width, src_height)
        R_rel = dst.rot @ self.rot.T
        M = Kd @ R_rel @ Ks_inv
        t = Kd @ (dst.trans - R_rel @ self.trans)
        return M, t


def depth_z_to_mve(depth: np.ndarray, inv_calib: np.ndarray) -> np.ndarray:
    """Convert a z-depth map to MVE's distance-along-ray convention.

    Mirrors ``mve::image::depthmap_convert_conventions(map, invproj, true)``
    as used when writing depth embeddings (reference `lib/stereo_view.h:108-119`).
    Zeros stay zero.
    """
    h, w = depth.shape
    xs = np.arange(w, dtype=np.float64) + 0.5
    ys = np.arange(h, dtype=np.float64) + 0.5
    vx = inv_calib[0, 0] * xs + inv_calib[0, 2]
    vy = inv_calib[1, 1] * ys + inv_calib[1, 2]
    norm = np.sqrt(vx[None, :] ** 2 + vy[:, None] ** 2 + 1.0)
    return np.where(depth > 0, depth * norm, 0.0).astype(depth.dtype)


def depth_mve_to_z(depth: np.ndarray, inv_calib: np.ndarray) -> np.ndarray:
    """Inverse of :func:`depth_z_to_mve` (reference `lib/stereo_view.h:121-130`)."""
    h, w = depth.shape
    xs = np.arange(w, dtype=np.float64) + 0.5
    ys = np.arange(h, dtype=np.float64) + 0.5
    vx = inv_calib[0, 0] * xs + inv_calib[0, 2]
    vy = inv_calib[1, 1] * ys + inv_calib[1, 2]
    norm = np.sqrt(vx[None, :] ** 2 + vy[:, None] ** 2 + 1.0)
    return np.where(depth > 0, depth / norm, 0.0).astype(depth.dtype)
