"""Epipolar rectification for the TPU plane-sweep (SGM) initializer.

Why this exists: the reference builds its cost volume by warping the
neighbor image once per inverse-depth plane (`lib/sgm_stereo.cc:150-244`),
which on TPU means W*H*D arbitrary bilinear gathers — the slowest op class
on the hardware (measured ~700 ms of a 703 ms cost volume at 360^2 x 128).
Rectifying the pair first (one homography warp per image) turns every sweep
plane into a pure integer *shift* along the lane axis: zero gathers in the
hot loop, and uniform disparity steps are exactly uniform inverse-depth
steps, so the sweep geometry matches the reference's
(`lib/sgm_stereo.cc:193-203`).

Host-side math (numpy, per view pair, trivially cheap): a Fusiello-style
rotation that puts both optical axes perpendicular to the baseline and
aligns image rows with it. Degenerate pairs (near-forward motion) report
``valid=False`` and the caller falls back to the general gather-based
cost volume.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from smvs_tpu.core.camera import Camera
from smvs_tpu.image import ops as iops


@dataclasses.dataclass(frozen=True)
class RectifiedPair:
    """Host-side rectification data for one (main, neighbor) view pair.

    Pixel conventions follow the rest of the codebase: a pixel (x, y)
    is addressed at continuous coordinates (x+0.5, y+0.5).

    Attributes:
      H_main / H_nbr: 3x3 homographies mapping *original* pixel-center
        homogeneous coords to *rectified* pixel-center coords.
      fB: rectified focal length times signed baseline; the disparity of a
        point at rectified depth Z is ``disp = fB / Z + off``.
      off: constant disparity offset (difference of the two rectified
        principal points along x).
      L_main: 3-vector linear form; the *main-camera z-depth* of a point
        seen at rectified pixel r with rectified depth Z is
        ``w = Z * (L_main @ (r_x, r_y, 1))``.
      disp_lo / disp_hi: disparity sweep bounds derived from the given
        main/neighbor z-depth ranges.
    """

    valid: bool
    width: int = 0
    height: int = 0
    H_main: np.ndarray | None = None
    H_nbr: np.ndarray | None = None
    fB: float = 0.0
    off: float = 0.0
    L_main: np.ndarray | None = None
    disp_lo: float = 0.0
    disp_hi: float = 0.0
    # Extra columns on EACH side of the rectified neighbor canvas
    # (static, quantized to 128). The neighbor's rectified footprint can
    # extend past [0, width) — rotation between the views shifts content
    # sideways — and clipping it there starves border matching: the r5
    # coverage analysis measured the entire 1.4% base-coverage gap vs the
    # reference as main-frame border pixels whose matches fell off the
    # neighbor canvas. H_nbr/off/disp_* are expressed in the WIDENED
    # canvas coordinates (content shifted +nbr_pad).
    nbr_pad: int = 0


def _pixel_grid_form(row3: np.ndarray, width: int, height: int,
                     n: int = 5) -> np.ndarray:
    """Evaluate a linear form row3 . (x+0.5, y+0.5, 1) over an n x n grid."""
    xs = np.linspace(0.5, width - 0.5, n)
    ys = np.linspace(0.5, height - 0.5, n)
    gx, gy = np.meshgrid(xs, ys)
    return row3[0] * gx + row3[1] * gy + row3[2]


def rectify_pair(
    cam_main: Camera,
    cam_nbr: Camera,
    width: int,
    height: int,
    range_main: tuple[float, float],
    range_nbr: tuple[float, float],
    min_baseline: float = 1e-9,
    min_perp: float = 0.15,
    nbr_pad: int | None = None,
) -> RectifiedPair:
    """Compute the rectifying transforms for a view pair (or report invalid).

    ``range_main`` / ``range_nbr`` are (min, max) z-depth sweep ranges in
    each camera's own frame (reference `lib/sgm_stereo.cc:669-720`).
    """
    invalid = RectifiedPair(valid=False)

    C1 = cam_main.cam_position()
    C2 = cam_nbr.cam_position()
    b = C2 - C1
    bn = np.linalg.norm(b)
    if bn < min_baseline:
        return invalid

    e1 = b / bn
    # Keep the rectified x-axis roughly aligned with the main camera's
    # x-axis so the image is not mirrored/rotated more than necessary.
    if np.dot(e1, cam_main.rot[0]) < 0:
        e1 = -e1
    z_ref = cam_main.viewing_direction()
    e3 = z_ref - np.dot(z_ref, e1) * e1
    n3 = np.linalg.norm(e3)
    if n3 < min_perp:  # near-forward motion: rectification degenerates
        return invalid
    e3 /= n3
    e2 = np.cross(e3, e1)
    R_r = np.stack([e1, e2, e3])  # world-to-rectified rotation

    f = cam_main.flen_pixels(width, height)
    K1_inv = cam_main.inverse_calibration(width, height)
    K2_inv = cam_nbr.inverse_calibration(width, height)

    # Rotation homography cores (before the rectified intrinsics).
    A_main = R_r @ cam_main.rot.T @ K1_inv
    A_nbr = R_r @ cam_nbr.rot.T @ K2_inv

    # Depth-scale forms: a point at z-depth w in a camera has rectified
    # depth Z = w * (A[2] . (x+0.5, y+0.5, 1)) at that camera's pixel.
    g_main = _pixel_grid_form(A_main[2], width, height)
    g_nbr = _pixel_grid_form(A_nbr[2], width, height)
    if g_main.min() < 0.2 or g_nbr.min() < 0.2:
        return invalid  # scene wraps behind the rectified image plane

    # Per-image principal points: map each image's center to itself.
    def k_rect(A):
        c = A @ np.array([width / 2.0, height / 2.0, 1.0])
        cx = width / 2.0 - f * c[0] / c[2]
        cy = height / 2.0 - f * c[1] / c[2]
        return np.array([[f, 0.0, cx], [0.0, f, cy], [0.0, 0.0, 1.0]]), cx, cy

    K_rm, cx_m, cy_m = k_rect(A_main)
    K_rn, cx_n, _ = k_rect(A_nbr)
    # Rows must align between the two rectified images: share cy.
    K_rn[1, 2] = K_rm[1, 2]

    H_main = K_rm @ A_main
    H_nbr = K_rn @ A_nbr

    # Require the two rectified footprints to overlap vertically.
    corners = np.array([[0.5, 0.5, 1], [width - 0.5, 0.5, 1],
                        [0.5, height - 0.5, 1],
                        [width - 0.5, height - 0.5, 1]], dtype=np.float64)
    ym = (corners @ H_main.T)
    yn = (corners @ H_nbr.T)
    ym = ym[:, 1] / ym[:, 2]
    yn = yn[:, 1] / yn[:, 2]
    lo = max(ym.min(), yn.min(), 0.0)
    hi = min(ym.max(), yn.max(), float(height))
    if hi - lo < 0.25 * height:
        return invalid

    # Widen the neighbor canvas to its rectified x-footprint (see
    # RectifiedPair.nbr_pad). Quantized to 128-column steps so pairs of
    # similar geometry share compiled programs; capped at 384.
    xn = corners @ H_nbr.T
    xn = xn[:, 0] / xn[:, 2]
    need = max(0.0, -xn.min(), xn.max() - width)
    # Quantum scales with the image so small frames get proportionate
    # pads (a 128 quantum exceeded 64-px half-res CLI images entirely
    # and, with the +-width disparity clamp, zeroed their sweeps).
    q = 128 if width >= 768 else 32
    auto_pad = int(min(int(np.ceil(need / q)) * q, 3 * q))
    pad = auto_pad if nbr_pad is None else int(nbr_pad)
    if pad:
        # x' = x + pad in projective form: row0 += pad * row2.
        H_nbr = H_nbr.copy()
        H_nbr[0, :] += pad * H_nbr[2, :]
        cx_n += pad

    # Signed baseline along the rectified x-axis.
    B = float(np.dot(e1, b))
    fB = f * B
    off = float(cx_m - cx_n)

    # Disparity sweep bounds from both cameras' z-depth ranges:
    # Z = w * g, disp - off = fB / Z.
    z_bounds = []
    for (dmin, dmax), g in ((range_main, g_main), (range_nbr, g_nbr)):
        z_bounds.append(dmin * g.min())
        z_bounds.append(dmax * g.max())
    z_lo, z_hi = max(min(z_bounds), 1e-9), max(z_bounds)
    d_a, d_b = fB / z_lo, fB / z_hi
    disp_lo, disp_hi = min(d_a, d_b) + off, max(d_a, d_b) + off
    # Clamp to the physically-resolvable window (the widened neighbor
    # canvas legitimately shifts disparities by -pad).
    disp_lo = float(np.clip(disp_lo, -(width + pad), width + pad))
    disp_hi = float(np.clip(disp_hi, -(width + pad), width + pad))

    # Main z-depth reconstruction form: w = Z * (L_main . rect_pixel).
    L_main = (cam_main.rot @ R_r.T @ np.linalg.inv(K_rm))[2]

    return RectifiedPair(
        valid=True, width=width, height=height,
        H_main=H_main, H_nbr=H_nbr, fB=fB, off=off, L_main=L_main,
        disp_lo=disp_lo, disp_hi=disp_hi, nbr_pad=pad,
    )


@functools.partial(jax.jit, static_argnames=("out_width",))
def warp_homography(img: jnp.ndarray, H_inv: jnp.ndarray,
                    out_width: int | None = None) -> jnp.ndarray:
    """Resample ``img`` [H, W] under an output->input pixel homography.

    Output pixel (x, y) samples the input at ``H_inv @ (x+0.5, y+0.5, 1)``
    (bilinear, zero outside). This is the only gather in the rectified SGM
    path — one per image instead of one per (pixel, depth plane).
    ``out_width`` renders onto a wider canvas (the widened rectified
    neighbor, see `RectifiedPair.nbr_pad`).
    """
    h, w = img.shape
    ow = w if out_width is None else out_width
    ys, xs = jnp.mgrid[0:h, 0:ow]
    u = xs.astype(img.dtype) + 0.5
    v = ys.astype(img.dtype) + 0.5
    Hc = H_inv.astype(img.dtype)
    px = Hc[0, 0] * u + Hc[0, 1] * v + Hc[0, 2]
    py = Hc[1, 0] * u + Hc[1, 1] * v + Hc[1, 2]
    pz = Hc[2, 0] * u + Hc[2, 1] * v + Hc[2, 2]
    px = px / pz - 0.5
    py = py / pz - 0.5
    ok = (pz > 0) & (px >= 0) & (py >= 0) & (px <= w - 1) & (py <= h - 1)
    return jnp.where(ok, iops.bilinear_packed4(iops.pack_window4(img), px, py),
                     0.0)
