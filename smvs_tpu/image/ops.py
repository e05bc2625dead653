"""Image operations for the stereo pipeline (JAX, batched, TPU-friendly).

TPU-native counterpart of the MVE image tooling the reference relies on
(`lib/stereo_view.cc`, `mve::image::*`): scale-space by Gaussian blur (NOT
downsampling — reference `lib/stereo_view.cc:27-31`), luminance
desaturation, half-size rescales, inverse-sRGB linearization, and bilinear
sampling. All functions operate on [..., H, W] arrays and jit cleanly.
"""

from __future__ import annotations

import math

import functools

import jax
import jax.numpy as jnp
import numpy as np


def scale_space_sigma(scale: int | float) -> float:
    """Blur sigma for a pyramid scale; reference `lib/stereo_view.cc:29`."""
    return 0.12 * (2.0**scale) + 0.2


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """Desaturate [..., H, W, 3] -> [..., H, W] (MVE DESATURATE_LUMINANCE,

    ITU-R BT.601 weights), as used at reference `lib/stereo_view.cc:51-53`.
    """
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=rgb.dtype)
    return jnp.einsum("...c,c->...", rgb, w)


def srgb_to_linear(img: jnp.ndarray) -> jnp.ndarray:
    """Inverse sRGB gamma (MVE gamma_correct_inv_srgb);

    used for the shading image at reference `lib/stereo_view.cc:64-74`.
    """
    return jnp.where(
        img <= 0.04045, img / 12.92, ((img + 0.055) / 1.055) ** 2.4
    )


def gaussian_kernel(sigma: float, dtype=jnp.float32) -> jnp.ndarray:
    """1D Gaussian kernel with MVE's support rule (ks = ceil(sigma * 2.884))."""
    ks = int(math.ceil(sigma * 2.884))
    xs = np.arange(-ks, ks + 1, dtype=np.float64)
    w = np.exp(-(xs**2) / (2.0 * sigma**2))
    w /= w.sum()
    return jnp.asarray(w, dtype=dtype)


@functools.partial(jax.jit, static_argnames=('sigma',))
def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur with edge-clamp borders on [..., H, W]."""
    if sigma <= 0:
        return img
    k = gaussian_kernel(sigma, img.dtype)
    ks = (k.shape[0] - 1) // 2

    def conv1d(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (ks, ks)
        xp = jnp.pad(x, pad, mode="edge")
        # Convolve by summing shifted slices (small kernels; XLA fuses this).
        out = jnp.zeros_like(x)
        for i in range(k.shape[0]):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(i, i + x.shape[axis])
            out = out + k[i] * xp[tuple(sl)]
        return out

    return conv1d(conv1d(img, -1), -2)


@jax.jit
def rescale_half_size(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 box downsample (mve::image::rescale_half_size), odd sizes keep the

    partial last row/column by edge-padding.
    """
    h, w = img.shape[-2], img.shape[-1]
    ph, pw = h % 2, w % 2
    if ph or pw:
        pad = [(0, 0)] * (img.ndim - 2) + [(0, ph), (0, pw)]
        img = jnp.pad(img, pad, mode="edge")
    s = img.shape
    r = img.reshape(*s[:-2], s[-2] // 2, 2, s[-1] // 2, 2)
    return r.mean(axis=(-3, -1))


@functools.partial(jax.jit, static_argnames=('sigma',))
def rescale_half_size_gaussian(img: jnp.ndarray, sigma: float = math.sqrt(3.0) / 2.0
                               ) -> jnp.ndarray:
    """Half-size rescale with 4x4 Gaussian taps

    (mve::image::rescale_half_size_gaussian, used at reference
    `app/smvsrecon.cc:637`). Output pixel centers sit at input coords
    (2i+0.5, 2j+0.5); taps at distances^2 {0.5, 2.5, 4.5}.
    """
    h, w = img.shape[-2], img.shape[-1]
    oh, ow = (h + 1) // 2, (w + 1) // 2
    w1 = math.exp(-0.5 / (2.0 * sigma**2))
    w2 = math.exp(-2.5 / (2.0 * sigma**2))
    w3 = math.exp(-4.5 / (2.0 * sigma**2))
    kernel = np.array(
        [[w3, w2, w2, w3], [w2, w1, w1, w2], [w2, w1, w1, w2], [w3, w2, w2, w3]]
    )
    kernel /= kernel.sum()
    pad = [(0, 0)] * (img.ndim - 2) + [(1, 2 + (h % 2)), (1, 2 + (w % 2))]
    xp = jnp.pad(img, pad, mode="edge")
    out = jnp.zeros((*img.shape[:-2], oh, ow), dtype=img.dtype)
    for dy in range(4):
        for dx in range(4):
            sl = xp[..., dy : dy + 2 * oh : 2, dx : dx + 2 * ow : 2]
            out = out + kernel[dy, dx] * sl
    return out


def bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img[..., H, W] at (x, y); coords clamped to the border

    (MVE linear_at semantics). x/y index columns/rows with pixel centers at
    integers. Returns values broadcast over x/y's shape (leading img dims
    must be absent for the common single-image case).
    """
    h, w = img.shape[-2], img.shape[-1]
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    fx = x - x0
    fy = y - y0
    v00 = img[..., y0, x0]
    v10 = img[..., y0, x0 + 1]
    v01 = img[..., y0 + 1, x0]
    v11 = img[..., y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v10 * fx * (1 - fy)
        + v01 * (1 - fx) * fy
        + v11 * fx * fy
    )


def pack_window4(img: jnp.ndarray) -> jnp.ndarray:
    """[H, W] -> [H, W, 4] with each pixel's 2x2 support (v00, v10, v01, v11).

    `bilinear_packed4` then needs ONE 4-wide row gather per sample point —
    measured ~3.4x faster than 4 scalar gathers on TPU (gather cost is per
    index, and ~16-byte rows are the sweet spot). The rolls wrap, but
    wrapped entries sit at x=W-1 / y=H-1 which clamped sampling never
    addresses.
    """
    x1 = jnp.roll(img, -1, axis=-1)
    y1 = jnp.roll(img, -1, axis=-2)
    xy1 = jnp.roll(x1, -1, axis=-2)
    return jnp.stack([img, x1, y1, xy1], axis=-1)


def bilinear_packed4(img4: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                     ) -> jnp.ndarray:
    """`bilinear` over a `pack_window4` image; same border-clamp semantics."""
    h, w = img4.shape[0], img4.shape[1]
    shape = x.shape
    xf = jnp.clip(x.reshape(-1), 0.0, w - 1.0)
    yf = jnp.clip(y.reshape(-1), 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(xf).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(yf).astype(jnp.int32), 0, h - 2)
    fx = xf - x0
    fy = yf - y0
    rows = jnp.take(img4.reshape(h * w, 4), y0 * w + x0, axis=0)  # [M, 4]
    top = rows[:, 0] * (1 - fx) + rows[:, 1] * fx
    bot = rows[:, 2] * (1 - fx) + rows[:, 3] * fx
    return (top * (1 - fy) + bot * fy).reshape(shape)


@jax.custom_jvp
def sample_gradient(grad_img: jnp.ndarray, hess_img: jnp.ndarray,
                    x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample an image-gradient field, differentiating through the image Hessian.

    Primal: bilinear sample of grad_img [2, H, W] at (x, y) -> (..., 2).
    JVP w.r.t. (x, y): routed through the *precomputed, smoothed* image
    Hessian hess_img [3, H, W] = (Ixx, Ixy, Iyy) rather than through the
    piecewise-constant derivative of bilinear interpolation. This reproduces
    the reference's chain rule, which multiplies the warp-position derivative
    by the sampled Hessian (`lib/gauss_newton_step.cc:195-207`), while
    letting `jax.jacfwd` derive the full Gauss-Newton Jacobian.
    """
    return jnp.stack([bilinear(grad_img[0], x, y), bilinear(grad_img[1], x, y)],
                     axis=-1)


@sample_gradient.defjvp
def _sample_gradient_jvp(primals, tangents):
    grad_img, hess_img, x, y = primals
    _, _, dx, dy = tangents
    out = sample_gradient(grad_img, hess_img, x, y)
    hxx = bilinear(hess_img[0], x, y)
    hxy = bilinear(hess_img[1], x, y)
    hyy = bilinear(hess_img[2], x, y)
    dx = jnp.zeros_like(x) if isinstance(dx, jax.custom_derivatives.SymbolicZero) else dx
    dy = jnp.zeros_like(y) if isinstance(dy, jax.custom_derivatives.SymbolicZero) else dy
    d0 = hxx * dx + hxy * dy
    d1 = hxy * dx + hyy * dy
    return out, jnp.stack([d0, d1], axis=-1)


def pack_gradhess(grad: jnp.ndarray, hess: jnp.ndarray) -> jnp.ndarray:
    """Stack grad [2, H, W] + hess [3, H, W] into one [H, W, 5] sampling image.

    Channels: (Ix, Iy, Ixx, Ixy, Iyy). One channels-last array means
    `sample_window` fetches a pixel's whole 2x2x5 stencil with a single
    gather-of-slices instead of 20 scalar gathers.
    """
    return jnp.moveaxis(jnp.concatenate([grad, hess], axis=0), 0, -1)


def sample_window(img_c: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                  ) -> jnp.ndarray:
    """Bilinear sample of a channels-last image img_c [H, W, C] at (x, y).

    Same border-clamp semantics as :func:`bilinear`, but each of the 4
    corner reads fetches ALL C channels as one row gather from the
    [H*W, C] flattened image (`jnp.take` along axis 0) — measured ~8x
    faster than C independent scalar gathers on TPU, and ~60x faster than
    a vmapped dynamic_slice of the 2x2xC window. Returns [..., C].
    """
    h, w, c = img_c.shape
    shape = x.shape
    xf = jnp.clip(x.reshape(-1), 0.0, w - 1.0)
    yf = jnp.clip(y.reshape(-1), 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(xf).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(yf).astype(jnp.int32), 0, h - 2)
    fx = (xf - x0)[:, None]
    fy = (yf - y0)[:, None]

    flat = img_c.reshape(h * w, c)
    i00 = y0 * w + x0
    v00 = jnp.take(flat, i00, axis=0)
    v10 = jnp.take(flat, i00 + 1, axis=0)
    v01 = jnp.take(flat, i00 + w, axis=0)
    v11 = jnp.take(flat, i00 + w + 1, axis=0)
    out = (v00 * (1 - fx) * (1 - fy) + v10 * fx * (1 - fy)
           + v01 * (1 - fx) * fy + v11 * fx * fy)
    return out.reshape(*shape, c)


def pack_gradhess_pair10(grad: jnp.ndarray, hess: jnp.ndarray) -> jnp.ndarray:
    """bf16 x-paired sampling image [H, W, 10]: channels of pixel x and
    x + 1 side by side.

    A bilinear sample then needs TWO 20-byte row gathers (rows y0 and
    y0 + 1 each carrying both x-corners) instead of four — measured
    1.34x faster at assembly scale (PERF_NOTES "GN assembly gather").
    bf16 storage halves the row bytes; corners are blended in f32 after
    the load. The quantization (~0.4% on gradient/Hessian samples)
    perturbs only the data term's IRLS system, not the solution targets;
    the accuracy gate lives in tests/test_gn_analytic.py and the bench.
    """
    img5 = pack_gradhess(grad, hess)
    right = jnp.concatenate([img5[:, 1:], img5[:, -1:]], axis=1)
    return jnp.concatenate([img5, right], axis=-1).astype(jnp.bfloat16)


def sample_window_pair10(img10: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                         ) -> jnp.ndarray:
    """Bilinear 5-channel sample from a `pack_gradhess_pair10` image.

    Same clamp semantics as :func:`sample_window`; returns [..., 5] in
    the coordinate dtype via two row gathers.
    """
    h, w, c2 = img10.shape
    c = c2 // 2
    shape = x.shape
    xf = jnp.clip(x.reshape(-1), 0.0, w - 1.0)
    yf = jnp.clip(y.reshape(-1), 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(xf).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(yf).astype(jnp.int32), 0, h - 2)
    fx = (xf - x0)[:, None]
    fy = (yf - y0)[:, None]

    flat = img10.reshape(h * w, c2)
    i00 = y0 * w + x0
    r0 = jnp.take(flat, i00, axis=0).astype(x.dtype)  # [M, 2c]
    r1 = jnp.take(flat, i00 + w, axis=0).astype(x.dtype)
    out = ((r0[:, :c] * (1 - fx) + r0[:, c:] * fx) * (1 - fy)
           + (r1[:, :c] * (1 - fx) + r1[:, c:] * fx) * fy)
    return out.reshape(*shape, c)


def sample_gh(gh: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample a packed (Ix, Iy, Ixx, Ixy, Iyy) image in either format:
    [H, W, 5] f32 (`pack_gradhess`) or [H, W, 10] bf16 x-paired
    (`pack_gradhess_pair10`)."""
    if gh.shape[-1] == 10:
        return sample_window_pair10(gh, x, y)
    return sample_window(gh, x, y)


@jax.custom_jvp
def sample_gradient_packed(gh: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                           ) -> jnp.ndarray:
    """`sample_gradient` over a packed (Ix, Iy, Ixx, Ixy, Iyy) image.

    Primal: bilinear (Ix, Iy) at (x, y) -> (..., 2). JVP w.r.t. (x, y)
    routes through the smoothed image Hessian channels exactly like
    :func:`sample_gradient` (reference `lib/gauss_newton_step.cc:195-207`),
    but primal and Hessian values share one windowed gather. Accepts
    either packed format (see :func:`sample_gh`).
    """
    return sample_gh(gh, x, y)[..., :2]


@sample_gradient_packed.defjvp
def _sample_gradient_packed_jvp(primals, tangents):
    gh, x, y = primals
    _, dx, dy = tangents
    vals = sample_gh(gh, x, y)  # [..., 5]
    out = vals[..., :2]
    hxx = vals[..., 2]
    hxy = vals[..., 3]
    hyy = vals[..., 4]
    dx = jnp.zeros_like(x) if isinstance(dx, jax.custom_derivatives.SymbolicZero) else dx
    dy = jnp.zeros_like(y) if isinstance(dy, jax.custom_derivatives.SymbolicZero) else dy
    d0 = hxx * dx + hxy * dy
    d1 = hxy * dx + hyy * dy
    return out, jnp.stack([d0, d1], axis=-1)
