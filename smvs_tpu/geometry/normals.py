"""Differential geometry of the depth surface in camera coordinates.

TPU-native counterpart of reference `lib/surface_derivative.cc` — forward
functions only; the hand-derived node-parameter derivatives
(`normal_derivative`, `normal_divergence_deriv`,
`lib/surface_derivative.cc:31-190`) come from `jax.jacfwd` in the solver.

Inputs use pixel coordinates centered at the principal point
(x = px + 0.5 - W/2, y = py + 0.5 - H/2) and per-pixel depth derivatives,
exactly as consumed at `lib/gauss_newton_step.cc:210-239`.
"""

from __future__ import annotations

import jax.numpy as jnp


def normal(x, y, inv_flen, w, dx, dy):
    """Unit surface normal; reference `lib/surface_derivative.cc:17-28`.

    Returns (..., 3).
    """
    nx = dx
    ny = -dy
    nz = (x * dx + y * dy + w) * inv_flen
    n = jnp.stack([nx, ny, nz], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def normal_divergence(x, y, flen, w, dx, dy, dxy, dxx, dyy):
    """Six-component spatial derivative of the (unnormalized-normalized) normal.

    Components are (d n_x/dx, d n_y/dx, d n_z/dx, d n_x/dy, d n_y/dy,
    d n_z/dy) of the *unit* normal, matching reference
    `lib/surface_derivative.cc:69-107` (including its sign conventions).
    Returns (..., 6).
    """
    a = w + x * dx + y * dy
    ax = 2.0 * dx + x * dxx + y * dxy
    ay = 2.0 * dy + y * dyy + x * dxy

    t = (a / flen) ** 2 + dx * dx + dy * dy
    n = jnp.sqrt(t)

    f2 = 1.0 / (flen * flen)
    nx = (dx * dxx + dy * dxy + f2 * a * ax) / n
    ny = (dx * dxy + dy * dyy + f2 * a * ay) / n

    xx = (dxx * n - dx * nx) / t
    yy = (dyy * n - dy * ny) / t
    xy = (dxy * n - dx * ny) / t
    yx = (dxy * n - dy * nx) / t
    zx = (ax * n - a * nx) / (t * flen)
    zy = (ay * n - a * ny) / (t * flen)
    return jnp.stack([xx, -yx, zx, xy, -yy, zy], axis=-1)


def mean_curvature(dx, dy, dxy, dxx, dyy):
    """Mean curvature of the graph surface; reference `lib/surface_derivative.cc:193-203`."""
    dx2 = dx * dx
    dy2 = dy * dy
    c = (1.0 + dx2) * dyy - 2.0 * dx * dy * dxy + (1.0 + dy2) * dxx
    denom = 1.0 + dx2 + dy2
    return c / jnp.sqrt(denom * denom * denom)
