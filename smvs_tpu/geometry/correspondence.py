"""Closed-form stereo correspondence (pixel reprojection between views).

TPU-native counterpart of reference `lib/correspondence.cc`. Only the forward
maps are implemented; the analytic derivatives the reference hand-derives
(`get_derivative`, `fill_jacobian_derivative_grad`,
`lib/correspondence.cc:53-187`) are obtained exactly via `jax.jacfwd`
through these functions in the Gauss-Newton assembly.

Conventions: a main-view pixel center (u, v) = (x+0.5, y+0.5) at z-depth w
maps through the per-view-pair warp (M, t) (see
`smvs_tpu.core.camera.Camera.fill_reprojection`) to homogeneous
``h = w * M @ (u, v, 1) + t``; the neighbor pixel is (h0/h2, h1/h2) and the
neighbor z-depth is h2.
"""

from __future__ import annotations

import jax.numpy as jnp


def warp(M: jnp.ndarray, t: jnp.ndarray, u, v, w):
    """Project (u, v, w) into the neighbor view.

    M: (..., 3, 3), t: (..., 3); u, v, w broadcastable.
    Returns (proj_uv (..., 2), neighbor_depth (...)).
    Reference `lib/correspondence.cc:20-51`.
    """
    p = M[..., 0, 0] * u + M[..., 0, 1] * v + M[..., 0, 2]
    q = M[..., 1, 0] * u + M[..., 1, 1] * v + M[..., 1, 2]
    r = M[..., 2, 0] * u + M[..., 2, 1] * v + M[..., 2, 2]
    a = w * p + t[..., 0]
    b = w * q + t[..., 1]
    d = w * r + t[..., 2]
    return jnp.stack([a / d, b / d], axis=-1), d


def warp_jacobian(M: jnp.ndarray, t: jnp.ndarray, u, v, w, w_dx, w_dy):
    """2x2 Jacobian d(neighbor pixel)/d(main pixel) along the surface.

    The surface contributes through the depth gradient (w_dx, w_dy) in
    pixel units. Reference `lib/correspondence.cc:89-100`.
    Returns (..., 2, 2) as [[du'/du, du'/dv], [dv'/du, dv'/dv]].
    """
    p = M[..., 0, 0] * u + M[..., 0, 1] * v + M[..., 0, 2]
    q = M[..., 1, 0] * u + M[..., 1, 1] * v + M[..., 1, 2]
    r = M[..., 2, 0] * u + M[..., 2, 1] * v + M[..., 2, 2]
    a = w * p + t[..., 0]
    b = w * q + t[..., 1]
    d = w * r + t[..., 2]
    d2 = d * d

    # d a/du = w_dx * p + w * M00 etc.; d(a/d)/du = (a' d - a d')/d^2.
    da_du = w_dx * p + w * M[..., 0, 0]
    da_dv = w_dy * p + w * M[..., 0, 1]
    db_du = w_dx * q + w * M[..., 1, 0]
    db_dv = w_dy * q + w * M[..., 1, 1]
    dd_du = w_dx * r + w * M[..., 2, 0]
    dd_dv = w_dy * r + w * M[..., 2, 1]

    j00 = da_du / d - a * dd_du / d2
    j01 = da_dv / d - a * dd_dv / d2
    j10 = db_du / d - b * dd_du / d2
    j11 = db_dv / d - b * dd_dv / d2
    return jnp.stack(
        [jnp.stack([j00, j01], axis=-1), jnp.stack([j10, j11], axis=-1)], axis=-2
    )


def warp_depth_gradient(M: jnp.ndarray, t: jnp.ndarray, u, v, w):
    """d(neighbor pixel)/d(depth): (du/dw, dv/dw).

    Closed form (reference `Correspondence::get_derivative`,
    `lib/correspondence.cc:53-72`): du_w = (p d - r a)/d^2,
    dv_w = (q d - r b)/d^2. Returns (..., 2).
    """
    p = M[..., 0, 0] * u + M[..., 0, 1] * v + M[..., 0, 2]
    q = M[..., 1, 0] * u + M[..., 1, 1] * v + M[..., 1, 2]
    r = M[..., 2, 0] * u + M[..., 2, 1] * v + M[..., 2, 2]
    a = w * p + t[..., 0]
    b = w * q + t[..., 1]
    d = w * r + t[..., 2]
    d2 = d * d
    return jnp.stack([(p * d - r * a) / d2, (q * d - r * b) / d2], axis=-1)


def jacobian_condition(jac: jnp.ndarray) -> jnp.ndarray:
    """sigma_max^2 / sigma_min^2 of a 2x2 warp Jacobian.

    Closed-form singular values used for the anisotropy visibility test
    (reference `lib/depth_optimizer.cc:560-574`).
    """
    j00 = jac[..., 0, 0]
    j01 = jac[..., 0, 1]
    j10 = jac[..., 1, 0]
    j11 = jac[..., 1, 1]
    m = jnp.sqrt((j00 - j11) ** 2 + (j01 + j10) ** 2)
    p = jnp.sqrt((j00 + j11) ** 2 + (j01 - j10) ** 2)
    s0 = (m + p) / 2.0
    s1 = jnp.abs(s0 - m)
    hi = jnp.maximum(s0, s1) ** 2
    lo = jnp.minimum(s0, s1) ** 2
    return hi / lo
