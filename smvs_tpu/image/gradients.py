"""Image gradient + Hessian via least-squares quadratic fit on 3x3 windows.

TPU-native counterpart of reference `lib/stereo_view.cc:98-188`: a fixed 6x9
matrix maps the 3x3 neighborhood to the coefficients of the best-fit
quadratic a*x^2 + b*y^2 + c*xy + d*x + e*y + f; the gradient is (d, e) and
the Hessian is (2a, c, 2b). Implemented as 9 shifted adds (XLA fuses these
into one fused elementwise pass); border pixels are zero like the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# M[k, c] with c = (a+1)*3 + (b+1) indexing the sample at offset (a=dx, b=dy),
# matching the fill order at reference `lib/stereo_view.cc:170-174`.
_M = np.array(
    [
        [1 / 6, 1 / 6, 1 / 6, -1 / 3, -1 / 3, -1 / 3, 1 / 6, 1 / 6, 1 / 6],
        [1 / 6, -1 / 3, 1 / 6, 1 / 6, -1 / 3, 1 / 6, 1 / 6, -1 / 3, 1 / 6],
        [1 / 4, 0, -1 / 4, 0, 0, 0, -1 / 4, 0, 1 / 4],
        [-1 / 6, -1 / 6, -1 / 6, 0, 0, 0, 1 / 6, 1 / 6, 1 / 6],
        [-1 / 6, 0, 1 / 6, -1 / 6, 0, 1 / 6, -1 / 6, 0, 1 / 6],
        [-1 / 9, 2 / 9, -1 / 9, 2 / 9, 5 / 9, 2 / 9, -1 / 9, 2 / 9, -1 / 9],
    ],
    dtype=np.float64,
)


@jax.jit
def gradients_and_hessian(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compute (gradient [2, H, W], hessian [3, H, W]) of img [H, W].

    gradient = (Ix, Iy); hessian = (Ixx, Ixy, Iyy), matching the channel
    layout at reference `lib/stereo_view.cc:179-187`. Border ring is zero.
    """
    m = jnp.asarray(_M, dtype=img.dtype)
    h, w = img.shape
    acc = [jnp.zeros_like(img) for _ in range(6)]
    xp = jnp.pad(img, ((1, 1), (1, 1)))
    for a in range(-1, 2):  # x offset
        for b in range(-1, 2):  # y offset
            c = (a + 1) * 3 + (b + 1)
            shifted = xp[1 + b : 1 + b + h, 1 + a : 1 + a + w]
            for k in range(6):
                coeff = m[k, c]
                acc[k] = acc[k] + coeff * shifted

    interior = jnp.zeros((h, w), dtype=bool).at[1:-1, 1:-1].set(True)
    r = [jnp.where(interior, a_, 0.0) for a_ in acc]
    gradient = jnp.stack([r[3], r[4]])
    hessian = jnp.stack([2.0 * r[0], r[2], 2.0 * r[1]])
    return gradient, hessian
