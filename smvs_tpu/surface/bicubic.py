"""Hermite bicubic interpolation over a unit cell.

TPU-native counterpart of reference `lib/bicubic_patch.cc`. A cell is defined
by 4 corner nodes, each carrying (f, dx, dy, dxy). The interpolant and all of
its derivatives are *linear* in the 16 node parameters, so instead of the
reference's per-node derivative tables (`lib/bicubic_patch.cc:258-339`) we
expose *basis rows*: for a query point, ``basis(x, y)[k]`` is a (..., 16)
row with ``value = basis @ params16``. The rows double as exact
∂value/∂params — no hand-derived tables needed, and batched evaluation over
pixel grids becomes a single MXU matmul.

Parameter ordering (canonical throughout smvs_tpu): node-major,

    params16[4*n + v],  n in (00, 10, 01, 11),  v in (f, dx, dy, dxy)

where node 10 is +x and node 01 is +y (same corner order as the reference,
`lib/bicubic_patch.cc:62-80`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# The 16x16 Hermite coefficient matrix, mapping the *value-major* parameter
# vector [f00 f10 f01 f11 | dx.. | dy.. | dxy..] to power-basis coefficients
# a[j*4+i] of x^i y^j (reference `lib/bicubic_patch.cc:20-38`). This is the
# standard bicubic Hermite matrix (public domain constant).
_HERMITE_VALUE_MAJOR = np.array(
    [
        [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [-3, 3, 0, 0, -2, -1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [2, -2, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, -3, 3, 0, 0, -2, -1, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 2, -2, 0, 0, 1, 1, 0, 0],
        [-3, 0, 3, 0, 0, 0, 0, 0, -2, 0, -1, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, -3, 0, 3, 0, 0, 0, 0, 0, -2, 0, -1, 0],
        [9, -9, -9, 9, 6, 3, -6, -3, 6, -6, 3, -3, 4, 2, 2, 1],
        [-6, 6, 6, -6, -3, -3, 3, 3, -4, 4, -2, 2, -2, -2, -1, -1],
        [2, 0, -2, 0, 0, 0, 0, 0, 1, 0, 1, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 2, 0, -2, 0, 0, 0, 0, 0, 1, 0, 1, 0],
        [-6, 6, 6, -6, -4, -2, 4, 2, -3, 3, -3, 3, -2, -1, -2, -1],
        [4, -4, -4, 4, 2, 2, -2, -2, 2, -2, 2, -2, 1, 1, 1, 1],
    ],
    dtype=np.float64,
)

# Permute columns value-major -> node-major: ref index r = 4*v + n, ours
# m = 4*n + v.
_PERM = np.array([4 * v + n for n in range(4) for v in range(4)])

# A3[i, j, m]: coefficient of x^i y^j contributed by node-major param m.
_A3 = _HERMITE_VALUE_MAJOR[:, _PERM].reshape(4, 4, 16).transpose(1, 0, 2)
# (row index was j*4+i -> reshape to [j, i, m] then swap to [i, j, m])

VALUE_NAMES = ("f", "dx", "dy", "dxy", "dxx", "dyy")


def _powers(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(x^i, d/dx x^i, d2/dx2 x^i) for i in 0..3, stacked on a new last axis."""
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    p = jnp.stack([one, x, x * x, x * x * x], axis=-1)
    dp = jnp.stack([zero, one, 2.0 * x, 3.0 * x * x], axis=-1)
    ddp = jnp.stack([zero, zero, 2.0 * one, 6.0 * x], axis=-1)
    return p, dp, ddp


@functools.partial(jnp.vectorize, signature="(),()->(k,m)")
def basis_rows(x, y):
    """All six basis rows at unit-cell coords (x, y).

    Returns [6, 16]: rows for (f, dx, dy, dxy, dxx, dyy) such that
    ``values = rows @ params16`` reproduces
    `lib/bicubic_patch.cc:121-256` for node-major params.
    Broadcasts over leading dims of x/y.
    """
    a3 = jnp.asarray(_A3, dtype=x.dtype)
    px, dpx, ddpx = _powers(x)
    py, dpy, ddpy = _powers(y)
    b_f = jnp.einsum("i,j,ijm->m", px, py, a3)
    b_dx = jnp.einsum("i,j,ijm->m", dpx, py, a3)
    b_dy = jnp.einsum("i,j,ijm->m", px, dpy, a3)
    b_dxy = jnp.einsum("i,j,ijm->m", dpx, dpy, a3)
    b_dxx = jnp.einsum("i,j,ijm->m", ddpx, py, a3)
    b_dyy = jnp.einsum("i,j,ijm->m", px, ddpy, a3)
    return jnp.stack([b_f, b_dx, b_dy, b_dxy, b_dxx, b_dyy])


def pixel_basis(patchsize: int, subsample: int = 1, dtype=jnp.float32) -> jnp.ndarray:
    """Basis rows for every pixel center of a patch, with pixel-unit scaling.

    Pixel (i, j) of a size-S patch evaluates at unit coords ((i+.5)/S,
    (j+.5)/S); first derivatives are scaled by 1/S and second derivatives by
    1/S^2 to express them per-pixel (reference
    `lib/surface_patch.cc:78-119` and `lib/surface.cc:930-955`).

    Returns [P, 6, 16] with P = (S/subsample)^2 pixels in row-major (j, i)
    order of the subsampled grid.
    """
    s = patchsize
    idx = np.arange(0, s, subsample)
    ii, jj = np.meshgrid(idx, idx, indexing="xy")  # [rows=j, cols=i]
    x = (ii.reshape(-1) + 0.5) / s
    y = (jj.reshape(-1) + 0.5) / s
    rows = basis_rows(jnp.asarray(x, dtype=dtype), jnp.asarray(y, dtype=dtype))
    scale = jnp.asarray([1.0, 1.0 / s, 1.0 / s, 1.0 / s**2, 1.0 / s**2, 1.0 / s**2],
                        dtype=dtype)
    return rows * scale[None, :, None]


@jax.jit
def evaluate(params16: jnp.ndarray, x, y) -> jnp.ndarray:
    """Evaluate (f, dx, dy, dxy, dxx, dyy) at unit-cell coords.

    params16: (..., 16) node-major; x/y broadcastable to its leading shape.
    Returns (..., 6).
    """
    rows = basis_rows(jnp.asarray(x, params16.dtype), jnp.asarray(y, params16.dtype))
    return jnp.einsum("...km,...m->...k", rows, params16)


def fit_to_data(x: jnp.ndarray, y: jnp.ndarray, data: jnp.ndarray) -> jnp.ndarray:
    """Least-squares fit of power-basis coefficients to samples.

    Counterpart of `lib/bicubic_patch.cc:341-383`; returns the 16 power
    coefficients alpha[j*4+i] of x^i y^j.
    """
    px, _, _ = _powers(x)
    py, _, _ = _powers(y)
    A = jnp.einsum("ni,nj->nji", px, py).reshape(x.shape[0], 16)
    return jnp.linalg.lstsq(A, data)[0]


def evaluate_power(alpha: jnp.ndarray, x, y) -> jnp.ndarray:
    """Evaluate a power-basis patch (from fit_to_data) at (x, y)."""
    px, _, _ = _powers(jnp.asarray(x, alpha.dtype))
    py, _, _ = _powers(jnp.asarray(y, alpha.dtype))
    a = alpha.reshape(4, 4)  # [j, i]
    return jnp.einsum("...i,...j,ji->...", px, py, a)
