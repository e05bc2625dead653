"""Global spherical-harmonics lighting model and its linear fit.

TPU-native counterpart of reference `lib/global_lighting.h/.cc` and
`lib/light_optimizer.cc`: a 16-coefficient scaled-SH lighting; fitting is a
16x16 normal-equation solve over all pixels with valid (unit) normals and
sufficient intensity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from smvs_tpu.shading import sh


@jax.jit
def fit_lighting(normal_map: jnp.ndarray, image: jnp.ndarray) -> jnp.ndarray:
    """Fit 16 SH coefficients (reference `lib/light_optimizer.cc:22-55`).

    normal_map: [H, W, 3] (zero where invalid); image: [H, W] shading image.
    Pixels with non-unit normals or intensity < 0.05 are excluded. Uses the
    pseudo-inverse of the accumulated normal equations like the reference.
    """
    finite = jnp.isfinite(normal_map).all(axis=-1)
    nm = jnp.where(finite[..., None], normal_map, 0.0)
    norm = jnp.linalg.norm(nm, axis=-1)
    valid = finite & (jnp.abs(norm - 1.0) <= 1e-4) & (image >= 0.05)
    basis = sh.eval_4_band(nm)  # [H, W, 16]
    # jnp.where (not a mask multiply): excluded pixels may hold NaN normals
    # (unrasterized patches), and 0 * NaN would poison the normal equations.
    # The reference's skip-continue loop (`lib/light_optimizer.cc:36-38`)
    # is naturally NaN-safe; this is its masked equivalent.
    basis = jnp.where(valid[..., None], basis, 0.0)
    b = jnp.einsum("hwl,hw->l", basis, jnp.where(valid, image, 0.0))
    A = jnp.einsum("hwl,hwk->lk", basis, basis)
    return jnp.linalg.pinv(A) @ b


def value_for_normal(params: jnp.ndarray, normals: jnp.ndarray) -> jnp.ndarray:
    """Rendered shading for normals (..., 3) (reference `lib/global_lighting.cc:15-21`)."""
    return jnp.einsum("l,...l->...", params, sh.eval_4_band(normals))


def render_normal_map(params: jnp.ndarray, normal_map: jnp.ndarray) -> jnp.ndarray:
    """Shade a normal map; invalid (non-unit) normals render 0

    (reference `lib/global_lighting.cc:23-46`).
    """
    norm = jnp.linalg.norm(normal_map, axis=-1)
    shaded = value_for_normal(params, normal_map)
    return jnp.where(jnp.abs(norm - 1.0) <= 1e-4, shaded, 0.0)
