"""Joint bilateral filtering of sparse depth maps.

TPU-native counterpart of reference `lib/depth_optimizer.cc:957-1004`
(`depthmap_bilateral_filter`, defaults sigma=5, kernel_size=5 from
`lib/depth_optimizer.h:70-72`): smooth/densify the SGM depth guided by the
color image. Zero depths are holes and carry no weight. Implemented as a sum
of (2k+1)^2 shifted contributions — fully vectorized, no gathers.
"""

from __future__ import annotations

import math

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=('sigma', 'kernel_size', 'color_sigma'))
def depthmap_bilateral_filter(
    depth: jnp.ndarray,
    guide: jnp.ndarray,
    sigma: float = 5.0,
    kernel_size: int = 5,
    color_sigma: float = 0.1,
) -> jnp.ndarray:
    """Filter depth [H, W] guided by guide [H, W] (or [H, W, C]).

    Matches the reference: spatial Gaussian x per-channel Gaussian on guide
    differences, skipping zero-depth taps; output 0 where total weight is 0.
    The reference supports a lower-res depth map via nearest scaling; here
    both inputs are same-res (the pipeline upsamples first if needed).
    """
    if guide.ndim == 2:
        guide = guide[..., None]
    h, w = depth.shape
    k = kernel_size
    dp = jnp.pad(depth, ((k, k), (k, k)))
    gp = jnp.pad(guide, ((k, k), (k, k), (0, 0)), mode="edge")

    num = jnp.zeros_like(depth)
    den = jnp.zeros_like(depth)
    inv_2s2 = 1.0 / (2.0 * sigma * sigma)
    inv_2c2 = 1.0 / (2.0 * color_sigma * color_sigma)
    for ky in range(-k, k + 1):
        for kx in range(-k, k + 1):
            d_tap = dp[k + ky : k + ky + h, k + kx : k + kx + w]
            g_tap = gp[k + ky : k + ky + h, k + kx : k + kx + w]
            w_sp = math.exp(-(kx * kx + ky * ky) * inv_2s2)
            w_col = jnp.exp(-jnp.sum((g_tap - guide) ** 2, axis=-1) * inv_2c2)
            wgt = jnp.where(d_tap > 0, w_sp * w_col, 0.0)
            num = num + wgt * d_tap
            den = den + wgt
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-20), 0.0)
