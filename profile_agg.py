"""True device-time of SGM sub-ops: run each op N times inside one jit."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools
import numpy as np
import jax.numpy as jnp
from smvs_tpu.sgm import pallas_agg as PA
from smvs_tpu.sgm import stereo as sgm

H = W = 1440
D = 128
rng = np.random.default_rng(0)
cost = jnp.asarray(rng.integers(0, 126, size=(H, W, D)), jnp.int16)
inten = jnp.asarray(rng.integers(0, 255, size=(H, W)), jnp.int32)
img = jnp.asarray(rng.uniform(1.0, 255.0, size=(H, W)), jnp.float32)

ph, pw = (-H) % 8, (-W) % 8
c16 = jnp.pad(cost, ((0, ph), (0, pw), (0, 0)))
it = jnp.pad(inten, ((0, ph), (0, pw)))
ct = jnp.swapaxes(c16, 0, 1)
itT = it.T

N = 8

def devtime(tag, body, x0, *rest):
    @jax.jit
    def run(x, *a):
        return jax.lax.fori_loop(0, N, lambda i, xx: body(xx, *a), x)

    out = run(x0, *rest)
    np.asarray(out.ravel()[0])
    t0 = time.time()
    out = run(x0, *rest)
    np.asarray(out.ravel()[0])
    dt = (time.time() - t0) / N
    print(f"{tag:28s} {dt*1000:8.2f} ms/call", flush=True)

devtime("hpass",
        lambda x, c, i: PA._fused_pass(c, i, x, False, (0,), 6, 96),
        jnp.zeros_like(ct), ct, itT)
devtime("vpass3",
        lambda x, c, i: PA._fused_pass(c, i, x, False, (0, 1, -1), 6, 96),
        jnp.zeros_like(c16), c16, it)
devtime("census",
        lambda x, im: x + sgm.census_transform(
            im + x[0, 0].astype(im.dtype))[0].astype(jnp.int32)[..., None],
        jnp.zeros((H, W, 1), jnp.int32), img)

m_hi, m_lo = jax.jit(sgm.census_transform)(img)
shifts = jnp.asarray(15.0 + 0.63 * np.arange(D), jnp.float32)
devtime("disparity_cost(128)",
        lambda x, mh, ml, im, sh: x + sgm._disparity_cost(
            mh, ml, im + x[0, 0, 0].astype(im.dtype), sh),
        jnp.zeros((H, W, D), jnp.int32), m_hi, m_lo, img, shifts)
devtime("disparity_cost_interp(128)",
        lambda x, mh, ml, im, sh: x + sgm._disparity_cost_interp(
            mh, ml, im + x[0, 0, 0].astype(im.dtype), sh),
        jnp.zeros((H, W, D), jnp.int32), m_hi, m_lo, img, shifts)
