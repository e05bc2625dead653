"""Stage-level device times inside _rectified_sgm at bench size (r4 #8).

Components measured separately under jit with forced results; the
missing-vs-full delta is the consistency + un-rectify tail.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from smvs_tpu.core.synthetic import make_two_view_scene
from smvs_tpu.sgm import pallas_agg
from smvs_tpu.sgm import rectify as R
from smvs_tpu.sgm import stereo as sgm

dim = int(os.environ.get("SMVS_BENCH_DIM", "1440"))
slope = 0.005 * 460.0 / dim
scene = make_two_view_scene(dim=dim, rotate=True, texture="noise",
                            depth_fn=lambda i, j: 5.0 + slope * i + slope * j)
main_img = jnp.asarray(scene.images[1] * 255.0)
nbr_img = jnp.asarray(scene.images[0] * 255.0)
h, w = scene.height, scene.width
rp = R.rectify_pair(scene.cameras[1], scene.cameras[0], w, h,
                    (3.5, 9.5), (3.5, 9.5))
D = 128
lo = float(rp.disp_lo)
step = max((rp.disp_hi - lo) / (D - 1), 1e-3)
shifts = jnp.asarray(lo + step * np.arange(D), jnp.float32)
hinv_m = jnp.asarray(np.linalg.inv(rp.H_main), jnp.float32)
hinv_n = jnp.asarray(np.linalg.inv(rp.H_nbr), jnp.float32)


def force(out):
    jax.tree.map(lambda x: np.asarray(x.ravel()[0]), out)


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    force(out)
    print(f"{name:28s} {(time.time()-t0)/n*1000:8.1f} ms", flush=True)
    return out


warp = jax.jit(R.warp_homography, static_argnames=("out_width",))
main_r = timeit("warp_homography", warp, main_img, hinv_m)
nbr_r = warp(nbr_img, hinv_n, out_width=w + 2 * rp.nbr_pad)
force(nbr_r)

census = jax.jit(sgm.census_transform)
m_hi, m_lo = timeit("census", census, main_r)
n_hi, n_lo = census(nbr_r)
force(n_hi)

cost_fn = jax.jit(sgm._disparity_cost)
cost_m = timeit("disparity_cost", cost_fn, m_hi, m_lo, nbr_r, shifts)
cost_n = cost_fn(n_hi, n_lo, main_r, -shifts)
force(cost_n)

agg_fn = jax.jit(functools.partial(pallas_agg.aggregate_batch, p1=6, p2=96))
agg2 = timeit("aggregate_batch(2)", agg_fn, jnp.stack([cost_m, cost_n]),
              jnp.stack([main_r, nbr_r]).astype(jnp.int32))

wta = jax.jit(lambda a, c, i: sgm._wta_subpixel(a, c, i, lo, step))
timeit("wta_subpixel", wta, agg2[0], cost_m, main_r)

full = jax.jit(lambda mi, ni: sgm._rectified_sgm(
    mi, ni, jnp.asarray(np.linalg.inv(rp.H_nbr), jnp.float32),
    jnp.asarray(rp.H_main, jnp.float32),
    jnp.asarray(rp.L_main, jnp.float32), jnp.asarray(rp.fB, jnp.float32),
    jnp.asarray(rp.off, jnp.float32), jnp.asarray(lo, jnp.float32),
    jnp.asarray(step, jnp.float32), shifts, 6, 96, True))
timeit("full _rectified_sgm", full, main_r, nbr_r)

packed = jax.jit(functools.partial(sgm._rectified_sgm_packed, num_steps=D,
                                   p1=6, p2=96, use_pallas=True,
                                   nbr_pad=rp.nbr_pad))
params = jnp.asarray(np.concatenate([
    np.linalg.inv(rp.H_main).ravel(), np.linalg.inv(rp.H_nbr).ravel(),
    np.asarray(rp.H_main).ravel(), np.asarray(rp.L_main).ravel(),
    [rp.fB, rp.off, lo, step]]), jnp.float32)
timeit("packed (incl warps)", packed, main_img, nbr_img, params)
