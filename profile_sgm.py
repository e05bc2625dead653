"""Time rectified-SGM sub-stages on the default device."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools
import jax.numpy as jnp
import numpy as np

from smvs_tpu.core.synthetic import make_two_view_scene
from smvs_tpu.sgm import stereo as sgm
from smvs_tpu.sgm import rectify as R
from smvs_tpu.sgm import pallas_agg

dim = int(os.environ.get("SMVS_BENCH_DIM", "1440"))
slope = 0.005 * 460.0 / dim
scene = make_two_view_scene(dim=dim, rotate=True, texture="noise",
                            depth_fn=lambda i, j: 5.0 + slope * i + slope * j)
main_img = jnp.asarray(scene.images[1] * 255.0)
nbr_img = jnp.asarray(scene.images[0] * 255.0)
h, w = scene.height, scene.width
rp = R.rectify_pair(scene.cameras[1], scene.cameras[0], w, h,
                    (3.5, 9.5), (3.5, 9.5))
print("rectified pair valid:", rp.valid, "disp:", rp.disp_lo, rp.disp_hi)

main_r = R.warp_homography(main_img, jnp.asarray(np.linalg.inv(rp.H_main)))
nbr_r = R.warp_homography(nbr_img, jnp.asarray(np.linalg.inv(rp.H_nbr)))
D = 128
lo = float(rp.disp_lo)
step = max((rp.disp_hi - lo) / (D - 1), 1e-3)
shifts = jnp.asarray(lo + step * np.arange(D), jnp.float32)

census = jax.jit(sgm.census_transform)
m_hi, m_lo = census(main_r)
np.asarray(m_hi[0, 0])

cost_fn = jax.jit(sgm._disparity_cost)
agg_fn = jax.jit(functools.partial(pallas_agg.aggregate, p1=6, p2=96))
wta = jax.jit(lambda a, c, i: sgm._wta_subpixel(a, c, i, lo, step))

def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x if x.ndim == 0 else x.ravel()[0]), out)
    t0 = time.time()
    for _ in range(3):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x if x.ndim == 0 else x.ravel()[0]), out)
    dt = (time.time() - t0) / 3
    print(f"{name:24s} {dt*1000:8.1f} ms")
    return out

timeit("census", census, main_r)
cost = timeit("disparity_cost(128)", cost_fn, m_hi, m_lo, nbr_r, shifts)
agg = timeit("pallas_aggregate", agg_fn, cost, main_r.astype(jnp.int32))
timeit("wta_subpixel", wta, agg, cost, main_r)
full = jax.jit(lambda: sgm._rectified_sgm(
    main_r, nbr_r, jnp.asarray(rp.H_main, jnp.float32),
    jnp.asarray(rp.L_main, jnp.float32), jnp.asarray(rp.fB, jnp.float32),
    jnp.asarray(rp.off, jnp.float32), jnp.asarray(lo, jnp.float32),
    jnp.asarray(step, jnp.float32), shifts, 6, 96, True))
timeit("full _rectified_sgm", full)
