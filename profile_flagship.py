"""Steady-state per-stage profile of the FLAGSHIP (-S) bench workload.

The r3 bench measured flagship opt at 4.74s vs 1.14s for base on the same
grid; this breaks the difference into stages (debug_lvl=2 enables the
synced stage timers) to rank the shading-path perf work.
"""
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

from smvs_tpu.core.synthetic import make_plane_scene
from smvs_tpu.pipeline import optimizer as O
from smvs_tpu.pipeline.views import make_view
from smvs_tpu.sgm import stereo as sgm

dim = int(os.environ.get("SMVS_BENCH_DIM", "1440"))
min_scale = int(os.environ.get("SMVS_BENCH_MIN_SCALE", "2"))
scene = make_plane_scene(n_views=3, dim=dim)
views = [make_view(scene.cameras[i], scene.images[i], view_id=i)
         for i in range(3)]
main_v = views[1]
subs = [views[0], views[2]]
np.asarray(main_v.image[0, 0])

for rep in range(2):
    t0 = time.time()
    acc = None
    for s in subs:
        d = np.asarray(sgm.reconstruct_auto(
            scene.cameras[1], scene.cameras[s.view_id],
            main_v.image * 255.0, s.image * 255.0,
            range_main=(3.4, 6.6), range_nbr=(3.4, 6.6)))
        acc = d if acc is None else np.where(
            (acc > 0) & (d > 0), (acc + d) * 0.5,
            np.where((acc == 0) & (d > 0), d, acc))
    sgm_depth = jnp.asarray(acc)
    np.asarray(sgm_depth[0, 0])
    print(f"rep{rep}: sgm {time.time()-t0:.2f}s", flush=True)

    opts = O.OptimizerOptions(
        regularization=0.01, light_surf_regularization=0.0,
        num_iterations=5, min_scale=min_scale, use_sgm=True,
        use_shading=True, full_optimization=False,
        debug_lvl=2)  # syncing stage timers
    t0 = time.time()
    result = O.optimize_view(main_v, subs, opts, sgm_depth=sgm_depth,
                             log=print if rep else None)
    np.asarray(result.depth[0, 0])
    print(f"rep{rep}: opt {time.time()-t0:.2f}s", flush=True)
