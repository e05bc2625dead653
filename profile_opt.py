"""Steady-state per-stage profile of the bench workload on the default device."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from smvs_tpu.core.synthetic import make_two_view_scene
from smvs_tpu.pipeline import optimizer as O
from smvs_tpu.pipeline.views import make_view
from smvs_tpu.sgm import stereo as sgm

dim = int(os.environ.get("SMVS_BENCH_DIM", "1440"))
min_scale = int(os.environ.get("SMVS_BENCH_MIN_SCALE", "2"))
slope = 0.005 * 460.0 / dim
scene = make_two_view_scene(dim=dim, rotate=True, texture="noise",
                            depth_fn=lambda i, j: 5.0 + slope * i + slope * j)
main_v = make_view(scene.cameras[1], scene.images[1], view_id=1)
sub_v = make_view(scene.cameras[0], scene.images[0], view_id=0)
np.asarray(main_v.image[0, 0])

for rep in range(2):
    t0 = time.time()
    sgm_depth = sgm.reconstruct_auto(
        scene.cameras[1], scene.cameras[0],
        main_v.image * 255.0, sub_v.image * 255.0,
        range_main=(3.5, 9.5), range_nbr=(3.5, 9.5))
    np.asarray(sgm_depth[0, 0])
    print(f"rep{rep}: sgm {time.time()-t0:.2f}s", flush=True)

    opts = O.OptimizerOptions(regularization=0.01, num_iterations=5,
                              min_scale=min_scale, use_sgm=True,
                              full_optimization=False,
                              debug_lvl=2)  # syncing stage timers
    t0 = time.time()
    result = O.optimize_view(main_v, [sub_v], opts, sgm_depth=sgm_depth,
                             log=print if rep else None)
    np.asarray(result.depth[0, 0])
    print(f"rep{rep}: opt {time.time()-t0:.2f}s", flush=True)
