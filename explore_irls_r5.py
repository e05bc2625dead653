"""r5 experiment: reproduce & diagnose the flagship f32-exact-gather
error regression (VERDICT r4 weak #1 / next #1).

With bf16_gather=True (shipped default) the flagship bench reports
median rel err 1.8e-5; with exact f32 gathers it regressed to 0.14-1%.
The bf16 quantization was credited with "breaking pathological
near-zero-residual IRLS configurations" — this script reproduces the
delta and instruments WHERE the exact-gather path goes wrong.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from smvs_tpu.core.synthetic import make_plane_scene
from smvs_tpu.pipeline import optimizer as O
from smvs_tpu.pipeline.views import make_view
from smvs_tpu.sgm import stereo as sgm


def run(dim, bf16, min_scale=2, **kw):
    scene = make_plane_scene(n_views=3, dim=dim)
    views = [make_view(scene.cameras[i], scene.images[i], view_id=i)
             for i in range(3)]
    main_v = views[1]
    subs = [views[0], views[2]]
    sgm_depth = sgm.reconstruct_auto_multi(
        scene.cameras[1], [scene.cameras[s.view_id] for s in subs],
        main_v.image * 255.0, [s.image * 255.0 for s in subs],
        (3.4, 6.6), [(3.4, 6.6)] * len(subs))
    np.asarray(sgm_depth[0, 0])

    opts = O.OptimizerOptions(
        regularization=0.01, light_surf_regularization=0.0,
        num_iterations=5, min_scale=min_scale, use_sgm=True,
        use_shading=True, full_optimization=False, bf16_gather=bf16,
        debug_lvl=1, **kw)
    t0 = time.time()
    result = O.optimize_view(main_v, subs, opts, sgm_depth=sgm_depth,
                             log=lambda m: print(m, file=sys.stderr))
    depth = np.asarray(result.depth)
    t = time.time() - t0
    mask = depth > 0
    gt = scene.depths[1]
    rel = np.abs(depth[mask] - gt[mask]) / gt[mask]
    return {
        "bf16": bf16, "dim": dim, "opt_s": round(t, 2),
        "coverage": round(float(mask.mean()), 4),
        "median_rel_err": float(np.median(rel)),
        "p90_rel_err": float(np.percentile(rel, 90)),
        "max_rel_err": float(rel.max()),
    }


if __name__ == "__main__":
    dim = int(os.environ.get("DIM", "720"))
    for bf16 in (True, False):
        r = run(dim, bf16)
        print(json.dumps(r), flush=True)
