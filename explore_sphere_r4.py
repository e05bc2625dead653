"""Bisect the sphere-test regression: flexible CG vs omega policy."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from smvs_tpu.solver import mg

POL = os.environ.get("POL", "rel")
FLEX = os.environ.get("FLEX", "1")

if POL == "const":
    _orig = mg._node_omega
    mg._node_omega = lambda Hb, pinv: jnp.full(Hb.shape[-2:], mg.OMEGA,
                                               Hb.dtype)
if FLEX == "0":
    from smvs_tpu.solver import cg as _cg

    _solve = _cg.solve

    def _noflex(*a, **k):
        k["flexible"] = False
        return _solve(*a, **k)

    _cg.solve = _noflex

from smvs_tpu.core.synthetic import make_lambertian_sphere_scene
from smvs_tpu.image import ops as iops
from smvs_tpu.pipeline import optimizer as O
from smvs_tpu.pipeline.views import make_view
from smvs_tpu.surface import state as S

scene = make_lambertian_sphere_scene(n_views=3, dim=200)
gt = scene.depths[1]
main = make_view(scene.cameras[1], scene.images[1], view_id=1,
                 dtype=jnp.float64)
subs = [make_view(scene.cameras[i], scene.images[i], view_id=i,
                  dtype=jnp.float64) for i in (0, 2)]
gt_j = jnp.asarray(np.where(gt > 0, gt, 0.0))
init = jnp.where(gt_j > 0,
                 iops.gaussian_blur(jnp.where(gt_j > 0, gt_j, 3.9), 6.0),
                 0.0).astype(jnp.float64)


def run(use_shading):
    surf = S.create_from_depth(init, 3)
    opts = O.OptimizerOptions(
        regularization=0.01, light_surf_regularization=50.0,
        num_iterations=3, min_scale=2, use_sgm=False,
        use_shading=use_shading, full_optimization=True,
        max_newton_steps=40)
    r = O.optimize_view(main, subs, opts, init_surface=surf)
    depth = np.asarray(r.depth)
    mask = (depth > 0) & (gt > 0)
    rel = np.abs(depth[mask] - gt[mask]) / gt[mask]
    return float(mask.mean()), float(np.median(rel))


cov_on, err_on = run(True)
cov_off, err_off = run(False)
print(f"POL={POL} FLEX={FLEX}: on=({cov_on:.3f}, {err_on:.5f}) "
      f"off=({cov_off:.3f}, {err_off:.5f})", flush=True)
