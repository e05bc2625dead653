"""Multi-neighbor optimization: exercises the pairwise photometric terms
(reference `lib/gauss_newton_step.cc:290-321` / :359-381) and multi-neighbor
visibility, which two-view tests cannot reach."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from smvs_tpu.core.synthetic import make_plane_scene
from smvs_tpu.pipeline import optimizer as O
from smvs_tpu.pipeline.views import make_view
from smvs_tpu.surface import state as S


def test_plane_scene_is_consistent():
    scene = make_plane_scene(n_views=3, dim=120)
    # All views' depths back-project onto the same world plane.
    from smvs_tpu.mesh.pointcloud import backproject

    pts = []
    for cam, d in zip(scene.cameras, scene.depths):
        pts.append(backproject(d, cam).reshape(-1, 3))
    pts = np.concatenate(pts)
    nrm = np.array([0.0, 0.05, 1.0])
    nrm /= np.linalg.norm(nrm)
    resid = pts @ nrm - 5.0
    assert np.abs(resid).max() < 1e-9


def test_three_view_recovery_with_pair_terms():
    scene = make_plane_scene(n_views=3, dim=200)
    main = make_view(scene.cameras[1], scene.images[1], view_id=1,
                     dtype=jnp.float64)
    subs = [make_view(scene.cameras[0], scene.images[0], view_id=0,
                      dtype=jnp.float64),
            make_view(scene.cameras[2], scene.images[2], view_id=2,
                      dtype=jnp.float64)]
    gt = scene.depths[1]
    surf = S.create_planar(5.5, main.width, main.height, 4, dtype=jnp.float64)
    opts = O.OptimizerOptions(
        regularization=0.001, num_iterations=4, min_scale=4,
        use_sgm=False, full_optimization=True, max_newton_steps=40,
    )
    result = O.optimize_view(main, subs, opts, init_surface=surf)
    depth = np.asarray(result.depth)
    mask = depth > 0
    assert mask.mean() > 0.3
    rel = np.abs(depth[mask] - gt[mask]) / gt[mask]
    assert np.median(rel) < 0.005, f"median error {np.median(rel):.4f}"
