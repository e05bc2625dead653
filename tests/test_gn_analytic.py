"""Closed-form GN assembly vs the autodiff (jax.linearize) oracle.

The autodiff path is itself validated against finite differences and the
synthetic end-to-end scenes; here the analytic data-term Jacobians
(`gn.patch_grad_hessian_analytic`, reference `lib/correspondence.cc:53-187`)
must reproduce its (g, H) bit-for-bit up to fp reassociation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smvs_tpu.pipeline import optimizer as O
from smvs_tpu.pipeline.views import make_view
from smvs_tpu.core.synthetic import make_plane_scene
from smvs_tpu.solver import gn
from smvs_tpu.surface import state as S


def _problem(n_views=2, use_shading=False, dim=96, scale=3):
    scene = make_plane_scene(n_views=n_views + 1, dim=dim)
    main = make_view(scene.cameras[0], scene.images[0], view_id=0)
    subs = [make_view(scene.cameras[i], scene.images[i], view_id=i)
            for i in range(1, n_views + 1)]
    surf = S.create_from_depth(
        jnp.asarray(scene.depths[0], jnp.float64), scale)
    view = O._build_viewset(main, subs, scale, use_shading, jnp.float64)
    rng = np.random.default_rng(7)
    vis = jnp.asarray(
        rng.uniform(size=(*surf.patch_valid.shape, n_views)) > 0.2)
    vis = vis & surf.patch_valid[..., None]
    lighting = None
    if use_shading:
        lighting = jnp.asarray(rng.normal(size=16) * 0.1 + 0.3, jnp.float64)
    return surf, view, vis, lighting


@pytest.mark.parametrize("n_views,use_shading", [(1, False), (3, False),
                                                 (1, True), (2, True)])
def test_analytic_matches_autodiff(n_views, use_shading):
    surf, view, vis, lighting = _problem(n_views, use_shading)
    active = surf.node_valid
    base = gn.GNOptions(regularization=0.013, light_surf_regularization=0.5)

    g_ad, H_ad = gn.assemble(surf, view, vis, active,
                             dataclasses.replace(base, analytic=False),
                             lighting)
    g_an, H_an = gn.assemble(surf, view, vis, active,
                             dataclasses.replace(base, analytic=True),
                             lighting)
    scale_g = np.abs(np.asarray(g_ad)).max() + 1e-12
    scale_h = np.abs(np.asarray(H_ad)).max() + 1e-12
    np.testing.assert_allclose(np.asarray(g_an) / scale_g,
                               np.asarray(g_ad) / scale_g, atol=1e-9)
    np.testing.assert_allclose(np.asarray(H_an) / scale_h,
                               np.asarray(H_ad) / scale_h, atol=1e-9)
