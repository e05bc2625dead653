"""Closed-form GN assembly vs the autodiff (jax.linearize) oracle.

The autodiff path is itself validated against finite differences and the
synthetic end-to-end scenes; here the analytic data/shading-term Jacobians
(`gn._assemble_flat`, reference `lib/correspondence.cc:53-187` and
`lib/gauss_newton_step.cc:420-516`) must reproduce its (g, H) bit-for-bit
up to fp reassociation.
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


def test_bf16_gather_viewset_close_to_f32():
    """The bf16 x-paired sampling format (iops.pack_gradhess_pair10)
    perturbs the assembled system at bf16 quantization level. The IRLS
    weights (1/(1e-4+|r|)) amplify rows with near-zero residuals, so the
    per-step gradient can move by ~12% of its max entry — but the
    CONVERGED depth is set by the optimization criteria, not gradient
    precision: end-to-end error is unchanged (see OptimizerOptions.
    bf16_gather). This test bounds the system perturbation; the
    end-to-end accuracy gates are the pipeline/parity tests, which run
    with bf16_gather on by default."""
    import jax.numpy as jnp

    scene = make_plane_scene(n_views=2, dim=96)
    main = make_view(scene.cameras[0], scene.images[0], view_id=0,
                     dtype=jnp.float32)
    subs = [make_view(scene.cameras[1], scene.images[1], view_id=1,
                      dtype=jnp.float32)]
    surf = S.create_from_depth(jnp.asarray(scene.depths[0], jnp.float32), 3)
    vf32 = O._build_viewset(main, subs, 3, False, jnp.float32)
    vbf16 = O._build_viewset(main, subs, 3, False, jnp.float32,
                             bf16_gather=True)
    assert vbf16.sub_gh.shape[-1] == 10 and vbf16.sub_gh.dtype == jnp.bfloat16
    vis = jnp.ones((*surf.patch_valid.shape, 1), bool)
    opts = gn.GNOptions(regularization=0.01)
    g32, H32 = gn.assemble(surf, vf32, vis, surf.node_valid, opts, None)
    gbf, Hbf = gn.assemble(surf, vbf16, vis, surf.node_valid, opts, None)
    sg = float(np.abs(np.asarray(g32)).max()) + 1e-12
    sh = float(np.abs(np.asarray(H32)).max()) + 1e-12
    assert np.abs(np.asarray(gbf) - np.asarray(g32)).max() / sg < 0.25
    assert np.abs(np.asarray(Hbf) - np.asarray(H32)).max() / sh < 0.25


def test_sample_window_pair10_matches_sample_window():
    import jax.numpy as jnp

    from smvs_tpu.image import ops as iops

    rng = np.random.default_rng(3)
    grad = jnp.asarray(rng.normal(size=(2, 40, 50)), jnp.float32)
    hess = jnp.asarray(rng.normal(size=(3, 40, 50)), jnp.float32)
    img5 = iops.pack_gradhess(grad, hess)
    img10 = iops.pack_gradhess_pair10(grad, hess)
    x = jnp.asarray(rng.uniform(0, 49, size=200), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 39, size=200), jnp.float32)
    a = np.asarray(iops.sample_window(img5, x, y))
    b = np.asarray(iops.sample_window_pair10(img10, x, y))
    np.testing.assert_allclose(b, a, atol=2e-2, rtol=2e-2)

