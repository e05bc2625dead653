"""End-to-end: recover an analytic slanted plane from two synthetic views.

Counterpart of the reference's hermetic harness
(`tests/test_optimization.cc`): checkerboard texture, analytic depth,
second view rendered by warping; run the real optimizer from a coarse
planar initialization and check depth accuracy against ground truth.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from smvs_tpu.core.synthetic import make_two_view_scene
from smvs_tpu.pipeline import optimizer as O
from smvs_tpu.pipeline.views import make_view
from smvs_tpu.surface import state as S


def _setup(dim=232):
    scene = make_two_view_scene(dim=dim, rotate=True)
    # Optimize view 1 (analytic depth) against neighbor view 0.
    main = make_view(scene.cameras[1], scene.images[1], view_id=1,
                     dtype=jnp.float64)
    sub = make_view(scene.cameras[0], scene.images[0], view_id=0,
                    dtype=jnp.float64)
    gt = scene.depths[1]
    return main, sub, gt


def test_two_view_plane_recovery():
    main, sub, gt = _setup()
    scale = 5
    surf = S.create_planar(6.0, main.width, main.height, scale,
                           dtype=jnp.float64)
    opts = O.OptimizerOptions(
        regularization=0.001,
        num_iterations=10,
        min_scale=4,
        use_sgm=False,
        full_optimization=True,
        max_newton_steps=50,
    )
    result = O.optimize_view(main, [sub], opts, init_surface=surf)
    depth = np.asarray(result.depth)
    mask = depth > 0
    assert mask.mean() > 0.3, f"coverage too small: {mask.mean():.3f}"
    rel = np.abs(depth[mask] - gt[mask]) / gt[mask]
    med = np.median(rel)
    assert med < 0.01, f"median relative depth error {med:.4f}"


def test_newton_step_reduces_error():
    """A few Newton steps from a perturbed ground-truth surface must reduce
    the depth error (convergence sanity at a single scale)."""
    main, sub, gt = _setup()
    scale = 5
    surf = S.create_planar(1.0, main.width, main.height, scale,
                           dtype=jnp.float64)
    # Ground-truth-consistent node init: f = plane value at node, slopes in
    # patch units; then perturb.
    ps = surf.patchsize
    ny1, nx1 = surf.node_valid.shape
    jj, ii = np.mgrid[0:ny1, 0:nx1]
    px = surf.start_x + ii * ps
    py = surf.start_y + jj * ps
    nodes = np.zeros((ny1, nx1, 4))
    nodes[..., 0] = 5.0 + 0.005 * px + 0.005 * py
    nodes[..., 1] = 0.005 * ps
    nodes[..., 2] = 0.005 * ps
    rng = np.random.default_rng(0)
    nodes[..., 0] += rng.normal(scale=0.03, size=(ny1, nx1))
    surf = dataclasses.replace(surf, nodes=jnp.asarray(nodes))

    opts = O.OptimizerOptions(regularization=0.001, num_iterations=1,
                              min_scale=scale, use_sgm=False,
                              full_optimization=True, max_newton_steps=8)
    view = O._build_viewset(main, [sub], scale, False, jnp.float64)

    def depth_err(s):
        d = np.asarray(S.depth_map(s))
        m = d > 0
        return np.median(np.abs(d[m] - gt[m]))

    err0 = depth_err(surf)
    out = O.run_newton_iterations(surf, main, [sub], view, opts, None, None)
    err1 = depth_err(out)
    assert err1 < err0 * 0.7, f"error did not shrink: {err0:.4f} -> {err1:.4f}"


def test_patch_tex_score():
    """Texture score = mean abs deviation per patch, gated at mean
    intensity 0.05 (reference `lib/depth_optimizer.cc:914-955`)."""
    surf = S.create_planar(6.0, 32, 32, 3, dtype=jnp.float64)  # 3x3 patches
    ps = surf.patchsize
    sx, sy = surf.start_x, surf.start_y
    img = jnp.zeros((32, 32), jnp.float64)
    # patch (0, 0): bright with strong texture (half 0.2, half 0.8)
    img = img.at[sy:sy + ps, sx:sx + ps // 2].set(0.2)
    img = img.at[sy:sy + ps, sx + ps // 2:sx + ps].set(0.8)
    # patch (0, 1): bright but flat
    img = img.at[sy:sy + ps, sx + ps:sx + 2 * ps].set(0.5)
    # patch (1, 0): textured but too dark (mean < 0.05 gate)
    img = img.at[sy + ps:sy + 2 * ps, sx:sx + ps // 2].set(0.04)
    img = img.at[sy + ps:sy + 2 * ps, sx + ps // 2:sx + ps].set(0.02)
    score = np.asarray(O.patch_tex_score(surf, img))
    assert score.shape == (3, 3)
    np.testing.assert_allclose(score[0, 0], 0.3, rtol=1e-12)
    assert score[0, 1] == 0.0
    assert score[1, 0] == 0.0  # dark gate
    assert score[0, 0] > score[0, 1]


def test_bundle_splat_init_with_expansion():
    """No-SGM mode end-to-end: init from sparse SfM feature splats
    (`Bundle.splat_depth_map`, reference `lib/surface.cc:91-130`) and grow
    the surface by `expand` each outer iteration (reference
    `lib/depth_optimizer.cc:326-338`, `lib/surface.cc:472-628`). The final
    surface must cover far more than the splat footprint and stay accurate.
    """
    from smvs_tpu.core import scene as sc
    from smvs_tpu.core.synthetic import make_plane_scene

    scene = make_plane_scene(n_views=3, dim=160)
    views = [make_view(scene.cameras[i], scene.images[i], view_id=i)
             for i in range(3)]
    main_id = 1
    main = views[main_id]
    subs = [views[0], views[2]]

    # Bundle features sampled from the main view's analytic depth.
    cam = scene.cameras[main_id]
    inv = cam.inverse_calibration(scene.width, scene.height)
    rng = np.random.default_rng(3)
    feats = []
    for _ in range(150):
        x = int(rng.integers(5, scene.width - 5))
        y = int(rng.integers(5, scene.height - 5))
        z = scene.depths[main_id][y, x]
        ray = inv @ np.array([x + 0.5, y + 0.5, 1.0])
        p_world = cam.rot.T @ (ray * z - cam.trans)
        feats.append(sc.Feature3D(pos=p_world,
                                  color=np.array([128, 128, 128]),
                                  refs=[0, 1, 2]))
    bundle = sc.Bundle(cameras=list(scene.cameras), features=feats)
    splat = bundle.splat_depth_map(main_id, cam, scene.width, scene.height)
    splat_cov = float((splat > 0).mean())
    assert splat_cov < 0.02  # sparse by construction

    opts = O.OptimizerOptions(
        regularization=0.01, num_iterations=5, min_scale=4,
        use_sgm=False, full_optimization=True, max_newton_steps=20)
    result = O.optimize_view(main, subs, opts,
                             init_depth=jnp.asarray(splat, jnp.float32))
    depth = np.asarray(result.depth)
    gt = scene.depths[main_id]
    mask = (depth > 0) & (gt > 0)
    cov = float(mask.mean())
    assert cov > 10 * splat_cov, (cov, splat_cov)
    assert cov > 0.25, cov
    rel = np.abs(depth[mask] - gt[mask]) / gt[mask]
    assert np.median(rel) < 0.01, f"median err {np.median(rel):.4f}"
