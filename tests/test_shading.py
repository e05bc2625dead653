"""Shading subsystem tests: SH lighting fit + shading-aware optimization."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from smvs_tpu.core.synthetic import make_two_view_scene
from smvs_tpu.pipeline import optimizer as O
from smvs_tpu.pipeline.views import make_view
from smvs_tpu.shading import lighting, sh
from smvs_tpu.surface import state as S


def _random_unit_normals(n, rng):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    # camera-facing hemisphere like real normal maps
    v[:, 2] = -np.abs(v[:, 2])
    return v


def test_fit_lighting_recovers_params():
    rng = np.random.default_rng(0)
    # strong ambient keeps the render positive (no clamping, exact fit)
    params_true = jnp.asarray(rng.normal(size=16) * 0.05 +
                              np.eye(16)[0] * 2.0)
    normals = _random_unit_normals(64 * 64, rng).reshape(64, 64, 3)
    image = lighting.value_for_normal(params_true, jnp.asarray(normals))
    assert float(image.min()) > 0.05
    fitted = lighting.fit_lighting(jnp.asarray(normals), image)
    # The fit reproduces the *shading*, not necessarily the coefficients
    # (the scaled SH basis is not orthogonal).
    recon = lighting.value_for_normal(fitted, jnp.asarray(normals))
    err = np.abs(np.asarray(recon) - np.asarray(image))
    mask = np.asarray(image) > 0.06
    assert np.median(err[mask]) < 1e-6


def test_fit_lighting_ignores_invalid_normals():
    rng = np.random.default_rng(1)
    normals = _random_unit_normals(100, rng).reshape(10, 10, 3)
    normals[0, :] = 0.0  # invalid
    params = jnp.asarray(rng.normal(size=16))
    img = lighting.value_for_normal(params, jnp.asarray(normals))
    img = jnp.maximum(img, 0.06)
    fitted = lighting.fit_lighting(jnp.asarray(normals), img)
    assert np.isfinite(np.asarray(fitted)).all()


def test_render_normal_map_zeroes_invalid():
    params = jnp.zeros(16).at[0].set(1.0)
    nm = jnp.zeros((4, 4, 3)).at[1, 1].set(jnp.asarray([0.0, 0.0, -1.0]))
    out = np.asarray(lighting.render_normal_map(params, nm))
    assert out[1, 1] != 0.0
    assert out[0, 0] == 0.0


def test_shading_term_recovers_textureless_sphere():
    """The headline capability of the reference paper (ECCV 2016): on a
    textureless Lambertian surface the base photometric term has no anchor —
    the normal-divergence regularizer flattens the shape — while the SH
    shading term (reference `lib/gauss_newton_step.cc:420-516`) ties
    intensity to normals and preserves it.

    Thresholds are calibrated against the REFERENCE's measured behavior on
    this exact scene (baseline/ harness, reference code, blurred-GT init,
    2 neighbors, 3 iterations, alpha 0.01, light-reg 50): the reference
    lands at median error 2.45% with shading on — the term stabilizes the
    textureless shape against regularizer flattening rather than driving
    error to zero. Ours must land in the same band and beat shading-off
    (observed: on 2.3% vs off 4.0%; reference-off under SGM-style init:
    0.65%, but its shading-on is still 2.45%)."""
    from smvs_tpu.core.synthetic import make_lambertian_sphere_scene
    from smvs_tpu.image import ops as iops

    scene = make_lambertian_sphere_scene(n_views=3, dim=200)
    gt = scene.depths[1]
    main = make_view(scene.cameras[1], scene.images[1], view_id=1,
                     dtype=jnp.float64)
    subs = [make_view(scene.cameras[i], scene.images[i], view_id=i,
                      dtype=jnp.float64) for i in (0, 2)]
    # degraded init: heavily blurred ground truth (shape detail lost)
    gt_j = jnp.asarray(np.where(gt > 0, gt, 0.0))
    init = jnp.where(
        gt_j > 0,
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

    cov_off, err_off = run(False)
    cov_on, err_on = run(True)
    assert cov_on > 0.6
    # Reference-parity band (see docstring): 2.45% measured for the
    # reference's shading-on run on this scene. Ours has since improved
    # to ~0.7% (r4 solver work), 3.5x better than the reference.
    assert err_on < 0.015, f"shading-on error {err_on:.4f}"
    # The shading term must still help measurably. The original 1.5x
    # margin was calibrated at on=2.3% / off=4.0%; both modes improved
    # ~3x since (r4: on=0.76%, off=1.13%), compressing the ratio — the
    # regularizer flattens less when the solver converges further. Keep
    # a significance margin, not the historical magnitude.
    assert err_off > 1.25 * err_on, (
        f"shading should help >=1.25x: off={err_off:.4f} on={err_on:.4f}")


def test_shading_aware_optimization_runs():
    # End-to-end smoke: the -S path (SH fit at scale<4 + shading term in the
    # GN assembly) must run and still recover the plane.
    scene = make_two_view_scene(dim=200, rotate=True)
    main = make_view(scene.cameras[1], scene.images[1], view_id=1,
                     dtype=jnp.float64)
    sub = make_view(scene.cameras[0], scene.images[0], view_id=0,
                    dtype=jnp.float64)
    gt = scene.depths[1]
    surf = S.create_planar(6.0, main.width, main.height, 4, dtype=jnp.float64)
    opts = O.OptimizerOptions(
        regularization=0.001, light_surf_regularization=50.0,
        num_iterations=4, min_scale=3, use_sgm=False, use_shading=True,
        full_optimization=True, max_newton_steps=30,
    )
    result = O.optimize_view(main, [sub], opts, init_surface=surf)
    assert result.lighting is not None
    depth = np.asarray(result.depth)
    mask = depth > 0
    assert mask.mean() > 0.2
    rel = np.abs(depth[mask] - gt[mask]) / gt[mask]
    assert np.median(rel) < 0.02, f"median error {np.median(rel):.4f}"
