"""Image-op tests: quadratic-fit gradients, blur, sampling custom-JVP."""

import jax
import jax.numpy as jnp
import numpy as np

from smvs_tpu.image import bilateral, gradients, ops


def test_gradients_exact_on_quadratic():
    # The 3x3 LS quadratic fit recovers a global quadratic exactly
    # (reference lib/stereo_view.cc:98-188).
    h, w = 24, 30
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    a, b, c, d, e, f0 = 0.02, -0.01, 0.005, 0.3, -0.2, 1.0
    img = a * xs**2 + b * ys**2 + c * xs * ys + d * xs + e * ys + f0
    grad, hess = gradients.gradients_and_hessian(jnp.asarray(img))
    gx = 2 * a * xs + c * ys + d
    gy = 2 * b * ys + c * xs + e
    interior = np.s_[2:-2, 2:-2]
    np.testing.assert_allclose(np.asarray(grad[0])[interior], gx[interior], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(grad[1])[interior], gy[interior], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(hess[0])[interior], 2 * a, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(hess[1])[interior], c, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(hess[2])[interior], 2 * b, rtol=1e-9)
    # Border ring is zeroed like the reference.
    assert float(jnp.abs(grad[:, 0, :]).max()) == 0.0


def test_gaussian_blur_preserves_constant_and_mass():
    img = jnp.full((16, 16), 3.5)
    out = ops.gaussian_blur(img, 1.3)
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-12)
    imp = jnp.zeros((33, 33)).at[16, 16].set(1.0)
    out = ops.gaussian_blur(imp, 2.0)
    np.testing.assert_allclose(float(out.sum()), 1.0, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out)[::-1, ::-1],
                               rtol=1e-12)


def test_bilinear_matches_manual():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(8, 9)))
    x, y = 3.3, 2.7
    v = float(ops.bilinear(img, jnp.float64(x), jnp.float64(y)))
    i0, j0 = 3, 2
    fx, fy = x - i0, y - j0
    want = (
        img[j0, i0] * (1 - fx) * (1 - fy)
        + img[j0, i0 + 1] * fx * (1 - fy)
        + img[j0 + 1, i0] * (1 - fx) * fy
        + img[j0 + 1, i0 + 1] * fx * fy
    )
    np.testing.assert_allclose(v, float(want), rtol=1e-12)


def test_sample_gradient_jvp_routes_through_hessian():
    # d(sampled gradient)/d(position) must be the *sampled image Hessian*,
    # not the derivative of the bilinear weights — this reproduces
    # reference lib/gauss_newton_step.cc:195-207 semantics under jacfwd.
    rng = np.random.default_rng(1)
    grad_img = jnp.asarray(rng.normal(size=(2, 10, 11)))
    hess_img = jnp.asarray(rng.normal(size=(3, 10, 11)))

    def f(xy):
        return ops.sample_gradient(grad_img, hess_img, xy[0], xy[1])

    xy = jnp.asarray([4.3, 5.6])
    jac = jax.jacfwd(f)(xy)
    hxx = float(ops.bilinear(hess_img[0], xy[0], xy[1]))
    hxy = float(ops.bilinear(hess_img[1], xy[0], xy[1]))
    hyy = float(ops.bilinear(hess_img[2], xy[0], xy[1]))
    np.testing.assert_allclose(np.asarray(jac), np.array([[hxx, hxy], [hxy, hyy]]),
                               rtol=1e-9)


def test_half_size_shapes_and_values():
    img = jnp.arange(16.0).reshape(4, 4)
    half = ops.rescale_half_size(img)
    assert half.shape == (2, 2)
    np.testing.assert_allclose(float(half[0, 0]), (0 + 1 + 4 + 5) / 4, rtol=1e-12)
    g = ops.rescale_half_size_gaussian(jnp.full((9, 7), 2.0))
    assert g.shape == (5, 4)
    np.testing.assert_allclose(np.asarray(g), 2.0, rtol=1e-12)


def test_bilateral_fills_holes_and_respects_edges():
    h, w = 20, 20
    depth = np.full((h, w), 2.0)
    depth[:, 10:] = 4.0
    guide = np.zeros((h, w))
    guide[:, 10:] = 1.0
    # Punch holes
    holes = np.zeros_like(depth, dtype=bool)
    holes[5, 5] = holes[5, 15] = True
    depth_in = depth.copy()
    depth_in[holes] = 0.0
    out = np.asarray(
        bilateral.depthmap_bilateral_filter(jnp.asarray(depth_in), jnp.asarray(guide))
    )
    # Holes filled with the side-consistent value (guide prevents bleed).
    np.testing.assert_allclose(out[5, 5], 2.0, rtol=1e-6)
    np.testing.assert_allclose(out[5, 15], 4.0, rtol=1e-6)


def test_luminance_and_srgb():
    rgb = jnp.asarray([[[1.0, 1.0, 1.0]]])
    np.testing.assert_allclose(np.asarray(ops.luminance(rgb))[0, 0], 1.0,
                               rtol=1e-6)
    np.testing.assert_allclose(float(ops.srgb_to_linear(jnp.asarray(0.0))), 0.0)
    np.testing.assert_allclose(float(ops.srgb_to_linear(jnp.asarray(1.0))), 1.0,
                               rtol=1e-9)
    assert float(ops.srgb_to_linear(jnp.asarray(0.5))) < 0.5
