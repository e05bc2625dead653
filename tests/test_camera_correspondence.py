"""Camera / correspondence tests — counterpart of reference
tests/gtest_correspondence.cc (derivative checks via autodiff/FD)."""

import jax
import jax.numpy as jnp
import numpy as np

from smvs_tpu.core.camera import Camera, depth_mve_to_z, depth_z_to_mve
from smvs_tpu.geometry import correspondence as corr


def _make_pair(dim=200):
    rot1 = np.array(
        [
            [0.9958143234, -0.09047859907, -0.02066593803],
            [0.0904353857, 0.996034503, -0.003206958761],
            [0.02082847804, 0.001360671129, 0.9998072386],
        ]
    )
    cam0 = Camera(flen=1.0, rot=np.eye(3), trans=np.zeros(3))
    cam1 = Camera(flen=0.9, rot=rot1, trans=np.array([0.3, 0.05, -0.02]))
    M, t = cam0.fill_reprojection(cam1, dim, dim, dim, dim)
    return cam0, cam1, jnp.asarray(M), jnp.asarray(t), dim


def test_warp_matches_direct_camera_math():
    cam0, cam1, M, t, dim = _make_pair()
    # Take a world point, project into both cameras, verify the warp maps
    # cam0's (pixel, z-depth) to cam1's pixel and z-depth.
    pw = np.array([[0.1, -0.2, 4.0], [0.5, 0.3, 6.0], [-0.4, 0.1, 3.0]])
    p0 = cam0.world_to_cam(pw)
    p1 = cam1.world_to_cam(pw)
    uv0 = cam0.project(p0, dim, dim)
    uv1 = cam1.project(p1, dim, dim)
    proj, d = corr.warp(M, t, jnp.asarray(uv0[:, 0]), jnp.asarray(uv0[:, 1]),
                        jnp.asarray(p0[:, 2]))
    np.testing.assert_allclose(np.asarray(proj), uv1, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(d), p1[:, 2], rtol=1e-9)


def test_warp_jacobian_matches_autodiff():
    # The closed-form 2x2 Jacobian (reference lib/correspondence.cc:89-100)
    # equals the autodiff derivative of the warp along the depth surface.
    _, _, M, t, _ = _make_pair()
    w0, wdx, wdy = 5.0, 0.02, -0.03

    def warped(uv):
        u, v = uv[0], uv[1]
        # depth varies linearly along the surface
        w = w0 + wdx * (u - 100.0) + wdy * (v - 120.0)
        p, _ = corr.warp(M, t, u, v, w)
        return p

    uv = jnp.asarray([100.0, 120.0])
    jac_auto = jax.jacfwd(warped)(uv)
    jac_closed = corr.warp_jacobian(M, t, uv[0], uv[1], jnp.float64(w0),
                                    jnp.float64(wdx), jnp.float64(wdy))
    np.testing.assert_allclose(np.asarray(jac_closed), np.asarray(jac_auto),
                               rtol=1e-9)


def test_jacobian_condition_matches_svd():
    rng = np.random.default_rng(0)
    for _ in range(5):
        j = rng.normal(size=(2, 2))
        s = np.linalg.svd(j, compute_uv=False)
        want = (s[0] ** 2) / (s[1] ** 2)
        got = corr.jacobian_condition(jnp.asarray(j))
        np.testing.assert_allclose(float(got), want, rtol=1e-8)


def test_depth_convention_roundtrip():
    cam = Camera(flen=1.2, rot=np.eye(3), trans=np.zeros(3))
    inv = cam.inverse_calibration(64, 48)
    rng = np.random.default_rng(1)
    d = rng.uniform(1.0, 5.0, size=(48, 64))
    d[10:20, 5:15] = 0.0
    mve = depth_z_to_mve(d, inv)
    back = depth_mve_to_z(mve, inv)
    np.testing.assert_allclose(back, d, rtol=1e-12)
    # distance-along-ray >= z-depth
    assert np.all(mve[d > 0] >= d[d > 0])


def test_reprojection_composition_is_identity():
    # Needs a *properly orthogonal* rotation (the reference's hard-coded
    # matrix is only orthogonal to ~3e-4, which breaks exact roundtripping).
    _, cam1_raw, _, _, dim = _make_pair()
    u, _, vt = np.linalg.svd(cam1_raw.rot)
    cam0 = Camera(flen=1.0, rot=np.eye(3), trans=np.zeros(3))
    cam1 = Camera(flen=0.9, rot=u @ vt, trans=cam1_raw.trans)
    M, t = cam0.fill_reprojection(cam1, dim, dim, dim, dim)
    M = jnp.asarray(M)
    t = jnp.asarray(t)
    M10, t10 = cam1.fill_reprojection(cam0, dim, dim, dim, dim)
    uv = jnp.asarray([80.0, 90.0])
    w = jnp.float64(4.2)
    p1, d1 = corr.warp(M, t, uv[0], uv[1], w)
    p0, d0 = corr.warp(jnp.asarray(M10), jnp.asarray(t10), p1[0], p1[1], d1)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(uv), rtol=1e-9)
    np.testing.assert_allclose(float(d0), float(w), rtol=1e-9)
