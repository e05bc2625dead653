"""Stencil linear algebra + CG tests — counterpart of reference
tests/gtest_matrix_vector.cc (block sparse matrix / solver checks)."""

import numpy as np
import jax.numpy as jnp

from smvs_tpu.solver import cg, stencil


def _random_patch_system(ny, nx, rng, active=None):
    g_patch = rng.normal(size=(ny, nx, 16))
    A = rng.normal(size=(ny, nx, 16, 16))
    H_patch = A @ A.transpose(0, 1, 3, 2) + 16 * np.eye(16)  # SPD per patch
    pv = np.ones((ny, nx), dtype=bool)
    if active is None:
        active = np.ones((ny + 1, nx + 1), dtype=bool)
    return g_patch, H_patch, pv, active


def _dense_from_patches(g_patch, H_patch, pv, active):
    """Brute-force dense assembly mirroring the reference's block scatter."""
    ny, nx = g_patch.shape[:2]
    nn = (ny + 1) * (nx + 1)
    G = np.zeros((nn, 4))
    H = np.zeros((nn, 4, nn, 4))
    offs = [(0, 0), (1, 0), (0, 1), (1, 1)]
    for j in range(ny):
        for i in range(nx):
            if not pv[j, i]:
                continue
            nid = [(j + ay) * (nx + 1) + (i + ax) for ax, ay in offs]
            for a in range(4):
                if not active[j + offs[a][1], i + offs[a][0]]:
                    continue
                G[nid[a]] += g_patch[j, i, 4 * a : 4 * a + 4]
                for b in range(4):
                    if not active[j + offs[b][1], i + offs[b][0]]:
                        continue
                    H[nid[a], :, nid[b], :] += H_patch[
                        j, i, 4 * a : 4 * a + 4, 4 * b : 4 * b + 4
                    ]
    return G.reshape(nn * 4), H.reshape(nn * 4, nn * 4)


def test_scatter_and_spmv_match_dense():
    rng = np.random.default_rng(0)
    ny, nx = 3, 4
    g_patch, H_patch, pv, active = _random_patch_system(ny, nx, rng)
    # Knock out a patch and a node to exercise masking.
    pv[1, 2] = False
    active[2, 1] = False

    g, Hb = stencil.scatter_patch_systems(
        jnp.asarray(np.moveaxis(g_patch, -1, 0)),
        jnp.asarray(np.moveaxis(H_patch, (-2, -1), (0, 1))),
        jnp.asarray(active), jnp.asarray(pv)
    )
    Gd, Hd = _dense_from_patches(g_patch, H_patch, pv, active)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(g), 0, -1).reshape(-1), Gd, rtol=1e-12)

    x = rng.normal(size=((ny + 1), (nx + 1), 4))
    y = stencil.spmv(Hb, jnp.asarray(np.moveaxis(x, -1, 0)))
    yd = Hd @ x.reshape(-1)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(y), 0, -1).reshape(-1), yd, rtol=1e-10,
        atol=1e-10)


def test_cg_solves_spd_system():
    rng = np.random.default_rng(1)
    ny, nx = 3, 3
    g_patch, H_patch, pv, active = _random_patch_system(ny, nx, rng)
    g, Hb = stencil.scatter_patch_systems(
        jnp.asarray(np.moveaxis(g_patch, -1, 0)),
        jnp.asarray(np.moveaxis(H_patch, (-2, -1), (0, 1))),
        jnp.asarray(active), jnp.asarray(pv)
    )
    Gd, Hd = _dense_from_patches(g_patch, H_patch, pv, active)
    P = stencil.block_jacobi_inverse(Hb, jnp.asarray(active))
    res = cg.solve(
        lambda v: stencil.spmv(Hb, v),
        g,
        precond=lambda v: stencil.apply_block_diag(P, v),
        max_iterations=500,
        error_tolerance=1e-18,
        q_tolerance=0.0,
    )
    want = np.linalg.solve(Hd, Gd)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(res.x), 0, -1).reshape(-1), want, rtol=1e-6,
        atol=1e-8)


def test_cg_inactive_rows_stay_zero():
    rng = np.random.default_rng(2)
    ny, nx = 3, 3
    g_patch, H_patch, pv, _ = _random_patch_system(ny, nx, rng)
    active = np.ones((ny + 1, nx + 1), dtype=bool)
    active[0, :] = False
    g, Hb = stencil.scatter_patch_systems(
        jnp.asarray(np.moveaxis(g_patch, -1, 0)),
        jnp.asarray(np.moveaxis(H_patch, (-2, -1), (0, 1))),
        jnp.asarray(active), jnp.asarray(pv)
    )
    P = stencil.block_jacobi_inverse(Hb, jnp.asarray(active))
    res = cg.solve(
        lambda v: stencil.spmv(Hb, v), g,
        precond=lambda v: stencil.apply_block_diag(P, v),
        max_iterations=200, error_tolerance=1e-18, q_tolerance=1e-3,
    )
    x = np.moveaxis(np.asarray(res.x), 0, -1)
    assert np.abs(x[0]).max() == 0.0
    assert np.isfinite(x).all()


def test_cg_nash_termination_early_stops():
    # With a loose q_tolerance CG should stop well before max_iterations on a
    # well-conditioned system (reference lib/conjugate_gradient.h:145-177).
    rng = np.random.default_rng(3)
    n = 64
    A = rng.normal(size=(n, n))
    A = A @ A.T + n * np.eye(n)
    b = rng.normal(size=n)
    res = cg.solve(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                   max_iterations=1000, error_tolerance=0.0, q_tolerance=1e-3)
    assert int(res.iterations) < 1000
    x = np.asarray(res.x)
    np.testing.assert_allclose(A @ x, b, rtol=1e-2, atol=1e-2)
