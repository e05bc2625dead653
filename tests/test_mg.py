"""Multilevel preconditioner: transfers, Galerkin product, CG iteration wins.

The reference itself runs block-Jacobi CG and hits its 200-iteration cap at
fine scales (PERF_NOTES.md measures the reference at 189-200 average
iterations at scale 2); the multilevel preconditioner is a beyond-parity
solver improvement, so these tests gate both its algebra (exactness of the
closed-form Galerkin stencil vs operator composition) and its value (a real
assembled system must converge in far fewer iterations than block-Jacobi).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smvs_tpu.dist.testing import make_single_view_problem
from smvs_tpu.solver import cg, gn, mg, stencil


def _random_system(ny1, nx1, seed=0, dtype=jnp.float32):
    """Random SPD stencil system with a mask, built by assembling random
    per-patch SPD systems through the production scatter."""
    rng = np.random.default_rng(seed)
    ny, nx = ny1 - 1, nx1 - 1
    J = rng.normal(size=(ny * nx, 24, 16))
    Hp = np.einsum("pck,pcl->pkl", J, J) + 1e-3 * np.eye(16)
    gp = rng.normal(size=(ny * nx, 16))
    active = jnp.asarray(rng.random((ny1, nx1)) > 0.1)
    patch_valid = jnp.asarray(rng.random((ny, nx)) > 0.1)
    g, Hb = stencil.scatter_patch_systems(
        jnp.asarray(gp.T.reshape(16, ny, nx), dtype),
        jnp.asarray(Hp.reshape(ny * nx, 256).T.reshape(16, 16, ny, nx),
                    dtype),
        active, patch_valid)
    return g, Hb, active


def test_transfer_adjointness():
    rng = np.random.default_rng(1)
    for (ny1, nx1) in [(9, 9), (12, 10), (15, 17)]:
        ncy, ncx = mg.coarse_size(ny1), mg.coarse_size(nx1)
        xc = jnp.asarray(rng.normal(size=(4, ncy, ncx)))
        yf = jnp.asarray(rng.normal(size=(4, ny1, nx1)))
        lhs = jnp.vdot(mg.prolong(xc, ny1, nx1), yf)
        rhs = jnp.vdot(xc, mg.restrict(yf))
        assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))


def test_prolong_reproduces_constant_surface():
    # A constant coarse surface (f=1, derivatives 0) maps to the identical
    # fine surface — the Hermite transfer is exact on nested spline spaces.
    xc = jnp.zeros((4, 5, 5)).at[0].set(1.0)
    xf = mg.prolong(xc, 9, 9)
    np.testing.assert_allclose(np.asarray(xf[0]), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(xf[1:]), 0.0, atol=1e-12)


def test_prolong_reproduces_linear_surface():
    # Linear ramp f = x (in coarse cell units): coarse dx = 1; the fine
    # surface must be the same ramp with fine-unit dx = 1/2.
    xs = np.arange(5, dtype=np.float64)
    xc = np.zeros((4, 5, 5))
    xc[0] = xs[None, :]
    xc[1] = 1.0
    xf = mg.prolong(jnp.asarray(xc), 9, 9)
    np.testing.assert_allclose(np.asarray(xf[0]),
                               0.5 * np.arange(9)[None, :] * np.ones((9, 1)),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(xf[1]), 0.5, atol=1e-12)
    np.testing.assert_allclose(np.asarray(xf[2]), 0.0, atol=1e-12)


@pytest.mark.parametrize("shape", [(9, 9), (14, 12), (21, 17)])
def test_galerkin_matches_operator_composition(shape):
    ny1, nx1 = shape
    _, Hb, _ = _random_system(ny1, nx1, seed=2, dtype=jnp.float64)
    Hc = mg.galerkin_coarse(Hb)
    ncy, ncx = mg.coarse_size(ny1), mg.coarse_size(nx1)
    rng = np.random.default_rng(3)
    for seed in range(3):
        xc = jnp.asarray(rng.normal(size=(4, ncy, ncx)))
        direct = stencil.spmv(Hc, xc)
        composed = mg.restrict(stencil.spmv(Hb, mg.prolong(xc, ny1, nx1)))
        np.testing.assert_allclose(np.asarray(direct), np.asarray(composed),
                                   rtol=1e-9, atol=1e-9)


def test_apply_is_spd():
    ny1 = nx1 = 17
    _, Hb, active = _random_system(ny1, nx1, seed=4, dtype=jnp.float64)
    levels = mg.build(Hb, active)
    rng = np.random.default_rng(5)
    xs = [jnp.asarray(rng.normal(size=(4, ny1, nx1))) for _ in range(4)]
    for a in xs:
        for b in xs:
            lhs = jnp.vdot(a, mg.apply(levels, b))
            rhs = jnp.vdot(mg.apply(levels, a), b)
            assert abs(lhs - rhs) < 1e-9 * max(1.0, abs(lhs))
    for a in xs:
        quad = float(jnp.vdot(a, mg.apply(levels, a)))
        assert quad > 0.0


def _cg_iters(Hb, g, active, precond):
    gnorm = jnp.linalg.norm(g.reshape(-1))
    res = cg.solve(lambda x: stencil.spmv(Hb, x), -g, precond=precond,
                   max_iterations=200, error_tolerance=gnorm * 0.01,
                   q_tolerance=0.0)
    return int(res.iterations), res.x


def test_mg_beats_jacobi_on_assembled_system():
    """Real GN system from the synthetic scene (f32, the production dtype):
    the multigrid V-cycle must cut CG iterations below the reference's 200
    cap AND reach a lower normal-equation residual than block-Jacobi gets
    with its full 200-iteration budget."""
    surf, view, vis, active = make_single_view_problem(dim=240, scale=2)
    opts = gn.GNOptions(regularization=0.01)
    g, Hb = gn.assemble(surf, view, vis, active, opts, None)

    pj = stencil.block_jacobi_inverse(Hb, active)
    it_j, xj = _cg_iters(Hb, g, active,
                         lambda x: stencil.apply_block_diag(pj, x))
    levels = mg.build(Hb, active)
    it_m, xm = _cg_iters(Hb, g, active, lambda x: mg.apply(levels, x))

    # Block-Jacobi should burn most of its budget (the reference caps at
    # 200 here too); mg must cut that by at least 2x. A ratio, not exact
    # cap equality — benign assembly/CG changes shouldn't fail this.
    assert it_j > 150, it_j
    assert it_m < it_j // 2, (it_m, it_j)

    rj = jnp.linalg.norm((stencil.spmv(Hb, xj) + g).reshape(-1))
    rm = jnp.linalg.norm((stencil.spmv(Hb, xm) + g).reshape(-1))
    gnorm = jnp.linalg.norm(g.reshape(-1))
    # mg converges to the f32 stagnation floor (a few % of ||g||) in a
    # fraction of the iterations; jacobi doesn't get near it in 200.
    assert float(rm) < 0.5 * float(rj), (float(rm), float(rj))
    assert float(rm) <= float(gnorm) * 0.05
