"""Diagnose MG preconditioner variants on the real assembled system (CPU)."""
import os, sys, time
os.environ.setdefault("XLA_FLAGS", "")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from smvs_tpu.dist.testing import make_single_view_problem
from smvs_tpu.solver import cg, gn, mg, stencil

dim = int(os.environ.get("DIM", "240"))
scale = int(os.environ.get("S", "2"))
surf, view, vis, active = make_single_view_problem(dim=dim, scale=scale, dtype=jnp.float64)
opts = gn.GNOptions(regularization=0.01)
g, Hb = gn.assemble(surf, view, vis, active, opts, None)
ny1, nx1 = g.shape[-2:]
print(f"grid {ny1}x{nx1}, active={int(active.sum())}")

gnorm = float(jnp.linalg.norm(g.reshape(-1)))

def run(tag, precond, q_tol=0.0):
    res = cg.solve(lambda x: stencil.spmv(Hb, x), -g, precond=precond,
                   max_iterations=400, error_tolerance=gnorm**2 * 1e-4,
                   q_tolerance=q_tol)
    rn = float(jnp.sqrt(res.residual)) / gnorm
    print(f"{tag:34s} iters={int(res.iterations):4d} |r|/|g|={rn:.4f}")

pj = stencil.block_jacobi_inverse(Hb, active)
run("block-jacobi", lambda x: stencil.apply_block_diag(pj, x))

# --- diagnostics: per-channel diagonal magnitude --------------------------
diag = Hb[1, 1]  # [4,4,ny1,nx1]
for c in range(4):
    d = diag[c, c][active]
    print(f"  diag ch{c}: median={float(jnp.median(d)):.3e} "
          f"p5={float(jnp.percentile(d,5)):.3e} p95={float(jnp.percentile(d,95)):.3e}")

# --- 2-level with EXACT coarse solve ---------------------------------------
Hc = mg.galerkin_coarse(Hb)
act_c = mg.restrict_mask(active)
ncy, ncx = Hc.shape[-2:]
n_c = ncy * ncx * 4
# dense coarse matrix
def dense_from_stencil(Hs, act):
    ncy, ncx = Hs.shape[-2:]
    n = ncy * ncx * 4
    A = np.zeros((ncy, ncx, 4, ncy, ncx, 4))
    Hn = np.asarray(Hs)
    for oy in range(3):
        for ox in range(3):
            dy, dx = oy - 1, ox - 1
            for i in range(max(0, -dy), ncy - max(0, dy)):
                for j in range(max(0, -dx), ncx - max(0, dx)):
                    A[i, j, :, i + dy, j + dx, :] += Hn[oy, ox, :, :, i, j]
    A = A.reshape(n, n)
    mask = np.repeat(np.asarray(act).reshape(-1), 4)
    A[~mask] = 0; A[:, ~mask] = 0
    A[~mask, ~mask] = 1.0
    # regularize near-singular active rows
    return A, mask

print(f"coarse {ncy}x{ncx} -> dense {n_c}")
Ac, cmask = dense_from_stencil(Hc, act_c)
Ac_inv = np.linalg.pinv(Ac, rcond=1e-12)
Ac_inv[~cmask] = 0; Ac_inv[:, ~cmask] = 0
Ac_inv = jnp.asarray(Ac_inv)

def two_level_exact(x):
    z = stencil.apply_block_diag(pj, x)
    rc = mg.restrict(x).reshape(-1)
    zc = (Ac_inv @ rc).reshape(4, ncy, ncx)
    return z + mg.prolong(zc, ny1, nx1)

run("2-level additive exact-coarse", two_level_exact)

def two_level_mult(x):
    # symmetric multiplicative: pre-smooth, coarse-correct, post-smooth
    z = stencil.apply_block_diag(pj, x)
    r1 = x - stencil.spmv(Hb, z)
    rc = mg.restrict(r1).reshape(-1)
    zc = (Ac_inv @ rc).reshape(4, ncy, ncx)
    z = z + mg.prolong(zc, ny1, nx1)
    r2 = x - stencil.spmv(Hb, z)
    z = z + stencil.apply_block_diag(pj, r2)
    return z

run("2-level multiplicative exact", two_level_mult)

# channel-scaled prolongation: derivatives double going coarse->fine?
cs = jnp.asarray([1.0, 2.0, 2.0, 4.0])[:, None, None]
def two_level_mult_scaled(x):
    z = stencil.apply_block_diag(pj, x)
    r1 = x - stencil.spmv(Hb, z)
    rc = (mg.restrict(r1) * cs).reshape(-1)
    zc = (Ac_inv @ rc).reshape(4, ncy, ncx)
    z = z + mg.prolong(zc * cs, ny1, nx1)
    r2 = x - stencil.spmv(Hb, z)
    z = z + stencil.apply_block_diag(pj, r2)
    return z
# note: scaled transfer changes the Galerkin operator too; this variant is
# inconsistent (coarse op built unscaled) — just a probe.
run("2-level mult, scaled transfer", two_level_mult_scaled)

run("bpx (committed)", lambda x: mg.apply(mg.build(Hb, active), x))

# --- parameter sweep on the V-cycle ---------------------------------------
for omega in (0.6, 0.7, 0.8, 0.9):
    mg.OMEGA = omega
    for sweeps in (8, 24):
        mg.COARSE_SWEEPS = sweeps
        lv = mg.build(Hb, active)
        run(f"vcycle omega={omega} csweeps={sweeps}",
            lambda x: mg.apply(lv, x))
