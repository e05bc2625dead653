"""V-cycle variants: smoothing strength, coarse regularization, f32 vs f64."""
import os, sys
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

for dtype in (jnp.float32, jnp.float64):
    surf, view, vis, active = make_single_view_problem(dim=dim, scale=scale,
                                                       dtype=dtype)
    opts = gn.GNOptions(regularization=0.01)
    g, Hb = gn.assemble(surf, view, vis, active, opts, None)
    gnorm = float(jnp.linalg.norm(g.reshape(-1)))
    print(f"--- dtype={dtype.__name__} grid={g.shape[-2:]} gnorm={gnorm:.3e}")

    def run(tag, precond):
        res = cg.solve(lambda x: stencil.spmv(Hb, x), -g, precond=precond,
                       max_iterations=400, error_tolerance=gnorm**2 * 1e-4,
                       q_tolerance=0.0)
        rn = float(jnp.sqrt(res.residual)) / gnorm
        print(f"{tag:40s} iters={int(res.iterations):4d} |r|/|g|={rn:.4f}",
              flush=True)

    pj = stencil.block_jacobi_inverse(Hb, active)
    run("block-jacobi", lambda x: stencil.apply_block_diag(pj, x))

    levels = mg.build(Hb, active)
    run("V(1,1)", lambda x: mg.apply(levels, x))

    # V(2,2): two damped-Jacobi Richardson sweeps per smooth.
    def smooth2(l, rl, z0=None):
        z = mg._smooth(levels, l, rl) if z0 is None else z0
        z = z + mg._smooth(levels, l, rl - stencil.spmv(levels.ops[l], z))
        return z

    def cycle22(l, rl):
        A = levels.ops[l]
        if l == len(levels.ops) - 1:
            z = mg._smooth(levels, l, rl)
            for _ in range(mg.COARSE_SWEEPS - 1):
                z = z + mg._smooth(levels, l, rl - stencil.spmv(A, z))
            return z
        z = smooth2(l, rl)
        zc = cycle22(l + 1, mg.restrict(rl - stencil.spmv(A, z)))
        z = z + mg.prolong(zc, levels.shapes[l][0], levels.shapes[l][1])
        z = z + mg._smooth(levels, l, rl - stencil.spmv(A, z))
        return z + mg._smooth(levels, l, rl - stencil.spmv(A, z))

    run("V(2,2)", lambda x: cycle22(0, x))

    # Tikhonov-guarded coarse inverses: D + lam*tr/4*I per block.
    def guarded_levels(lam):
        ops = [Hb]; act = active
        pinvs = [stencil.block_jacobi_inverse(Hb, active)]
        shapes = [Hb.shape[-2:]]
        omegas = [mg._node_omega(Hb, pinvs[0])]
        H = Hb
        for _ in range(mg.num_levels(*Hb.shape[-2:]) - 1):
            H = mg.galerkin_coarse(H)
            act = mg.restrict_mask(act)
            diag = jnp.moveaxis(H[1, 1], (0, 1), (-2, -1))
            tr = jnp.trace(diag, axis1=-2, axis2=-1)[..., None, None]
            eye = jnp.eye(4, dtype=H.dtype)
            Hg = H.at[1, 1].set(jnp.moveaxis(diag + lam * tr / 4 * eye,
                                             (-2, -1), (0, 1)))
            ops.append(Hg)
            pinvs.append(stencil.block_jacobi_inverse(Hg, act))
            shapes.append(H.shape[-2:])
            omegas.append(mg._node_omega(Hg, pinvs[-1]))
        return mg.Levels(ops=tuple(ops), pinvs=tuple(pinvs),
                         shapes=tuple(shapes), omegas=tuple(omegas))

    for lam in (1e-5, 1e-4, 1e-3):
        lg = guarded_levels(lam)
        run(f"V(1,1) tikhonov={lam}", lambda x: mg.apply(lg, x))
