"""TPU measurement: mg vs jacobi preconditioning at bench scale (VERDICT #3).

Per preconditioner at the bench-scale-2 system (1440px, 360x360 patches):
- one full `_newton_step` wall (assembly + precond build + PCG + update),
- CG iterations taken,
- mg-only: the V-cycle build cost in isolation.

Run on the real chip: `python profile_mg.py`; S=3/4/5 for other scales.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from smvs_tpu.dist.testing import make_single_view_problem
from smvs_tpu.pipeline import optimizer as O
from smvs_tpu.solver import cg, gn, mg, stencil

scale = int(os.environ.get("S", "2"))
dim = int(os.environ.get("SMVS_BENCH_DIM", "1440"))
surf, view, vis, active = make_single_view_problem(dim=dim, scale=scale)
print(f"scale={scale} patches={surf.num_patches_y}x{surf.num_patches_x} "
      f"nodes={surf.node_valid.shape}", flush=True)


def force(out):
    jax.tree.map(lambda x: np.asarray(x if getattr(x, "ndim", 1) == 0
                                      else x.ravel()[0]), out)


def timeit(tag, fn, *args, n=3):
    t0 = time.time()
    out = fn(*args)
    force(out)
    first = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    force(out)
    print(f"{tag:32s} {(time.time()-t0)/n*1000:8.2f} ms "
          f"(first {first:.1f}s)", flush=True)
    return out


gn_opts = gn.GNOptions(regularization=0.01)
asm = jax.jit(lambda s, v, vi, a: gn.assemble(s, v, vi, a, gn_opts, None))
g, Hb = timeit("assemble", asm, surf, view, vis, active)

# --- preconditioner build cost in isolation -----------------------------
build_mg = jax.jit(mg.build)
levels = timeit("mg.build", build_mg, Hb, active)
build_j = jax.jit(stencil.block_jacobi_inverse)
P = timeit("jacobi build", build_j, Hb, active)

# --- solve-only comparison ----------------------------------------------
gnorm = jnp.linalg.norm(np.asarray(g).reshape(-1))


@jax.jit
def solve_mg(Hb, g, active):
    lv = mg.build(Hb, active)
    res = cg.solve(lambda x: stencil.spmv(Hb, x), -g,
                   precond=lambda x: mg.apply(lv, x),
                   max_iterations=200,
                   error_tolerance=jnp.linalg.norm(g.reshape(-1)) * 0.01,
                   q_tolerance=1e-3)
    return res.x, res.iterations


@jax.jit
def solve_j(Hb, g, active):
    P = stencil.block_jacobi_inverse(Hb, active)
    res = cg.solve(lambda x: stencil.spmv(Hb, x), -g,
                   precond=lambda x: stencil.apply_block_diag(P, x),
                   max_iterations=200,
                   error_tolerance=jnp.linalg.norm(g.reshape(-1)) * 0.01,
                   q_tolerance=1e-3)
    return res.x, res.iterations


xm, itm = timeit("build+solve mg", solve_mg, Hb, g, active)
xj, itj = timeit("build+solve jacobi", solve_j, Hb, g, active)
print(f"CG iterations: mg={int(itm)} jacobi={int(itj)}", flush=True)
rm = float(jnp.linalg.norm((stencil.spmv(Hb, xm) + g).reshape(-1)))
rj = float(jnp.linalg.norm((stencil.spmv(Hb, xj) + g).reshape(-1)))
print(f"residual/|g|: mg={rm/float(gnorm):.4f} jacobi={rj/float(gnorm):.4f}",
      flush=True)

# --- full newton step through the production path -----------------------
for precond in ("mg", "jacobi"):
    opts = O.OptimizerOptions(regularization=0.01, precond=precond)
    step = jax.jit(lambda s, vw, vi, a, o=opts: O._newton_step(
        s, vw, vi, a, o, None))
    out = timeit(f"newton_step[{precond}]", step, surf, view, vis, active)
    print(f"  cg_iters={int(out[6])}", flush=True)
