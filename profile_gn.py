"""Device-time of GN assembly / CG / SpMV at bench scale-2 size."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from smvs_tpu.dist.testing import make_single_view_problem
from smvs_tpu.solver import cg, gn, stencil

scale = int(os.environ.get("S", "2"))
dim = int(os.environ.get("SMVS_BENCH_DIM", "1440"))
surf, view, vis, active = make_single_view_problem(dim=dim, scale=scale)
print(f"scale={scale} patches={surf.num_patches_y}x{surf.num_patches_x}",
      flush=True)
opts = gn.GNOptions(regularization=0.01, chunk=4096)

def force(out):
    jax.tree.map(lambda x: np.asarray(x if getattr(x, 'ndim', 1) == 0
                                      else x.ravel()[0]), out)

def timeit(tag, fn, *args, n=3):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    force(out)
    print(f"{tag:28s} {(time.time()-t0)/n*1000:8.2f} ms", flush=True)
    return out

asm = jax.jit(lambda s, v, vi, a: gn.assemble(s, v, vi, a, opts, None))
g, Hb = timeit("assemble(full)", asm, surf, view, vis, active)

P = jax.jit(stencil.block_jacobi_inverse)(Hb, active)
force(P)

N = 20
@jax.jit
def spmv_loop(Hb, x):
    return jax.lax.fori_loop(
        0, N, lambda i, xx: stencil.spmv(Hb, xx) * 1e-3, x)
x0 = jnp.ones_like(g)  # [4, ny1, nx1] plane layout
out = spmv_loop(Hb, x0)
force(out)
t0 = time.time()
out = spmv_loop(Hb, x0)
force(out)
print(f"{'spmv (in-graph)':28s} {(time.time()-t0)/N*1000:8.2f} ms/iter", flush=True)

@jax.jit
def cg_fixed(Hb, g, P):
    return cg.solve(lambda x: stencil.spmv(Hb, x), -g,
                    precond=lambda x: stencil.apply_block_diag(P, x),
                    max_iterations=50, error_tolerance=0.0, q_tolerance=0.0)
res = cg_fixed(Hb, g, P)
force(res.x)
t0 = time.time()
res = cg_fixed(Hb, g, P)
force(res.x)
dt = time.time() - t0
print(f"{'cg 50 iters':28s} {dt*1000:8.2f} ms  ({dt/50*1000:.2f} ms/iter)",
      flush=True)

@jax.jit
def cg_real(Hb, g, P):
    gnorm = jnp.linalg.norm(g.reshape(-1))
    return cg.solve(lambda x: stencil.spmv(Hb, x), -g,
                    precond=lambda x: stencil.apply_block_diag(P, x),
                    max_iterations=200, error_tolerance=gnorm * 0.01,
                    q_tolerance=1e-3)
res = cg_real(Hb, g, P)
force(res.x)
t0 = time.time()
res = cg_real(Hb, g, P)
force(res.x)
print(f"{'cg real tol':28s} {(time.time()-t0)*1000:8.2f} ms  "
      f"iters={int(res.iterations)}", flush=True)

from smvs_tpu.solver import mg

@jax.jit
def mg_build(Hb):
    return mg.build(Hb, active)
levels = mg_build(Hb)
force(levels.pinvs[-1])
t0 = time.time()
levels = mg_build(Hb)
force(levels.pinvs[-1])
print(f"{'mg build':28s} {(time.time()-t0)*1000:8.2f} ms", flush=True)

@jax.jit
def cg_mg(Hb, g):
    levels = mg.build(Hb, active)
    gnorm = jnp.linalg.norm(g.reshape(-1))
    return cg.solve(lambda x: stencil.spmv(Hb, x), -g,
                    precond=lambda x: mg.apply(levels, x),
                    max_iterations=200, error_tolerance=gnorm * 0.01,
                    q_tolerance=1e-3)
res = cg_mg(Hb, g)
force(res.x)
t0 = time.time()
res = cg_mg(Hb, g)
force(res.x)
print(f"{'cg mg (incl build)':28s} {(time.time()-t0)*1000:8.2f} ms  "
      f"iters={int(res.iterations)}", flush=True)
