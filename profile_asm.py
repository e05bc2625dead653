"""Breakdown of GN assembly at bench s2: gather vs math vs scatter."""
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
from smvs_tpu.image import ops as iops
from smvs_tpu.solver import gn, stencil

scale = int(os.environ.get("S", "2"))
dim = int(os.environ.get("SMVS_BENCH_DIM", "1440"))
surf, view, vis, active = make_single_view_problem(dim=dim, scale=scale)
ny, nx = surf.num_patches_y, surf.num_patches_x
print(f"scale={scale} patches={ny}x{nx}", flush=True)


def force(out):
    jax.tree.map(lambda x: np.asarray(x if getattr(x, 'ndim', 1) == 0
                                      else x.ravel()[0]), out)


def timeit(tag, fn, *args, n=5):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    force(out)
    print(f"{tag:34s} {(time.time()-t0)/n*1000:8.2f} ms", flush=True)
    return out


opts = gn.GNOptions(regularization=0.01, chunk=16384)
asm = jax.jit(lambda s, v, vi, a: gn.assemble(s, v, vi, a, opts, None))
g, Hb = timeit("assemble(full)", asm, surf, view, vis, active)

# --- gather only: sample_window at the same 2M warped sites ---------------
M_sites = ny * nx * (surf.patchsize ** 2)
rng = np.random.default_rng(0)
xs = jnp.asarray(rng.uniform(2, dim - 3, size=M_sites), jnp.float32)
ys = jnp.asarray(rng.uniform(2, dim - 3, size=M_sites), jnp.float32)


@jax.jit
def gather_only(gh, xs, ys):
    return iops.sample_window(gh, xs, ys).sum(0)


timeit(f"sample_window x{M_sites/1e6:.1f}M", gather_only, view.sub_gh[0],
       xs, ys)

# --- scatter only ----------------------------------------------------------
gp = jnp.zeros((ny, nx, 16), jnp.float32)
Hp = jnp.zeros((ny, nx, 16, 16), jnp.float32)
timeit("scatter_patch_systems",
       jax.jit(stencil.scatter_patch_systems), gp, Hp, active,
       surf.patch_valid)
