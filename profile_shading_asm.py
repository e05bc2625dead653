"""Device-time of GN assembly with/without the SH shading term.

Measures VERDICT r4 #2: the shading term's marginal assembly cost after
replacing the 6-seed jax.linearize with closed-form value-space columns
(solver/gn.py `_assemble_flat`). Run on the real chip.
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

from smvs_tpu.core.synthetic import make_plane_scene
from smvs_tpu.pipeline import optimizer as O
from smvs_tpu.pipeline.views import make_view
from smvs_tpu.solver import gn
from smvs_tpu.surface import state as S

scale = int(os.environ.get("S", "2"))
dim = int(os.environ.get("SMVS_BENCH_DIM", "1440"))

scene = make_plane_scene(n_views=3, dim=dim)
main = make_view(scene.cameras[1], scene.images[1], view_id=1)
subs = [make_view(scene.cameras[i], scene.images[i], view_id=i)
        for i in (0, 2)]
surf = S.create_from_depth(jnp.asarray(scene.depths[1], jnp.float32), scale)
view_sh = O._build_viewset(main, subs, scale, True, jnp.float32)
view_b = O._build_viewset(main, subs, scale, False, jnp.float32)
ny, nx = surf.num_patches_y, surf.num_patches_x
vis = jnp.ones((ny, nx, 2), dtype=bool)
active = surf.node_valid
lighting = jnp.asarray(np.random.default_rng(0).normal(size=16) * 0.1 + 0.3,
                       jnp.float32)
opts = gn.GNOptions(regularization=0.01, light_surf_regularization=50.0)
print(f"scale={scale} patches={ny}x{nx} dev={jax.devices()[0]}", flush=True)


def force(out):
    jax.tree.map(lambda x: np.asarray(x.ravel()[0]), out)


def timeit(tag, fn, *args, n=5):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    force(out)
    print(f"{tag:28s} {(time.time()-t0)/n*1000:8.2f} ms", flush=True)


asm_b = jax.jit(lambda s, v, vi, a: gn.assemble(s, v, vi, a, opts, None))
asm_s = jax.jit(lambda s, v, vi, a, l: gn.assemble(s, v, vi, a, opts, l))
timeit("assemble base (2 nbrs)", asm_b, surf, view_b, vis, active)
timeit("assemble shading (2 nbrs)", asm_s, surf, view_sh, vis, active,
       lighting)
