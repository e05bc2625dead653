"""Device-time of the visibility pass at bench sizes."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from smvs_tpu.dist.testing import make_single_view_problem
from smvs_tpu.pipeline import optimizer as O
from smvs_tpu.surface import state as S

scale = int(os.environ.get("S", "2"))
dim = int(os.environ.get("SMVS_BENCH_DIM", "1440"))
surf, view, vis, active = make_single_view_problem(dim=dim, scale=scale)
print(f"scale={scale} patches={surf.num_patches_y}x{surf.num_patches_x}", flush=True)

def force(out):
    jax.tree.map(lambda x: np.asarray(x if getattr(x, 'ndim', 1) == 0 else x.ravel()[0]), out)

def timeit(tag, fn, *args, n=5):
    out = fn(*args); force(out); t0 = time.time()
    for _ in range(n): out = fn(*args)
    force(out)
    print(f"{tag:30s} {(time.time()-t0)/n*1000:8.2f} ms", flush=True)
    return out

main_img = jnp.zeros((dim, dim), jnp.float32) + 0.5
sub_imgs = jnp.zeros((1, dim, dim), jnp.float32) + 0.5
sgm = jnp.full((dim, dim), 5.5, jnp.float32)

timeit("zbuffer_scatter", O.zbuffer_scatter, view, sgm)
zb = O.zbuffer_scatter(view, sgm)
timeit("compute_visibility(use_sgm)",
       lambda: O.compute_visibility(surf, view, sgm, True, main_img,
                                    sub_imgs, sgm_zbuffer=zb))
inv_cal = jnp.asarray(np.eye(3, dtype=np.float32))
vis2 = O.compute_visibility(surf, view, sgm, True, main_img, sub_imgs, sgm_zbuffer=zb)[1]
timeit("patch_mse(full)", lambda: O.patch_mse(surf, view, vis2))
