"""WTA + subpixel variants at bench size (SGM stage, r4 #8)."""
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

import jax.numpy as jnp
import numpy as np

from smvs_tpu.sgm import stereo as sgm

H = W = int(os.environ.get("SMVS_BENCH_DIM", "1440"))
D = 128
rng = np.random.default_rng(0)
agg = jnp.asarray(rng.integers(0, 2000, size=(H, W, D)), jnp.int16)
raw = jnp.asarray(rng.integers(0, 126, size=(H, W, D)), jnp.int32)
inten = jnp.asarray(rng.integers(0, 255, size=(H, W)), jnp.float32)
disp0, dstep = 15.0, 0.63


def force(out):
    jax.tree.map(lambda x: np.asarray(x.ravel()[0]), out)


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    force(out)
    print(f"{name:28s} {(time.time()-t0)/n*1000:8.1f} ms", flush=True)
    return out


cur = jax.jit(lambda a, c, i: sgm._wta_subpixel(a, c, i, disp0, dstep))
d1, ok1 = timeit("current", cur, agg, raw, inten)


def wta_shift(agg, raw_cost, intensity, disp0, dstep):
    idx = jnp.argmin(agg, axis=-1)
    d = agg.shape[-1]
    eq = jnp.arange(d) == idx[..., None]
    aggm = jnp.concatenate([agg[..., :1], agg[..., :-1]], axis=-1)
    aggp = jnp.concatenate([agg[..., 1:], agg[..., -1:]], axis=-1)
    sel = lambda v: jnp.sum(jnp.where(eq, v, 0), axis=-1)
    c0 = sel(agg).astype(jnp.float32)
    cm = sel(aggm).astype(jnp.float32)
    cp = sel(aggp).astype(jnp.float32)
    matched = sel(raw_cost) < sgm.INVALID_COST
    denom = cm + cp - 2.0 * c0
    frac = jnp.where(denom > 1e-6,
                     0.5 * (cm - cp) / jnp.maximum(denom, 1e-6), 0.0)
    frac = jnp.where((idx > 0) & (idx < d - 1),
                     jnp.clip(frac, -0.5, 0.5), 0.0)
    disp = disp0 + dstep * (idx.astype(jnp.float32) + frac)
    ok = (idx >= 2) & (intensity >= 25) & matched
    return disp, ok


sh = jax.jit(lambda a, c, i: wta_shift(a, c, i, disp0, dstep))
d2, ok2 = timeit("shifted-single-mask", sh, agg, raw, inten)
print("match:", bool(jnp.array_equal(ok1, ok2)),
      float(jnp.abs(jnp.where(ok1, d1, 0) - jnp.where(ok2, d2, 0)).max()))


def wta_take(agg, raw_cost, intensity, disp0, dstep):
    idx = jnp.argmin(agg, axis=-1)
    d = agg.shape[-1]
    ga = lambda v, w_: jnp.take_along_axis(
        v, jnp.clip(w_, 0, d - 1)[..., None], axis=-1)[..., 0]
    c0 = ga(agg, idx).astype(jnp.float32)
    cm = ga(agg, idx - 1).astype(jnp.float32)
    cp = ga(agg, idx + 1).astype(jnp.float32)
    matched = ga(raw_cost, idx) < sgm.INVALID_COST
    denom = cm + cp - 2.0 * c0
    frac = jnp.where(denom > 1e-6,
                     0.5 * (cm - cp) / jnp.maximum(denom, 1e-6), 0.0)
    frac = jnp.where((idx > 0) & (idx < d - 1),
                     jnp.clip(frac, -0.5, 0.5), 0.0)
    disp = disp0 + dstep * (idx.astype(jnp.float32) + frac)
    ok = (idx >= 2) & (intensity >= 25) & matched
    return disp, ok


tk = jax.jit(lambda a, c, i: wta_take(a, c, i, disp0, dstep))
d3, ok3 = timeit("take_along_axis", tk, agg, raw, inten)
print("match:", bool(jnp.array_equal(ok1, ok3)),
      float(jnp.abs(jnp.where(ok1, d1, 0) - jnp.where(ok3, d3, 0)).max()))
