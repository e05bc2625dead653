"""Gather row-width microbench: 5ch f32 (20B) vs 4ch f32 (16B) rows."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
import jax.numpy as jnp
import numpy as np

H = W = 1448
M = 2_070_000
rng = np.random.default_rng(0)
img5 = jnp.asarray(rng.normal(size=(H * W, 5)).astype(np.float32))
img4 = jnp.asarray(rng.normal(size=(H * W, 4)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, H * W - W - 2, size=M).astype(np.int32))

def force(x):
    np.asarray(x.ravel()[0])

@jax.jit
def g5(img, idx):
    out = 0.0
    for off in (0, 1, W, W + 1):
        out = out + jnp.take(img, idx + off, axis=0)
    return out.sum(-1)

@jax.jit
def g4(img, idx):
    out = 0.0
    for off in (0, 1, W, W + 1):
        out = out + jnp.take(img, idx + off, axis=0)
    return out.sum(-1)

@jax.jit
def g4_unpack(img, idx):
    out = 0.0
    for off in (0, 1, W, W + 1):
        rows = jnp.take(img, idx + off, axis=0)  # [M, 4]
        hx = jax.lax.bitcast_convert_type(rows[:, 3], jnp.bfloat16)  # [M, 2]
        out = out + rows[:, 0] + rows[:, 1] + rows[:, 2] \
            + hx[:, 0].astype(jnp.float32) + hx[:, 1].astype(jnp.float32)
    return out

for tag, fn, img in (("5ch-20B", g5, img5), ("4ch-16B", g4, img4),
                     ("4ch-16B+unpack", g4_unpack, img4)):
    out = fn(img, idx); force(out)
    t0 = time.time()
    for _ in range(5):
        out = fn(img, idx)
    force(out)
    print(f"{tag:18s} {(time.time()-t0)/5*1000:7.2f} ms", flush=True)
