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

# ---------------------------------------------------------------------------
# Gather-of-slices experiments: can one gather fetch a whole 2x2 bilinear
# window (per site) or an 8x8 patch window (per patch) at decent bandwidth?
# The assembly gather is the dominant Newton-step cost (PERF_NOTES).
# ---------------------------------------------------------------------------
img3d = img5.reshape(H, W, 5)
yx = jnp.stack([idx // W, idx % W], axis=-1)  # [M, 2] y0, x0

B = 129_000  # patches at s2
pidx = jnp.asarray(rng.integers(0, H * W - 8 * W - 8, size=B).astype(np.int32))
pyx = jnp.stack([pidx // W, pidx % W], axis=-1)


def slice_gather(img, starts, sizes):
    nd = len(sizes)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=tuple(range(1, nd + 1)),
        collapsed_slice_dims=(),
        start_index_map=tuple(range(starts.shape[-1])),
    )
    return jax.lax.gather(img, starts, dn, sizes, mode="clip")


@jax.jit
def g_win225(img, yx):
    # One gather per site: 2x2x5 window (80B slice).
    w = slice_gather(img, yx, (2, 2, 5))  # [M, 2, 2, 5]
    return w.sum((1, 2, 3))


@jax.jit
def g_2rows(img, idx):
    # Two gathers of (2,5) row-pair slices: x-adjacent pair at y0 and y0+1.
    flat = img.reshape(H * W, 5)
    a = slice_gather(flat, idx[:, None], (2, 5))
    b = slice_gather(flat, (idx + W)[:, None], (2, 5))
    return a.sum((1, 2)) + b.sum((1, 2))


@jax.jit
def g_patch885(img, pyx):
    # One gather per PATCH: 8x8x5 window (1.28KB slice), B=129k patches.
    w = slice_gather(img, pyx, (8, 8, 5))  # [B, 8, 8, 5]
    return w.sum((1, 2, 3))


@jax.jit
def g_patch_interp(img, pyx, frac):
    # Window gather + in-register bilinear of 16 sites per patch via a
    # weight-matrix contraction (the full assembly-side replacement).
    w = slice_gather(img, pyx, (8, 8, 5)).reshape(-1, 64, 5)  # [B, 64, 5]
    # fake per-site window offsets/weights [B, 16] in 0..6
    ox = jnp.clip((frac[:, :, 0] * 6).astype(jnp.int32), 0, 6)
    oy = jnp.clip((frac[:, :, 1] * 6).astype(jnp.int32), 0, 6)
    fx = frac[:, :, 0] * 0.5
    fy = frac[:, :, 1] * 0.5
    lin = oy * 8 + ox  # [B, 16]
    oh = jax.nn.one_hot(lin, 64, dtype=jnp.float32)
    wt = (oh * ((1 - fx) * (1 - fy))[..., None]
          + jnp.roll(oh, 1, axis=-1) * (fx * (1 - fy))[..., None]
          + jnp.roll(oh, 8, axis=-1) * ((1 - fx) * fy)[..., None]
          + jnp.roll(oh, 9, axis=-1) * (fx * fy)[..., None])  # [B, 16, 64]
    out = jnp.einsum("bpw,bwc->bpc", wt, w)  # [B, 16, 5]
    return out.sum((1, 2))


frac = jnp.asarray(rng.uniform(size=(B, 16, 2)).astype(np.float32))

# Row-pair packing: img10[y, x] = (img5[y, x] | img5[y+1, x]) so ONE
# jnp.take row fetches both vertical corners -> 2 gathers instead of 4.
img10 = jnp.concatenate(
    [img5.reshape(H, W, 5),
     jnp.roll(img5.reshape(H, W, 5), -1, axis=0)], axis=-1).reshape(-1, 10)
img10_bf = img10.astype(jnp.bfloat16)


@jax.jit
def g_pack10(img, idx):
    a = jnp.take(img, idx, axis=0)        # y0 row: (v00 | v01)
    b = jnp.take(img, idx + 1, axis=0)    # x0+1:   (v10 | v11)
    return (a.astype(jnp.float32) + b.astype(jnp.float32)).sum(-1)


for tag, fn, args in (
        ("pack10-f32 2x40B", g_pack10, (img10, idx)),
        ("pack10-bf16 2x20B", g_pack10, (img10_bf, idx)),
        ("win-2x2x5 1-gather", g_win225, (img3d, yx)),
        ("rowpair-2x(2,5)", g_2rows, (img5, idx)),
        ("patch-8x8x5 gather", g_patch885, (img3d, pyx)),
        ("patch-win + interp", g_patch_interp, (img3d, pyx, frac))):
    try:
        out = fn(*args); force(out)
        t0 = time.time()
        for _ in range(5):
            out = fn(*args)
        force(out)
        print(f"{tag:18s} {(time.time()-t0)/5*1000:7.2f} ms", flush=True)
    except Exception as e:
        print(f"{tag:18s} FAIL {type(e).__name__}: {str(e)[:120]}",
              flush=True)
