"""Time the bidirectional fused SGM pass vs two per-direction passes on
the real chip, and probe whether Mosaic's scoped-VMEM budget can be raised
(`vmem_limit_bytes`) far enough to admit the wider kernels (3-path bidir,
B=2 batch) at 2 MP line sizes.

Correctness of every variant is pinned bit-exactly in interpreter mode by
tests/test_pallas_sgm.py; here each variant's on-device checksum is also
compared against the two-pass baseline (never transfer the 0.5 GB volume
through the tunnel).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
from smvs_tpu.sgm import pallas_agg as PA

H = W = int(os.environ.get("DIM", "1440"))
D = 128
rng = np.random.default_rng(0)
cost = jnp.asarray(rng.integers(0, 126, size=(H, W, D)), jnp.int16)
inten = jnp.asarray(rng.integers(0, 255, size=(H, W)), jnp.int32)
ct = jnp.swapaxes(cost, 0, 1)
itT = inten.T

N = 4
checks = {}


def timeit(tag, fn, *args, base=None):
    try:
        @jax.jit
        def run(*a):
            def body(k, acc):
                return fn(acc, *a)
            return jax.lax.fori_loop(0, N, body, jnp.zeros_like(a[0]))

        t0 = time.time()
        out = run(*args)
        chk = int(np.asarray(jnp.sum(out.astype(jnp.int64))))
        t_comp = time.time() - t0
        t0 = time.time()
        out = run(*args)
        np.asarray(out.ravel()[0])
        dt = (time.time() - t0) / N
        ok = "" if base is None or checks.get(base) == chk else "  CHK-MISMATCH"
        checks[tag] = chk
        print(f"{tag:36s} {dt*1000:8.2f} ms/call  (compile {t_comp:.1f}s)"
              f"{ok}", flush=True)
    except Exception as e:
        print(f"{tag:36s} FAIL: {type(e).__name__}: {str(e)[:160]}",
              flush=True)


def two_pass(acc, c, i, shifts, **kw):
    a = PA._fused_pass(c, i, acc, False, shifts, 6, 96, **kw)
    return PA._fused_pass(c, i, a, True, shifts, 6, 96, **kw)


MB = 1024 * 1024

# Horizontal (1 path): bidir fits the default budget by the model.
timeit("hpass 2x one-dir",
       lambda acc, c, i: two_pass(acc, c, i, (0,)), ct, itT)
checks["hpass-base"] = checks.get("hpass 2x one-dir")
timeit("hpass bidir", lambda acc, c, i: PA._fused_pass_bidir(
    c, i, acc, (0,), 6, 96), ct, itT, base="hpass-base")

# Vertical 3-path: bidir needs ~24 MB stack -> probe raised limits.
timeit("vpass3 2x one-dir",
       lambda acc, c, i: two_pass(acc, c, i, (0, 1, -1)), cost, inten)
checks["vpass3-base"] = checks.get("vpass3 2x one-dir")
for lim in (32, 64, 100):
    timeit(f"vpass3 bidir vmem={lim}MB",
           lambda acc, c, i, lim=lim: PA._fused_pass_bidir(
               c, i, acc, (0, 1, -1), 6, 96, vmem_limit=lim * MB),
           cost, inten, base="vpass3-base")

# B=2 batched per-direction at raised limits (re-enables the batch kernel
# at bench scale if any limit holds).
cost2 = jnp.stack([cost, cost])
inten2 = jnp.stack([inten, inten])


def batch_two(acc, c, i, **kw):
    a = PA._fused_pass_batch(c, i, acc, False, (0, 1, -1), 6, 96, **kw)
    return PA._fused_pass_batch(c, i, a, True, (0, 1, -1), 6, 96, **kw)


timeit("vpass3 B=2 2x one-dir(each)",
       lambda acc, c, i: jnp.stack(
           [two_pass(acc[b], c[b], i[b], (0, 1, -1)) for b in range(2)]),
       cost2, inten2)
checks["vb-base"] = checks.get("vpass3 B=2 2x one-dir(each)")
for lim in (32, 64):
    timeit(f"vpass3 B=2 batch vmem={lim}MB",
           lambda acc, c, i, lim=lim: batch_two(acc, c, i,
                                                vmem_limit=lim * MB),
           cost2, inten2, base="vb-base")

# fori_loop xb variant: amortize the fixed grid-step cost without the
# unrolled body's stack blowup.
for xb in (2, 4, 8):
    timeit(f"hpass 2x one-dir xb_loop={xb}",
           lambda acc, c, i, xb=xb: two_pass(acc, c, i, (0,), xb=xb,
                                             loop=True),
           ct, itT, base="hpass-base")
for xb in (2, 4, 8):
    timeit(f"vpass3 2x one-dir xb_loop={xb}",
           lambda acc, c, i, xb=xb: two_pass(acc, c, i, (0, 1, -1), xb=xb,
                                             loop=True),
           cost, inten, base="vpass3-base")
