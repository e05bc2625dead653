"""Sweep the xb (scan positions per grid step) knob of the fused SGM pass."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
from smvs_tpu.sgm import pallas_agg as PA

H = W = 1440
D = 128
rng = np.random.default_rng(0)
cost = jnp.asarray(rng.integers(0, 126, size=(H, W, D)), jnp.int16)
inten = jnp.asarray(rng.integers(0, 255, size=(H, W)), jnp.int32)

ph, pw = (-H) % 8, (-W) % 8
c16 = jnp.pad(cost, ((0, ph), (0, pw), (0, 0)))
it = jnp.pad(inten, ((0, ph), (0, pw)))
ct = jnp.swapaxes(c16, 0, 1)
itT = it.T

N = 8

ref_h = ref_v = None

for xb in (1, 2, 4, 8):
    for tag, c, i, shifts in (("hpass", ct, itT, (0,)),
                              ("vpass3", c16, it, (0, 1, -1))):
        try:
            out = PA._fused_pass(c, i, jnp.zeros_like(c), False, shifts,
                                 6, 96, xb=xb)
            outv = np.asarray(out)
        except Exception as e:
            print(f"xb={xb} {tag:8s} FAILED: {type(e).__name__}: {e}"[:200],
                  flush=True)
            continue
        if xb == 1:
            if tag == "hpass":
                ref_h = outv
            else:
                ref_v = outv
            match = True
        else:
            ref = ref_h if tag == "hpass" else ref_v
            match = np.array_equal(outv, ref)

        @jax.jit
        def run(c, i):
            def body(k, acc):
                return PA._fused_pass(c, i, acc, False, shifts, 6, 96, xb=xb)
            return jax.lax.fori_loop(0, N, body, jnp.zeros_like(c))

        out = run(c, i)
        np.asarray(out.ravel()[0])
        t0 = time.time()
        out = run(c, i)
        np.asarray(out.ravel()[0])
        dt = (time.time() - t0) / N
        print(f"xb={xb} {tag:8s} {dt*1000:8.2f} ms/call  match={match}",
              flush=True)
