"""Sweep the xb (scan positions per grid step) knob of the fused SGM pass.

Correctness of xb>1 is pinned by tests/test_pallas_sgm.py in interpreter
mode; this script only times the variants on the chip. All comparisons are
on-device checksums — never transfer the 0.5GB volume through the tunnel.
"""
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

ct = jnp.swapaxes(cost, 0, 1)
itT = inten.T

N = 4
checks = {}

for xb in (1, 4, 8):
    for tag, c, i, shifts in (("hpass", ct, itT, (0,)),
                              ("vpass3", cost, inten, (0, 1, -1))):
        try:
            @jax.jit
            def run(c, i):
                def body(k, acc):
                    return PA._fused_pass(c, i, acc, False, shifts, 6, 96,
                                          xb=xb)
                return jax.lax.fori_loop(0, N, body, jnp.zeros_like(c))

            t0 = time.time()
            out = run(c, i)
            chk = int(np.asarray(jnp.sum(out.astype(jnp.int32))))
            t_compile = time.time() - t0
            t0 = time.time()
            out = run(c, i)
            np.asarray(jnp.sum(out.astype(jnp.int32)))
            dt = (time.time() - t0) / N
        except Exception as e:
            print(f"xb={xb} {tag:8s} FAILED: {type(e).__name__}: {e}"[:200],
                  flush=True)
            continue
        ref = checks.setdefault(tag, chk)
        print(f"xb={xb} {tag:8s} {dt*1000:8.2f} ms/call  "
              f"checksum_match={chk == ref}  (first call {t_compile:.1f}s)",
              flush=True)
