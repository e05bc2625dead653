"""Record the Gershgorin row-stiffness (lam) distribution of every MG
level built during a pipeline run (CPU), to choose the smoother damping
policy on data instead of guesses (VERDICT r4 #1).

MODE=base|shading DIM=480
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from smvs_tpu.solver import mg

DIM = int(os.environ.get("DIM", "480"))
MODE = os.environ.get("MODE", "shading")

_orig = mg._node_omega


def report(lam):
    lam = np.asarray(lam)
    act = lam[lam > 0]
    if act.size == 0:
        print("  lam: (empty)")
        return
    q = np.percentile(act, [1, 25, 50, 75, 90, 99])
    print(f"  lam[{lam.shape[0]}x{lam.shape[1]}] n={act.size} "
          f"p1={q[0]:.2f} p25={q[1]:.2f} p50={q[2]:.2f} p75={q[3]:.2f} "
          f"p90={q[4]:.2f} p99={q[5]:.2f} max={act.max():.2f}", flush=True)


def patched(Hb, pinv):
    prod = jnp.einsum("abyx,dqbcyx->dqacyx", pinv, Hb)
    lam = jnp.sqrt(jnp.sum(prod * prod, axis=(2, 3))).sum((0, 1))
    jax.debug.callback(report, lam)
    return _orig(Hb, pinv)


mg._node_omega = patched

import bench  # noqa: E402

if MODE == "shading":
    out = bench.run_shading_once(DIM, 2)
else:
    out = bench.run_once(DIM, 2)
print(f"MODE={MODE} DIM={DIM}: cov={out[2]:.3f} err={out[3]:.5f}",
      flush=True)
