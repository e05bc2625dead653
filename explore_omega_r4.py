"""A/B the MG smoother damping policy on the bench's two workloads (CPU).

r3's last commit (7dcb336, relative-median Gershgorin damping) fixed the
base bench's stiff coarse scales but regressed the flagship shading mode
2x in throughput and 3.5x in accuracy (VERDICT r3 #1). This reproduces
both workloads at reduced dim on CPU under switchable policies:

  POL=rel    current HEAD (w_i = OMEGA * min(1, 1.5 * med / lam_i))
  POL=const  pre-commit state (OMEGA everywhere + <r,z> guard)
  POL=abs    absolute cap  (w_i = min(OMEGA, C / lam_i), C from ABSC)
  POL=relabs max of rel and abs (damp only rows BOTH rules flag)

MODE=base|shading  DIM=480  MINS=2
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from smvs_tpu.solver import mg

POL = os.environ.get("POL", "rel")
ABSC = float(os.environ.get("ABSC", "7.2"))
DIM = int(os.environ.get("DIM", "480"))
MINS = int(os.environ.get("MINS", "2"))
MODE = os.environ.get("MODE", "shading")

_orig = mg._node_omega

LAM_STATS = []


def _lam(Hb, pinv):
    prod = jnp.einsum("abyx,dqbcyx->dqacyx", pinv, Hb)
    return jnp.sqrt(jnp.sum(prod * prod, axis=(2, 3))).sum((0, 1))


def patched(Hb, pinv):
    lam = _lam(Hb, pinv)
    if POL == "const":
        return jnp.full(Hb.shape[-2:], mg.OMEGA, Hb.dtype)
    if POL == "rel":
        return _orig(Hb, pinv)
    cap = ABSC / jnp.maximum(lam, 1e-6)
    if POL == "abs":
        return jnp.minimum(jnp.asarray(mg.OMEGA, Hb.dtype),
                           cap).astype(Hb.dtype)
    if POL == "relabs":
        return jnp.maximum(_orig(Hb, pinv),
                           jnp.minimum(jnp.asarray(mg.OMEGA, Hb.dtype),
                                       cap)).astype(Hb.dtype)
    raise ValueError(POL)


mg._node_omega = patched

if os.environ.get("FLEX", "1") == "0":
    from smvs_tpu.solver import cg as _cg

    _solve = _cg.solve

    def _solve_noflex(*a, **k):
        k["flexible"] = False
        return _solve(*a, **k)

    _cg.solve = _solve_noflex

import bench  # noqa: E402  (repo-root bench.py)

t0 = time.time()
if MODE == "shading":
    t_sgm, t_opt, cov, err = bench.run_shading_once(DIM, MINS)
else:
    t_sgm, t_opt, cov, err = bench.run_once(DIM, MINS)
print(f"POL={POL} ABSC={ABSC} MODE={MODE} DIM={DIM}: "
      f"sgm={t_sgm:.1f}s opt={t_opt:.1f}s cov={cov:.3f} err={err:.5f} "
      f"wall={time.time()-t0:.1f}s", flush=True)
