"""Matrix-free preconditioned conjugate gradient under `lax.while_loop`.

TPU-native counterpart of reference `lib/conjugate_gradient.h`: same
termination rules — residual ``||r||^2 < error_tolerance`` and the
Ceres/Nash truncated-Newton quadratic-model test
``i * (Q1 - Q0) / Q1 < q_tolerance`` (reference :139-177).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    residual: jnp.ndarray  # final ||r||^2


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.vdot(a, b)


def solve(
    A: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    precond: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    max_iterations: int = 200,
    error_tolerance: jnp.ndarray | float = 1e-20,
    q_tolerance: float = 1e-3,
    flexible: bool = False,
) -> CGResult:
    """Solve A x = b from x0 = 0. All state is a fixed-shape pytree.

    ``flexible=True`` uses the Polak-Ribiere beta
    ``<z, r - r_prev> / <z_prev, r_prev>`` (flexible PCG). Identical to
    the Fletcher-Reeves form in exact arithmetic for a FIXED SPD
    preconditioner, and remains convergent when the preconditioner
    varies between applications — which the MG preconditioner's
    per-apply indefiniteness fallback (solver/mg.py::apply) can do
    within one solve. NOT used by the depth optimizer: measured on the
    flagship bench (r4), flexible beta stalled the Newton trajectory
    (median err 0.3% -> 0.9%) — see the preconditioner note in
    `pipeline/optimizer._newton_step`. Kept for experimentation.
    """
    P = precond if precond is not None else (lambda v: v)
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = P(r0)
    d0 = z0
    rdr0 = _dot(z0, r0)
    q0 = jnp.zeros((), dtype=b.dtype)  # -x.(b + r) with x = 0
    tol = jnp.asarray(error_tolerance, b.dtype)

    def cond(state):
        i, _, r, _, _, _, done = state
        return (~done) & (i < max_iterations)

    def body(state):
        i, x, r, d, rdr, q_prev, _ = state
        Ad = A(d)
        dAd = _dot(d, Ad)
        alpha = jnp.where(dAd != 0, rdr / dAd, 0.0)
        x = x + alpha * d
        r_prev = r
        r = r - alpha * Ad
        new_rr = _dot(r, r)
        done_res = new_rr < tol

        q1 = -_dot(x, b + r)
        zeta = (i + 1).astype(b.dtype) * (q1 - q_prev) / jnp.where(q1 != 0, q1, 1.0)
        done_q = zeta < q_tolerance

        z = P(r)
        if flexible:
            num = _dot(z, r - r_prev)
        else:
            num = _dot(z, r)
        new_rdr = _dot(z, r)
        beta = jnp.where(rdr != 0, num / rdr, 0.0)
        d = z + beta * d
        return (i + 1, x, r, d, new_rdr, q1, done_res | done_q)

    init = (jnp.asarray(0, jnp.int32), x0, r0, d0, rdr0, q0,
            jnp.asarray(False))
    i, x, r, *_ = jax.lax.while_loop(cond, body, init)
    return CGResult(x=x, iterations=i, residual=_dot(r, r))
