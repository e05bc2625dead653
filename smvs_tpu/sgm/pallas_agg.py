"""Pallas TPU kernel for SGM path-cost aggregation.

The 8-direction min-plus recurrence is the reference's hottest loop
(`lib/sgm_stereo.cc:429-667`, SSE inner kernel :361-406). Here one scan
direction is a single Pallas program: the grid walks scan positions, the
carried previous line lives in VMEM scratch (persistent across grid steps),
and the depth axis sits in the 128-lane dimension — the layout the TPU VPU
wants. Diagonal paths shift the carried line by one in the perpendicular
axis per step, restarting at the shifted-in border like the reference's
border initialization.

`aggregate(cost, intensity, p1, p2)` sums all 8 directions by flipping /
transposing the volume and reusing the same kernel; it is a drop-in
replacement for `smvs_tpu.sgm.stereo.aggregate` (validated against it in
tests, including in interpreter mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1 << 24


def _scan_kernel(shift: int, p1: int, p2: int,
                 cost_ref, inten_ref, out_ref, prev_ref, pint_ref):
    """One scan position: L lines x D depths.

    cost_ref/out_ref: [L, D] block at scan position x; inten_ref: [L, 1].
    prev_ref/pint_ref: VMEM scratch with the previous aggregated line and
    its intensities (persist across sequential grid steps).
    """
    x = pl.program_id(0)
    cost = cost_ref[:]

    @pl.when(x == 0)
    def _():
        out_ref[:] = cost
        prev_ref[:] = cost
        pint_ref[:] = inten_ref[:]

    @pl.when(x > 0)
    def _():
        prev = prev_ref[:]
        prev_int = pint_ref[:]
        if shift:
            L = prev.shape[0]
            sh = shift % L  # pltpu.roll requires non-negative shifts
            prev = pltpu.roll(prev, sh, axis=0)
            prev_int = pltpu.roll(prev_int, sh, axis=0)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 0)
            border_row = 0 if shift > 0 else L - 1
            border = row_ids == border_row
            prev = jnp.where(border, BIG, prev)

        # Adaptive P2 (reference :314-319): penalty2 / (|dI| + 1), floored.
        diff = jnp.abs(inten_ref[:] - prev_int) + 1
        p2a = jnp.maximum(p1 * 3 // 2, p2 // diff)  # [L, 1]

        up = jnp.concatenate(
            [prev[:, 1:], jnp.full_like(prev[:, :1], BIG)], axis=1)
        dn = jnp.concatenate(
            [jnp.full_like(prev[:, :1], BIG), prev[:, :-1]], axis=1)
        min_prev = jnp.min(prev, axis=1, keepdims=True)
        upd = jnp.minimum(jnp.minimum(prev, jnp.minimum(up, dn) + p1),
                          min_prev + p2a)
        new = cost + upd - min_prev
        if shift:
            new = jnp.where(border, cost, new)
        out_ref[:] = new
        prev_ref[:] = new
        pint_ref[:] = inten_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("shift", "p1", "p2", "interpret"))
def scan_direction(cost: jnp.ndarray, intensity: jnp.ndarray, shift: int,
                   p1: int, p2: int, interpret: bool = False) -> jnp.ndarray:
    """Aggregate along axis 1 of cost [L, X, D] int32; intensity [L, X]."""
    L, X, D = cost.shape
    cost_t = jnp.moveaxis(cost, 1, 0)  # [X, L, D]
    inten_t = jnp.moveaxis(intensity.astype(cost.dtype), 1, 0)[..., None]

    out = pl.pallas_call(
        functools.partial(_scan_kernel, shift, p1, p2),
        grid=(X,),
        in_specs=[
            pl.BlockSpec((None, L, D), lambda x: (x, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, 1), lambda x: (x, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, L, D), lambda x: (x, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((X, L, D), cost.dtype),
        scratch_shapes=[
            pltpu.VMEM((L, D), cost.dtype),
            pltpu.VMEM((L, 1), cost.dtype),
        ],
        interpret=interpret,
    )(cost_t, inten_t)
    return jnp.moveaxis(out, 0, 1)


def aggregate(cost: jnp.ndarray, intensity: jnp.ndarray, p1: int, p2: int,
              interpret: bool = False) -> jnp.ndarray:
    """All 8 SGM paths via the Pallas scan kernel.

    cost: [H, W, D] int32; intensity [H, W]. Same contract as
    `smvs_tpu.sgm.stereo.aggregate`.
    """
    inten = intensity.astype(jnp.int32)
    total = jnp.zeros_like(cost)

    def run(c, i, shift):
        return scan_direction(c, i, shift, p1, p2, interpret)

    # Horizontal: scan over x, lines = rows.
    total = total + run(cost, inten, 0)
    total = total + run(cost[:, ::-1], inten[:, ::-1], 0)[:, ::-1]
    # Vertical + diagonals: scan over y, lines = columns.
    cv = jnp.swapaxes(cost, 0, 1)  # lines = W, scan axis = H
    iv = jnp.swapaxes(inten, 0, 1)
    for shift in (0, 1, -1):
        total = total + jnp.swapaxes(run(cv, iv, shift), 0, 1)
        total = total + jnp.swapaxes(
            run(cv[:, ::-1], iv[:, ::-1], shift)[:, ::-1], 0, 1)
    return total
