"""Pallas TPU kernels for SGM path-cost aggregation.

The 8-direction min-plus recurrence is the reference's hottest loop
(`lib/sgm_stereo.cc:429-667`, SSE inner kernel :361-406). Two designs live
here:

- `scan_direction`: one direction per `pallas_call` (the original kernel,
  kept as the readable spec and for single-direction parity tests).
- `aggregate`: the production path — FOUR fused passes instead of eight:
  horizontal forward/backward (1 path each) and vertical forward/backward
  (vertical + both diagonals = 3 paths per pass, three carried lines in
  VMEM scratch). All work is int16 (census Hamming costs are <= 126 and an
  aggregated path cost is <= cost + P2 <= 222, so the 8-path sum <= 1776),
  halving HBM traffic of the memory-bound volume; scan reversal and the
  line/scan-axis choice are expressed through BlockSpec index maps so no
  flipped or transposed copy of the [H, W, D] volume is ever materialized;
  and the running 8-path total is accumulated in-kernel through an
  input/output-aliased accumulator, so each pass reads the raw cost volume
  once and read-modify-writes the accumulator once.

The depth axis sits in the 128-lane dimension — the layout the TPU VPU
wants. Diagonal paths shift the carried line by one in the perpendicular
axis per step, restarting at the shifted-in border like the reference's
border initialization. Validated against `smvs_tpu.sgm.stereo.aggregate`
in tests, including in interpreter mode on CPU.
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


# ---------------------------------------------------------------------------
# Fused multi-path passes
# ---------------------------------------------------------------------------


def _min_plus(prev, cost, p1: int, p2a, big):
    """new = cost + min(prev, prev<<1 + P1, prev>>1 + P1, min+P2) - min."""
    up = jnp.concatenate([prev[:, 1:], jnp.full_like(prev[:, :1], big)],
                         axis=1)
    dn = jnp.concatenate([jnp.full_like(prev[:, :1], big), prev[:, :-1]],
                         axis=1)
    min_prev = jnp.min(prev, axis=1, keepdims=True)
    upd = jnp.minimum(jnp.minimum(prev, jnp.minimum(up, dn) + p1),
                      min_prev + p2a)
    return cost + upd - min_prev


def _fused_kernel(reverse: bool, xb: int, shifts: tuple, p1: int,
                  cost_ref, p2a_ref, acc_ref, out_ref, *prev_refs):
    """xb scan positions per grid step; len(shifts) paths carried at once.

    The scan always walks the LEADING axis (the caller transposes the
    volume once for horizontal passes), so every per-position slice
    `ref[j]` is a contiguous [L, D] tile — no middle-axis relayouts, which
    Mosaic compiles pathologically slowly at real image sizes. Blocks:
    cost/acc/out int16 [xb, L, D]; p2a int32 [xb, L, len(shifts)] with the
    adaptive-P2 penalties precomputed by the caller in scan order (the
    intensity math needs no path state, so it costs one cheap XLA pass
    instead of per-step VPU work). Scratch: one int32 [L, D] carried line
    per path. out = acc + sum of the per-path updates.

    Border restarts for diagonal paths are free: a carried line set to the
    uniform BIG yields new = cost + BIG - BIG = cost, exactly the restart
    value, so no select is needed after the min-plus update. Arithmetic is
    int32 in-register (v5e Mosaic has no 16-bit rotates/reductions, and
    VPU lanes are 32-bit so this costs nothing); int16 is purely the HBM
    storage format.
    """
    x = pl.program_id(0)
    js = range(xb - 1, -1, -1) if reverse else range(xb)

    def load(j):
        return cost_ref[j].astype(jnp.int32), acc_ref[j].astype(jnp.int32)

    def store(j, val):
        out_ref[j] = val.astype(out_ref.dtype)

    def init(j):
        cost, acc = load(j)
        store(j, acc + cost * len(shifts))
        for pr in prev_refs:
            pr[:] = cost

    def step(j):
        cost, acc = load(j)
        total = acc
        for k, (shift, pr) in enumerate(zip(shifts, prev_refs)):
            prev = pr[:]
            if shift:
                L = prev.shape[0]
                prev = pltpu.roll(prev, shift % L, axis=0)
                row_ids = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 0)
                border = row_ids == (0 if shift > 0 else L - 1)
                prev = jnp.where(border, BIG, prev)
            new = _min_plus(prev, cost, p1, p2a_ref[j, :, k:k + 1], BIG)
            pr[:] = new
            total = total + new
        store(j, total)

    for k, j in enumerate(js):
        if k == 0:
            pl.when(x == 0)(lambda j=j: init(j))
            pl.when(x > 0)(lambda j=j: step(j))
        else:
            step(j)


def _fused_kernel_loop(reverse: bool, xb: int, shifts: tuple, p1: int,
                       cost_ref, p2a_ref, acc_ref, out_ref, *prev_refs):
    """`_fused_kernel` with the xb scan positions advanced by a
    `lax.fori_loop` instead of Python unrolling.

    Mosaic stack-allocates every live tile of an unrolled body (the xb>1
    unrolled variant OOMs/crashes at 2 MP line sizes — PERF_NOTES "dead
    ends"), but a fori_loop body keeps ONE iteration's temporaries live, so
    the stack stays at the xb=1 footprint while the per-grid-step fixed
    cost is amortized over xb positions.

    The scan-start special case folds into the recurrence: a UNIFORM
    carried line C makes the min-plus update return cost + C - C = cost,
    exactly the restart value (border rows forced to BIG behave the same
    way), so the first position simply substitutes prev = 0 instead of a
    separate init branch.
    """
    x = pl.program_id(0)

    def body(i, _):
        j = (xb - 1 - i) if reverse else i
        first = jnp.logical_and(x == 0, i == 0)
        cost = cost_ref[j].astype(jnp.int32)
        total = acc_ref[j].astype(jnp.int32)
        for k, (shift, pr) in enumerate(zip(shifts, prev_refs)):
            prev = jnp.where(first, 0, pr[:])
            if shift:
                L = prev.shape[0]
                prev = pltpu.roll(prev, shift % L, axis=0)
                row_ids = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 0)
                border = row_ids == (0 if shift > 0 else L - 1)
                prev = jnp.where(border, BIG, prev)
            new = _min_plus(prev, cost, p1, p2a_ref[j, :, k:k + 1], BIG)
            pr[:] = new
            total = total + new
        out_ref[j] = total.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, xb, body, 0)


def _adaptive_p2_planes(inten: jnp.ndarray, reverse: bool, shifts: tuple,
                        p1: int, p2: int) -> jnp.ndarray:
    """Precompute the adaptive P2 penalty [X, L, len(shifts)] in scan order.

    Reference :314-319: P2 scaled by the inverse intensity difference of
    the current pixel and the previous pixel ON THE PATH — i.e. the
    previous scan line rolled by the path's diagonal shift.
    """
    prev = jnp.roll(inten, -1 if reverse else 1, axis=0)
    planes = []
    for shift in shifts:
        pi = jnp.roll(prev, shift, axis=1) if shift else prev
        diff = jnp.abs(inten - pi) + 1
        planes.append(jnp.maximum(p1 * 3 // 2, p2 // diff))
    return jnp.stack(planes, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("reverse", "shifts", "p1", "p2", "interpret", "xb",
                     "loop", "vmem_limit"))
def _fused_pass(cost: jnp.ndarray, inten: jnp.ndarray, acc: jnp.ndarray,
                reverse: bool, shifts: tuple, p1: int, p2: int,
                interpret: bool = False, xb: int = 1, loop: bool = False,
                vmem_limit: int | None = None) -> jnp.ndarray:
    """One scan sweep of len(shifts) paths, accumulated into `acc`.

    cost/acc: [X, L, D] int16, scanned along the leading axis X (lines are
    along L). inten: [X, L] int32 in the same orientation. ``xb`` scan
    positions are processed per grid step (amortizes the fixed grid-step
    cost; Mosaic stack-allocates every live [L, D] temporary of the
    unrolled body, so xb is bounded by the 16MB VMEM budget at 2MP line
    sizes).
    """
    X, L, D = cost.shape
    if X % xb:
        xb = 1
    nblk = X // xb

    def idx(x):
        return nblk - 1 - x if reverse else x

    p2a = _adaptive_p2_planes(inten, reverse, shifts, p1, p2)

    vol_spec = pl.BlockSpec((xb, L, D), lambda x: (idx(x), 0, 0),
                            memory_space=pltpu.VMEM)
    p2a_spec = pl.BlockSpec((xb, L, len(shifts)), lambda x: (idx(x), 0, 0),
                            memory_space=pltpu.VMEM)

    kernel = (_fused_kernel_loop if loop else _fused_kernel)
    return pl.pallas_call(
        functools.partial(kernel, reverse, xb, shifts, p1),
        grid=(nblk,),
        in_specs=[vol_spec, p2a_spec, vol_spec],
        out_specs=vol_spec,
        out_shape=jax.ShapeDtypeStruct(cost.shape, cost.dtype),
        scratch_shapes=[pltpu.VMEM((L, D), jnp.int32) for _ in shifts],
        input_output_aliases={2: 0},
        interpret=interpret,
        compiler_params=(None if vmem_limit is None else
                         pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)),
    )(cost, p2a, acc)


def _fused_kernel_bidir(shifts: tuple, p1: int,
                        cost_f_ref, cost_b_ref, p2a_f_ref, p2a_b_ref,
                        acc_ref, out_f_ref, out_b_ref, *prev_refs):
    """Forward AND backward sweep in one grid walk.

    Grid step x advances the forward recurrence at scan position x and the
    backward recurrence at position X-1-x (independent problems — SGM path
    directions never interact until the final sum), expressed through two
    index maps over the same volume. Halves the number of sequential grid
    steps, which is what bounds the fused pass (~21us fixed cost per step,
    latency- not bandwidth-bound; PERF_NOTES.md). Outputs are disjoint
    volumes (out_f carries acc + forward paths, out_b the backward paths);
    the caller adds them with one cheap XLA pass.

    prev_refs: len(shifts) forward carried lines then len(shifts) backward
    carried lines, [L, D] int32 each.
    """
    x = pl.program_id(0)
    n = len(shifts)
    f_prev = prev_refs[:n]
    b_prev = prev_refs[n:]

    def one(cost_ref, p2a_ref, out_ref, prevs, base):
        cost = cost_ref[:].astype(jnp.int32)
        total = base

        def init():
            out_ref[:] = (base + cost * n).astype(out_ref.dtype)
            for pr in prevs:
                pr[:] = cost

        def step():
            t = total
            for k, (shift, pr) in enumerate(zip(shifts, prevs)):
                prev = pr[:]
                if shift:
                    L = prev.shape[0]
                    prev = pltpu.roll(prev, shift % L, axis=0)
                    row_ids = jax.lax.broadcasted_iota(jnp.int32,
                                                       prev.shape, 0)
                    border = row_ids == (0 if shift > 0 else L - 1)
                    prev = jnp.where(border, BIG, prev)
                new = _min_plus(prev, cost, p1, p2a_ref[:, k:k + 1], BIG)
                pr[:] = new
                t = t + new
            out_ref[:] = t.astype(out_ref.dtype)

        pl.when(x == 0)(init)
        pl.when(x > 0)(step)

    one(cost_f_ref, p2a_f_ref, out_f_ref, f_prev,
        acc_ref[:].astype(jnp.int32))
    one(cost_b_ref, p2a_b_ref, out_b_ref, b_prev,
        jnp.zeros(cost_b_ref.shape, jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=("shifts", "p1", "p2", "interpret", "vmem_limit"))
def _fused_pass_bidir(cost: jnp.ndarray, inten: jnp.ndarray,
                      acc: jnp.ndarray, shifts: tuple, p1: int, p2: int,
                      interpret: bool = False,
                      vmem_limit: int | None = None) -> jnp.ndarray:
    """Both scan directions of len(shifts) paths in ONE grid walk.

    cost/acc: [X, L, D] int16; inten [X, L] int32. Equivalent to
    `_fused_pass(..., False)` then `_fused_pass(..., True)` (asserted in
    tests) at half the sequential grid steps.
    """
    X, L, D = cost.shape

    p2a_f = _adaptive_p2_planes(inten, False, shifts, p1, p2)
    p2a_b = _adaptive_p2_planes(inten, True, shifts, p1, p2)

    def fwd(x):
        return (x, 0, 0)

    def bwd(x):
        return (X - 1 - x, 0, 0)

    def vol(imap):
        return pl.BlockSpec((None, L, D), imap, memory_space=pltpu.VMEM)

    def pen(imap):
        return pl.BlockSpec((None, L, len(shifts)), imap,
                            memory_space=pltpu.VMEM)

    out_f, out_b = pl.pallas_call(
        functools.partial(_fused_kernel_bidir, shifts, p1),
        grid=(X,),
        in_specs=[vol(fwd), vol(bwd), pen(fwd), pen(bwd), vol(fwd)],
        out_specs=[vol(fwd), vol(bwd)],
        out_shape=[jax.ShapeDtypeStruct(cost.shape, cost.dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((L, D), jnp.int32)
                        for _ in range(2 * len(shifts))],
        input_output_aliases={4: 0},
        interpret=interpret,
        compiler_params=(None if vmem_limit is None else
                         pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)),
    )(cost, cost, p2a_f, p2a_b, acc)
    return out_f + out_b


def _bidir_fits(L: int, D: int, n_shifts: int) -> bool:
    """VMEM-stack model for the bidirectional kernel (see `_batch_fits`:
    ~5 live [L, D] int32 tiles per carried path + 1, and the bidirectional
    body carries 2*n_shifts paths)."""
    tiles = 2 * (5 * n_shifts + 1)
    return tiles * L * D * 4 <= _VMEM_STACK_BUDGET


def _fused_kernel_batch(reverse: bool, nb: int, shifts: tuple, p1: int,
                        cost_ref, p2a_ref, acc_ref, out_ref, *prev_refs):
    """`_fused_kernel` over `nb` independent problems per grid step.

    Blocks are [nb, L, D] (one scan position of each problem); scratch is
    one [nb, L, D] carried line per path, indexed per problem. Batching
    independent problems (the two bidirectional SGM runs) amortizes the
    fixed per-grid-step latency — the measured bottleneck of the fused
    pass (~21us/step, latency- not bandwidth-bound; PERF_NOTES.md).
    """
    x = pl.program_id(0)

    def init():
        for b in range(nb):
            cost = cost_ref[b].astype(jnp.int32)
            acc = acc_ref[b].astype(jnp.int32)
            out_ref[b] = (acc + cost * len(shifts)).astype(out_ref.dtype)
            for pr in prev_refs:
                pr[b] = cost

    def step():
        for b in range(nb):
            cost = cost_ref[b].astype(jnp.int32)
            total = acc_ref[b].astype(jnp.int32)
            for k, (shift, pr) in enumerate(zip(shifts, prev_refs)):
                prev = pr[b]
                if shift:
                    L = prev.shape[0]
                    prev = pltpu.roll(prev, shift % L, axis=0)
                    row_ids = jax.lax.broadcasted_iota(
                        jnp.int32, prev.shape, 0)
                    border = row_ids == (0 if shift > 0 else L - 1)
                    prev = jnp.where(border, BIG, prev)
                new = _min_plus(prev, cost, p1, p2a_ref[b, :, k:k + 1], BIG)
                pr[b] = new
                total = total + new
            out_ref[b] = total.astype(out_ref.dtype)

    pl.when(x == 0)(init)
    pl.when(x > 0)(step)


@functools.partial(
    jax.jit, static_argnames=("reverse", "shifts", "p1", "p2", "interpret",
                              "vmem_limit"))
def _fused_pass_batch(cost: jnp.ndarray, inten: jnp.ndarray,
                      acc: jnp.ndarray, reverse: bool, shifts: tuple,
                      p1: int, p2: int, interpret: bool = False,
                      vmem_limit: int | None = None) -> jnp.ndarray:
    """One scan sweep of len(shifts) paths over a BATCH of problems.

    cost/acc: [B, X, L, D] int16 scanned along X; inten: [B, X, L] int32.
    Same recurrence as `_fused_pass`, with all B problems advanced at each
    grid step (independent carried lines per problem).
    """
    B, X, L, D = cost.shape
    nblk = X

    def idx(x):
        return nblk - 1 - x if reverse else x

    p2a = jax.vmap(
        lambda i: _adaptive_p2_planes(i, reverse, shifts, p1, p2))(inten)

    # Scan axis leading for contiguous [L, D] tiles: [X, B, L, D].
    cost_t = jnp.swapaxes(cost, 0, 1)
    acc_t = jnp.swapaxes(acc, 0, 1)
    p2a_t = jnp.swapaxes(p2a, 0, 1)

    vol_spec = pl.BlockSpec((None, B, L, D), lambda x: (idx(x), 0, 0, 0),
                            memory_space=pltpu.VMEM)
    p2a_spec = pl.BlockSpec((None, B, L, len(shifts)),
                            lambda x: (idx(x), 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_fused_kernel_batch, reverse, B, shifts, p1),
        grid=(nblk,),
        in_specs=[vol_spec, p2a_spec, vol_spec],
        out_specs=vol_spec,
        out_shape=jax.ShapeDtypeStruct(cost_t.shape, cost.dtype),
        scratch_shapes=[pltpu.VMEM((B, L, D), jnp.int32) for _ in shifts],
        input_output_aliases={2: 0},
        interpret=interpret,
        compiler_params=(None if vmem_limit is None else
                         pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)),
    )(cost_t, p2a_t, acc_t)
    return jnp.swapaxes(out, 0, 1)


# Mosaic stack-allocates every live [L, D] int32 tile of the unrolled
# batch-kernel body: ~ (5 tiles per carried path + 1) per problem, measured
# from the real-chip scoped-VMEM report (B=2, 3 paths, L=1440, D=128 ->
# 32 tiles = 23.84 MB against the 16 MB scoped budget; the single-problem
# kernel's 16 tiles = 11.8 MB fits). Dispatch batched passes only when the
# model predicts headroom; otherwise run the per-problem kernel, which is
# validated at 2 MP on hardware. Round 2 shipped the batched kernel without
# this guard and the bench OOMed — do not remove it on "should fit" logic;
# re-measure on the chip instead.
_VMEM_STACK_BUDGET = 14 * 1024 * 1024


def _batch_fits(B: int, L: int, D: int, n_shifts: int) -> bool:
    tiles = B * (5 * n_shifts + 1)
    return tiles * L * D * 4 <= _VMEM_STACK_BUDGET


def aggregate_batch(cost: jnp.ndarray, intensity: jnp.ndarray, p1: int,
                    p2: int, interpret: bool = False) -> jnp.ndarray:
    """All 8 SGM paths for a BATCH of cost volumes, four fused passes.

    cost: [B, H, W, D] integer census costs; intensity [B, H, W]. Same
    result as :func:`aggregate` per problem (asserted in tests); one shared
    grid walk advances every problem at each scan position (amortizing the
    per-grid-step latency that bounds the fused pass), falling back to
    per-problem passes whenever the batched kernel's VMEM stack would
    exceed the scoped budget (see `_batch_fits`).
    """
    B, H, W, D = cost.shape
    c16 = cost.astype(jnp.int16)
    inten = intensity.astype(jnp.int32)
    ph, pw = (-H) % 8, (-W) % 8
    if ph or pw:
        c16 = jnp.pad(c16, ((0, 0), (0, ph), (0, pw), (0, 0)))
        inten = jnp.pad(inten, ((0, 0), (0, ph), (0, pw)))

    def sweep_both(c, i, acc, shifts):
        """Forward + backward sweep of `shifts` paths for every problem,
        picking the widest kernel whose VMEM-stack model predicts headroom:
        batched per-direction > per-problem bidirectional > per-problem
        per-direction."""
        L = c.shape[2]
        if _batch_fits(B, L, D, len(shifts)):
            acc = _fused_pass_batch(c, i, acc, False, shifts, p1, p2,
                                    interpret)
            return _fused_pass_batch(c, i, acc, True, shifts, p1, p2,
                                     interpret)
        if _bidir_fits(L, D, len(shifts)):
            return jnp.stack([
                _fused_pass_bidir(c[b], i[b], acc[b], shifts, p1, p2,
                                  interpret) for b in range(B)])
        outs = []
        for b in range(B):
            a = _fused_pass(c[b], i[b], acc[b], False, shifts, p1, p2,
                            interpret)
            outs.append(_fused_pass(c[b], i[b], a, True, shifts, p1, p2,
                                    interpret))
        return jnp.stack(outs)

    ct = jnp.swapaxes(c16, 1, 2)  # [B, W, H, D]
    it = jnp.swapaxes(inten, 1, 2)
    acc_t = sweep_both(ct, it, jnp.zeros_like(ct), (0,))
    acc = jnp.swapaxes(acc_t, 1, 2)
    acc = sweep_both(c16, inten, acc, (0, 1, -1))
    return acc[:, :H, :W] if (ph or pw) else acc


def aggregate(cost: jnp.ndarray, intensity: jnp.ndarray, p1: int, p2: int,
              interpret: bool = False) -> jnp.ndarray:
    """All 8 SGM paths in four fused int16 passes.

    cost: [H, W, D] integer census costs (values <= 255); intensity [H, W].
    Same contract as `smvs_tpu.sgm.stereo.aggregate`; returns the 8-path
    sum as int16 (bounded by 8 * (max cost + P2) < 2^15).
    """
    H, W, D = cost.shape
    c16 = cost.astype(jnp.int16)
    inten = intensity.astype(jnp.int32)
    # Pad H/W to multiples of 8 (TPU block-shape constraint). Uniform-valued
    # padding is exactly a scan restart for the min-plus recurrence — a
    # uniform previous line contributes cost + c - c = cost — so results in
    # the real region are unchanged.
    ph, pw = (-H) % 8, (-W) % 8
    if ph or pw:
        c16 = jnp.pad(c16, ((0, ph), (0, pw), (0, 0)))
        inten = jnp.pad(inten, ((0, ph), (0, pw)))
    # Horizontal: scan over x, lines = rows, straight path only. The volume
    # is transposed once so the scan walks the leading axis (one ~ms-scale
    # XLA transpose instead of per-block relayouts inside the kernel).
    ct = jnp.swapaxes(c16, 0, 1)  # [W, H, D]
    it = inten.T

    def sweep_both(c, i, acc, shifts):
        if _bidir_fits(c.shape[1], D, len(shifts)):
            return _fused_pass_bidir(c, i, acc, shifts, p1, p2, interpret)
        acc = _fused_pass(c, i, acc, False, shifts, p1, p2, interpret)
        return _fused_pass(c, i, acc, True, shifts, p1, p2, interpret)

    acc_t = sweep_both(ct, it, jnp.zeros_like(ct), (0,))
    # Vertical + both diagonals: scan over y, lines = columns.
    acc = jnp.swapaxes(acc_t, 0, 1)
    acc = sweep_both(c16, inten, acc, (0, 1, -1))
    return acc[:H, :W] if (ph or pw) else acc
