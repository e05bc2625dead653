"""Geometric multigrid preconditioner for the stencil normal equations.

The reference preconditions CG with the inverted block diagonal only
(`lib/block_sparse_matrix.h:300-316`) and, like this framework, hits its
200-iteration CG cap at fine scales (measured in PERF_NOTES.md: the
reference averages 189-200 CG iterations per Newton step at scale 2).
Block-Jacobi cannot damp the smooth low-frequency error modes of the
surface system; their wavelength grows with the node grid, so the iteration
count grows with resolution.

This module goes beyond the reference with a V-cycle preconditioner whose
coarse spaces are *exactly nested* in the surface's own function space:

- **Hermite subdivision prolongation**: the transfer from a 2x-coarser node
  grid is the bicubic surface's own refinement operator — even fine nodes
  copy the coarse node with derivative channels rescaled (a coarse-cell
  derivative is 2 fine-cell units), odd fine nodes evaluate the coarse
  Hermite spline and its derivative at the cell midpoint. This is the same
  operator as `Surface.subdivide_patches` (reference
  `lib/surface.cc:984-1107`): a coarse bicubic surface maps onto the fine
  node grid *exactly*, so smooth error components live in the coarse space
  by construction. Per-channel hat interpolation (tried first) leaves the
  V-cycle stuck near 140 CG iterations; the Hermite transfers drop it
  to a few dozen.
- **Galerkin coarse operators** ``A_c = P^T A P`` in closed form on the
  9-point block-stencil representation: the triple product with one-cell
  transfers is again a 9-point stencil, with 4x4 channel-mixing weight
  matrices (tensor products of the 1D 2x2 Hermite weights).
- **Damped block-Jacobi smoothing**: the spectrum of the block-Jacobi-
  preconditioned GN system reaches ~2.15 (measured on the synthetic
  scene), so undamped block-Jacobi smoothing is divergent and would make
  the V-cycle indefinite — CG then breaks down. OMEGA < 2/2.15.

All pieces are stencil/slice arithmetic — no gathers, no sparse formats —
so the preconditioner is as TPU-friendly as the SpMV itself. Validated in
tests/test_mg.py: transfer adjointness, Galerkin product vs operator
composition, SPD of the apply, and CG iteration counts on real assembled
systems vs block-Jacobi.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from smvs_tpu.solver import stencil

# Smoother damping ceiling (see module docstring). 0.8 measured best in
# tests/test_mg.py; divergence starts beyond ~0.93. Each node's damping
# is clamped LOCALLY by a Gershgorin-style block-row bound
# (`_node_omega`): a global spectral clamp lets a few near-singular
# blocks gut the smoother everywhere (Lambertian-sphere shading test:
# 2.3% -> 11.9% median depth error), while NO clamp makes the V-cycle
# indefinite on the base bench's stiff coarse scales (CG 2 -> 84
# iters/step). Residual indefiniteness is handled per SOLVE: the
# optimizer probes the V-cycle on the initial residual and latches the
# whole solve onto block-Jacobi if it fails (fixed preconditioner per
# solve — r3 advisor #1), with the per-application <r, z> <= 0 guard in
# `apply` as the last line of defense.
OMEGA = 0.8
# Damped-Jacobi sweeps on the coarsest grid (<= 8x8 nodes).
COARSE_SWEEPS = 8


def coarse_size(n: int) -> int:
    """Nodes of the next-coarser grid: keep every even-index node."""
    return (n + 1) // 2


@functools.lru_cache(maxsize=None)
def _weights_1d():
    """1D Hermite subdivision weights W(u) mapping a coarse (f, d) pair to
    the fine (f, d) pair at fine node 2I + u.

    u = 0: the coincident node — value copies, derivative halves (a coarse
    cell is 2 fine cells). u = +1 / -1: the midpoint node, from the left /
    right coarse neighbor — cubic Hermite basis at t = 1/2 (values
    h = (1/2, 1/8, 1/2, -1/8)) and its derivative (h' = (-3/2, -1/4, 3/2,
    -1/4)) halved into fine units. Matches `BicubicPatch` midpoint
    evaluation used by subdivision (reference `lib/surface.cc:984-1107`).
    """
    w0 = np.array([[1.0, 0.0], [0.0, 0.5]])
    wp = np.array([[0.5, 0.125], [-0.75, -0.125]])  # left coarse neighbor
    wm = np.array([[0.5, -0.125], [0.75, -0.125]])  # right coarse neighbor
    return {0: w0, 1: wp, -1: wm}


@functools.lru_cache(maxsize=None)
def _weights_4(dtype_str: str = "float32"):
    """4x4 channel weights W4[axis][u] on (f, dx, dy, dxy).

    Channel c = 2*cy + cx with cx indexing the (f, dx) tensor factor and cy
    the (f, dy) factor; the x-transfer is I_2 (x) w, the y-transfer
    w (x) I_2.
    """
    w = _weights_1d()
    eye = np.eye(2)
    wx = {u: np.kron(eye, w[u]) for u in (-1, 0, 1)}
    wy = {u: np.kron(w[u], eye) for u in (-1, 0, 1)}
    dt = np.dtype(dtype_str)
    return ({u: m.astype(dt) for u, m in wx.items()},
            {u: m.astype(dt) for u, m in wy.items()})


def _axis_up(x: jnp.ndarray, W: dict, axis: int, n_out: int) -> jnp.ndarray:
    """1D prolongation along `axis` of x [4, ...]: coarse n -> fine n_out."""
    x = jnp.moveaxis(x, axis, -1)
    W0 = jnp.asarray(W[0])
    Wp = jnp.asarray(W[1])
    Wm = jnp.asarray(W[-1])
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, 1)])
    even = jnp.einsum("ab,b...->a...", W0, xp[..., :-1])
    odd = (jnp.einsum("ab,b...->a...", Wp, xp[..., :-1])
           + jnp.einsum("ab,b...->a...", Wm, xp[..., 1:]))
    inter = jnp.stack([even, odd], axis=-1).reshape(*x.shape[:-1], -1)
    return jnp.moveaxis(inter[..., :n_out], -1, axis)


def _axis_down(x: jnp.ndarray, W: dict, axis: int) -> jnp.ndarray:
    """Adjoint of :func:`_axis_up` (transposed weights, gathered taps)."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    nc = coarse_size(n)
    W0 = jnp.asarray(W[0])
    Wp = jnp.asarray(W[1])
    Wm = jnp.asarray(W[-1])
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(1, 2 * nc - n)])
    out = (jnp.einsum("ba,b...->a...", W0, xp[..., 1::2][..., :nc])
           + jnp.einsum("ba,b...->a...", Wp, xp[..., 2::2][..., :nc])
           + jnp.einsum("ba,b...->a...", Wm, xp[..., 0::2][..., :nc]))
    return jnp.moveaxis(out, -1, axis)


def prolong(xc: jnp.ndarray, ny1: int, nx1: int) -> jnp.ndarray:
    """Hermite subdivision [4, ncy, ncx] -> [4, ny1, nx1] (see module doc)."""
    wx, wy = _weights_4(str(xc.dtype))
    return _axis_up(_axis_up(xc, wx, -1, nx1), wy, -2, ny1)


def restrict(xf: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of :func:`prolong`: [4, ny1, nx1] -> [4, ncy, ncx]."""
    wx, wy = _weights_4(str(xf.dtype))
    return _axis_down(_axis_down(xf, wx, -1), wy, -2)


def restrict_mask(active: jnp.ndarray) -> jnp.ndarray:
    """Coarse activity: any fine node in the transfer support is active."""
    a = active.astype(jnp.float32)
    ny1, nx1 = a.shape
    ncy, ncx = coarse_size(ny1), coarse_size(nx1)
    ap = jnp.pad(a, ((1, 2 * ncy - ny1), (1, 2 * ncx - nx1)))

    def taps(x, axis):
        x = jnp.moveaxis(x, axis, -1)
        nc = (x.shape[-1] - 1) // 2
        out = (x[..., 1::2][..., :nc] + x[..., 2::2][..., :nc]
               + x[..., 0::2][..., :nc])
        return jnp.moveaxis(out, -1, axis)

    return taps(taps(ap, -1), -2) > 0


@functools.lru_cache(maxsize=None)
def _galerkin_weight(dtype_str: str) -> np.ndarray:
    """Combined Galerkin weight tensor G [9*16, 9*9*16].

    G[(DY,DX,e,f), ((u,v),(dy,dx),a,b)] =
        W2(u, v)[a, e] * W2(u+dy-2DY, v+dx-2DX)[b, f]
    with W2(s, t) = Wy(s) Wx(t) and zero whenever the second transfer
    offset falls outside {-1, 0, 1}. Contracting this constant against the
    strided-window tensor of the fine stencil performs the whole triple
    product P^T A P as ONE matmul (see :func:`galerkin_coarse`).
    """
    wx, wy = _weights_4(dtype_str)

    def w2(u, v):
        return wy[u] @ wx[v]

    offs = (-1, 0, 1)
    G = np.zeros((9, 4, 4, 9, 9, 4, 4), np.dtype(dtype_str))
    for qi, (DY, DX) in enumerate([(a, b) for a in offs for b in offs]):
        for ti, (u, v) in enumerate([(a, b) for a in offs for b in offs]):
            left = w2(u, v)  # [a, e]
            for pi, (dy, dx) in enumerate(
                    [(a, b) for a in offs for b in offs]):
                ru, rv = u + dy - 2 * DY, v + dx - 2 * DX
                if abs(ru) > 1 or abs(rv) > 1:
                    continue
                right = w2(ru, rv)  # [b, f]
                G[qi, :, :, ti, pi] = np.einsum("ae,bf->efab", left, right)
    return G.reshape(9 * 16, 9 * 9 * 16)


def galerkin_coarse(Hb: jnp.ndarray) -> jnp.ndarray:
    """Coarse stencil A_c = P^T A P, in closed form.

    Hb: [3, 3, 4, 4, ny1, nx1] -> [3, 3, 4, 4, ncy, ncx].

    With W2(u, v) = Wy(u) Wx(v) the 4x4 channel weight of the fine node at
    offset (u, v) from coarse node (2I, 2J), and A's plane (dy, dx)
    coupling node (i, j) to (i+dy, j+dx):

        A_c[DY, DX][I, J] = sum_{u, v, dy, dx in {-1,0,1}}
            W2(u, v)^T A[dy, dx][2I+u, 2J+v] W2(u+dy-2DY, v+dx-2DX)

    where terms with |u+dy-2DY| > 1 or |v+dx-2DX| > 1 vanish (the fine
    destination is outside the coarse destination's transfer support).
    Evaluated as one MXU matmul: a precomputed [144, 1296] weight tensor
    (`_galerkin_weight`) times the 9 strided (u, v)-windows of the 9x16
    fine stencil planes — NOT as 225 separate slice-einsums, whose launch
    and memory-pass overheads measured ~280 ms at bench scale 2.
    Verified against `restrict(spmv(prolong(.)))` in tests/test_mg.py.
    """
    ny1, nx1 = Hb.shape[-2:]
    ncy, ncx = coarse_size(ny1), coarse_size(nx1)
    pad_y = (1, 2 * ncy + 1 - ny1 - 1)
    pad_x = (1, 2 * ncx + 1 - nx1 - 1)
    Hp = jnp.pad(Hb, ((0, 0), (0, 0), (0, 0), (0, 0), pad_y, pad_x))
    Hp = Hp.reshape(9, 16, *Hp.shape[-2:])

    # win[(u, v), (dy, dx), (a, b), Y, X] = A[dy, dx][a, b][2I+u, 2J+v]
    win = jnp.stack(
        [Hp[:, :, 1 + u::2, 1 + v::2][:, :, :ncy, :ncx]
         for u in (-1, 0, 1) for v in (-1, 0, 1)], axis=0)
    G = jnp.asarray(_galerkin_weight(str(Hb.dtype)))
    out = G @ win.reshape(9 * 9 * 16, ncy * ncx)
    # rows are (DY, DX, e, f): undo the einsum's (e, f) ordering
    return out.reshape(3, 3, 4, 4, ncy, ncx)


class Levels(NamedTuple):
    """Galerkin operators + inverted block diagonals, finest first."""

    ops: tuple  # stencil tensors [3, 3, 4, 4, ny1_l, nx1_l]
    pinvs: tuple  # block-Jacobi inverses [4, 4, ny1_l, nx1_l]
    shapes: tuple  # (ny1, nx1) per level
    # Per-NODE damping maps [ny1_l, nx1_l]; REQUIRED, one per level
    # (a defaulted () only crashed later inside _smooth — r3 advisor #4).
    omegas: tuple
    active: jnp.ndarray | None = None  # fine-level active mask [ny1, nx1]


def num_levels(ny1: int, nx1: int, min_size: int = 8) -> int:
    n = 1
    while min(coarse_size(ny1), coarse_size(nx1)) >= min_size:
        ny1, nx1 = coarse_size(ny1), coarse_size(nx1)
        n += 1
    return n


def build(Hb: jnp.ndarray, active: jnp.ndarray, min_size: int = 8,
          damp_rows: bool = True) -> Levels:
    """Build the V-cycle hierarchy for one assembled system.

    A coarse node is "active" if any fine node in its transfer support is
    (its Galerkin diagonal is then nonsingular); singular/inactive coarse
    blocks invert to zero exactly like the fine block-Jacobi guard. The
    fine-level ``active`` mask is kept so :func:`apply` can project the
    preconditioner onto the active subspace (inactive nodes have zero
    H rows/cols and zero gradient, so CG never controls components the
    V-cycle would otherwise smear onto them through the transfers).

    ``damp_rows`` selects the smoother damping policy per PROBLEM
    (measured on the r4 flagship/base benches, bench_r4_{c,d}.log):

    - True (base photometric systems): relative Gershgorin row damping
      (`_node_omega`). Their coarse Galerkin levels grow pathological
      outlier rows (5-2000x the median) that make the 0.8 V-cycle
      indefinite; damping them took base CG from 84 to 4 iters/step and
      the optimizer from 1.39 s to 1.16 s.
    - False (shading systems): constant OMEGA. Shading systems' stiff
      rows are FUNCTIONAL — they sit on weakly-textured nodes where the
      SH shading term supplies the only strong constraint; damping them
      (any F tried) cost the flagship 2.8x optimizer time (3.3 s ->
      9.3 s) and 3x accuracy (0.29% -> 0.88% median err). Their
      indefinite solves are carried by the per-apply <r, z> guard.
    """
    ny1, nx1 = Hb.shape[-2:]
    pinv0 = stencil.block_jacobi_inverse(Hb, active)

    def omega(H, pinv):
        if damp_rows:
            return _node_omega(H, pinv)
        return jnp.full(H.shape[-2:], OMEGA, H.dtype)

    ops = [Hb]
    pinvs = [pinv0]
    shapes = [(ny1, nx1)]
    omegas = [omega(Hb, pinv0)]
    act = active
    for _ in range(num_levels(ny1, nx1, min_size) - 1):
        Hb = galerkin_coarse(Hb)
        act = restrict_mask(act)
        pinv = stencil.block_jacobi_inverse(Hb, act)
        ops.append(Hb)
        pinvs.append(pinv)
        shapes.append(Hb.shape[-2:])
        omegas.append(omega(Hb, pinv))
    return Levels(ops=tuple(ops), pinvs=tuple(pinvs), shapes=tuple(shapes),
                  omegas=tuple(omegas), active=active)


# Rows whose Gershgorin block-row sum exceeds this multiple of the
# median row get damped proportionally (see `_node_omega`; used only
# for damp_rows=True systems — base photometric problems). Calibrated
# on MEASURED per-level lam distributions (explore_lam_r4.py, r4):
# healthy base rows span p99/p50 ~= 1.4 while the pathological
# coarse-level outliers that make the 0.8 V-cycle indefinite sit at
# 5-2000x the median; F = 2.0 clears the healthy p99 with margin and
# still crushes the outliers. (F = 1.5, r3, also damped healthy
# upper-quartile rows of SHADING systems and cost the flagship 2x
# throughput / 3.5x accuracy — shading systems now skip row damping
# entirely, see `build`.)
_ROW_STIFF_FACTOR = 2.0

# Debug/benchmark override: SMVS_MG_OMEGA=const disables the relative
# row damping (constant OMEGA everywhere; the guard + per-solve latch
# then carry stiff systems). Read once at import.
_OMEGA_POLICY = os.environ.get("SMVS_MG_OMEGA", "rel")


def _node_omega(Hb: jnp.ndarray, pinv: jnp.ndarray) -> jnp.ndarray:
    """Per-NODE smoother damping map [ny1, nx1].

    Row stiffness is measured by the Gershgorin block-row sum
    lam_i = sum_j ||pinv_i A_ij||_F. As an ABSOLUTE bound this is
    conservative by a problem-dependent factor (measured: healthy
    systems have lambda_max(D^-1 A) ~= 2.1 with lam_i median ~= 8.3 on
    base systems but ~= 15 on shading systems), so no absolute cap can
    both preserve healthy shading rows (lam up to ~30) and guarantee
    stability (omega*lam < 2) — the rule is RELATIVE instead: rows are
    damped by their excess over the typical row,
    w_i = OMEGA * min(1, F * median(lam) / lam_i). Healthy systems keep
    OMEGA everywhere; outlier-stiff rows — the coarse Galerkin rows at
    5-2000x the median that made the fixed-0.8 V-cycle indefinite on
    the base bench (CG 2 -> 84 iters/step) — are damped locally. A
    handful of near-singular blocks (weakly-determined shading systems)
    likewise damp only their own nodes instead of collapsing the global
    omega, the failure mode of the scalar power-iteration clamp
    (2.3% -> 11.9% depth error). Uniformly-stiff systems (median itself
    huge, e.g. late compacted working sets) are NOT damped by this rule;
    they fall to the per-application <r, z> guard in `apply` (block-
    Jacobi fallback, made sound mid-solve by flexible-beta CG).
    Per-node scalar damping keeps the smoother symmetric (w_i * D_i^-1
    is a scalar times a symmetric block).
    """
    if _OMEGA_POLICY == "const":
        return jnp.full(Hb.shape[-2:], OMEGA, Hb.dtype)
    # row blocks of D^-1 A at node (y, x): pinv[a,b,y,x] @ Hb[dy,dx,b,c,y,x].
    # Unrolled over the 4-wide contraction — a dot lowering here demands
    # a transposed Hb layout (32x tile padding in batched programs, see
    # stencil.spmv).
    prod = sum(
        pinv[None, None, :, b, None, :, :] * Hb[:, :, None, b, :, :, :]
        for b in range(4))
    lam = jnp.sqrt(jnp.sum(prod * prod, axis=(2, 3))).sum((0, 1))
    # median over rows that participate (inactive rows have pinv = 0)
    lam_act = jnp.where(lam > 0, lam, jnp.nan)
    med = jnp.nan_to_num(jnp.nanmedian(lam_act), nan=1.0)
    scale = jnp.minimum(1.0, _ROW_STIFF_FACTOR * med
                        / jnp.maximum(lam, 1e-6))
    return jnp.asarray(OMEGA, Hb.dtype) * scale.astype(Hb.dtype)


def _smooth(levels: Levels, l: int, r: jnp.ndarray) -> jnp.ndarray:
    return levels.omegas[l][None] * stencil.apply_block_diag(
        levels.pinvs[l], r)


def apply(levels: Levels, r: jnp.ndarray) -> jnp.ndarray:
    """z = M^-1 r: one symmetric V(1,1) cycle. r, z: [4, ny1, nx1].

    Damped block-Jacobi pre/post smoothing, Hermite transfers, Galerkin
    coarse corrections, COARSE_SWEEPS damped-Jacobi sweeps at the coarsest
    level. Symmetric by construction (identical pre/post smoother,
    restrict = prolong^T, fixed coarsest sweep count) and positive definite
    for OMEGA < 2 / lambda_max(D^-1 A). OMEGA is NOT clamped from a
    spectral estimate: lambda_max(D^-1 A) is dominated by a handful of
    near-singular blocks on weakly-determined systems (e.g. textureless
    shading problems), and collapsing the global damping to accommodate
    them guts the smoother everywhere — measured 2.3% -> 11.9% median
    depth error on the Lambertian-sphere test. Instead the pathological
    case is caught per application: if <r, z> <= 0 the V-cycle was
    indefinite for this system, and the always-PD damped block-Jacobi
    result is returned for that apply (and, in practice, every apply of
    that solve).

    The result is projected onto the fine active subspace (z * active):
    the prolongation would otherwise spread coarse corrections onto
    inactive-but-valid fine nodes whose H rows/cols and gradient are zero,
    so CG's x would accumulate uncontrolled null-space components there
    and `update_nodes` would apply spurious depth updates to frozen nodes.
    Pi M Pi remains symmetric PSD and the CG residual stays in range(Pi).
    """

    z = apply_vcycle(levels, r)
    if levels.active is not None:
        r = jnp.where(levels.active[None], r, 0.0)
    # Indefiniteness guard (see docstring): fall back to damped
    # block-Jacobi — always PD on the active set — when the V-cycle
    # produced a non-positive <r, z> (possible when OMEGA exceeds
    # 2/lambda_max for an unusually stiff system).
    rz = jnp.sum(r * z)
    return jnp.where(rz > 0, z, jacobi(levels, r))


def apply_vcycle(levels: Levels, r: jnp.ndarray) -> jnp.ndarray:
    """One symmetric V(1,1) cycle, active-projected, WITHOUT the
    indefiniteness guard. Callers probing definiteness (the per-solve
    latch in `pipeline/optimizer._newton_step`) use this directly."""

    def cycle(l: int, rl: jnp.ndarray) -> jnp.ndarray:
        A = levels.ops[l]
        if l == len(levels.ops) - 1:
            z = _smooth(levels, l, rl)
            for _ in range(COARSE_SWEEPS - 1):
                z = z + _smooth(levels, l, rl - stencil.spmv(A, z))
            return z
        z = _smooth(levels, l, rl)
        coarse_r = restrict(rl - stencil.spmv(A, z))
        zc = cycle(l + 1, coarse_r)
        z = z + prolong(zc, levels.shapes[l][0], levels.shapes[l][1])
        return z + _smooth(levels, l, rl - stencil.spmv(A, z))

    if levels.active is not None:
        r = jnp.where(levels.active[None], r, 0.0)
    z = cycle(0, r)
    if levels.active is not None:
        z = jnp.where(levels.active[None], z, 0.0)
    return z


def jacobi(levels: Levels, r: jnp.ndarray) -> jnp.ndarray:
    """Damped block-Jacobi on the fine level (always PD on the active
    set) — the fallback preconditioner of the per-solve latch and the
    per-apply guard."""
    zj = _smooth(levels, 0, r)
    if levels.active is not None:
        zj = jnp.where(levels.active[None], zj, 0.0)
    return zj
