"""Semi-global matching depth initialization (plane sweep in inverse depth).

TPU-native counterpart of reference `lib/sgm_stereo.cc`. Structure:

- 9x7 census transform packed into two uint32 lanes (no uint64 on TPU),
- per-depth-plane warp + census + Hamming cost (`create_cost_volume`,
  reference :150-244), streamed over planes with `lax.map`,
- 8-path min-plus aggregation as `lax.scan` over the scan axis, vectorized
  over the perpendicular axis with the depth axis in the 128-lane dimension
  (the standard 3-candidate SGM recurrence the reference's SSE kernel also
  uses, :361-406). Penalty P2 is intensity-adaptive like the scalar path
  (:316-319),
- WTA + bidirectional consistency (:46-96, :274-306).

All integer arithmetic is int32 (TPU-native); costs are bounded well below
2^31 because each step subtracts the previous minimum.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from smvs_tpu.geometry import correspondence as corr
from smvs_tpu.image import ops as iops

INVALID_COST = 255  # reference fills missing warps with 255 (:216-221)


@dataclasses.dataclass(frozen=True)
class SGMOptions:
    """Mirror of `SGMStereo::Options` (reference `lib/sgm_stereo.h:24-34`)."""

    scale: int = 1
    num_steps: int = 128
    debug_lvl: int = 0
    min_depth: float = 0.0
    max_depth: float = 0.0
    penalty1: int = 6
    penalty2: int = 96
    # Rectified fast path only: build the cost volume from the neighbor's
    # census computed ONCE and integer-shifted, with fractional planes as
    # cost-space lerps (~10x less per-plane work than re-censusing the
    # fractionally blended image like the reference does, :150-190 +
    # :126-148). Integer-only matching quantizes sub-pixel disparity, which
    # costs real accuracy when the sweep's disparity span is small (measured
    # 0.17% -> 3% median depth error at ~15px span), so the reference-exact
    # blend-then-census path stays the default; enable for large-baseline /
    # high-resolution pairs where the span dwarfs the quantization.
    cost_interp: bool = False


def depth_planes(min_depth: float, max_depth: float, num_steps: int) -> np.ndarray:
    """Inverse-depth sweep values (reference :193-203)."""
    inv = np.linspace(1.0 / max_depth, 1.0 / min_depth, num_steps)
    return (1.0 / inv).astype(np.float32)


@jax.jit
def census_transform(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """9(x) x 7(y) census over [H, W] intensities -> two uint32 planes.

    Bit order follows reference :126-148 (x-major over the window, MSB
    first); split into (hi: first 31 bits, lo: last 32 bits). Pixels with
    value 0 and the border band get census 0.
    """
    h, w = img.shape
    bits = []
    center = img
    pad = jnp.pad(img, ((3, 3), (4, 4)))
    for dx in range(-4, 5):
        for dy in range(-3, 4):
            nb = pad[3 + dy : 3 + dy + h, 4 + dx : 4 + dx + w]
            bits.append((center < nb).astype(jnp.uint32))
    hi = jnp.zeros((h, w), jnp.uint32)
    lo = jnp.zeros((h, w), jnp.uint32)
    for b in bits[:31]:
        hi = (hi << 1) | b
    for b in bits[31:]:
        lo = (lo << 1) | b
    xs = jnp.arange(w)
    ys = jnp.arange(h)
    interior = ((xs >= 4) & (xs < w - 5))[None, :] & \
        ((ys >= 3) & (ys < h - 4))[:, None]
    valid = interior & (center != 0)
    return jnp.where(valid, hi, 0), jnp.where(valid, lo, 0)


def _hamming(a_hi, a_lo, b_hi, b_lo):
    pc = jax.lax.population_count
    return (pc(a_hi ^ b_hi) + pc(a_lo ^ b_lo)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("plane_chunk",))
def cost_volume(
    main_img: jnp.ndarray,  # [H, W] float intensities (0..255 scale)
    neighbor_img: jnp.ndarray,  # [Hn, Wn]
    M: jnp.ndarray,
    t: jnp.ndarray,
    depths: jnp.ndarray,  # [D]
    plane_chunk: int = 8,
) -> jnp.ndarray:
    """Census Hamming cost volume [H, W, D] int32 (reference :193-244)."""
    h, w = main_img.shape
    hn, wn = neighbor_img.shape
    m_hi, m_lo = census_transform(main_img)
    nbr_win4 = iops.pack_window4(neighbor_img)
    ys, xs = jnp.mgrid[0:h, 0:w]
    u = xs.astype(main_img.dtype) + 0.5
    v = ys.astype(main_img.dtype) + 0.5

    def per_plane(d):
        proj, depth_n = corr.warp(M, t, u, v, d)
        px = proj[..., 0] - 0.5
        py = proj[..., 1] - 0.5
        ok = (depth_n > 0) & (px >= 0) & (py >= 0) & (px <= wn - 1) & \
            (py <= hn - 1)
        warped = jnp.where(ok, iops.bilinear_packed4(nbr_win4, px, py), 0.0)
        w_hi, w_lo = census_transform(warped)
        cost = _hamming(m_hi, m_lo, w_hi, w_lo)
        return jnp.where(warped != 0, cost, INVALID_COST)

    D = depths.shape[0]
    chunks = (D + plane_chunk - 1) // plane_chunk
    dpad = jnp.pad(depths, (0, chunks * plane_chunk - D))
    out = jax.lax.map(jax.vmap(per_plane),
                      dpad.reshape(chunks, plane_chunk))
    out = out.reshape(chunks * plane_chunk, h, w)[:D]
    return jnp.moveaxis(out, 0, -1)  # [H, W, D]


def _path_update(prev: jnp.ndarray, cost: jnp.ndarray, p1: int,
                 p2: jnp.ndarray) -> jnp.ndarray:
    """One min-plus step. prev/cost: [..., D]; p2 broadcastable [...]

    new = cost + min(prev, prev<<1 + P1, prev>>1 + P1, min_prev + P2) - min_prev
    (reference :328-345 scalar, :361-406 SSE).
    """
    big = jnp.asarray(1 << 24, prev.dtype)
    up = jnp.concatenate([prev[..., 1:], jnp.full_like(prev[..., :1], big)],
                         axis=-1)
    dn = jnp.concatenate([jnp.full_like(prev[..., :1], big), prev[..., :-1]],
                         axis=-1)
    min_prev = prev.min(axis=-1, keepdims=True)
    upd = jnp.minimum(jnp.minimum(prev, jnp.minimum(up, dn) + p1),
                      min_prev + p2[..., None])
    return cost + upd - min_prev


def _adaptive_p2(i1: jnp.ndarray, i2: jnp.ndarray, p1: int, p2: int
                 ) -> jnp.ndarray:
    """P2 scaled by inverse intensity difference (reference :314-319)."""
    diff = jnp.abs(i1 - i2).astype(jnp.int32) + 1
    return jnp.maximum(p1 * 3 // 2, p2 // diff)


@functools.partial(jax.jit, static_argnames=("p1", "p2"))
def aggregate(cost: jnp.ndarray, intensity: jnp.ndarray, p1: int, p2: int
              ) -> jnp.ndarray:
    """8-path SGM aggregation (reference `aggregate_sgm_costs`, :429-667).

    cost: [H, W, D] int32; intensity: [H, W] (for adaptive P2).
    Returns summed path costs [H, W, D] int32.
    """
    inten = intensity.astype(jnp.int32)

    def scan_lines(cost_lw, inten_lw, shift: int):
        """Scan along axis 0 of cost_lw [L, Wp, D]; the carried previous line
        is shifted by `shift` in the perpendicular axis (diagonal paths).
        Border positions restart from the raw cost (reference's border
        initialization)."""
        big = jnp.asarray(1 << 24, cost_lw.dtype)

        def step(carry, xs):
            prev, prev_int = carry
            c, it = xs
            if shift:
                prev = jnp.roll(prev, shift, axis=0)
                prev_int = jnp.roll(prev_int, shift, axis=0)
                border = jnp.zeros(prev.shape[0], bool)
                idx = 0 if shift > 0 else prev.shape[0] - 1
                border = border.at[idx].set(True)
                prev = jnp.where(border[:, None], big, prev)
            p2a = _adaptive_p2(it, prev_int, p1, p2)
            new = _path_update(prev, c, p1, p2a)
            if shift:
                new = jnp.where(border[:, None], c, new)
            return (new, it), new

        first = cost_lw[0]
        (_, _), rest = jax.lax.scan(step, (first, inten_lw[0]),
                                    (cost_lw[1:], inten_lw[1:]))
        return jnp.concatenate([first[None], rest], axis=0)

    total = jnp.zeros_like(cost)
    # Left-to-right / right-to-left: scan over x; lines are columns.
    cx = jnp.moveaxis(cost, 1, 0)  # [W, H, D]
    ix = jnp.moveaxis(inten, 1, 0)  # [W, H]
    total = total + jnp.moveaxis(scan_lines(cx, ix, 0), 0, 1)
    total = total + jnp.moveaxis(scan_lines(cx[::-1], ix[::-1], 0)[::-1], 0, 1)
    # Top-to-bottom / bottom-to-top (+ diagonals): scan over y.
    for shift in (0, 1, -1):
        total = total + scan_lines(cost, inten, shift)
        total = total + scan_lines(cost[::-1], inten[::-1], shift)[::-1]
    return total


@jax.jit
def winner_take_all(sgm_volume: jnp.ndarray, intensity: jnp.ndarray,
                    depths: jnp.ndarray) -> jnp.ndarray:
    """WTA depth extraction (reference `depth_from_sgm_volume`, :274-306):

    reject min_index < 2 and dark pixels (< 25/255 intensity)."""
    idx = jnp.argmin(sgm_volume, axis=-1)
    depth = depths[idx]
    ok = (idx >= 2) & (intensity >= 25)
    return jnp.where(ok, depth, 0.0)


def _use_pallas_default() -> bool:
    """Use the Pallas aggregation kernel on real TPU devices."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def run_sgm(main_img, neighbor_img, M, t, min_depth, max_depth,
            opts: SGMOptions, use_pallas: bool | None = None) -> jnp.ndarray:
    """Single-direction SGM depth map (reference `run_sgm`, :98-124)."""
    depths = jnp.asarray(depth_planes(min_depth, max_depth, opts.num_steps))
    cost = cost_volume(main_img, neighbor_img, M, t, depths)
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    if use_pallas:
        from smvs_tpu.sgm import pallas_agg

        agg = pallas_agg.aggregate(cost, main_img.astype(jnp.int32),
                                   opts.penalty1, opts.penalty2)
    else:
        agg = aggregate(cost, main_img, opts.penalty1, opts.penalty2)
    return winner_take_all(agg, main_img, depths)


@jax.jit
def consistency_filter(d_main: jnp.ndarray, d_neig: jnp.ndarray,
                       M: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Bidirectional consistency (reference `reconstruct`, :64-91):

    zero pixels whose reprojection misses the neighbor (3% border) or whose
    depth ratio with the neighbor's estimate is < 0.8."""
    h, w = d_main.shape
    hn, wn = d_neig.shape
    cut = 0.03 * max(wn, hn)
    ys, xs = jnp.mgrid[0:h, 0:w]
    # NOTE: the reference warps integer coords here (no +0.5), :77.
    proj, cdepth = corr.warp(M, t, xs.astype(d_main.dtype),
                             ys.astype(d_main.dtype), d_main)
    px, py = proj[..., 0], proj[..., 1]
    inb = (px >= cut) & (px < wn - cut) & (py >= cut) & (py < hn - cut)
    cx = jnp.clip(px.astype(jnp.int32), 0, wn - 1)
    cy = jnp.clip(py.astype(jnp.int32), 0, hn - 1)
    ndepth = d_neig[cy, cx]
    ratio = jnp.minimum(cdepth, ndepth) / jnp.maximum(
        jnp.maximum(cdepth, ndepth), 1e-20)
    ok = (d_main > 0) & inb & (ndepth > 0) & (ratio >= 0.8)
    return jnp.where(ok, d_main, 0.0)


def reconstruct(
    main_img: jnp.ndarray,
    neighbor_img: jnp.ndarray,
    M_mn: jnp.ndarray,
    t_mn: jnp.ndarray,
    M_nm: jnp.ndarray,
    t_nm: jnp.ndarray,
    range_main: tuple[float, float],
    range_neighbor: tuple[float, float],
    opts: SGMOptions = SGMOptions(),
) -> jnp.ndarray:
    """Full bidirectional SGM (reference `SGMStereo::reconstruct`, :46-96).

    Images are [H, W] intensities on a 0..255 scale (byte-image semantics of
    the reference); (M_mn, t_mn) warps main->neighbor, (M_nm, t_nm) the
    reverse. Depth ranges are per-view sweep bounds.
    """
    d_main = run_sgm(main_img, neighbor_img, M_mn, t_mn, *range_main, opts)
    d_neig = run_sgm(neighbor_img, main_img, M_nm, t_nm, *range_neighbor, opts)
    return consistency_filter(d_main, d_neig, M_mn, t_mn)


def depth_range_from_features(feature_depths: np.ndarray
                              ) -> tuple[float, float]:
    """SfM-feature-based sweep range (reference :669-720)."""
    d = np.sort(np.asarray(feature_depths))
    if d.size < 2:
        return 0.3, 1.1
    return float(d[0] * 0.7), float(d[(d.size * 99) // 100] * 5.0)


# ---------------------------------------------------------------------------
# Rectified fast path: the sweep as integer-disparity census shifts.
#
# The general path above gathers W*H*D bilinear samples (the dominant cost
# on TPU: ~700 ms of a 703 ms cost volume at 360^2 x 128, vs 25 ms for all
# 128 census transforms). After epipolar rectification every inverse-depth
# plane is a pure x-shift, so the cost volume needs NO gathers at all; and
# uniform disparity steps are exactly the reference's uniform inverse-depth
# sweep (`lib/sgm_stereo.cc:193-203`). See `smvs_tpu/sgm/rectify.py`.
# ---------------------------------------------------------------------------


def _disparity_cost(m_hi, m_lo, nbr_img, shifts: jnp.ndarray) -> jnp.ndarray:
    """Census Hamming cost volume [H, W, D] over fractional x-shifts.

    Per plane the neighbor image is shifted by ``shifts[d]`` (a 2-tap blend
    of two static-width slices — the rectified analog of the reference's
    per-plane bilinear warp, :150-190, with zero gathers), then
    census-transformed and Hamming-matched against the main census
    (:226-243). Unwarpable positions get INVALID_COST (:216-221). Shifts
    are traced, so one compilation covers every view pair.
    """
    h, w = m_hi.shape
    wn = nbr_img.shape[1]
    P = w + wn  # padding covers any |shift| the clip admits
    pimg = jnp.pad(nbr_img, ((0, 0), (P, P)))

    def per_shift(s):
        si = jnp.floor(s).astype(jnp.int32)
        a = (s - si.astype(s.dtype)).astype(nbr_img.dtype)
        start = jnp.clip(P - si, 1, P + wn).astype(jnp.int32)
        zero = jnp.zeros((), jnp.int32)
        t0 = jax.lax.dynamic_slice(pimg, (zero, start), (h, w))  # x - floor(s)
        t1 = jax.lax.dynamic_slice(pimg, (zero, start - 1), (h, w))
        warped = jnp.where((t0 != 0) & (t1 != 0), (1 - a) * t0 + a * t1, 0.0)
        w_hi, w_lo = census_transform(warped)
        cost = _hamming(m_hi, m_lo, w_hi, w_lo)
        return jnp.where(warped != 0, cost, INVALID_COST)

    out = jax.lax.map(per_shift, shifts)  # [D, H, W]
    return jnp.moveaxis(out, 0, -1)


def _disparity_cost_interp(m_hi, m_lo, nbr_img, shifts: jnp.ndarray
                           ) -> jnp.ndarray:
    """Census Hamming cost volume [H, W, D] via cost-space interpolation.

    The neighbor census is computed once; each plane takes the Hamming
    costs at the two bracketing integer shifts and lerps them by the
    fractional part. Within one inverse-depth step this matches the
    image-blend volume (`_disparity_cost`) to the cost-interpolation
    approximation — the standard integer-disparity SGM formulation — and
    skips the 128 per-plane census transforms. Validity mirrors the blend
    path: both tapped image samples must be nonzero.
    """
    h, w = m_hi.shape
    wn = nbr_img.shape[1]
    P = w + wn
    n_hi, n_lo = census_transform(nbr_img)
    pimg = jnp.pad(nbr_img, ((0, 0), (P, P)))
    phi = jnp.pad(n_hi, ((0, 0), (P, P)))
    plo = jnp.pad(n_lo, ((0, 0), (P, P)))
    zero = jnp.zeros((), jnp.int32)

    def per_shift(s):
        si = jnp.floor(s).astype(jnp.int32)
        a = (s - si.astype(s.dtype)).astype(s.dtype)
        start = jnp.clip(P - si, 1, P + wn).astype(jnp.int32)

        def tap(p, st):
            return jax.lax.dynamic_slice(p, (zero, st), (h, w))

        t0 = tap(pimg, start)  # x - floor(s)
        t1 = tap(pimg, start - 1)  # x - floor(s) - 1
        c0 = _hamming(m_hi, m_lo, tap(phi, start), tap(plo, start))
        c1 = _hamming(m_hi, m_lo, tap(phi, start - 1), tap(plo, start - 1))
        cf = (1.0 - a) * c0.astype(s.dtype) + a * c1.astype(s.dtype)
        cost = jnp.round(cf).astype(jnp.int32)
        return jnp.where((t0 != 0) & (t1 != 0), cost, INVALID_COST)

    out = jax.lax.map(per_shift, shifts)  # [D, H, W]
    return jnp.moveaxis(out, 0, -1)


def _at_plane(vol: jnp.ndarray, idx: jnp.ndarray, offset: int) -> jnp.ndarray:
    """vol[y, x, idx[y, x] + offset] via a masked reduction (no gather)."""
    d = vol.shape[-1]
    want = jnp.clip(idx + offset, 0, d - 1)
    planes = jnp.arange(d)
    return jnp.sum(jnp.where(planes == want[..., None], vol, 0), axis=-1)


def _wta_subpixel(agg: jnp.ndarray, raw_cost: jnp.ndarray,
                  intensity: jnp.ndarray, disp0, dstep):
    """WTA + parabolic sub-plane refinement -> (disparity, valid).

    Rejection mirrors the reference (`depth_from_sgm_volume`, :274-306):
    the two lowest sweep planes and dark pixels; additionally the winning
    plane must hold a real (non-INVALID) raw matching cost. The parabola
    fit is an improvement over the reference's discrete WTA — sub-plane
    disparity costs nothing here and sharpens the initialization.
    """
    idx = jnp.argmin(agg, axis=-1)
    c0 = _at_plane(agg, idx, 0).astype(jnp.float32)
    cm = _at_plane(agg, idx, -1).astype(jnp.float32)
    cp = _at_plane(agg, idx, 1).astype(jnp.float32)
    denom = cm + cp - 2.0 * c0
    frac = jnp.where(denom > 1e-6, 0.5 * (cm - cp) / jnp.maximum(denom, 1e-6),
                     0.0)
    d = agg.shape[-1]
    frac = jnp.where((idx > 0) & (idx < d - 1), jnp.clip(frac, -0.5, 0.5), 0.0)
    disp = disp0 + dstep * (idx.astype(jnp.float32) + frac)
    matched = _at_plane(raw_cost, idx, 0) < INVALID_COST
    ok = (idx >= 2) & (intensity >= 25) & matched
    return disp, ok


@functools.partial(jax.jit, static_argnames=("p1", "p2", "use_pallas",
                                              "cost_interp"))
def _rectified_sgm(main_r, nbr_r, hinv_nbr, H_main, L_main, fB, off,
                   disp0, dstep, shifts, p1: int, p2: int,
                   use_pallas: bool, cost_interp: bool = False):
    """Full bidirectional SGM in the rectified frame -> main-view z-depth.

    main_r [H, W] / nbr_r [H, W + 2*nbr_pad]: rectified intensities
    (0..255 scale, 0 = outside the original image); the neighbor canvas
    may be widened so border matches survive (`rectify.RectifiedPair
    .nbr_pad`). H_main maps original main pixel-center coords to
    rectified coords; hinv_nbr maps rectified-neighbor coords back to the
    ORIGINAL neighbor frame (for the reference's border cut,
    `lib/sgm_stereo.cc:77-82`); L_main converts rectified depth back to
    main z-depth (see `rectify.RectifiedPair`). All pair geometry enters
    as traced scalars, so this compiles once per image size.
    """
    h, w = main_r.shape
    wn = nbr_r.shape[1]
    f32 = main_r.dtype

    m_hi, m_lo = census_transform(main_r)
    n_hi, n_lo = census_transform(nbr_r)

    cost_fn = _disparity_cost_interp if cost_interp else _disparity_cost
    cost_m = cost_fn(m_hi, m_lo, nbr_r, shifts)
    cost_n = cost_fn(n_hi, n_lo, main_r, -shifts)
    if use_pallas:
        from smvs_tpu.sgm import pallas_agg

        # Both bidirectional sweeps ride ONE batched kernel walk: the
        # fused pass is grid-step-latency-bound (PERF_NOTES.md), so two
        # independent problems per step cost barely more than one. A
        # widened neighbor pads the main problem with INVALID columns.
        if wn != w:
            cm = jnp.pad(cost_m, ((0, 0), (0, wn - w), (0, 0)),
                         constant_values=INVALID_COST)
            im = jnp.pad(main_r, ((0, 0), (0, wn - w)))
        else:
            cm, im = cost_m, main_r
        agg2 = pallas_agg.aggregate_batch(
            jnp.stack([cm, cost_n]),
            jnp.stack([im, nbr_r]).astype(jnp.int32), p1, p2)
        agg_m, agg_n = agg2[0][:, :w], agg2[1]
    else:
        agg_m = aggregate(cost_m, main_r, p1, p2)
        agg_n = aggregate(cost_n, nbr_r, p1, p2)
    disp_m, ok_m = _wta_subpixel(agg_m, cost_m, main_r, disp0, dstep)
    disp_n, ok_n = _wta_subpixel(agg_n, cost_n, nbr_r, disp0, dstep)

    # Bidirectional consistency (reference `reconstruct`, :64-91): the
    # matched neighbor pixel must see a compatible depth (ratio >= 0.8)
    # and lie inside a 3% border margin OF THE ORIGINAL NEIGHBOR FRAME
    # (the reference applies the cut to the unrectified reprojection,
    # :77-82; cutting in rectified-canvas coords also discarded real
    # border content — the r5 coverage-gap root cause).
    ys, xs = jnp.mgrid[0:h, 0:w]
    cut = 0.03 * max(w, h)
    xn = xs.astype(f32) - disp_m
    Hn = hinv_nbr.astype(f32)
    un_h = Hn[0, 0] * (xn + 0.5) + Hn[0, 1] * (ys + 0.5) + Hn[0, 2]
    vn_h = Hn[1, 0] * (xn + 0.5) + Hn[1, 1] * (ys + 0.5) + Hn[1, 2]
    zn_h = Hn[2, 0] * (xn + 0.5) + Hn[2, 1] * (ys + 0.5) + Hn[2, 2]
    uo = un_h / zn_h - 0.5
    vo = vn_h / zn_h - 0.5
    inb = (zn_h > 0) & (uo >= cut) & (uo < w - cut) & \
        (vo >= cut) & (vo < h - cut)
    # Sub-pixel consistency: bilinear along the epipolar line where both
    # supports are valid, nearest valid support otherwise. (The reference
    # truncates to the integer pixel, `lib/sgm_stereo.cc:86-88`; sub-pixel
    # lookup measurably tightens the check at depth discontinuities.)
    x0 = jnp.clip(jnp.floor(xn).astype(jnp.int32), 0, wn - 2)
    fx = jnp.clip(xn - x0.astype(f32), 0.0, 1.0)
    dn0 = disp_n[ys, x0]
    dn1 = disp_n[ys, x0 + 1]
    okn0 = ok_n[ys, x0]
    okn1 = ok_n[ys, x0 + 1]
    disp_n_at = jnp.where(okn0 & okn1, dn0 * (1.0 - fx) + dn1 * fx,
                          jnp.where(okn0, dn0, dn1))
    ok_n_at = okn0 | okn1
    zm_rect = fB / jnp.where(jnp.abs(disp_m - off) > 1e-9, disp_m - off, 1e9)
    zn_rect = fB / jnp.where(jnp.abs(disp_n_at - off) > 1e-9,
                             disp_n_at - off, 1e9)
    ratio = jnp.minimum(zm_rect, zn_rect) / jnp.maximum(
        jnp.maximum(zm_rect, zn_rect), 1e-20)
    good = ok_m & ok_n_at & inb & (zm_rect > 0) & (zn_rect > 0) & \
        (ratio >= 0.8)
    z_rect = jnp.where(good, zm_rect, 0.0)

    # Un-rectify: each original main pixel reads the rectified depth at its
    # homography image and converts to main-camera z-depth.
    Hc = H_main.astype(f32)
    u = xs.astype(f32) + 0.5
    v = ys.astype(f32) + 0.5
    rx = Hc[0, 0] * u + Hc[0, 1] * v + Hc[0, 2]
    ry = Hc[1, 0] * u + Hc[1, 1] * v + Hc[1, 2]
    rz = Hc[2, 0] * u + Hc[2, 1] * v + Hc[2, 2]
    rx = rx / rz
    ry = ry / rz
    # Sub-pixel un-rectify: validity-weighted bilinear over the 2x2 support
    # when the valid samples agree (ratio >= 0.8); otherwise fall back to
    # the nearest sample — plain bilinear would invent phantom depths
    # across discontinuities.
    gx = rx - 0.5
    gy = ry - 0.5
    gx0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, w - 2)
    gy0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, h - 2)
    gfx = jnp.clip(gx - gx0.astype(f32), 0.0, 1.0)
    gfy = jnp.clip(gy - gy0.astype(f32), 0.0, 1.0)
    z4 = jnp.stack([z_rect[gy0, gx0], z_rect[gy0, gx0 + 1],
                    z_rect[gy0 + 1, gx0], z_rect[gy0 + 1, gx0 + 1]])
    w4 = jnp.stack([(1 - gfx) * (1 - gfy), gfx * (1 - gfy),
                    (1 - gfx) * gfy, gfx * gfy])
    m4 = (z4 > 0).astype(f32)
    wsum = (w4 * m4).sum(0)
    zbar = (w4 * m4 * z4).sum(0) / jnp.maximum(wsum, 1e-12)
    zmin = jnp.min(jnp.where(m4 > 0, z4, jnp.inf), axis=0)
    zmax = jnp.max(jnp.where(m4 > 0, z4, 0.0), axis=0)
    agree = zmin >= 0.8 * zmax
    rxi = jnp.clip(jnp.round(gx).astype(jnp.int32), 0, w - 1)
    ryi = jnp.clip(jnp.round(gy).astype(jnp.int32), 0, h - 1)
    z_nn = z_rect[ryi, rxi]
    z_at = jnp.where((wsum > 0.5) & agree, zbar, z_nn)
    inb_r = (rz > 0) & (rx >= 0.5) & (rx <= w - 0.5) & (ry >= 0.5) & \
        (ry <= h - 0.5)
    Lc = L_main.astype(f32)
    depth = z_at * (Lc[0] * rx + Lc[1] * ry + Lc[2])
    return jnp.where(inb_r & (z_at > 0) & (depth > 0), depth, 0.0)


@functools.partial(jax.jit, static_argnames=("num_steps", "p1", "p2",
                                              "use_pallas", "cost_interp",
                                              "nbr_pad"))
def _rectified_sgm_packed(main_img, nbr_img, params, num_steps: int,
                          p1: int, p2: int, use_pallas: bool,
                          cost_interp: bool = False, nbr_pad: int = 0):
    """Single-dispatch rectified SGM: warps + sweep + consistency in one jit.

    ``params`` packs every per-pair scalar into ONE f32[34] array —
    Hinv_main (9), Hinv_nbr (9), H_main (9), L_main (3), fB, off, disp0,
    dstep — so one reconstruction costs one host->device transfer and one
    dispatch instead of ~10 of each (each small transfer pays full
    round-trip latency under a tunneled device; measured ~0.3s of a 0.7s
    call at 2MP).
    """
    from smvs_tpu.sgm import rectify as R

    f32 = main_img.dtype
    params = params.astype(f32)
    hinv_m = params[0:9].reshape(3, 3)
    hinv_n = params[9:18].reshape(3, 3)
    h_main = params[18:27].reshape(3, 3)
    l_main = params[27:30]
    fB, off, disp0, dstep = params[30], params[31], params[32], params[33]
    main_r = R.warp_homography(main_img, hinv_m)
    nbr_r = R.warp_homography(nbr_img, hinv_n,
                              out_width=main_img.shape[1] + 2 * nbr_pad)
    shifts = disp0 + dstep * jnp.arange(num_steps, dtype=f32)
    return _rectified_sgm(main_r, nbr_r, hinv_n, h_main, l_main, fB, off,
                          disp0, dstep, shifts, p1, p2, use_pallas,
                          cost_interp)


def reconstruct_rectified(rp, main_img: jnp.ndarray, nbr_img: jnp.ndarray,
                          opts: SGMOptions = SGMOptions(),
                          use_pallas: bool | None = None) -> jnp.ndarray:
    """Bidirectional SGM through a precomputed rectification.

    ``rp`` is a valid `rectify.RectifiedPair`. Images are [H, W]
    intensities on the 0..255 scale in the ORIGINAL frames; the returned
    depth map is in the main view's frame like :func:`reconstruct`.
    """
    d = opts.num_steps
    params = _pair_params(rp, d)
    return _rectified_sgm_packed(
        jnp.asarray(main_img), jnp.asarray(nbr_img), jnp.asarray(params),
        d, opts.penalty1, opts.penalty2,
        _use_pallas_default() if use_pallas is None else use_pallas,
        opts.cost_interp, nbr_pad=rp.nbr_pad)


@functools.partial(jax.jit, static_argnames=("num_steps", "p1", "p2",
                                              "use_pallas", "cost_interp",
                                              "nbr_pad"))
def _rectified_sgm_packed_multi(main_img, nbr_imgs, params, num_steps: int,
                                p1: int, p2: int, use_pallas: bool,
                                cost_interp: bool = False,
                                nbr_pad: int = 0):
    """N rectified pair reconstructions + neighbor averaging, ONE program.

    nbr_imgs: [N, H, W]; params: [N, 34] per-pair packed scalars (see
    `_rectified_sgm_packed`). The per-neighbor depth maps are averaged
    on-device with the reference's rule (mean where both see depth, else
    whichever does — `app/smvsrecon.cc:347-384`). Fusing the N
    reconstructions saves N-1 dispatch + full-depth-map download/upload
    round trips through the tunnel, which cost as much as the SGM math
    itself at 2 MP (measured r4: flagship SGM 2.5 s for 2 neighbors vs
    0.57 s device time per pair).
    """
    acc = None
    for k in range(nbr_imgs.shape[0]):
        d = _rectified_sgm_packed(main_img, nbr_imgs[k], params[k],
                                  num_steps, p1, p2, use_pallas,
                                  cost_interp, nbr_pad=nbr_pad)
        if acc is None:
            acc = d
        else:
            both = (acc > 0) & (d > 0)
            only2 = (acc == 0) & (d > 0)
            acc = jnp.where(both, (acc + d) * 0.5,
                            jnp.where(only2, d, acc))
    return acc


def _pair_params(rp, num_steps: int) -> np.ndarray:
    lo = float(rp.disp_lo)
    step = max((rp.disp_hi - lo) / max(num_steps - 1, 1), 1e-3)
    return np.concatenate([
        np.linalg.inv(rp.H_main).ravel(), np.linalg.inv(rp.H_nbr).ravel(),
        np.asarray(rp.H_main).ravel(), np.asarray(rp.L_main).ravel(),
        [rp.fB, rp.off, lo, step],
    ]).astype(np.float32)


def reconstruct_auto_multi(cam_main, cams_nbr, main_img, nbr_imgs,
                           range_main: tuple[float, float],
                           ranges_nbr,
                           opts: SGMOptions = SGMOptions(),
                           use_pallas: bool | None = None) -> jnp.ndarray:
    """SGM of several neighbors averaged (reference `app/smvsrecon.cc:
    347-384`), fused into one device program when every pair rectifies
    and the neighbor images share the main image's shape; otherwise the
    equivalent sequential `reconstruct_auto` + host averaging."""
    from smvs_tpu.sgm import rectify as R

    # np.shape reads the .shape attribute without materializing the array
    # (np.asarray on a device array is a full D2H transfer under the
    # tunnel — ~8 MB per 1440^2 image, measured as SGM wall, not compute).
    h, w = np.shape(main_img)
    shapes_ok = all(np.shape(n) == (h, w) for n in nbr_imgs)
    rps = [R.rectify_pair(cam_main, c, w, h, range_main, rn)
           for c, rn in zip(cams_nbr, ranges_nbr)]
    if shapes_ok and all(rp.valid for rp in rps):
        # One fused program needs one canvas width: re-rectify every
        # pair at the max footprint pad.
        pad = max(rp.nbr_pad for rp in rps)
        if any(rp.nbr_pad != pad for rp in rps):
            rps = [R.rectify_pair(cam_main, c, w, h, range_main, rn,
                                  nbr_pad=pad)
                   for c, rn in zip(cams_nbr, ranges_nbr)]
        params = np.stack([_pair_params(rp, opts.num_steps) for rp in rps])
        return _rectified_sgm_packed_multi(
            jnp.asarray(main_img), jnp.stack([jnp.asarray(n)
                                              for n in nbr_imgs]),
            jnp.asarray(params), opts.num_steps, opts.penalty1,
            opts.penalty2,
            _use_pallas_default() if use_pallas is None else use_pallas,
            opts.cost_interp, nbr_pad=pad)

    acc = None
    for cam_n, nbr, rn in zip(cams_nbr, nbr_imgs, ranges_nbr):
        d = np.asarray(reconstruct_auto(cam_main, cam_n, main_img, nbr,
                                        range_main, rn, opts, use_pallas))
        if acc is None:
            acc = d
        else:
            both = (acc > 0) & (d > 0)
            only2 = (acc == 0) & (d > 0)
            acc = np.where(both, (acc + d) * 0.5, np.where(only2, d, acc))
    return jnp.asarray(acc)


def reconstruct_auto(cam_main, cam_nbr, main_img, nbr_img,
                     range_main: tuple[float, float],
                     range_nbr: tuple[float, float],
                     opts: SGMOptions = SGMOptions(),
                     use_pallas: bool | None = None) -> jnp.ndarray:
    """Camera-level entry: rectified fast path with general-warp fallback.

    Equivalent to the reference's `SGMStereo::reconstruct` (:46-96) given
    the two cameras; picks the shift-based rectified sweep whenever the
    pair geometry allows it and falls back to the per-plane gather path
    for degenerate (near-forward-motion) pairs.
    """
    from smvs_tpu.sgm import rectify as R

    h, w = np.shape(main_img)  # no D2H transfer (see reconstruct_auto_multi)
    rp = R.rectify_pair(cam_main, cam_nbr, w, h, range_main, range_nbr)
    if rp.valid:
        return reconstruct_rectified(rp, main_img, nbr_img, opts, use_pallas)
    hn, wn = np.shape(nbr_img)
    M_mn, t_mn = cam_main.fill_reprojection(cam_nbr, w, h, wn, hn)
    M_nm, t_nm = cam_nbr.fill_reprojection(cam_main, wn, hn, w, h)
    return reconstruct(jnp.asarray(main_img), jnp.asarray(nbr_img),
                       jnp.asarray(M_mn), jnp.asarray(t_mn),
                       jnp.asarray(M_nm), jnp.asarray(t_nm),
                       range_main, range_neighbor=range_nbr, opts=opts)
