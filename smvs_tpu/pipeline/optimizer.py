"""Per-view coarse-to-fine depth optimization controller.

TPU-native counterpart of reference `lib/depth_optimizer.cc`: the scale loop
(`optimize`, :53-162), Newton iterations with a reprojection-delta working
set (`run_newton_iterations`, :164-358), visibility/occlusion analysis
(`create_subview_surfaces`, :433-604), and boundary cutting
(`cut_boundaries`, :360-431) — all expressed as masked dense array programs.
Per-scale compute (assembly, CG, projections, visibility) is jitted; the
Python level only sequences scales and reads convergence scalars.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from smvs_tpu.geometry import correspondence as corr
from smvs_tpu.image import bilateral, ops as iops
from smvs_tpu.shading.lighting import fit_lighting
from smvs_tpu.solver import cg, gn, mg, stencil
from smvs_tpu.surface import bicubic
from smvs_tpu.surface import state as S
from smvs_tpu.pipeline.views import StereoViewState
from smvs_tpu.utils.timing import StageTimer


@dataclasses.dataclass(frozen=True)
class OptimizerOptions:
    """Mirror of `DepthOptimizer::Options` (reference `lib/depth_optimizer.h:30-42`)."""

    regularization: float = 0.001
    light_surf_regularization: float = 0.0
    num_iterations: int = 10
    min_scale: int = 1
    use_shading: bool = False
    use_sgm: bool = False
    full_optimization: bool = False
    debug_lvl: int = 0
    output_name: str = "smvs" 
    # TPU-specific knobs
    max_newton_steps: int = 200
    chunk: int = 16384
    # CG preconditioner: "mg" (Hermite-subdivision geometric multigrid
    # V-cycle, smvs_tpu/solver/mg.py) or "jacobi" (the reference's inverted
    # block diagonal, `lib/block_sparse_matrix.h:300-316`). Both use the
    # same CG termination rules; "mg" converges in a fraction of the
    # iterations at fine scales, where block-Jacobi (here AND in the
    # reference — see PERF_NOTES.md) hits the 200-iteration cap.
    precond: str = "mg"
    # Newton steps without active-set or reprojection-delta improvement
    # before the inner loop exits (see `_newton_loop`).
    stall_limit: int = 8
    # bf16 x-paired assembly gather (iops.pack_gradhess_pair10):
    # measured 1.34x on the dominant assembly gather (PERF_NOTES "GN
    # assembly gather"). The per-step system perturbation (~12% of the
    # gradient's max entry through the IRLS weights) washes out through
    # the Newton iteration: end-to-end depth error is unchanged
    # (measured r4, 360px base: median 7.1e-5 bf16 vs 8.0e-5 f32).
    # Applied only to f32 pipelines; f64 runs keep exact gathers.
    bf16_gather: bool = True
    # Equality-harness mode: run EXACTLY max_newton_steps per inner loop
    # (no convergence/stall early exits; the non-finite-delta bail
    # remains). Cross-path equality tests (sharded vs unsharded, batched
    # vs sequential) use this so reduction-order noise cannot flip an
    # iteration count and shift the whole map by a convergence epsilon —
    # which is what forced the r3 tolerance loosening (advisor #3).
    fixed_newton_steps: bool = False


def initial_scale(width: int, height: int) -> int:
    """Reference `lib/depth_optimizer.cc:37-39`."""
    return int(max(np.ceil(np.log2(width * height / 1.7e6) / 2) + 4, 4))


def _build_viewset(
    main: StereoViewState,
    subs: list[StereoViewState],
    scale: int,
    use_shading: bool,
    dtype,
    bf16_gather: bool = False,
) -> gn.ViewSet:
    mi = main.at_scale(scale)
    if bf16_gather and jnp.dtype(dtype) == jnp.float32:
        # bf16 x-paired sampling image: halves the assembly gather's row
        # bytes and take count (iops.pack_gradhess_pair10). The analytic
        # assembly dispatches on the channel count; the autodiff oracle
        # path requires the 5-channel f32 format.
        sub_gh = jnp.stack([
            iops.pack_gradhess_pair10(
                s.at_scale(scale).grad.astype(dtype),
                s.at_scale(scale).hess.astype(dtype))
            for s in subs])
    else:
        sub_gh = jnp.stack([
            iops.pack_gradhess(s.at_scale(scale).grad.astype(dtype),
                               s.at_scale(scale).hess.astype(dtype))
            for s in subs])
    Ms, ts = [], []
    for s in subs:
        M, t = main.camera.fill_reprojection(
            s.camera, main.width, main.height, s.width, s.height
        )
        Ms.append(M)
        ts.append(t)
    shading_gi = None
    if use_shading:
        shading_image, shading_grad = main.shading_images()
        shading_gi = jnp.moveaxis(
            jnp.concatenate([shading_grad, shading_image[None]], axis=0),
            0, -1).astype(dtype)  # [H, W, 3] = (gx, gy, value)
    return gn.ViewSet(
        grad_main=mi.grad.astype(dtype),
        sub_gh=sub_gh,
        M=jnp.asarray(np.stack(Ms), dtype),
        t=jnp.asarray(np.stack(ts), dtype),
        flen=jnp.asarray(main.flen(), dtype),
        shading_gi=shading_gi,
    )


# ---------------------------------------------------------------------------
# geometry helpers on the patch grid


def _patch_pixel_grids(surf: S.Surface):
    """Full-resolution pixel centers per patch: (u, v) each [ny, nx, P]."""
    return _patch_pixel_grids_sub(surf, 1)


def _patch_pixel_grids_sub(surf: S.Surface, sampling: int):
    px, py = gn._patch_pixel_coords(surf, sampling=sampling)
    u = jnp.asarray(px + 0.5, surf.nodes.dtype)
    v = jnp.asarray(py + 0.5, surf.nodes.dtype)
    return u, v


def _patch_depths_and_derivs(surf: S.Surface):
    """(w, wdx, wdy) per full-res patch pixel, each [ny, nx, P]."""
    return _patch_depths_and_derivs_sub(surf, 1)


def _patch_depths_and_derivs_sub(surf: S.Surface, sampling: int):
    """As above with pixel subsampling.

    Implemented as a plain 2D matmul: 4D-output einsums of the basis
    contraction miscompile on the experimental TPU backend when fused with
    downstream consumers (same bug class as in `Surface.subdivide`).
    """
    ny, nx = surf.num_patches_y, surf.num_patches_x
    basis = bicubic.pixel_basis(surf.patchsize, sampling,
                                dtype=surf.nodes.dtype)
    b2 = basis[:, :3, :].reshape(-1, 16)  # [P*3, 16]
    params = S.patch_params(surf).reshape(ny * nx, 16)
    vals = (params @ b2.T).reshape(ny, nx, -1, 3)  # [ny, nx, P, 3]
    return vals[..., 0], vals[..., 1], vals[..., 2]


def _all_projections(surf: S.Surface, view: gn.ViewSet):
    """proj [N, ny, nx, P, 2] and depth [N, ny, nx, P] for all patch pixels.

    Invalid patches get a fixed dummy depth so their (masked-out)
    projections are stable — garbage projections from near-zero depths
    amplified downstream numerical noise and, on the experimental TPU
    backend, leaked through fused mask selects.
    """
    u, v = _patch_pixel_grids(surf)
    w, _, _ = _patch_depths_and_derivs(surf)
    w = jnp.where(surf.patch_valid[..., None], w, 1.0)

    def per_n(M, t):
        return corr.warp(M, t, u, v, w)

    return jax.vmap(per_n)(view.M, view.t)


# ---------------------------------------------------------------------------
# visibility (create_subview_surfaces)


@jax.jit
def zbuffer_scatter(view: gn.ViewSet, src: jnp.ndarray) -> jnp.ndarray:
    """Min-depth z-buffer of a full-res depth source in each neighbor.

    Returns [N, (sub_h+1)*(sub_w+1)] pre-pooled center splats (1e4 = empty).
    Split out of :func:`compute_visibility` so a scale-invariant source
    (the SGM depth: full-res, and the reprojection M/t never change across
    scales because scale-space is by blur, not downsampling) is scattered
    ONCE per view instead of once per scale — min over sources commutes
    with everything downstream, so the caching is exact.
    """
    H, W = src.shape
    dtype = src.dtype
    sub_h, sub_w = view.sub_gh.shape[1:3]
    ys, xs = jnp.mgrid[0:H, 0:W]
    u_img = xs.astype(dtype) + 0.5
    v_img = ys.astype(dtype) + 0.5
    valid = src > 0
    big = jnp.asarray(1e4, dtype)

    def scatter_one(M, t):
        proj, d = corr.warp(M, t, u_img, v_img, src)
        pxl = proj[..., 0] - 0.5
        pyl = proj[..., 1] - 0.5
        ok = valid & (pxl >= 3.0) & (pxl < sub_w - 3.0) & \
            (pyl >= 3.0) & (pyl < sub_h - 3.0)
        cx = jnp.clip(pxl.astype(jnp.int32), 1, sub_w - 2)
        cy = jnp.clip(pyl.astype(jnp.int32), 1, sub_h - 2)
        vals = jnp.where(ok, d, big).reshape(-1)
        idx = (cy * (sub_w + 1) + cx).reshape(-1)
        return jnp.full(((sub_h + 1) * (sub_w + 1),), big,
                        dtype).at[idx].min(vals)

    return jax.vmap(scatter_one)(view.M, view.t)


@partial(jax.jit, static_argnames=("use_sgm",))
def compute_visibility(
    surf: S.Surface,
    view: gn.ViewSet,
    sgm_depth: Optional[jnp.ndarray],
    use_sgm: bool,
    main_image: jnp.ndarray,
    sub_images: jnp.ndarray,
    sgm_zbuffer: Optional[jnp.ndarray] = None,
) -> tuple[S.Surface, jnp.ndarray]:
    """Per-(patch, neighbor) visibility; deletes patches visible nowhere.

    Counterpart of reference `lib/depth_optimizer.cc:433-604`: two-pass
    z-buffer with 0.95 tolerance, warp-anisotropy test (sigma ratio <= 8),
    and (no-SGM) NCC occlusion rejection. Returns (surface, vis[ny, nx, N]).
    ``sgm_zbuffer`` is an optional precomputed `zbuffer_scatter(view,
    sgm_depth)` (used instead of re-scattering the SGM source).
    """
    N = view.M.shape[0]
    H, W = surf.height, surf.width
    dtype = surf.nodes.dtype
    sub_h, sub_w = view.sub_gh.shape[1:3]

    # ---- pass 1: min-depth z-buffer per neighbor over all valid pixels ----
    # Each point splats a 3x3 footprint; scattering only the center and
    # min-pooling the buffer afterwards is equivalent (min over a window of
    # scattered centers) and does 1 scatter instead of 9.
    cache = zbuffer_scatter(view, S.depth_map(surf))
    if use_sgm:
        if sgm_zbuffer is not None:
            cache = jnp.minimum(cache, sgm_zbuffer.astype(dtype))
        elif sgm_depth is not None:
            cache = jnp.minimum(cache,
                                zbuffer_scatter(view, sgm_depth.astype(dtype)))
    cache = cache.reshape(N, sub_h + 1, sub_w + 1)

    def min_pool3(c):
        cp = jnp.pad(c, ((0, 0), (1, 1), (0, 0)), constant_values=np.inf)
        c = jnp.minimum(jnp.minimum(cp[:, :-2], cp[:, 1:-1]), cp[:, 2:])
        cp = jnp.pad(c, ((0, 0), (0, 0), (1, 1)), constant_values=np.inf)
        return jnp.minimum(jnp.minimum(cp[:, :, :-2], cp[:, :, 1:-1]),
                           cp[:, :, 2:])

    # 3x3 min-pool = the splat footprint; the second pool folds in the
    # patch test's own 3x3 window min so the test needs ONE lookup.
    cache = min_pool3(min_pool3(cache))

    # ---- pass 2: per-patch tests -----------------------------------------
    u, v = _patch_pixel_grids(surf)
    w, wdx, wdy = _patch_depths_and_derivs(surf)
    cutoff = 0.03 * max(sub_w, sub_h)
    # (u, v) are exact pixel centers, so the main-view values come from
    # static slicing, not interpolation.
    main_vals = gn.extract_patch_pixels(main_image, surf)  # [ny, nx, P]

    sub_win4 = jax.vmap(iops.pack_window4)(sub_images)

    def per_neighbor(M, t, cache_n, sub_img):
        proj, d = corr.warp(M, t, u, v, w)  # [ny, nx, P, 2]
        pxl = proj[..., 0] - 0.5
        pyl = proj[..., 1] - 0.5
        inb = (pxl >= cutoff) & (pxl < sub_w - cutoff) & \
            (pyl >= cutoff) & (pyl < sub_h - cutoff)
        in_bounds = inb.all(axis=-1)  # [ny, nx]

        cx = jnp.clip(pxl.astype(jnp.int32), 1, sub_w - 2)
        cy = jnp.clip(pyl.astype(jnp.int32), 1, sub_h - 2)
        nb_min = cache_n[cy, cx]  # cache is double-min-pooled (see above)
        occluded = (d * 0.95 > nb_min).any(axis=-1)

        jac = corr.warp_jacobian(M, t, u, v, w, wdx, wdy)
        aniso = corr.jacobian_condition(jac).max(axis=-1) <= 8.0

        # NCC (reference :577-580, used when SGM is off): normalized
        # correlation of main vs warped neighbor intensities over the patch.
        sub_vals = iops.bilinear_packed4(sub_img, pxl, pyl)
        m0 = main_vals - main_vals.mean(axis=-1, keepdims=True)
        m1 = sub_vals - sub_vals.mean(axis=-1, keepdims=True)
        n0 = jnp.linalg.norm(m0, axis=-1)
        n1 = jnp.linalg.norm(m1, axis=-1)
        ncc = jnp.sum(m0 * m1, axis=-1) / jnp.maximum(n0 * n1, 1e-20)
        textureless = (n0 + n1) < 0.001 * u.shape[-1]
        ncc_ok = textureless | (ncc >= 0)

        ok = in_bounds & ~occluded & aniso
        if not use_sgm:
            ok = ok & ncc_ok
        return ok

    vis = jax.vmap(per_neighbor)(view.M, view.t, cache, sub_win4)
    vis = jnp.moveaxis(vis, 0, -1)  # [ny, nx, N]
    vis = vis & surf.patch_valid[..., None]

    surf = S.delete_patches(surf, ~vis.any(axis=-1) & surf.patch_valid)
    surf = S.remove_nodes_without_patch(surf)
    vis = vis & surf.patch_valid[..., None]
    return surf, vis


# ---------------------------------------------------------------------------
# boundary cutting


@jax.jit
def cut_boundaries_loop(surf: S.Surface, view: gn.ViewSet, vis: jnp.ndarray,
                        inv_flen_cal: jnp.ndarray):
    """Repeat boundary cutting while it deletes > 10 patches
    (reference `lib/depth_optimizer.cc:192-194, 326-328`), fully on device.
    """

    def cond(state):
        _, _, deleted = state
        return deleted > 10

    def body(state):
        surf_, vis_, _ = state
        surf_, d = cut_boundaries(surf_, view, vis_, inv_flen_cal)
        vis_ = vis_ & surf_.patch_valid[..., None]
        return (surf_, vis_, d)

    surf, vis, _ = jax.lax.while_loop(
        cond, body, (surf, vis, jnp.asarray(1 << 30)))
    return surf, vis


@jax.jit
def cut_boundaries(surf: S.Surface, view: gn.ViewSet, vis: jnp.ndarray,
                   inv_flen_cal: np.ndarray
                   ) -> tuple[S.Surface, jnp.ndarray]:
    """One sweep of boundary cutting (reference `lib/depth_optimizer.cc:360-431`).

    Returns (surface, number_deleted). inv_flen_cal is the 3x3 inverse
    calibration of the main view. The photometric-error test only applies
    to border patches, so the MSE is computed just for those (through a
    fixed-capacity compaction like the GN assembly) — the reference also
    evaluates `mse_for_patch` per border patch per sweep (:402-428).
    """
    ny, nx, _ = vis.shape
    ps = surf.patchsize
    dtype = surf.nodes.dtype
    n = surf.nodes

    # -- depth-discontinuity test over the 4 corner node depths -------------
    c00 = n[:-1, :-1, 0]
    c10 = n[:-1, 1:, 0]
    c01 = n[1:, :-1, 0]
    c11 = n[1:, 1:, 0]
    corners = jnp.stack([c00, c10, c01, c11], axis=-1)  # [ny, nx, 4]
    dmin = corners.min(-1)
    dmax = corners.max(-1)
    amin = corners.argmin(-1)
    amax = corners.argmax(-1)
    dd_factor = jnp.where(amin + amax == 3, 5.0 * np.sqrt(2.0), 5.0)

    bx = jnp.asarray(surf.start_x + np.arange(nx) * ps, dtype)
    by = jnp.asarray(surf.start_y + np.arange(ny) * ps, dtype)
    vx = inv_flen_cal[0, 0] * (bx + 0.5) + inv_flen_cal[0, 2]
    vy = inv_flen_cal[1, 1] * (by + 0.5) + inv_flen_cal[1, 2]
    vnorm = jnp.sqrt(vx[None, :] ** 2 + vy[:, None] ** 2 + 1.0)
    threshold = dd_factor * dmin * inv_flen_cal[0, 0] * ps / vnorm
    cut_depth = (dmax - dmin) > threshold

    # -- border-patch photometric error test --------------------------------
    nvp = jnp.pad(surf.node_valid, ((1, 1), (1, 1)))
    ny1, nx1 = surf.node_valid.shape
    invalid_count = jnp.zeros((ny1, nx1), jnp.int32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            invalid_count = invalid_count + (
                ~nvp[1 + dy : 1 + dy + ny1, 1 + dx : 1 + dx + nx1]
            ).astype(jnp.int32)
    node_border = invalid_count > 1
    patch_border = (node_border[:-1, :-1] | node_border[:-1, 1:]
                    | node_border[1:, :-1] | node_border[1:, 1:])
    B = ny * nx
    cap = B // 4 if B >= 4096 else None
    mse = patch_mse(surf, view, vis,
                    select=patch_border & surf.patch_valid, capacity=cap)
    cut_border = patch_border & (mse > 0.05)

    delete = (cut_depth | cut_border) & surf.patch_valid
    deleted = jnp.sum(delete)
    surf = S.delete_patches(surf, delete)
    surf = S.remove_nodes_without_patch(surf)
    return surf, deleted


def patch_mse(surf: S.Surface, view: gn.ViewSet, vis: jnp.ndarray,
              select: Optional[jnp.ndarray] = None,
              capacity: int | None = None) -> jnp.ndarray:
    """Mean photometric-gradient error per patch (reference :747-790).

    With `select`/`capacity`, only selected patches are evaluated through
    a fixed-size compaction buffer; the rest get 0 (never cut). Selected
    patches beyond capacity also get 0 — conservative, and the cut loop
    re-sweeps while it keeps deleting.
    """
    u, v = _patch_pixel_grids(surf)
    w, wdx, wdy = _patch_depths_and_derivs(surf)
    gm = gn.extract_patch_pixels(view.grad_main, surf)  # [ny, nx, P, 2]
    ny, nx = surf.num_patches_y, surf.num_patches_x
    B = ny * nx
    P = u.shape[-1]

    if capacity is not None and capacity < B:
        flat_sel = select.reshape(-1)
        total_sel = jnp.sum(flat_sel)
        idx = jnp.nonzero(flat_sel, size=capacity, fill_value=0)[0]
        kvalid = jnp.arange(capacity) < total_sel
        u = u.reshape(B, P)[idx]
        v = v.reshape(B, P)[idx]
        w = w.reshape(B, P)[idx]
        wdx = wdx.reshape(B, P)[idx]
        wdy = wdy.reshape(B, P)[idx]
        gm = gm.reshape(B, P, 2)[idx]
        vis_sel = vis.reshape(B, -1)[idx]
    else:
        vis_sel = vis

    def per_n(M, t, gh_img):
        proj, _ = corr.warp(M, t, u, v, w)
        jac = corr.warp_jacobian(M, t, u, v, w, wdx, wdy)
        gs = iops.sample_gradient_packed(gh_img, proj[..., 0] - 0.5,
                                         proj[..., 1] - 0.5)
        jg = jnp.einsum("...ij,...i->...j", jac, gs)
        return jnp.linalg.norm(gm - jg, axis=-1)  # [..., P]

    err = jax.vmap(per_n)(view.M, view.t, view.sub_gh)
    err = jnp.moveaxis(err, 0, -1)  # [..., P, N]
    mask = vis_sel[..., None, :].astype(err.dtype)
    total = (err * mask).sum((-1, -2))
    count = mask.sum(-1).sum(-1) * err.shape[-2]  # visible neighbors x pixels
    mse = jnp.where(count > 0, total / jnp.maximum(count, 1.0), 1.0)
    if capacity is not None and capacity < B:
        out = jnp.zeros((B,), mse.dtype).at[idx].add(
            mse * kvalid.astype(mse.dtype))
        return out.reshape(ny, nx)
    if select is not None:
        mse = jnp.where(select, mse, 0.0)
    return mse


# ---------------------------------------------------------------------------
# Newton iterations


@jax.jit
def patch_tex_score(surf: S.Surface, main_image: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute deviation of patch intensities (texture score),

    reference `DepthOptimizer::tex_score_for_patch` (:914-955). Returns
    [ny, nx]; 0 for patches darker than the 0.05 mean-intensity gate.
    """
    vals = gn.extract_patch_pixels(main_image, surf)  # [ny, nx, P]
    mean = vals.mean(axis=-1, keepdims=True)
    score = jnp.abs(vals - mean).mean(axis=-1)
    return jnp.where(mean[..., 0] >= 0.05, score, 0.0)


def _newton_step(surf: S.Surface, view: gn.ViewSet, vis, active,
                 opts: OptimizerOptions, lighting):
    """One Newton step (assembly + PCG solve + node update).

    Plain traced function; always called from inside a module-level jitted
    program (reference inner-loop body, `lib/depth_optimizer.cc:219-304`).
    """
    gn_opts = gn.GNOptions(
        regularization=opts.regularization,
        light_surf_regularization=opts.light_surf_regularization,
        chunk=opts.chunk,
    )
    s = surf
    act = active & s.node_valid

    # Working-set assembly: a patch enters the system only via active
    # corner nodes, so once the active set shrinks (reprojection-delta
    # criterion below) most patches contribute exactly nothing. Pick the
    # smallest compaction tier the current active set fits (lax.cond picks
    # ONE branch at runtime); each tier is exact, not an approximation.
    B = s.num_patches_y * s.num_patches_x
    if B >= 4096:
        ca = (act[:-1, :-1] | act[:-1, 1:]
              | act[1:, :-1] | act[1:, 1:]) & s.patch_valid
        n_sel = jnp.sum(ca)

        def asm(cap):
            return lambda _: gn.assemble(s, view, vis, act, gn_opts,
                                         lighting, capacity=cap)

        g, Hb = jax.lax.cond(
            n_sel <= B // 16, asm(B // 16),
            lambda _: jax.lax.cond(n_sel <= B // 4, asm(B // 4),
                                   asm(None), None),
            None)
    else:
        g, Hb = gn.assemble(s, view, vis, act, gn_opts, lighting)
    if opts.precond == "mg":
        # Per-problem smoother damping (see mg.build): base systems get
        # relative row damping, shading systems a constant OMEGA.
        levels = mg.build(Hb, act, damp_rows=lighting is None)
        # Preconditioner indefiniteness is handled per APPLY inside
        # mg.apply (<r, z> guard -> block-Jacobi for that apply). Two
        # theoretically-cleaner designs were measured WORSE on the
        # flagship bench and rejected (r4): a per-solve latch (probe the
        # V-cycle on r0, use Jacobi for the whole solve if indefinite)
        # collapsed shading solves to pure Jacobi — optimizer 3.4 s ->
        # 10.2 s and median err 0.3% -> 1.1% — and flexible-beta PCG
        # (sound under preconditioner switching) stalled the Newton
        # trajectory (err 0.9%, Lambertian-sphere regression). The
        # weakly-determined shading systems NEED the V-cycle on the
        # applies where it is definite; mixed preconditioning with
        # standard beta is a deliberate, measured trade.
        precond = lambda x: mg.apply(levels, x)  # noqa: E731
    else:
        P = stencil.block_jacobi_inverse(Hb, act)
        precond = lambda x: stencil.apply_block_diag(P, x)  # noqa: E731
    gnorm = jnp.linalg.norm(g.reshape(-1))
    res = cg.solve(
        lambda x: stencil.spmv(Hb, x),
        -g,
        precond=precond,
        max_iterations=200,
        error_tolerance=gnorm * 0.01,
        q_tolerance=1e-3,
    )
    delta = jnp.moveaxis(res.x, 0, -1)  # [ny1, nx1, 4] (solver plane layout)
    bad = ~jnp.isfinite(delta).all()
    delta = jnp.where(bad, 0.0, delta)

    # Reprojection delta of the step, first order: |dproj/dw| * |dw|.
    # (The reference differences two full projection passes,
    # `lib/depth_optimizer.cc:271-303`; the closed form is cheaper and
    # avoids subtractive cancellation between two huge tensors.)
    s2 = S.update_nodes(s, delta)
    ny, nx = s.num_patches_y, s.num_patches_x
    # The reprojection delta is a working-set heuristic; a 2x2 pixel
    # subsample per patch estimates the max movement at a fraction of the
    # full-resolution cost (the reference pays full cost but only on
    # active patches, `lib/depth_optimizer.cc:271-303`).
    samp = max(1, s.patchsize // 2)
    u, v = _patch_pixel_grids_sub(s, samp)
    w, _, _ = _patch_depths_and_derivs_sub(s, samp)
    w = jnp.where(s.patch_valid[..., None], w, 1.0)
    basis_f = bicubic.pixel_basis(s.patchsize, samp,
                                  dtype=s.nodes.dtype)[:, 0, :]
    dparams = (S.patch_params(s2) - S.patch_params(s)).reshape(
        ny * nx, 16)
    dw = jnp.abs(dparams @ basis_f.T).reshape(ny, nx, -1)  # [ny, nx, P]

    def per_n(M, t):
        g = corr.warp_depth_gradient(M, t, u, v, w)
        return jnp.sqrt(g[..., 0] ** 2 + g[..., 1] ** 2)

    dproj_dw = jax.vmap(per_n)(view.M, view.t)  # [N, ny, nx, P]
    diff = jnp.moveaxis(dproj_dw, 0, -1) * dw[..., None]  # [ny,nx,P,N]

    corner_active = (act[:-1, :-1] | act[:-1, 1:]
                     | act[1:, :-1] | act[1:, 1:])
    mask = jnp.broadcast_to(
        vis[:, :, None, :] & corner_active[:, :, None, None]
        & s.patch_valid[:, :, None, None], diff.shape)
    diff = jnp.where(mask, diff, 0.0)
    maskf = mask.astype(diff.dtype)
    avg = jnp.sum(diff * maskf) / jnp.maximum(jnp.sum(maskf), 1.0)

    moved = (diff > 0.15).any((-1, -2))  # [ny, nx]
    ny1, nx1 = s.node_valid.shape
    new_active = jnp.zeros((ny1, nx1), bool)
    mp = moved
    new_active = new_active.at[:-1, :-1].max(mp)
    new_active = new_active.at[:-1, 1:].max(mp)
    new_active = new_active.at[1:, :-1].max(mp)
    new_active = new_active.at[1:, 1:].max(mp)
    new_active = new_active & s.node_valid

    # Relative depth step: a platform-robust convergence measure.
    f_safe = jnp.maximum(jnp.abs(s.nodes[..., 0]), 1e-6)
    rel_step = jnp.max(
        jnp.where(s.node_valid, jnp.abs(delta[..., 0]) / f_safe, 0.0))
    return (s2.nodes, new_active, bad, avg, rel_step,
            jnp.sum(new_active), res.iterations)


def _newton_loop(surf: S.Surface, view: gn.ViewSet, vis, active,
                 opts: OptimizerOptions, lighting):
    """On-device Newton inner loop (`lax.while_loop` over steps).

    Runs the reference inner loop (`lib/depth_optimizer.cc:219-304`) — up
    to ``max_newton_steps`` while >5% of nodes are active (or, in
    full-optimization mode, while the average reprojection delta exceeds
    0.01) — as one traced while_loop, eliminating per-step host syncs.
    Returns (nodes, active, steps_taken, cg_iters_total).
    """
    max_steps = opts.max_newton_steps
    full = opts.full_optimization
    num_initial = jnp.sum(active & surf.node_valid)
    big = jnp.asarray(jnp.inf, surf.nodes.dtype)

    def cond(state):
        nodes, active_, steps, done = state[:4]
        if opts.fixed_newton_steps:
            return (steps < max_steps) & ~done
        if full:
            more = ~done
        else:
            more = jnp.sum(active_) > num_initial // 20
        return (steps < max_steps) & more & ~done

    def body(state):
        (nodes, active_, steps, _, best_act, best_avg, stall,
         cg_total) = state
        s = dataclasses.replace(surf, nodes=nodes)
        (new_nodes, new_active, bad, avg, rel_step, n_act,
         cg_iters) = _newton_step(s, view, vis, active_, opts, lighting)
        converged = rel_step < 1e-4  # depth changed by < 0.01%
        # Plateau detection: the reference tolerates a small cluster of
        # never-converging (oscillating) nodes because its per-step cost
        # shrinks with the active set (`lib/depth_optimizer.cc:291-303`
        # only re-assembles active nodes); here every step costs a full
        # assembly, so once neither the active count nor the average
        # reprojection delta improves for several steps we stop — those
        # nodes would not converge in 200 steps either.
        improved = (n_act < best_act) | (avg < 0.9 * best_avg)
        stall = jnp.where(improved, 0, stall + 1)
        best_act = jnp.minimum(best_act, n_act)
        best_avg = jnp.minimum(best_avg, avg)
        stalled = stall >= opts.stall_limit
        if full:
            done = bad | (avg < 0.01) | converged | stalled
            new_active = active_  # full mode keeps every node active
        else:
            # Active-set criterion plus hard convergence floors.
            done = bad | (avg < 0.002) | converged | stalled
        if opts.fixed_newton_steps:
            done = bad
            if full:
                new_active = active_
        return (new_nodes, new_active, steps + 1, done, best_act,
                best_avg, stall, cg_total + cg_iters)

    init = (surf.nodes, active, jnp.asarray(0, jnp.int32),
            jnp.asarray(False), num_initial + 1, big,
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    out = jax.lax.while_loop(cond, body, init)
    nodes, active, steps = out[:3]
    return nodes, active, steps, out[7]


@partial(jax.jit, static_argnames=("opts",))
def scale_program(surf: S.Surface, view: gn.ViewSet, vis, sgm_depth,
                  main_img, sub_imgs, inv_cal, lighting,
                  opts: OptimizerOptions):
    """One fully on-device program for a scale's outer iteration loop.

    Mirrors `DepthOptimizer::run_newton_iterations` (reference :164-358):
    per outer iteration run the Newton inner loop, then boundary cutting /
    expansion / isolated-patch cleanup, tracking patch-count convergence.
    A single module-level jit keyed on (surface meta + shapes, opts), so a
    scene of same-sized views traces and compiles this exactly once.
    """
    num_iters = opts.num_iterations
    use_sgm = opts.use_sgm
    template = surf

    def mk(nodes, node_valid, patch_valid):
        return dataclasses.replace(template, nodes=nodes,
                                   node_valid=node_valid,
                                   patch_valid=patch_valid)

    stats0 = jnp.zeros((num_iters, 3), jnp.int32)

    def body(state):
        (nodes, node_valid, patch_valid, vis, it, brk, prev_count,
         finished, stats) = state
        nodes, _, steps, cg_total = _newton_loop(
            mk(nodes, node_valid, patch_valid), view, vis, node_valid,
            opts, lighting)

        def cleanup(args):
            nodes, node_valid, patch_valid, vis = args
            surf_ = mk(nodes, node_valid, patch_valid)
            surf_, vis = cut_boundaries_loop(surf_, view, vis, inv_cal)
            if not use_sgm:
                surf_ = S.expand(surf_)
                surf_, vis = compute_visibility(
                    surf_, view, sgm_depth, use_sgm, main_img, sub_imgs)
                surf_, vis = cut_boundaries_loop(surf_, view, vis,
                                                 inv_cal)
            surf_ = S.remove_isolated_patches(surf_)
            vis = vis & surf_.patch_valid[..., None]
            return (surf_.nodes, surf_.node_valid, surf_.patch_valid,
                    vis)

        nodes, node_valid, patch_valid, vis = jax.lax.cond(
            finished, lambda a: a, cleanup,
            (nodes, node_valid, patch_valid, vis))

        new_count = jnp.sum(patch_valid)
        lo = jnp.minimum(new_count, prev_count)
        hi = jnp.maximum(jnp.maximum(new_count, prev_count), 1)
        change = 1.0 - lo.astype(jnp.float32) / hi.astype(jnp.float32)
        # Patch-count stability (reference :346-356). prev_count starts at
        # the scale's initial count, so a first iteration whose cleanup
        # deletes nothing converges immediately — the inner Newton loop
        # already ran to plateau, further outer iterations only re-polish
        # after cuts that didn't happen.
        conv = (new_count <= prev_count) | (change < 0.05 * template.scale)
        # Break the outer loop immediately on patch-count convergence: the
        # reference also exits right after the cleanup of the converged
        # iteration (`lib/depth_optimizer.cc:346-356`), without spending
        # another Newton pass.
        finished = finished | conv
        stats = stats.at[it, 0].set(jnp.asarray(steps, jnp.int32))
        stats = stats.at[it, 1].set(jnp.asarray(new_count, jnp.int32))
        stats = stats.at[it, 2].set(jnp.asarray(cg_total, jnp.int32))
        return (nodes, node_valid, patch_valid, vis, it + 1, finished,
                new_count, finished, stats)

    def cond(state):
        it, brk = state[4], state[5]
        return (it < num_iters) & ~brk

    init = (surf.nodes, surf.node_valid, surf.patch_valid, vis,
            jnp.asarray(0, jnp.int32), jnp.asarray(False),
            jnp.sum(surf.patch_valid), jnp.asarray(False), stats0)
    out = jax.lax.while_loop(cond, body, init)
    return out[0], out[1], out[2], out[8]


def run_newton_iterations(
    surf: S.Surface,
    main: StereoViewState,
    subs: list[StereoViewState],
    view: gn.ViewSet,
    opts: OptimizerOptions,
    lighting,
    sgm_depth,
    log=None,
    timer: StageTimer | None = None,
    sgm_zbuffer=None,
) -> S.Surface:
    """Reference `DepthOptimizer::run_newton_iterations` (:164-358).

    Initial visibility + boundary cutting run as one dispatch, then the
    whole outer iteration loop runs as a second on-device program.
    """
    inv_cal = jnp.asarray(
        main.camera.inverse_calibration(main.width, main.height))
    main_img = main.at_scale(surf.scale).image
    sub_imgs = jnp.stack([s.at_scale(surf.scale).image for s in subs])
    timer = timer or StageTimer()

    with timer.stage(f"visibility@s{surf.scale}"):
        surf, vis = compute_visibility(surf, view, sgm_depth, opts.use_sgm,
                                       main_img, sub_imgs,
                                       sgm_zbuffer=sgm_zbuffer)
        surf, vis = cut_boundaries_loop(surf, view, vis, inv_cal)
        timer.sync(vis)

    sgm_arg = (sgm_depth if sgm_depth is not None
               else jnp.zeros((surf.height, surf.width), surf.nodes.dtype))
    with timer.stage(f"iterations@s{surf.scale}"):
        nodes, node_valid, patch_valid, stats = scale_program(
            surf, view, vis, sgm_arg, main_img, sub_imgs, inv_cal,
            lighting, opts)
        timer.sync(nodes)
    surf = dataclasses.replace(surf, nodes=nodes, node_valid=node_valid,
                               patch_valid=patch_valid)
    if log:
        st = np.asarray(stats)
        for it in range(opts.num_iterations):
            if it > 0 and st[it].sum() == 0:
                break
            avg_cg = st[it, 2] / max(int(st[it, 0]), 1)
            log(f"  iter {it}: {st[it, 0]} newton steps, "
                f"{st[it, 1]} patches, {avg_cg:.0f} cg iters/step")
    return surf


# ---------------------------------------------------------------------------
# top-level per-view optimization


@dataclasses.dataclass
class DepthResult:
    depth: jnp.ndarray  # [H, W] z-depth, 0 = unreconstructed
    normals: jnp.ndarray  # [H, W, 3]
    surface: S.Surface
    lighting: Optional[jnp.ndarray] = None


def optimize_view(
    main: StereoViewState,
    subs: list[StereoViewState],
    opts: OptimizerOptions,
    init_depth: Optional[jnp.ndarray] = None,
    sgm_depth: Optional[jnp.ndarray] = None,
    init_surface: Optional[S.Surface] = None,
    log=None,
    debug_sink=None,
) -> DepthResult:
    """Full coarse-to-fine optimization of one view

    (reference `DepthOptimizer::optimize`, `lib/depth_optimizer.cc:53-162`).
    `init_depth` is a sparse/dense z-depth prior (SfM splats or SGM);
    `sgm_depth` additionally feeds the visibility z-buffer when use_sgm.
    """
    dtype = jnp.float32
    if init_surface is not None:
        surf = init_surface
        fill_src = None
    else:
        scale0 = initial_scale(main.width, main.height)
        if opts.use_sgm:
            assert sgm_depth is not None
            filt = bilateral.depthmap_bilateral_filter(
                sgm_depth.astype(dtype), main.image.astype(dtype))
            surf = S.create_from_depth(filt, scale0)
            fill_src = filt
            sgm_depth = filt
            if debug_sink is not None and opts.debug_lvl > 1:
                debug_sink("smvs-sgm-filtered", filt)
        else:
            assert init_depth is not None
            surf = S.create_from_depth(init_depth.astype(dtype), scale0 + 1)
            fill_src = init_depth.astype(dtype)

    lighting = None
    sgm_zb = None
    timer = StageTimer(sync_arrays=opts.debug_lvl >= 2)

    def run_scale(surf):
        nonlocal lighting, sgm_zb
        if log:
            log(f"### scale {surf.scale}: "
                f"{int(surf.num_valid_patches())} patches")
        with timer.stage(f"viewset@s{surf.scale}"):
            view = _build_viewset(main, subs, surf.scale,
                                  opts.use_shading, surf.nodes.dtype,
                                  bf16_gather=opts.bf16_gather)
            timer.sync(view.sub_gh)
        if opts.use_sgm and sgm_depth is not None and sgm_zb is None:
            # Scale-invariant (blur scale-space keeps resolution and the
            # reprojections fixed): scatter the SGM z-buffer once per view.
            sgm_zb = zbuffer_scatter(view, sgm_depth.astype(surf.nodes.dtype))
        if opts.use_shading and surf.scale < 4:
            with timer.stage(f"lighting@s{surf.scale}"):
                shading_img, _ = main.shading_images()
                nmap = S.normal_map(surf, 1.0 / main.flen())
                lighting = fit_lighting(nmap,
                                        shading_img.astype(surf.nodes.dtype))
        return run_newton_iterations(surf, main, subs, view, opts, lighting,
                                     sgm_depth, log=log, timer=timer,
                                     sgm_zbuffer=sgm_zb)

    if debug_sink is not None and opts.debug_lvl > 1:
        debug_sink("smvs-initial", S.depth_map(surf))
    surf = run_scale(surf)
    while surf.scale > opts.min_scale and surf.scale > 0:
        with timer.stage(f"subdivide@s{surf.scale}"):
            surf = S.subdivide(surf)
            if fill_src is not None:
                surf = S.fill_patches_from_depth(surf, fill_src)
            timer.sync(surf.nodes)
        surf = run_scale(surf)

    with timer.stage("extract"):
        depth = S.depth_map(surf)
        normals = S.normal_map(surf, 1.0 / main.flen())
        timer.sync(normals)
    if log:
        log(timer.report())
    if debug_sink is not None and opts.debug_lvl > 1 and lighting is not None:
        from smvs_tpu.shading import lighting as L

        shaded = L.render_normal_map(lighting, normals)
        debug_sink("smvs-shaded", shaded)
        debug_sink("smvs-shaded-sphere", render_lighting_sphere(lighting))
        shading_img, _ = main.shading_images()
        albedo = jnp.where(shaded > 0,
                           shading_img.astype(shaded.dtype)
                           / jnp.maximum(shaded, 1e-6), 0.0)
        debug_sink("smvs-implicit-albedo", albedo)
    return DepthResult(depth=depth, normals=normals, surface=surf,
                       lighting=lighting)


def render_lighting_sphere(params: jnp.ndarray, size: int = 555) -> jnp.ndarray:
    """Debug sphere render (reference `GlobalLighting::get_rendered_sphere`,
    `lib/global_lighting.cc:48-75`)."""
    from smvs_tpu.shading import lighting as L

    ys, xs = jnp.mgrid[0:size, 0:size]
    u = (xs + 0.5) / size * 2.0 - 1.0
    v = (ys + 0.5) / size * 2.0 - 1.0
    r2 = u * u + v * v
    nz = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
    n = jnp.stack([u, v, -nz], axis=-1)
    val = L.value_for_normal(params, n)
    return jnp.where(r2 <= 1.0, val, 0.0)
