"""Batched Gauss-Newton normal-equation assembly.

TPU-native counterpart of reference `lib/gauss_newton_step.cc`. The reference
walks patches with scalar SSE loops, hand-derived Jacobians, and scatters
4x4 blocks into a CSR block-sparse matrix. Here:

- the per-(patch, pixel) residual vector (photometric-gradient data terms,
  IRLS-L1 weights, normal-divergence regularizer, optional SH shading term)
  is written as a pure function of the patch's 16 node parameters;
- `jax.jacfwd` produces the exact Jacobian the reference derives by hand
  (image sampling routes through the precomputed image Hessian via
  `smvs_tpu.image.ops.sample_gradient`, reproducing
  `lib/gauss_newton_step.cc:195-207` semantics);
- per-patch gradients (16,) and Gauss-Newton Hessians (16, 16) come from
  batched einsums (MXU work), vmapped over all patches;
- node assembly is 4 (gradient) / 16 (Hessian) static shifted adds into a
  9-point-stencil block layout (`smvs_tpu.solver.stencil`) — each node only
  couples to its 8 neighbors because Hessian blocks arise from node pairs of
  a shared patch (reference `lib/gauss_newton_step.cc:98-122`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from smvs_tpu.geometry import correspondence as corr
from smvs_tpu.geometry import normals as nrm
from smvs_tpu.image import ops as iops
from smvs_tpu.shading import sh as shmod
from smvs_tpu.surface import bicubic
from smvs_tpu.surface.state import Surface, patch_params

R_FACTOR = 1e-4  # IRLS-L1 floor, reference `lib/gauss_newton_step.cc:17`


class ViewSet(NamedTuple):
    """Per-view data at the current scale, device-resident.

    grad_main from the blurred main image; ``sub_gh`` packs each neighbor's
    gradient + Hessian channels (Ix, Iy, Ixx, Ixy, Iyy) channels-last so a
    warped sample is one windowed gather (`iops.sample_gradient_packed`).
    ``shading_*`` are None unless shading is active.
    """

    grad_main: jnp.ndarray  # [2, H, W]
    sub_gh: jnp.ndarray  # [N, H, W, 5]
    M: jnp.ndarray  # [N, 3, 3]
    t: jnp.ndarray  # [N, 3]
    flen: jnp.ndarray  # scalar, pixels
    shading_grad: Any = None  # [2, H, W] gradients of linear shading image
    shading_image: Any = None  # [H, W]


@dataclasses.dataclass(frozen=True)
class GNOptions:
    regularization: float = 0.01
    light_surf_regularization: float = 0.0
    # Upper bound on patches per lax.map slab. The effective chunk is
    # scaled down so a slab stays near `chunk * 16` pixels regardless of
    # patch size — big enough to fill the chip, small enough to bound the
    # Jacobian workspace.
    chunk: int = 4096


def _sampling_for_scale(scale: int) -> int:
    """Pixel subsampling per scale (reference `lib/gauss_newton_step.cc:157-161`)."""
    if scale < 3:
        return 1
    if scale < 5:
        return 2
    return 4


def _patch_pixel_coords(surf: Surface, sampling: int) -> tuple[np.ndarray, np.ndarray]:
    """Global integer pixel coords of each patch's (subsampled) pixels.

    Returns (px, py) of shape [ny, nx, P].
    """
    ps = surf.patchsize
    idx = np.arange(0, ps, sampling)
    ii, jj = np.meshgrid(idx, idx, indexing="xy")
    lx = ii.reshape(-1)
    ly = jj.reshape(-1)
    bx = surf.start_x + np.arange(surf.num_patches_x) * ps
    by = surf.start_y + np.arange(surf.num_patches_y) * ps
    px = bx[None, :, None] + lx[None, None, :]
    py = by[:, None, None] + ly[None, None, :]
    px = np.broadcast_to(px, (surf.num_patches_y, surf.num_patches_x, lx.size))
    py = np.broadcast_to(py, px.shape)
    return px, py


def _gather_image_at(img: jnp.ndarray, px: np.ndarray, py: np.ndarray) -> jnp.ndarray:
    """img [..., H, W] at integer pixel coords [ny, nx, P] -> [ny, nx, P, ...]."""
    out = img[..., py, px]  # [..., ny, nx, P]
    return jnp.moveaxis(out, tuple(range(img.ndim - 2)),
                        tuple(range(-(img.ndim - 2), 0)))


def extract_patch_pixels(img: jnp.ndarray, surf: Surface, sampling: int = 1
                         ) -> jnp.ndarray:
    """img [C?, H, W] -> per-patch pixel values [ny, nx, P(, C)].

    The patch grid tiles the image regularly (`_patch_pixel_coords`), so
    this is pure static slicing + reshapes — no gather op. P follows the
    same (row-outer, column-inner, stride=sampling) order as
    `_patch_pixel_coords`.
    """
    ps = surf.patchsize
    ny, nx = surf.num_patches_y, surf.num_patches_x
    sy, sx = surf.start_y, surf.start_x
    lead = img.shape[:-2]
    region = img[..., sy : sy + ny * ps, sx : sx + nx * ps]
    r = region.reshape(*lead, ny, ps, nx, ps)
    r = r[..., ::sampling, :, ::sampling]
    r = jnp.moveaxis(r, -3, -2)  # [..., ny, nx, ps/s, ps/s]
    r = r.reshape(*lead, ny, nx, r.shape[-1] * r.shape[-2])
    if lead:
        r = jnp.moveaxis(r, tuple(range(len(lead))),
                         tuple(range(-len(lead), 0)))
    return r


def _patch_residuals(
    vals: jnp.ndarray,  # [P, 6] per-pixel (w, dx, dy, dxy, dxx, dyy)
    pix_u: jnp.ndarray,  # [P] pixel centers (px + 0.5)
    pix_v: jnp.ndarray,  # [P]
    grad_main: jnp.ndarray,  # [P, 2]
    vis: jnp.ndarray,  # [N] float (0/1)
    view: ViewSet,
    lighting: jnp.ndarray | None,  # [16] SH params or None
    opts: GNOptions,
    width: int,
    height: int,
    want_weights: bool,
):
    """Residual vector (and IRLS weights) for one patch.

    Takes the *per-pixel surface values* — each residual row depends only on
    its own pixel's 6 values, and the values are linear in the 16 node
    params (vals = basis @ params), so the param Jacobian factorizes as
    J_params = J_vals @ basis. This mirrors the reference's chaining through
    per-pixel node-derivative tables (`lib/gauss_newton_step.cc:43-51`)
    while letting `jacfwd` push only 6 tangents.

    Returns (residuals [P, C], weights [P, C]) with C =
    2*N (data) + N*(N-1) (pairs) + 6 (regularizer) + 2 (shading; zero-weight
    when lighting is None). Weights fold in visibility masks and must be
    treated as constants (the caller stop-gradients them).
    """
    n_sub = view.M.shape[0]
    dtype = vals.dtype

    w = vals[..., 0]
    wdx = vals[..., 1]
    wdy = vals[..., 2]
    dxy = vals[..., 3]
    dxx = vals[..., 4]
    dyy = vals[..., 5]

    # --- data terms: warped neighbor gradient vs main gradient -------------
    def per_neighbor(M, t, gh_img):
        proj, _ = corr.warp(M, t, pix_u, pix_v, w)
        jac = corr.warp_jacobian(M, t, pix_u, pix_v, w, wdx, wdy)  # [P,2,2]
        gs = iops.sample_gradient_packed(gh_img,
                                         proj[..., 0] - 0.5,
                                         proj[..., 1] - 0.5)
        # j_grad_sub = J^T grad (gradient of warped neighbor image in main
        # pixel coords), reference `lib/gauss_newton_step.cc:200`.
        return jnp.einsum("pij,pi->pj", jac, gs)

    jg = jax.vmap(per_neighbor)(view.M, view.t, view.sub_gh)
    # jg: [N, P, 2]
    diffs = jg - grad_main[None, :, :]  # [N, P, 2]

    res = [jnp.moveaxis(diffs, 0, 1).reshape(-1, 2 * n_sub)]  # [P, 2N]
    pair_idx = [(a, b) for a in range(n_sub) for b in range(a + 1, n_sub)]
    if pair_idx:
        subdiffs = jnp.stack([jg[a] - jg[b] for a, b in pair_idx], axis=1)
        res.append(subdiffs.reshape(-1, 2 * len(pair_idx)))  # [P, 2*pairs]

    # --- regularizer: normal divergence ------------------------------------
    xc = pix_u - width / 2.0
    yc = pix_v - height / 2.0
    div = nrm.normal_divergence(xc, yc, view.flen, w, wdx, wdy, dxy, dxx, dyy)
    res.append(div)  # [P, 6]

    # --- shading term -------------------------------------------------------
    if lighting is not None:
        inv_flen = 1.0 / view.flen
        normal = nrm.normal(xc, yc, inv_flen, w, wdx, wdy)  # [P, 3]
        # Match the reference's GN approximation: the SH derivative matrix is
        # evaluated at the current normal but held constant w.r.t. the node
        # parameters (`lib/gauss_newton_step.cc:480-495` ignores its second-
        # order variation).
        sh_jac = jax.vmap(jax.jacfwd(shmod.eval_4_band))(
            jax.lax.stop_gradient(normal)
        )  # [P, 16, 3]
        lam = lighting
        shading = jnp.einsum("l,pl->p", lam, shmod.eval_4_band(normal))
        # d(shading)/d(pixel xy) through the surface: lam . dSH/dn . dn/dxy
        dn_dx = div[:, 0:3]
        dn_dy = div[:, 3:6]
        coef = jnp.einsum("l,plk->pk", lam.at[0].set(0.0), sh_jac)  # [P, 3]
        shading_grad = jnp.stack(
            [jnp.einsum("pk,pk->p", coef, dn_dx),
             jnp.einsum("pk,pk->p", coef, dn_dy)], axis=-1
        )
        shading_safe = jnp.where(jnp.abs(shading) < 1e-10, 1.0, shading)
        render_grad = shading_grad / shading_safe[:, None]

        lin_grad = _nan0(jnp.stack(
            [iops.bilinear(view.shading_grad[0], pix_u - 0.5, pix_v - 0.5),
             iops.bilinear(view.shading_grad[1], pix_u - 0.5, pix_v - 0.5)],
            axis=-1))
        lin_val = iops.bilinear(view.shading_image, pix_u - 0.5, pix_v - 0.5)
        lin_safe = jnp.where(jnp.abs(lin_val) < 1e-10, 1.0, lin_val)
        shading_res = render_grad - lin_grad / lin_safe[:, None]
        res.append(shading_res)  # [P, 2]
    else:
        res.append(jnp.zeros((pix_u.shape[0], 2), dtype=dtype))

    residuals = jnp.concatenate(res, axis=-1)
    if not want_weights:
        return residuals

    # --- IRLS / term weights (constants for the GN step) --------------------
    num_subs = jnp.sum(vis)
    num_diffs = num_subs * (num_subs + 1.0) / 2.0
    wts = []
    data_w = vis[None, :, None] / (R_FACTOR + jnp.abs(
        jnp.moveaxis(diffs, 0, 1)))  # [P, N, 2]
    wts.append(data_w.reshape(-1, 2 * n_sub))
    if pair_idx:
        pv = jnp.stack([vis[a] * vis[b] for a, b in pair_idx])
        pair_w = pv[None, :, None] / (R_FACTOR + jnp.abs(subdiffs))
        wts.append(pair_w.reshape(-1, 2 * len(pair_idx)))

    gm_abs = jnp.abs(grad_main).sum(-1)  # [P]
    basic_w = opts.regularization * 0.005 / jnp.maximum(0.03, gm_abs)
    basic_w = basic_w * num_diffs
    if lighting is not None:
        geom = opts.light_surf_regularization / 100.0
    else:
        geom = 1.0
    reg_w = basic_w[:, None] * geom / (R_FACTOR + jnp.abs(div))
    if opts.regularization <= 0.0 or (lighting is not None
                                      and opts.light_surf_regularization <= 0.0):
        reg_w = jnp.zeros_like(reg_w)
    wts.append(reg_w)

    if lighting is not None:
        lin_grad_abs = jnp.abs(lin_grad).sum(-1)
        shading_weight = 0.001 * num_diffs / (R_FACTOR + lin_grad_abs)
        gate = (
            (lin_grad_abs**2 >= 1e-20).astype(dtype)
            * (shading**2 >= 1e-10).astype(dtype)
            * (lin_val**2 >= 1e-10).astype(dtype)
        )
        if opts.regularization <= 0.0:
            gate = gate * 0.0
        sh_w = gate[:, None] * shading_weight[:, None] / (
            R_FACTOR + jnp.abs(shading_res))
        wts.append(sh_w)
    else:
        wts.append(jnp.zeros((pix_u.shape[0], 2), dtype=dtype))

    weights = jnp.concatenate(wts, axis=-1)
    return residuals, weights


def _nan0(x):
    return jnp.where(jnp.isfinite(x), x, 0.0)


def patch_grad_hessian(
    params16, pix_u, pix_v, grad_main, vis, patch_ok, view, basis, lighting,
    opts, width, height,
):
    """(g [16], H [16,16]) for one patch.

    The residuals depend on the node params only through the 6 per-pixel
    surface values (linear: vals = basis @ params), so we linearize once in
    value space (6 tangents) and contract through the basis with matmuls:
    H = sum_p basis_p^T (J6^T W J6)_p basis_p. This is the MXU-friendly
    factorization of the reference's per-patch 16x16 accumulation
    (`lib/gauss_newton_step.cc:88-122`).
    """
    params_safe = jnp.where(patch_ok, params16,
                            jnp.zeros_like(params16).at[0::4].set(1.0))
    vals = jnp.einsum("pkm,m->pk", basis, params_safe)  # [P, 6]

    # One linearized primal computes residuals AND weights (the weights are
    # stop-gradiented inside, so their tangent code is dead and XLA drops
    # it) — the expensive warp + image gathers run once instead of twice.
    def res_fn(v):
        r, w = _patch_residuals(v, pix_u, pix_v, grad_main, vis, view,
                                lighting, opts, width, height,
                                want_weights=True)
        return r, jax.lax.stop_gradient(w)

    (residuals, weights), f_jvp = jax.linearize(res_fn, vals)
    weights = weights * patch_ok
    seeds = jnp.eye(6, dtype=vals.dtype)[:, None, :] * jnp.ones_like(
        vals)[None, :, :]  # [6, P, 6] one-hot value-component seeds
    cols = jax.vmap(lambda s: f_jvp(s)[0])(seeds)  # [6, P, C]
    J6 = _nan0(jnp.moveaxis(cols, 0, -1))  # [P, C, 6]
    residuals = _nan0(residuals)

    A = jnp.einsum("pck,pc,pcl->pkl", J6, weights, J6)  # [P, 6, 6]
    b = jnp.einsum("pck,pc->pk", J6, weights * residuals)  # [P, 6]
    H = jnp.einsum("pkm,pkl,pln->mn", basis, A, basis)
    g = jnp.einsum("pkm,pk->m", basis, b)
    return g, H


def assemble(
    surf: Surface,
    view: ViewSet,
    vis: jnp.ndarray,  # [ny, nx, N] float or bool visibility per patch/neighbor
    active: jnp.ndarray,  # [ny+1, nx+1] bool active nodes
    opts: GNOptions,
    lighting: jnp.ndarray | None = None,
):
    """Build the stencil normal equations for one Newton step.

    Returns (g [ny+1, nx+1, 4], Hb [ny+1, nx+1, 3, 3, 4, 4]).
    Counterpart of `GaussNewtonStep::construct`
    (reference `lib/gauss_newton_step.cc:33-143`).
    """
    ny, nx = surf.num_patches_y, surf.num_patches_x
    sampling = _sampling_for_scale(surf.scale)
    basis = bicubic.pixel_basis(surf.patchsize, sampling, dtype=surf.nodes.dtype)
    px, py = _patch_pixel_coords(surf, sampling)

    params = patch_params(surf).reshape(ny * nx, 16)
    gm = extract_patch_pixels(view.grad_main, surf, sampling).reshape(
        ny * nx, -1, 2)
    pix_u = jnp.asarray(px.reshape(ny * nx, -1) + 0.5, surf.nodes.dtype)
    pix_v = jnp.asarray(py.reshape(ny * nx, -1) + 0.5, surf.nodes.dtype)
    vis_f = vis.astype(surf.nodes.dtype).reshape(ny * nx, -1)
    patch_ok = (surf.patch_valid.reshape(-1) & (vis.reshape(ny * nx, -1).sum(-1) > 0)
                ).astype(surf.nodes.dtype)

    fn = partial(patch_grad_hessian, view=view, basis=basis, lighting=lighting,
                 opts=opts, width=surf.width, height=surf.height)
    vfn = jax.vmap(fn)

    B = ny * nx
    P_pix = pix_u.shape[1]
    chunk = max(1, min(opts.chunk, B, (opts.chunk * 16) // max(P_pix, 1)))
    pad = (-B) % chunk

    def padded(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)).reshape(
            (B + pad) // chunk, chunk, *x.shape[1:]
        )

    gs, Hs = jax.lax.map(
        lambda args: vfn(*args),
        (padded(params), padded(pix_u), padded(pix_v), padded(gm),
         padded(vis_f), padded(patch_ok)),
    )
    g_patch = gs.reshape(B + pad, 16)[:B].reshape(ny, nx, 16)
    H_patch = Hs.reshape(B + pad, 16, 16)[:B].reshape(ny, nx, 16, 16)

    from smvs_tpu.solver import stencil

    return stencil.scatter_patch_systems(g_patch, H_patch, active,
                                         surf.patch_valid)
