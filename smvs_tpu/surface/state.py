"""Masked dense surface state — the optimized variable of the depth solver.

TPU-native counterpart of reference `lib/surface.h/.cc`. The reference models
partial image coverage with nullable shared-pointer nodes/patches; here the
surface is a statically-shaped pytree of dense arrays plus validity masks, so
every topology operation (fill_holes, expand, delete, subdivide, …) is a pure
masked array op that XLA can fuse — shapes only change at scale transitions.

Grid geometry (reference `lib/surface.cc:19-53`):
  - ``patchsize = 2**scale`` pixels per patch edge,
  - patch (i, j) covers pixels ``[start_x + i*ps, start_x + (i+1)*ps) x
    [start_y + j*ps, ...)``,
  - node (i, j) sits at pixel ``(start_x + i*ps, start_y + j*ps)`` and carries
    (f, dx, dy, dxy) in patch-normalized units.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from smvs_tpu.surface import bicubic


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["nodes", "node_valid", "patch_valid"],
    meta_fields=["scale", "width", "height", "start_x", "start_y"],
)
@dataclasses.dataclass
class Surface:
    nodes: jnp.ndarray  # [ny+1, nx+1, 4] (f, dx, dy, dxy)
    node_valid: jnp.ndarray  # bool [ny+1, nx+1]
    patch_valid: jnp.ndarray  # bool [ny, nx]
    scale: int
    width: int
    height: int
    start_x: int
    start_y: int

    @property
    def patchsize(self) -> int:
        return 1 << self.scale

    @property
    def num_patches_x(self) -> int:
        return self.patch_valid.shape[1]

    @property
    def num_patches_y(self) -> int:
        return self.patch_valid.shape[0]

    def num_valid_patches(self) -> jnp.ndarray:
        return jnp.sum(self.patch_valid)

    def num_valid_nodes(self) -> jnp.ndarray:
        return jnp.sum(self.node_valid)


# ---------------------------------------------------------------------------
# construction


def _grid_dims(width: int, height: int, scale: int, bundle_style: bool
               ) -> tuple[int, int, int, int]:
    ps = 1 << scale
    if bundle_style:  # reference ctor `lib/surface.cc:29-30`
        nx = (width - 2) // ps - 1
        ny = (height - 2) // ps - 1
    else:  # reference initialize_planar `lib/surface.cc:63-64`
        nx = (width - 2) // ps
        ny = (height - 2) // ps
    sx = (width - nx * ps) // 2
    sy = (height - ny * ps) // 2
    return nx, ny, sx, sy


def create_planar(depth: float, width: int, height: int, scale: int,
                  dtype=jnp.float32) -> Surface:
    """Fully-valid planar surface (reference `Surface::initialize_planar`)."""
    nx, ny, sx, sy = _grid_dims(width, height, scale, bundle_style=False)
    nodes = jnp.zeros((ny + 1, nx + 1, 4), dtype=dtype)
    nodes = nodes.at[..., 0].set(jnp.asarray(depth, dtype))
    return Surface(
        nodes=nodes,
        node_valid=jnp.ones((ny + 1, nx + 1), dtype=bool),
        patch_valid=jnp.ones((ny, nx), dtype=bool),
        scale=scale,
        width=width,
        height=height,
        start_x=sx,
        start_y=sy,
    )


def create_from_depth(depth: jnp.ndarray, scale: int) -> Surface:
    """Surface initialized from a (sparse or dense) z-depth map.

    Counterpart of `Surface::Surface` + `fill_patches_from_depth`
    (reference `lib/surface.cc:19-53, 140-152`): nodes from per-quadrant
    min/median depth statistics, patches wherever all 4 corners exist.
    """
    height, width = depth.shape
    nx, ny, sx, sy = _grid_dims(width, height, scale, bundle_style=True)
    surf = Surface(
        nodes=jnp.zeros((ny + 1, nx + 1, 4), dtype=depth.dtype),
        node_valid=jnp.zeros((ny + 1, nx + 1), dtype=bool),
        patch_valid=jnp.zeros((ny, nx), dtype=bool),
        scale=scale,
        width=width,
        height=height,
        start_x=sx,
        start_y=sy,
    )
    return fill_patches_from_depth(surf, depth)


# ---------------------------------------------------------------------------
# node initialization from a depth map


def _node_windows(surf: Surface, depth: jnp.ndarray) -> jnp.ndarray:
    """Gather the ps x ps window centered on each node: [ny+1, nx+1, ps, ps].

    Out-of-image samples are 0 (treated as holes, like the reference's bounds
    checks in `lib/surface.cc:678-704`).
    """
    ps = surf.patchsize
    ws = ps // 2
    ny1 = surf.num_patches_y + 1
    nx1 = surf.num_patches_x + 1
    # Window for node (i, j) starts at pixel (sx + i*ps - ws, sy + j*ps - ws).
    y0 = surf.start_y - ws
    x0 = surf.start_x - ws
    pad_top = max(0, -y0)
    pad_left = max(0, -x0)
    pad_bottom = max(0, y0 + ny1 * ps - depth.shape[0])
    pad_right = max(0, x0 + nx1 * ps - depth.shape[1])
    dp = jnp.pad(depth, ((pad_top, pad_bottom), (pad_left, pad_right)))
    block = jax.lax.dynamic_slice(
        dp, (y0 + pad_top, x0 + pad_left), (ny1 * ps, nx1 * ps)
    )
    return block.reshape(ny1, ps, nx1, ps).transpose(0, 2, 1, 3)


@jax.jit
def initialize_nodes_from_depth(surf: Surface, depth: jnp.ndarray) -> Surface:
    """Fill currently-invalid nodes from depth statistics.

    Per node: 4 quadrant windows of ps/2; quadrant stat = min positive depth;
    f = median of all positive samples; dx/dy/dxy from quadrant mins
    (reference `lib/surface.cc:667-760`, including its partial-quadrant
    fallback rules).
    """
    ps = surf.patchsize
    ws = ps // 2
    win = _node_windows(surf, depth)  # [ny1, nx1, ps, ps] rows=y, cols=x
    pos = win > 0

    # Quadrants: reference's d[0]=( -x, -y), d[1]=(+x, -y), d[2]=(-x, +y),
    # d[3]=(+x, +y); win rows are y so quadrant (qy, qx).
    q = win.reshape(*win.shape[:2], 2, ws, 2, ws)
    qpos = pos.reshape(*pos.shape[:2], 2, ws, 2, ws)
    big = jnp.asarray(jnp.inf, win.dtype)
    qmin = jnp.min(jnp.where(qpos, q, big), axis=(3, 5))  # [ny1, nx1, 2, 2]
    qcnt = jnp.sum(qpos, axis=(3, 5))
    m0 = jnp.where(qcnt[..., 0, 0] > 0, qmin[..., 0, 0], 0.0)
    m1 = jnp.where(qcnt[..., 0, 1] > 0, qmin[..., 0, 1], 0.0)
    m2 = jnp.where(qcnt[..., 1, 0] > 0, qmin[..., 1, 0], 0.0)
    m3 = jnp.where(qcnt[..., 1, 1] > 0, qmin[..., 1, 1], 0.0)
    nonzero_quadrants = sum((m > 0).astype(jnp.int32) for m in (m0, m1, m2, m3))

    total = jnp.sum(pos, axis=(2, 3))
    flat = jnp.where(pos, win, big).reshape(*win.shape[:2], ps * ps)
    svals = jnp.sort(flat, axis=-1)
    med_idx = jnp.clip(total // 2, 0, ps * ps - 1)
    f = jnp.take_along_axis(svals, med_idx[..., None], axis=-1)[..., 0]

    all4 = nonzero_quadrants == 4
    dx_full = ((m1 + m3) - (m0 + m2)) / 2.0
    dy_full = ((m2 + m3) - (m0 + m1)) / 2.0
    dxy_full = (m3 - m2) - (m1 - m0)
    # Partial-quadrant fallbacks (reference `lib/surface.cc:747-758`).
    dx_c1 = ((m1 == 0) | (m0 == 0)) & (m3 != 0) & (m2 != 0)
    dx_c2 = ((m2 == 0) | (m3 == 0)) & (m1 != 0) & (m0 != 0)
    dx_part = jnp.where(dx_c1, m3 - m2, jnp.where(dx_c2, m1 - m0, 0.0))
    dy_c1 = ((m0 == 0) | (m2 == 0)) & (m3 != 0) & (m1 != 0)
    dy_c2 = ((m1 == 0) | (m2 == 0)) & (m0 != 0) & (m2 != 0)
    dy_part = jnp.where(dy_c1, m3 - m1, jnp.where(dy_c2, m2 - m0, 0.0))

    dx = jnp.where(all4, dx_full, dx_part)
    dy = jnp.where(all4, dy_full, dy_part)
    dxy = jnp.where(all4, dxy_full, 0.0)

    makeable = (total >= 2) & (nonzero_quadrants > 0)
    fill = makeable & ~surf.node_valid
    new_vals = jnp.stack([f, dx, dy, dxy], axis=-1)
    nodes = jnp.where(fill[..., None], new_vals, surf.nodes)
    node_valid = surf.node_valid | fill
    return dataclasses.replace(surf, nodes=nodes, node_valid=node_valid)


def fill_patches_from_depth(surf: Surface, depth: jnp.ndarray) -> Surface:
    """initialize nodes + fill holes + cleanup (reference `lib/surface.cc:140-152`)."""
    surf = initialize_nodes_from_depth(surf, depth)
    surf = fill_holes(surf)
    return remove_nodes_without_patch(surf)


# ---------------------------------------------------------------------------
# topology ops (all pure mask updates)


@jax.jit
def fill_holes(surf: Surface) -> Surface:
    """Create every patch whose 4 corner nodes exist (reference :630-651)."""
    nv = surf.node_valid
    all4 = nv[:-1, :-1] & nv[:-1, 1:] & nv[1:, :-1] & nv[1:, 1:]
    return dataclasses.replace(surf, patch_valid=surf.patch_valid | all4)


@jax.jit
def remove_nodes_without_patch(surf: Surface) -> Surface:
    """Drop nodes not adjacent to any valid patch (reference :762-869)."""
    pv = jnp.pad(surf.patch_valid, ((1, 1), (1, 1)))
    adjacent = pv[:-1, :-1] | pv[:-1, 1:] | pv[1:, :-1] | pv[1:, 1:]
    node_valid = surf.node_valid & adjacent
    nodes = jnp.where(node_valid[..., None], surf.nodes, 0.0)
    return dataclasses.replace(surf, nodes=nodes, node_valid=node_valid)


@jax.jit
def remove_patches_without_nodes(surf: Surface) -> Surface:
    nv = surf.node_valid
    all4 = nv[:-1, :-1] & nv[:-1, 1:] & nv[1:, :-1] & nv[1:, 1:]
    return dataclasses.replace(surf, patch_valid=surf.patch_valid & all4)


@jax.jit
def remove_isolated_patches(surf: Surface) -> Surface:
    """Delete patches with <3 of 8 valid neighbors (reference :888-927)."""
    pv = jnp.pad(surf.patch_valid.astype(jnp.int32), ((1, 1), (1, 1)))
    neigh = (
        pv[:-2, :-2] + pv[:-2, 1:-1] + pv[:-2, 2:]
        + pv[1:-1, :-2] + pv[1:-1, 2:]
        + pv[2:, :-2] + pv[2:, 1:-1] + pv[2:, 2:]
    )
    keep = surf.patch_valid & (neigh >= 3)
    return remove_nodes_without_patch(
        dataclasses.replace(surf, patch_valid=keep)
    )


@jax.jit
def delete_patches(surf: Surface, delete_mask: jnp.ndarray) -> Surface:
    return dataclasses.replace(
        surf, patch_valid=surf.patch_valid & ~delete_mask
    )


@jax.jit
def update_nodes(surf: Surface, delta: jnp.ndarray) -> Surface:
    """Apply a solver step [ny+1, nx+1, 4] to valid nodes (reference :957-981)."""
    nodes = jnp.where(surf.node_valid[..., None], surf.nodes + delta, surf.nodes)
    return dataclasses.replace(surf, nodes=nodes)


# ---------------------------------------------------------------------------
# evaluation


@jax.jit
def patch_params(surf: Surface) -> jnp.ndarray:
    """Node-major params16 per patch: [ny, nx, 16].

    Node order (00, 10, 01, 11) with 10 = +x, matching
    `smvs_tpu.surface.bicubic` and reference `lib/surface.cc:290-298`.
    """
    n = surf.nodes
    return jnp.concatenate(
        [n[:-1, :-1], n[:-1, 1:], n[1:, :-1], n[1:, 1:]], axis=-1
    )


@jax.jit
def depth_map(surf: Surface) -> jnp.ndarray:
    """Rasterize patch depths into an [H, W] image; invalid regions are 0.

    Counterpart of `Surface::get_depth_map` (reference :155-168); one batched
    matmul of the per-pixel basis against all patch parameter vectors.
    """
    ps = surf.patchsize
    basis_f = bicubic.pixel_basis(ps, dtype=surf.nodes.dtype)[:, 0, :]  # [P,16]
    params = patch_params(surf)  # [ny, nx, 16]
    vals = jnp.einsum("pm,yxm->yxp", basis_f, params)
    vals = vals * surf.patch_valid[..., None]
    ny, nx = surf.num_patches_y, surf.num_patches_x
    block = vals.reshape(ny, nx, ps, ps).transpose(0, 2, 1, 3).reshape(
        ny * ps, nx * ps
    )
    out = jnp.zeros((surf.height, surf.width), dtype=surf.nodes.dtype)
    return jax.lax.dynamic_update_slice(out, block, (surf.start_y, surf.start_x))


@jax.jit
def depth_and_derivs(surf: Surface) -> jnp.ndarray:
    """[ny, nx, P, 6] per-pixel (f, dx, dy, dxy, dxx, dyy) in pixel units."""
    basis = bicubic.pixel_basis(surf.patchsize, dtype=surf.nodes.dtype)
    params = patch_params(surf)
    return jnp.einsum("pkm,yxm->yxpk", basis, params)


@jax.jit
def normal_map(surf: Surface, inv_flen: float) -> jnp.ndarray:
    """Rasterize unit normals into [H, W, 3] (reference :170-183)."""
    from smvs_tpu.geometry import normals as nrm

    ps = surf.patchsize
    vals = depth_and_derivs(surf)  # [ny, nx, P, 6]
    ny, nx = surf.num_patches_y, surf.num_patches_x
    # Pixel coordinates relative to the principal point.
    ii = np.arange(ps)
    px, py = np.meshgrid(ii, ii, indexing="xy")
    px = px.reshape(-1)
    py = py.reshape(-1)
    gx = (surf.start_x + np.arange(nx)[:, None] * ps + px[None, :] + 0.5
          - surf.width / 2.0)
    gy = (surf.start_y + np.arange(ny)[:, None] * ps + py[None, :] + 0.5
          - surf.height / 2.0)
    x = jnp.asarray(gx, surf.nodes.dtype)[None, :, :]
    y = jnp.asarray(gy, surf.nodes.dtype)[:, None, :]
    n = nrm.normal(x, y, inv_flen, vals[..., 0], vals[..., 1], vals[..., 2])
    n = n * surf.patch_valid[..., None, None]
    block = n.reshape(ny, nx, ps, ps, 3).transpose(0, 2, 1, 3, 4).reshape(
        ny * ps, nx * ps, 3
    )
    out = jnp.zeros((surf.height, surf.width, 3), dtype=surf.nodes.dtype)
    return jax.lax.dynamic_update_slice(out, block,
                                        (surf.start_y, surf.start_x, 0))


# ---------------------------------------------------------------------------
# expand


_NEIGHBOR_OFFSETS = [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0),
                     (-1, 1), (0, 1), (1, 1)]  # (dx, dy), reference order 0-7


def _shift_node_field(arr: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """Value of the node at offset (dx, dy) from each node; invalid -> 0.

    arr: [ny1, nx1, C]; out-of-bounds neighbors are zero.
    """
    pad = jnp.pad(arr, ((1, 1), (1, 1)) + ((0, 0),) * (arr.ndim - 2))
    ny1, nx1 = arr.shape[:2]
    return pad[1 + dy : 1 + dy + ny1, 1 + dx : 1 + dx + nx1]


@jax.jit
def expand(surf: Surface) -> Surface:
    """Grow the surface border (reference `Surface::expand`, :483-628).

    Two sweeps; in each, every currently-invalid (or newly created) node
    receives candidate depths extrapolated from 8 directional neighbor
    triples, resolved by the reference's ``check_swap_nodes`` rule (take the
    new candidate when it is >10% deeper, :472-480). New nodes carry zero
    derivatives. Afterwards: fill holes, then prune danglers.
    """
    orig_valid = surf.node_valid
    node_valid = surf.node_valid
    nodes = surf.nodes

    cand_f = jnp.zeros(node_valid.shape, dtype=nodes.dtype)
    cand_has = jnp.zeros(node_valid.shape, dtype=bool)

    for _ in range(2):
        nb_f = {}
        nb_dx = {}
        nb_dy = {}
        nb_valid = {}
        field = jnp.concatenate(
            [nodes * node_valid[..., None],
             node_valid[..., None].astype(nodes.dtype)], axis=-1
        )
        for k, (dx, dy) in enumerate(_NEIGHBOR_OFFSETS):
            sh = _shift_node_field(field, dx, dy)
            nb_f[k] = sh[..., 0]
            nb_dx[k] = sh[..., 1]
            nb_dy[k] = sh[..., 2]
            nb_valid[k] = sh[..., 4] > 0.5

        def check_swap(cf, ch, cond, value):
            take = cond & ((~ch) | (value * 0.9 > cf))
            return jnp.where(take, value, cf), ch | take

        rules = [
            # (required neighbor ids, candidate value)
            ((0, 1, 3), ((nb_f[3] + nb_dx[3] / 2) + (nb_f[1] + nb_dy[1] / 2)) / 2),
            ((1, 2, 4), ((nb_f[4] - nb_dx[4] / 2) + (nb_f[1] + nb_dy[1] / 2)) / 2),
            ((3, 5, 6), ((nb_f[3] + nb_dx[3] / 2) + (nb_f[6] - nb_dy[6] / 2)) / 2),
            ((4, 6, 7), ((nb_f[4] - nb_dx[4] / 2) + (nb_f[6] - nb_dy[6] / 2)) / 2),
            ((0, 1, 2), (nb_f[0] + nb_dy[0] / 2 + nb_f[1] + nb_dy[1] / 2
                         + nb_f[2] + nb_dy[2] / 2) / 3),
            ((0, 3, 5), (nb_f[0] + nb_dx[0] / 2 + nb_f[3] + nb_dx[3] / 2
                         + nb_f[5] + nb_dx[5] / 2) / 3),
            ((5, 6, 7), (nb_f[5] - nb_dy[5] / 2 + nb_f[6] - nb_dy[6] / 2
                         + nb_f[7] - nb_dy[7] / 2) / 3),
            ((2, 4, 7), (nb_f[2] - nb_dx[2] / 2 + nb_f[4] - nb_dx[4] / 2
                         + nb_f[7] - nb_dx[7] / 2) / 3),
        ]
        process = ~orig_valid  # null or created-this-expand nodes
        for req, value in rules:
            cond = process
            for r in req:
                cond = cond & nb_valid[r]
            cand_f, cand_has = check_swap(cand_f, cand_has, cond, value)

        # merge candidates into the working node set (reference :616-618)
        newly = cand_has & ~orig_valid
        new_vals = jnp.stack(
            [cand_f, jnp.zeros_like(cand_f), jnp.zeros_like(cand_f),
             jnp.zeros_like(cand_f)], axis=-1
        )
        nodes = jnp.where(newly[..., None], new_vals, nodes)
        node_valid = node_valid | newly

    surf = dataclasses.replace(surf, nodes=nodes, node_valid=node_valid)
    surf = fill_holes(surf)
    return remove_nodes_without_patch(surf)


# ---------------------------------------------------------------------------
# subdivision


@jax.jit
def subdivide(surf: Surface) -> Surface:
    """Halve the scale (reference `Surface::subdivide_patches`, :984-1107).

    Old nodes land on even grid positions with dx/2, dy/2, dxy/4; each valid
    patch spawns 5 midpoint nodes by bicubic evaluation; conflicting edge
    writes resolve exactly like the reference's last-writer-wins patch loop.
    """
    ps = surf.patchsize
    new_ps = ps // 2
    new_scale = surf.scale - 1
    nx, ny = surf.num_patches_x, surf.num_patches_y

    cand_nx = (surf.width - 2) // new_ps
    cand_ny = (surf.height - 2) // new_ps
    off_x = cand_nx - nx * 2
    off_y = cand_ny - ny * 2
    start_x, start_y = surf.start_x, surf.start_y
    if off_x >= 2:
        new_nx = nx * 2 + 2
        start_x = (surf.width - new_nx * new_ps) // 2
        off_x = 1
    else:
        off_x = 0
        new_nx = nx * 2
    if off_y >= 2:
        new_ny = ny * 2 + 2
        start_y = (surf.height - new_ny * new_ps) // 2
        off_y = 1
    else:
        off_y = 0
        new_ny = ny * 2

    params = patch_params(surf)  # [ny, nx, 16]
    pts = jnp.asarray(
        [[0.5, 0.0], [0.0, 0.5], [0.5, 0.5], [1.0, 0.5], [0.5, 1.0]],
        dtype=surf.nodes.dtype,
    )
    rows = bicubic.basis_rows(pts[:, 0], pts[:, 1])  # [5, 6, 16]
    vals = jnp.einsum("qkm,yxm->yxqk", rows[:, :4, :], params)  # [ny,nx,5,4]
    scale_vec = jnp.asarray([1.0, 0.5, 0.5, 0.25], dtype=surf.nodes.dtype)
    vals = vals * scale_vec  # new-node derivative rescale (reference :1039-1071)
    pv = surf.patch_valid

    # New-node values per parity class. The interleaved grid is assembled
    # with stack+reshape only: sequences of strided scatters (`.at[::2]`)
    # miscompile under jit on this XLA build (disjoint-scatter fusion bug,
    # observed on both the CPU and axon TPU backends), so no scatters are
    # used here.
    # Old nodes at (even, even): rescaled derivatives.
    old_scaled = jnp.where(surf.node_valid[..., None],
                           surf.nodes * scale_vec, 0.0)  # [ny+1, nx+1, 4]
    # Patch centers at (odd, odd).
    center = jnp.where(pv[..., None], vals[:, :, 2, :], 0.0)  # [ny, nx, 4]
    # Horizontal-edge midpoints at (even row, odd col): top-edge eval (q=0)
    # of the patch below, else bottom-edge eval (q=4) of the patch above
    # (last-writer-wins order of the reference patch loop, :1073-1100).
    vr = jnp.pad(vals, ((1, 1), (0, 0), (0, 0), (0, 0)))
    pr = jnp.pad(pv, ((1, 1), (0, 0)))
    top, top_ok = vr[1:, :, 0, :], pr[1:, :]      # [ny+1, nx, 4]
    bot, bot_ok = vr[:-1, :, 4, :], pr[:-1, :]
    hval = jnp.where(top_ok[..., None], top,
                     jnp.where(bot_ok[..., None], bot, 0.0))
    hvalid = top_ok | bot_ok  # [ny+1, nx]
    # Vertical-edge midpoints at (odd row, even col): left-edge eval (q=1)
    # of the patch to the right, else right-edge eval (q=3) of the left one.
    vc = jnp.pad(vals, ((0, 0), (1, 1), (0, 0), (0, 0)))
    pc = jnp.pad(pv, ((0, 0), (1, 1)))
    left, left_ok = vc[:, 1:, 1, :], pc[:, 1:]    # [ny, nx+1, 4]
    right, right_ok = vc[:, :-1, 3, :], pc[:, :-1]
    vvval = jnp.where(left_ok[..., None], left,
                      jnp.where(right_ok[..., None], right, 0.0))
    vvalid = left_ok | right_ok  # [ny, nx+1]

    def interleave_cols(a, b):
        """a [R, C+1, ...], b [R, C, ...] -> [R, 2C+1, ...] alternating."""
        bp = jnp.pad(b, ((0, 0), (0, 1)) + ((0, 0),) * (b.ndim - 2))
        out = jnp.stack([a, bp], axis=2)  # [R, C+1, 2, ...]
        return out.reshape(a.shape[0], 2 * a.shape[1], *a.shape[2:])[:, :-1]

    def interleave_rows(a, b):
        """a [R+1, C, ...], b [R, C, ...] -> [2R+1, C, ...] alternating."""
        bp = jnp.pad(b, ((0, 1),) + ((0, 0),) * (b.ndim - 1))
        out = jnp.stack([a, bp], axis=1)  # [R+1, 2, C, ...]
        return out.reshape(2 * a.shape[0], *a.shape[1:])[:-1]

    even_rows = interleave_cols(old_scaled, hval)     # [ny+1, 2nx+1, 4]
    odd_rows = interleave_cols(vvval, center)         # [ny,   2nx+1, 4]
    core = interleave_rows(even_rows, odd_rows)       # [2ny+1, 2nx+1, 4]
    even_v = interleave_cols(surf.node_valid, hvalid)
    odd_v = interleave_cols(vvalid, pv)
    core_valid = interleave_rows(even_v, odd_v)

    pad_r = ((off_y, new_ny + 1 - (2 * ny + 1) - off_y),
             (off_x, new_nx + 1 - (2 * nx + 1) - off_x))
    n1 = jnp.pad(core, pad_r + ((0, 0),))
    valid1 = jnp.pad(core_valid, pad_r)

    new_surf = Surface(
        nodes=n1,
        node_valid=valid1,
        patch_valid=jnp.zeros((new_ny, new_nx), dtype=bool),
        scale=new_scale,
        width=surf.width,
        height=surf.height,
        start_x=start_x,
        start_y=start_y,
    )
    new_surf = fill_holes(new_surf)
    return remove_nodes_without_patch(new_surf)
