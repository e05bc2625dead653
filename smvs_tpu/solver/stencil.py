"""9-point-stencil block linear algebra on the node grid.

TPU-native replacement for the reference's CSR block-sparse matrix
(`lib/block_sparse_matrix.h`): because Hessian blocks only couple nodes that
share a patch (reference `lib/gauss_newton_step.cc:98-122`), the system is
a [ny+1, nx+1, 3, 3, 4, 4] stencil tensor — SpMV is 9 shifted batched
(4x4)@(4,) contractions and the block-Jacobi preconditioner is a batched 4x4
inverse. No index arrays, no sorting, pure dense ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def scatter_patch_systems(
    g_patch: jnp.ndarray,  # [ny, nx, 16]
    H_patch: jnp.ndarray,  # [ny, nx, 16, 16]
    active: jnp.ndarray,  # [ny+1, nx+1] bool
    patch_valid: jnp.ndarray,  # [ny, nx] bool
):
    """Accumulate per-patch systems into the node grid.

    Corner order (00, 10, 01, 11); corner a of patch (i, j) is node
    (i + ax, j + ay). Inactive nodes get zero gradient rows and zero
    Hessian rows/columns (reference `lib/gauss_newton_step.cc:88-121`).
    Returns (g [ny+1, nx+1, 4], Hb [ny+1, nx+1, 3, 3, 4, 4]).
    """
    ny, nx = g_patch.shape[:2]
    dtype = g_patch.dtype
    offsets = [(0, 0), (1, 0), (0, 1), (1, 1)]  # (ax, ay) per corner

    pv = patch_valid.astype(dtype)[..., None]
    g = jnp.zeros((ny + 1, nx + 1, 4), dtype=dtype)
    for a, (ax, ay) in enumerate(offsets):
        contrib = g_patch[:, :, 4 * a : 4 * a + 4] * pv
        g = g.at[ay : ay + ny, ax : ax + nx, :].add(contrib)
    g = g * active[..., None]

    Hb = jnp.zeros((ny + 1, nx + 1, 3, 3, 4, 4), dtype=dtype)
    pvh = patch_valid.astype(dtype)[..., None, None]
    for a, (ax, ay) in enumerate(offsets):
        for b, (bx, by) in enumerate(offsets):
            blk = H_patch[:, :, 4 * a : 4 * a + 4, 4 * b : 4 * b + 4] * pvh
            oy = 1 + (by - ay)
            ox = 1 + (bx - ax)
            Hb = Hb.at[ay : ay + ny, ax : ax + nx, oy, ox, :, :].add(blk)

    # Zero rows/cols of inactive nodes: row mask at the destination node,
    # column mask at the neighbor the offset points to.
    act = active.astype(dtype)
    Hb = Hb * act[:, :, None, None, None, None]
    ap = jnp.pad(act, ((1, 1), (1, 1)))
    ny1, nx1 = act.shape
    for oy in range(3):
        for ox in range(3):
            nb_act = ap[oy : oy + ny1, ox : ox + nx1]
            Hb = Hb.at[:, :, oy, ox, :, :].multiply(
                nb_act[:, :, None, None]
            )
    return g, Hb


@jax.jit
def spmv(Hb: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """y = H @ x with H in stencil form; x, y: [ny+1, nx+1, 4].

    Counterpart of `BlockSparseMatrix::multiply`
    (reference `lib/block_sparse_matrix.h:276-298`).
    """
    ny1, nx1 = x.shape[:2]
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    y = jnp.zeros_like(x)
    for oy in range(3):
        for ox in range(3):
            xs = xp[oy : oy + ny1, ox : ox + nx1]
            y = y + jnp.einsum("yxab,yxb->yxa", Hb[:, :, oy, ox], xs)
    return y


@jax.jit
def block_jacobi_inverse(Hb: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """Inverted diagonal 4x4 blocks; zero where inactive/singular.

    Counterpart of `invert_blocks_inplace` + NaN guard
    (reference `lib/block_sparse_matrix.h:300-316`).
    Returns [ny+1, nx+1, 4, 4].
    """
    diag = Hb[:, :, 1, 1, :, :]
    eye = jnp.eye(4, dtype=Hb.dtype)
    # Guard singular blocks so inv doesn't emit inf on inactive nodes.
    ok = active & (jnp.abs(diag).sum((-1, -2)) > 0)
    safe = jnp.where(ok[..., None, None], diag, eye)
    inv = jnp.linalg.inv(safe)
    finite = jnp.isfinite(inv).all(axis=(-1, -2)) & ok
    return jnp.where(finite[..., None, None], inv, 0.0)


@jax.jit
def apply_block_diag(P: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """z = P @ x for a block-diagonal P [ny+1, nx+1, 4, 4]."""
    return jnp.einsum("yxab,yxb->yxa", P, x)
