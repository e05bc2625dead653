"""9-point-stencil block linear algebra on the node grid.

TPU-native replacement for the reference's CSR block-sparse matrix
(`lib/block_sparse_matrix.h`): because Hessian blocks only couple nodes that
share a patch (reference `lib/gauss_newton_step.cc:98-122`), the system is
a stencil tensor — SpMV is 9 shifted batched 4x4 contractions and the
block-Jacobi preconditioner is a batched 4x4 inverse. No index arrays, no
sorting, pure dense ops.

Layout: everything is **channel-major** — vectors are [4, ny1, nx1], the
stencil is [3, 3, 4, 4, ny1, nx1], the preconditioner [4, 4, ny1, nx1] —
so the node grid occupies the two minor (tiled) dimensions. The obvious
[ny1, nx1, 4] layout puts a 4-wide dim in the 128-lane axis and pads it
32x, multiplying the memory traffic of every CG iteration; measured, the
plane layout cuts SpMV/axpy traffic to the actual data size.

(A symmetric-half variant storing 5 of the 9 offsets was measured SLOWER —
1.03 vs 0.80 ms/CG-iter at bench s2 — because applying each plane forward
and transposed reads it twice; the full stencil reads each plane once.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CORNERS = [(0, 0), (1, 0), (0, 1), (1, 1)]  # (ax, ay), node-major order


@jax.jit
def scatter_patch_systems(
    g_patch: jnp.ndarray,  # [16, ny, nx] corner-major gradient planes
    H_patch: jnp.ndarray,  # [16, 16, ny, nx] per-patch Hessian planes
    active: jnp.ndarray,  # [ny+1, nx+1] bool
    patch_valid: jnp.ndarray,  # [ny, nx] bool
):
    """Accumulate per-patch systems into the node grid.

    Corner order (00, 10, 01, 11); corner a of patch (i, j) is node
    (i + ax, j + ay). Inactive nodes get zero gradient rows and zero
    Hessian rows/columns (reference `lib/gauss_newton_step.cc:88-121`).
    Returns (g [4, ny1, nx1], Hb [3, 3, 4, 4, ny1, nx1]) where
    Hb[1+dy, 1+dx] couples node (i, j) to node (i+dy, j+dx).
    """
    ny, nx = g_patch.shape[-2:]
    ny1, nx1 = ny + 1, nx + 1
    dtype = g_patch.dtype

    act = active.astype(dtype)
    ap = jnp.pad(act, ((1, 1), (1, 1)))
    pv = patch_valid.astype(dtype)

    g = jnp.zeros((4, ny1, nx1), dtype=dtype)
    for a, (ax, ay) in enumerate(_CORNERS):
        contrib = g_patch[4 * a : 4 * a + 4] * pv
        g = g + jnp.pad(contrib, ((0, 0), (ay, 1 - ay), (ax, 1 - ax)))
    g = g * act

    # Build each of the 9 offset planes as a sum of padded shifted block
    # slices (instead of scatter-adds into a 300MB buffer followed by
    # masking passes) — one streaming write, masks folded in. For offset
    # (dy, dx): the contributing corner pairs (a, b) satisfy
    # (by - ay, bx - ax) = (dy, dx).
    planes = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            acc = jnp.zeros((4, 4, ny1, nx1), dtype=dtype)
            for a, (ax, ay) in enumerate(_CORNERS):
                bx, by = ax + dx, ay + dy
                if (bx, by) not in _CORNERS:
                    continue
                b = _CORNERS.index((bx, by))
                blk = H_patch[4 * a : 4 * a + 4, 4 * b : 4 * b + 4] * pv
                acc = acc + jnp.pad(
                    blk, ((0, 0), (0, 0), (ay, 1 - ay), (ax, 1 - ax)))
            # Row mask at the destination node, column mask at the
            # neighbor this offset points to.
            nb_act = ap[1 + dy : 1 + dy + ny1, 1 + dx : 1 + dx + nx1]
            planes.append(acc * (act * nb_act))
    Hb = jnp.stack(planes, axis=0).reshape(3, 3, 4, 4, ny1, nx1)
    return g, Hb


@jax.jit
def spmv(Hb: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """y = H @ x with H in stencil form; x, y: [4, ny1, nx1].

    Counterpart of `BlockSparseMatrix::multiply`
    (reference `lib/block_sparse_matrix.h:276-298`).
    """
    ny1, nx1 = x.shape[-2:]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    y = jnp.zeros_like(x)
    for oy in range(3):
        for ox in range(3):
            xs = xp[:, oy : oy + ny1, ox : ox + nx1]
            # Unrolled 4-wide contraction (NOT an einsum/dot): a dot
            # lowering makes XLA demand a transposed Hb layout with the
            # 4x4 blocks on the tiled minor dims — measured 32x padding
            # (283 MB -> 8.85 GB per buffer) inside the vmapped batch
            # pipeline at 2 MP, an instant HBM OOM. Elementwise
            # multiply + tiny reduce keeps the (ny1, nx1)-minor layout.
            y = y + (Hb[oy, ox] * xs[None]).sum(1)
    return y


@jax.jit
def block_jacobi_inverse(Hb: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """Inverted diagonal 4x4 blocks; zero where inactive/singular.

    Counterpart of `invert_blocks_inplace` + NaN guard
    (reference `lib/block_sparse_matrix.h:300-316`).
    Returns [4, 4, ny1, nx1].
    """
    diag = jnp.moveaxis(Hb[1, 1], (0, 1), (-2, -1))  # [ny1, nx1, 4, 4]
    eye = jnp.eye(4, dtype=Hb.dtype)
    # Guard singular blocks so inv doesn't emit inf on inactive nodes.
    ok = active & (jnp.abs(diag).sum((-1, -2)) > 0)
    safe = jnp.where(ok[..., None, None], diag, eye)
    inv = jnp.linalg.inv(safe)
    finite = jnp.isfinite(inv).all(axis=(-1, -2)) & ok
    inv = jnp.where(finite[..., None, None], inv, 0.0)
    return jnp.moveaxis(inv, (-2, -1), (0, 1))


@jax.jit
def apply_block_diag(P: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """z = P @ x for a block-diagonal P [4, 4, ny1, nx1]; x [4, ny1, nx1]."""
    # Unrolled contraction — see the layout note in `spmv`.
    return (P * x[None]).sum(1)
