"""Spectrum of the block-Jacobi-preconditioned GN system (small problem)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from smvs_tpu.dist.testing import make_single_view_problem
from smvs_tpu.solver import gn, stencil

dim = int(os.environ.get("DIM", "120"))
scale = int(os.environ.get("S", "2"))
surf, view, vis, active = make_single_view_problem(dim=dim, scale=scale, dtype=jnp.float64)
opts = gn.GNOptions(regularization=0.01)
g, Hb = gn.assemble(surf, view, vis, active, opts, None)
ny1, nx1 = g.shape[-2:]
print(f"grid {ny1}x{nx1}")

def dense_from_stencil(Hs):
    ncy, ncx = Hs.shape[-2:]
    n = ncy * ncx * 4
    A = np.zeros((ncy, ncx, 4, ncy, ncx, 4))
    Hn = np.asarray(Hs)
    for oy in range(3):
        for ox in range(3):
            dy, dx = oy - 1, ox - 1
            for i in range(max(0, -dy), ncy - max(0, dy)):
                for j in range(max(0, -dx), ncx - max(0, dx)):
                    A[i, j, :, i + dy, j + dx, :] += Hn[oy, ox, :, :, i, j]
    return A.reshape(n, n)

A = dense_from_stencil(Hb)
mask = np.repeat(np.asarray(active).reshape(-1), 4)
A = A[np.ix_(mask, mask)]
n = A.shape[0]
print("dense", A.shape)

# block-jacobi preconditioned: M^-1/2 A M^-1/2 where M = block diag
nb = n // 4
Ab = A.reshape(nb, 4, nb, 4)
D = np.stack([Ab[i, :, i, :] for i in range(nb)])
# symmetric inverse sqrt per block
w, V = np.linalg.eigh(D)
w = np.maximum(w, 1e-300)
Dm = V @ (w[..., None] ** -0.5 * np.swapaxes(V, -1, -2))
S = np.zeros_like(A)
for i in range(nb):
    S[4*i:4*i+4, 4*i:4*i+4] = Dm[i]
P = S @ A @ S
P = 0.5 * (P + P.T)
ev, evec = np.linalg.eigh(P)
print("precond eigs: min", ev[:8])
print("  max", ev[-4:])
print("  cond", ev[-1] / max(ev[0], 1e-300))
print("  quantiles", np.percentile(ev, [1, 5, 25, 50, 75, 95, 99]))

# what do the smallest eigenvectors look like? energy per channel + smoothness
idx_back = np.zeros(n, dtype=int)
full_idx = np.where(mask)[0]
for k in range(6):
    v = np.zeros(mask.size)
    v[full_idx] = evec[:, k]
    v = v.reshape(ny1 * nx1, 4)  # node-major? mask was repeat(...,4) so yes
    ch_energy = (v ** 2).sum(0)
    vv = v.reshape(ny1, nx1, 4)
    # smoothness: ratio of energy after 3x3 box blur
    from scipy.ndimage import uniform_filter
    sm = uniform_filter(vv, size=(3, 3, 1))
    smooth_frac = (sm ** 2).sum() / (vv ** 2).sum()
    print(f"eig[{k}]={ev[k]:.3e} ch_energy={np.round(ch_energy, 3)} "
          f"smooth_frac={smooth_frac:.3f}")
