"""Multi-chip parallelism: view-batch DP x patch-grid SP over a device mesh.

The reference's only parallelism is a thread pool with one task per view
(`app/smvsrecon.cc:558, 652-735`) plus SSE lanes. The TPU-native mapping
(SURVEY.md section 2/7):

- **views axis (DP)**: independent per-view problems stacked on a leading
  axis and sharded across the ``views`` mesh axis — the analog of the
  thread pool, but batched into one SPMD program;
- **patch axis (SP)**: each view's node grid row-sharded across the
  ``patch`` mesh axis. The Gauss-Newton system couples only 9-node
  stencils, so XLA's SPMD partitioner turns the shifted-slice stencil ops
  (`smvs_tpu.solver.stencil`) into 1-row halo exchanges over ICI, and CG
  dot products into ``psum`` — no hand-written collectives needed.

Shapes are padded/bucketed by the caller so every view in a batch shares
(ny, nx, N, H, W).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smvs_tpu.solver import cg, gn, stencil
from smvs_tpu.surface.state import Surface


def make_mesh(n_devices: int | None = None, patch_axis: int = 1) -> Mesh:
    """Device mesh with ('views', 'patch') axes.

    patch_axis > 1 splits each view's node grid across that many devices.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % patch_axis == 0, (n, patch_axis)
    arr = np.array(devs[:n]).reshape(n // patch_axis, patch_axis)
    return Mesh(arr, ("views", "patch"))


def batch_shardings(mesh: Mesh):
    """NamedShardings for a stacked view-batch problem."""
    s_nodes = NamedSharding(mesh, P("views", "patch"))  # [V, ny1, nx1, 4]
    s_view = NamedSharding(mesh, P("views"))  # per-view images etc.
    return s_nodes, s_view


def batched_newton_step(
    template: Surface,
    gn_opts: gn.GNOptions,
    lighting=None,
):
    """A jittable one-Newton-step function over a stacked view batch.

    Returns step(nodes, node_valid, patch_valid, vis, active, view) -> nodes'
    with every argument carrying a leading views axis. Shard the inputs with
    `batch_shardings` and wrap in `jax.jit` — XLA inserts the halo/psum
    collectives.
    """

    def one_view(nodes, node_valid, patch_valid, vis, active, view):
        surf = dataclasses.replace(template, nodes=nodes,
                                   node_valid=node_valid,
                                   patch_valid=patch_valid)
        act = active & node_valid
        g, Hb = gn.assemble(surf, view, vis, act, gn_opts, lighting)
        Pinv = stencil.block_jacobi_inverse(Hb, act)
        gnorm = jnp.linalg.norm(g.reshape(-1))
        res = cg.solve(
            lambda x: stencil.spmv(Hb, x),
            -g,
            precond=lambda x: stencil.apply_block_diag(Pinv, x),
            max_iterations=200,
            error_tolerance=gnorm * 0.01,
            q_tolerance=1e-3,
        )
        delta = jnp.moveaxis(res.x, 0, -1)  # solver plane layout -> node grid
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        return jnp.where(node_valid[..., None], nodes + delta, nodes)

    return jax.vmap(one_view)


def training_step_fn(template: Surface, gn_opts: gn.GNOptions, mesh: Mesh):
    """The sharded 'training step': one batched Newton update, jitted over

    the mesh with DP(views) x SP(patch-grid rows) shardings.
    """
    step = batched_newton_step(template, gn_opts)
    s_nodes, s_view = batch_shardings(mesh)

    # Node-grid arrays (ny+1 rows) are row-sharded over 'patch'; patch-grid
    # arrays (ny rows, not divisible) stay DP-only — the SPMD partitioner
    # propagates/reshards internally and inserts the stencil halos.
    in_shardings = (
        s_nodes,  # nodes [V, ny1, nx1, 4]
        s_nodes,  # node_valid [V, ny1, nx1]
        s_view,  # patch_valid [V, ny, nx]
        s_view,  # vis [V, ny, nx, N]
        s_nodes,  # active [V, ny1, nx1]
        s_view,  # view pytree (images, M, t, flen)
    )
    return jax.jit(step, in_shardings=in_shardings, out_shardings=s_nodes)
