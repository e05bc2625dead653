"""Synthetic stacked view-batch problems for dryruns and benchmarks."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from smvs_tpu.core.synthetic import make_two_view_scene
from smvs_tpu.pipeline import optimizer as O
from smvs_tpu.pipeline.views import make_view
from smvs_tpu.solver import gn
from smvs_tpu.surface import state as S


def make_single_view_problem(dim: int = 120, scale: int = 4,
                             dtype=jnp.float32):
    """One synthetic view problem (surface + viewset + masks)."""
    scene = make_two_view_scene(dim=dim, rotate=True)
    main = make_view(scene.cameras[1], scene.images[1], view_id=1, dtype=dtype)
    sub = make_view(scene.cameras[0], scene.images[0], view_id=0, dtype=dtype)
    surf = S.create_planar(5.5, main.width, main.height, scale, dtype=dtype)
    view = O._build_viewset(main, [sub], scale, False, dtype)
    ny, nx = surf.num_patches_y, surf.num_patches_x
    vis = jnp.ones((ny, nx, 1), dtype=bool)
    active = surf.node_valid
    return surf, view, vis, active


def make_view_batch(n_views: int, dim: int = 120, scale: int = 4,
                    dtype=jnp.float32):
    """Stack n_views copies (with perturbed nodes) of the synthetic problem."""
    surf, view, vis, active = make_single_view_problem(dim, scale, dtype)
    rng = np.random.default_rng(0)

    def stack(x, noise=0.0):
        out = jnp.stack([x] * n_views)
        if noise:
            out = out + jnp.asarray(
                rng.normal(scale=noise, size=out.shape), dtype)
        return out

    nodes = stack(surf.nodes, noise=0.01)
    batch = dict(
        nodes=nodes,
        node_valid=stack(surf.node_valid),
        patch_valid=stack(surf.patch_valid),
        vis=stack(vis),
        active=stack(active),
        view=jax.tree.map(lambda x: jnp.stack([x] * n_views), view),
    )
    return surf, batch
