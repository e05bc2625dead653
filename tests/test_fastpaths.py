"""Parity of the TPU fast paths against their reference implementations.

Each optimization must be exact: packed-window bilinear vs 4-gather
bilinear, compacted (working-set) GN assembly vs full assembly, and
border-selected patch MSE vs the full-grid version.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from smvs_tpu.image import ops as iops
from smvs_tpu.pipeline import optimizer as O
from smvs_tpu.solver import gn
from tests.test_gn_analytic import _problem


def test_bilinear_packed4_matches_bilinear():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((37, 53)))
    # include exact borders and out-of-range coords (clamped)
    x = jnp.asarray(np.concatenate([
        rng.uniform(-2, 55, size=500), [0.0, 52.0, 52.5, -1.0]]))
    y = jnp.asarray(np.concatenate([
        rng.uniform(-2, 39, size=500), [0.0, 36.0, 36.5, -1.0]]))
    want = iops.bilinear(img, x, y)
    got = iops.bilinear_packed4(iops.pack_window4(img), x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


def test_compacted_assembly_matches_full():
    surf, view, vis, _ = _problem(n_views=2, use_shading=False, dim=128,
                                  scale=3)
    rng = np.random.default_rng(3)
    active = jnp.asarray(
        rng.uniform(size=surf.node_valid.shape) < 0.2) & surf.node_valid
    opts = gn.GNOptions(regularization=0.013)
    g_full, H_full = gn.assemble(surf, view, vis, active, opts)
    B = surf.num_patches_y * surf.num_patches_x
    # capacity: generous enough for the ~20% active selection
    g_cap, H_cap = gn.assemble(surf, view, vis, active, opts,
                               capacity=(3 * B) // 4)
    # Identical math; the compacted batch sums patches in a different
    # order, so allow fp reassociation at f64 scale.
    scale_g = np.abs(np.asarray(g_full)).max() + 1e-30
    scale_h = np.abs(np.asarray(H_full)).max() + 1e-30
    np.testing.assert_allclose(np.asarray(g_cap) / scale_g,
                               np.asarray(g_full) / scale_g, atol=1e-11)
    np.testing.assert_allclose(np.asarray(H_cap) / scale_h,
                               np.asarray(H_full) / scale_h, atol=1e-11)


def test_patch_mse_select_matches_full():
    surf, view, vis, _ = _problem(n_views=1, use_shading=False, dim=128,
                                  scale=3)
    rng = np.random.default_rng(4)
    select = jnp.asarray(
        rng.uniform(size=surf.patch_valid.shape) < 0.3) & surf.patch_valid
    full = O.patch_mse(surf, view, vis)
    B = surf.num_patches_y * surf.num_patches_x
    compact = O.patch_mse(surf, view, vis, select=select, capacity=B // 2)
    sel = np.asarray(select)
    np.testing.assert_allclose(np.asarray(compact)[sel],
                               np.asarray(full)[sel], rtol=1e-12)
    assert (np.asarray(compact)[~sel] == 0).all()


def test_precomputed_sgm_zbuffer_matches_inline():
    surf, view, vis, _ = _problem(n_views=2, use_shading=False, dim=128,
                                  scale=3)
    rng = np.random.default_rng(5)
    sgm_depth = jnp.asarray(
        np.where(rng.uniform(size=(surf.height, surf.width)) > 0.3,
                 rng.uniform(4.0, 7.0, size=(surf.height, surf.width)), 0.0),
        surf.nodes.dtype)
    main_img = jnp.asarray(rng.uniform(size=(surf.height, surf.width)),
                           surf.nodes.dtype)
    sub_imgs = jnp.asarray(
        rng.uniform(size=(2, surf.height, surf.width)), surf.nodes.dtype)
    s_in, vis_in = O.compute_visibility(surf, view, sgm_depth, True,
                                        main_img, sub_imgs)
    zb = O.zbuffer_scatter(view, sgm_depth)
    s_pre, vis_pre = O.compute_visibility(surf, view, sgm_depth, True,
                                          main_img, sub_imgs,
                                          sgm_zbuffer=zb)
    np.testing.assert_array_equal(np.asarray(vis_pre), np.asarray(vis_in))
    np.testing.assert_array_equal(np.asarray(s_pre.patch_valid),
                                  np.asarray(s_in.patch_valid))
