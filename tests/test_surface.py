"""Surface state-machine tests (counterpart of the reference's surface usage;
the reference has no dedicated surface gtest, so these pin our masked-array
semantics against analytic expectations)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from smvs_tpu.surface import state as S


def test_planar_depth_map():
    surf = S.create_planar(6.0, 130, 120, 4, dtype=jnp.float64)
    dm = np.asarray(S.depth_map(surf))
    ps = surf.patchsize
    inside = dm[surf.start_y : surf.start_y + surf.num_patches_y * ps,
                surf.start_x : surf.start_x + surf.num_patches_x * ps]
    np.testing.assert_allclose(inside, 6.0, rtol=1e-12)
    assert dm[0, 0] == 0.0


def test_create_from_dense_ramp():
    h = w = 140
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    depth = 5.0 + 0.01 * xs + 0.02 * ys
    surf = S.create_from_depth(jnp.asarray(depth), scale=4)
    assert bool(surf.patch_valid.any())
    dm = np.asarray(S.depth_map(surf))
    mask = dm > 0
    # Node stats use per-quadrant minima so the surface is biased slightly
    # low, but must track the ramp within a couple of patch-sized increments.
    err = np.abs(dm[mask] - depth[mask])
    assert np.median(err) < 0.01 * 16 * 2  # within ~2 patch x-increments


def test_subdivide_preserves_surface():
    surf = S.create_planar(4.0, 200, 180, 5, dtype=jnp.float64)
    # Make it non-trivial: a smooth node field.
    ny1, nx1 = surf.node_valid.shape
    jj, ii = np.mgrid[0:ny1, 0:nx1].astype(np.float64)
    f = 5.0 + 0.3 * ii + 0.2 * jj + 0.05 * ii * jj
    nodes = np.zeros((ny1, nx1, 4))
    nodes[..., 0] = f
    nodes[..., 1] = 0.3 + 0.05 * jj  # df/di
    nodes[..., 2] = 0.2 + 0.05 * ii
    nodes[..., 3] = 0.05
    surf = dataclasses.replace(surf, nodes=jnp.asarray(nodes))
    dm0 = np.asarray(S.depth_map(surf))
    sub = S.subdivide(surf)
    assert sub.scale == surf.scale - 1
    dm1 = np.asarray(S.depth_map(sub))
    both = (dm0 > 0) & (dm1 > 0)
    assert both.sum() > 0.5 * dm0.size * 0.5
    np.testing.assert_allclose(dm1[both], dm0[both], rtol=1e-6)


def test_subdivide_with_border_ring_offset():
    # Bundle-style grids leave >= 2 new-patch slack after halving, so the
    # subdivided grid gains a border ring (off_x/off_y = 1 path,
    # reference lib/surface.cc:993-1014). Check shapes and continuity.
    h = w = 360
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    depth = 4.0 + 0.004 * xs + 0.003 * ys
    surf = S.create_from_depth(jnp.asarray(depth), scale=4)
    sub = S.subdivide(surf)
    assert sub.scale == 3
    # offset path taken: new grid is 2*old + 2
    assert sub.num_patches_x == 2 * surf.num_patches_x + 2
    dm0 = np.asarray(S.depth_map(surf))
    dm1 = np.asarray(S.depth_map(sub))
    both = (dm0 > 0) & (dm1 > 0)
    assert both.sum() > 0
    np.testing.assert_allclose(dm1[both], dm0[both], rtol=1e-5)
    # border ring nodes are invalid (no source patch)
    assert not bool(sub.node_valid[0, :].any())


def test_fill_holes_and_remove_nodes():
    surf = S.create_planar(3.0, 100, 100, 4, dtype=jnp.float64)
    pv = np.asarray(surf.patch_valid).copy()
    pv[:] = False
    surf = dataclasses.replace(surf, patch_valid=jnp.asarray(pv))
    # all nodes valid -> fill_holes restores all patches
    surf2 = S.fill_holes(surf)
    assert bool(surf2.patch_valid.all())
    # no patches + remove nodes -> no nodes
    surf3 = S.remove_nodes_without_patch(surf)
    assert not bool(surf3.node_valid.any())


def test_remove_isolated_patches():
    surf = S.create_planar(3.0, 140, 140, 4, dtype=jnp.float64)
    pv = np.zeros_like(np.asarray(surf.patch_valid))
    pv[3, 3] = True  # isolated
    pv[0:3, 5:8] = True  # 3x3 block: all survive (corner has 3 neighbors)
    surf = dataclasses.replace(surf, patch_valid=jnp.asarray(pv))
    out = S.remove_isolated_patches(surf)
    opv = np.asarray(out.patch_valid)
    assert not opv[3, 3]
    assert opv[1, 6]
    assert opv[0, 5]


def test_expand_grows_border():
    surf = S.create_planar(5.0, 200, 200, 4, dtype=jnp.float64)
    nv = np.zeros_like(np.asarray(surf.node_valid))
    nv[3:7, 3:7] = True  # 4x4 node block = 3x3 patches
    pv = np.zeros_like(np.asarray(surf.patch_valid))
    pv[3:6, 3:6] = True
    surf = dataclasses.replace(
        surf, node_valid=jnp.asarray(nv), patch_valid=jnp.asarray(pv)
    )
    before = int(surf.num_valid_patches())
    out = S.expand(surf)
    after = int(out.num_valid_patches())
    assert after > before
    # expanded nodes carry plausible depths
    newly = np.asarray(out.node_valid) & ~nv
    vals = np.asarray(out.nodes[..., 0])[newly]
    assert np.all(np.abs(vals - 5.0) < 1.0)


def test_update_nodes_masks_invalid():
    surf = S.create_planar(2.0, 100, 100, 4, dtype=jnp.float64)
    nv = np.asarray(surf.node_valid).copy()
    nv[0, 0] = False
    surf = dataclasses.replace(surf, node_valid=jnp.asarray(nv))
    delta = jnp.ones_like(surf.nodes)
    out = S.update_nodes(surf, delta)
    assert float(out.nodes[0, 0, 0]) == 2.0  # untouched
    assert float(out.nodes[1, 1, 0]) == 3.0


def test_subdivide_edge_nodes_with_ring_offset():
    # Regression: with the off=1 border ring, the edge-midpoint nodes
    # (odd/even and even/odd parities) used to come back zeroed-but-valid
    # from a miscompiled sequence of strided scatters (XLA disjoint-scatter
    # fusion bug, hit on CPU and TPU alike). Check every valid node value
    # directly at node granularity, under jit, for a constant surface.
    depth = jnp.full((360, 360), 7.0, dtype=jnp.float32)
    surf = S.create_from_depth(depth, scale=4)
    sub = jax.jit(S.subdivide)(surf)
    assert sub.num_patches_x == 2 * surf.num_patches_x + 2
    nd = np.asarray(sub.nodes)
    nv = np.asarray(sub.node_valid)
    assert nv.sum() > 3 * np.asarray(surf.node_valid).sum()
    np.testing.assert_allclose(nd[..., 0][nv], 7.0, atol=1e-4)
    # derivatives of a constant patch stay zero
    np.testing.assert_allclose(nd[..., 1:][nv], 0.0, atol=1e-4)
