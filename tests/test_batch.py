"""View-batch DP of the real pipeline: batched == sequential, and the
DP x SP sharded run matches on the virtual 8-device mesh.

Counterpart of the reference's per-view thread-pool fanout
(`app/smvsrecon.cc:558, 652-735`), batched into one SPMD program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from smvs_tpu.core.synthetic import make_plane_scene
from smvs_tpu.pipeline import batch as B
from smvs_tpu.pipeline import optimizer as O
from smvs_tpu.pipeline.views import make_view


def _problem(n_mains=2, dim=96):
    scene = make_plane_scene(n_views=n_mains + 1, dim=dim)
    views = [make_view(scene.cameras[i], scene.images[i], view_id=i)
             for i in range(n_mains + 1)]
    # each main sees the shared center view as neighbor -> same bucket
    center = n_mains // 2
    mains, subs_list, gts, inits = [], [], [], []
    for i in range(n_mains + 1):
        if i == center:
            continue
        mains.append(views[i])
        subs_list.append([views[center]])
        gts.append(scene.depths[i])
        # degraded dense init from the analytic depth
        inits.append(jnp.asarray(scene.depths[i] * 1.02, jnp.float32))
    return mains, subs_list, gts, inits


# fixed_newton_steps: equality-harness mode (see OptimizerOptions) —
# batched/vmapped and sequential paths run step-for-step comparable
# trajectories, so reduction-order noise cannot flip an iteration count
# and shift the whole map by a convergence epsilon.
OPTS = O.OptimizerOptions(regularization=0.01, num_iterations=2,
                          min_scale=4, use_sgm=False,
                          full_optimization=True, max_newton_steps=8,
                          fixed_newton_steps=True)


def test_batched_matches_sequential():
    mains, subs_list, gts, inits = _problem(n_mains=2)
    seq = [O.optimize_view(m, s, OPTS, init_depth=d)
           for m, s, d in zip(mains, subs_list, inits)]
    bat = B.optimize_view_batch(mains, subs_list, OPTS, init_depths=inits)
    assert len(bat) == len(seq)
    for r_seq, r_bat, gt in zip(seq, bat, gts):
        d_seq = np.asarray(r_seq.depth)
        d_bat = np.asarray(r_bat.depth)
        assert (d_bat > 0).mean() > 0.3
        # Identical math modulo vmap reduction/fusion reassociation,
        # amplified through CG's tolerance-based exits (Newton steps are
        # fixed by OPTS, so the drift stays sparse).
        np.testing.assert_allclose(d_bat, d_seq, rtol=1e-3, atol=1e-3)
        # The loose ceiling above tolerates sparse iteration-count drift;
        # this distribution bound keeps sensitivity to broad systematic
        # divergence (a real cross-path bug under 1e-3 would light up far
        # more than 10% of pixels — r3 advisor #3).
        drift = np.abs(d_bat - d_seq) / np.maximum(np.abs(d_seq), 1e-6)
        assert (drift > 2e-4).mean() < 0.10, (drift > 2e-4).mean()
        mask = (d_bat > 0) & (gt > 0)
        rel = np.abs(d_bat[mask] - gt[mask]) / gt[mask]
        assert np.median(rel) < 0.01


def test_batched_sharded_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mains, subs_list, gts, inits = _problem(n_mains=4, dim=96)
    ref = B.optimize_view_batch(mains, subs_list, OPTS, init_depths=inits)
    mesh = B.make_view_mesh(8, patch_axis=2)
    out = B.optimize_view_batch(mains, subs_list, OPTS, init_depths=inits,
                                mesh=mesh)
    for r_ref, r_out in zip(ref, out):
        d_ref = np.asarray(r_ref.depth)
        d_out = np.asarray(r_out.depth)
        np.testing.assert_allclose(d_out, d_ref, rtol=1e-3, atol=1e-3)
        # Distribution bound: sparse iteration-count drift only (see
        # test_batched_matches_sequential).
        drift = np.abs(d_out - d_ref) / np.maximum(np.abs(d_ref), 1e-6)
        assert (drift > 2e-4).mean() < 0.10, (drift > 2e-4).mean()


def test_batched_sgm_path_runs():
    """use_sgm bucket path: SGM-style init + visibility z-buffer caching."""
    mains, subs_list, gts, inits = _problem(n_mains=2)
    opts = O.OptimizerOptions(regularization=0.01, num_iterations=2,
                              min_scale=4, use_sgm=True,
                              full_optimization=True, max_newton_steps=8)
    bat = B.optimize_view_batch(mains, subs_list, opts, sgm_depths=inits)
    for r, gt in zip(bat, gts):
        d = np.asarray(r.depth)
        mask = (d > 0) & (gt > 0)
        assert mask.mean() > 0.3
        rel = np.abs(d[mask] - gt[mask]) / gt[mask]
        assert np.median(rel) < 0.01
