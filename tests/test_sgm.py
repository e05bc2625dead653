"""SGM tests: census, min-plus recurrence, and end-to-end depth on the
synthetic two-view scene."""

import jax.numpy as jnp
import numpy as np

from smvs_tpu.core.synthetic import make_two_view_scene
from smvs_tpu.sgm import stereo as sgm


def test_census_matches_bruteforce():
    rng = np.random.default_rng(0)
    img = rng.integers(1, 255, size=(16, 20)).astype(np.float64)
    hi, lo = sgm.census_transform(jnp.asarray(img))
    hi = np.asarray(hi)
    lo = np.asarray(lo)

    def brute(x, y):
        bits = []
        for dx in range(-4, 5):
            for dy in range(-3, 4):
                bits.append(1 if img[y, x] < img[y + dy, x + dx] else 0)
        v = 0
        for b in bits:
            v = v * 2 + b
        return v

    for (x, y) in [(5, 4), (10, 8), (14, 11)]:
        want = brute(x, y)
        got = (int(hi[y, x]) << 32) | int(lo[y, x])
        assert got == want, (x, y, got, want)
    # border zero
    assert hi[0, 0] == 0 and lo[0, 0] == 0


def test_path_update_matches_bruteforce():
    rng = np.random.default_rng(1)
    D = 16
    prev = rng.integers(0, 100, size=(3, D)).astype(np.int32)
    cost = rng.integers(0, 64, size=(3, D)).astype(np.int32)
    p1 = 6
    p2 = np.asarray([30, 50, 96], dtype=np.int32)
    got = np.asarray(sgm._path_update(jnp.asarray(prev), jnp.asarray(cost),
                                      p1, jnp.asarray(p2)))
    # Brute force: reference fill_path_cost (lib/sgm_stereo.cc:328-345)
    for r in range(3):
        minp = prev[r].min()
        for i in range(D):
            upd = prev[r, i]
            for j in range(D):
                if j == i:
                    continue
                pen = p1 if abs(j - i) == 1 else p2[r]
                upd = min(upd, prev[r, j] + pen)
            want = cost[r, i] + upd - minp
            assert got[r, i] == want, (r, i, got[r, i], want)


def test_sgm_recovers_synthetic_depth():
    scene = make_two_view_scene(dim=160, rotate=False, baseline=0.25,
                                texture="noise")
    main = jnp.asarray(scene.images[1] * 255.0)
    neig = jnp.asarray(scene.images[0] * 255.0)
    cam_m, cam_n = scene.cameras[1], scene.cameras[0]
    dim = scene.width
    M_mn, t_mn = cam_m.fill_reprojection(cam_n, dim, dim, dim, dim)
    M_nm, t_nm = cam_n.fill_reprojection(cam_m, dim, dim, dim, dim)
    opts = sgm.SGMOptions(num_steps=96)
    depth = sgm.reconstruct(
        main, neig, jnp.asarray(M_mn), jnp.asarray(t_mn),
        jnp.asarray(M_nm), jnp.asarray(t_nm),
        range_main=(4.0, 8.5), range_neighbor=(4.0, 8.5), opts=opts,
    )
    depth = np.asarray(depth)
    gt = scene.depths[1]
    mask = depth > 0
    assert mask.mean() > 0.25, f"SGM coverage {mask.mean():.3f}"
    rel = np.abs(depth[mask] - gt[mask]) / gt[mask]
    # plane-sweep quantization at 96 steps over [4, 8.5] is ~1%/step
    assert np.median(rel) < 0.03, f"median SGM depth error {np.median(rel):.4f}"


def test_consistency_filter_drops_mismatches():
    h = w = 32
    d = jnp.full((h, w), 5.0)
    M = jnp.eye(3)
    t = jnp.zeros(3)
    # identical depth maps -> interior survives
    out = np.asarray(sgm.consistency_filter(d, d, M, t))
    assert (out[10:-10, 10:-10] > 0).all()
    # neighbor disagrees -> all dropped
    out2 = np.asarray(sgm.consistency_filter(d, d * 3.0, M, t))
    assert (out2 == 0).all()


def test_rectified_sgm_recovers_synthetic_depth():
    """The rectified (shift-based) fast path matches or beats the general
    gather path on the synthetic scene (reference parity: `reconstruct`,
    lib/sgm_stereo.cc:46-96)."""
    from smvs_tpu.sgm import rectify as R

    scene = make_two_view_scene(dim=160, rotate=True, texture="noise")
    dim = scene.width
    rp = R.rectify_pair(scene.cameras[1], scene.cameras[0], dim, dim,
                        (4.0, 8.5), (4.0, 8.5))
    assert rp.valid  # lateral baseline -> rectifiable

    depth = np.asarray(sgm.reconstruct_auto(
        scene.cameras[1], scene.cameras[0],
        jnp.asarray(scene.images[1] * 255.0),
        jnp.asarray(scene.images[0] * 255.0),
        (4.0, 8.5), (4.0, 8.5), opts=sgm.SGMOptions(num_steps=96),
        use_pallas=False))
    gt = scene.depths[1]
    mask = depth > 0
    assert mask.mean() > 0.25, f"coverage {mask.mean():.3f}"
    rel = np.abs(depth[mask] - gt[mask]) / gt[mask]
    # sub-plane WTA should land well under one sweep step of error
    assert np.median(rel) < 0.01, f"median err {np.median(rel):.4f}"


def test_rectify_rejects_forward_motion():
    """Near-forward baselines must fall back to the general path."""
    from smvs_tpu.core.camera import Camera
    from smvs_tpu.sgm import rectify as R

    cam0 = Camera(flen=1.0, rot=np.eye(3), trans=np.zeros(3))
    cam1 = Camera(flen=1.0, rot=np.eye(3), trans=np.array([0.0, 0.0, 0.4]))
    rp = R.rectify_pair(cam0, cam1, 100, 100, (3.0, 9.0), (3.0, 9.0))
    assert not rp.valid


def test_warp_homography_identity_and_shift():
    from smvs_tpu.sgm import rectify as R

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(10, 250, size=(24, 30)))
    out = np.asarray(R.warp_homography(img, jnp.eye(3)))
    np.testing.assert_allclose(out, np.asarray(img), rtol=1e-6)
    # pure translation by (2, 1): output (x,y) samples input (x+2, y+1)
    H_inv = jnp.asarray(np.array([[1.0, 0, 2.0], [0, 1.0, 1.0], [0, 0, 1.0]]))
    out = np.asarray(R.warp_homography(img, H_inv))
    np.testing.assert_allclose(out[:-1, :-2], np.asarray(img)[1:, 2:],
                               rtol=1e-6)


def test_sgm_depth_discontinuity_scene():
    """Step-edge scene: the sub-pixel consistency/un-rectify lookups must
    not bleed depths across the discontinuity (validity-weighted bilinear
    falls back to nearest when the 2x2 support disagrees)."""
    import numpy as np

    dim = 240
    step_fn = lambda i, j: np.where(i > dim / 2, 7.5, 5.0)
    scene = make_two_view_scene(dim=dim, rotate=True, texture="noise",
                                depth_fn=step_fn)
    d = sgm.reconstruct_auto(
        scene.cameras[1], scene.cameras[0],
        jnp.asarray(scene.images[1] * 255.0),
        jnp.asarray(scene.images[0] * 255.0),
        range_main=(3.5, 9.5), range_nbr=(3.5, 9.5))
    d = np.asarray(d)
    gt = scene.depths[1]
    mask = (d > 0) & (gt > 0)
    rel = np.abs(d - gt) / np.maximum(gt, 1e-9)
    assert mask.mean() > 0.7
    assert np.median(rel[mask]) < 0.01
    # within 8 px of the edge: no gross depth bleeding
    xs = np.arange(dim)[None, :] * np.ones((dim, 1))
    edge = (np.abs(xs - dim / 2) < 8) & mask
    assert np.median(rel[edge]) < 0.01


def test_reconstruct_auto_multi_matches_sequential():
    """The fused N-neighbor program (one dispatch, on-device averaging)
    reproduces the sequential reconstruct_auto + host-averaging
    composition exactly (reference averaging rule,
    `app/smvsrecon.cc:347-384`)."""
    from smvs_tpu.core.synthetic import make_plane_scene

    scene = make_plane_scene(n_views=3, dim=128)
    main = jnp.asarray(scene.images[1] * 255.0)
    nbrs = [jnp.asarray(scene.images[i] * 255.0) for i in (0, 2)]
    cams = [scene.cameras[i] for i in (0, 2)]
    opts = sgm.SGMOptions(num_steps=64)

    fused = np.asarray(sgm.reconstruct_auto_multi(
        scene.cameras[1], cams, main, nbrs, (3.4, 6.6),
        [(3.4, 6.6)] * 2, opts=opts, use_pallas=False))

    acc = None
    for cam_n, nbr in zip(cams, nbrs):
        d = np.asarray(sgm.reconstruct_auto(
            scene.cameras[1], cam_n, main, nbr, (3.4, 6.6), (3.4, 6.6),
            opts=opts, use_pallas=False))
        if acc is None:
            acc = d
        else:
            both = (acc > 0) & (d > 0)
            only2 = (acc == 0) & (d > 0)
            acc = np.where(both, (acc + d) * 0.5, np.where(only2, d, acc))

    np.testing.assert_allclose(fused, acc, rtol=1e-6, atol=1e-6)
    assert (fused > 0).mean() > 0.2
