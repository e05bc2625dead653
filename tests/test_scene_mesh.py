"""Scene IO, view selection, and point-cloud fusion tests."""

import os
import tempfile

import numpy as np

from smvs_tpu.core.camera import Camera
from smvs_tpu.core import scene as sc
from smvs_tpu.core.synthetic import make_two_view_scene
from smvs_tpu.mesh import ply, pointcloud as pc
from smvs_tpu.pipeline import view_selection as vs


def _cam(i):
    rng = np.random.default_rng(i)
    a = rng.normal(size=3) * 0.1
    # small rotation via Rodrigues-ish exponential
    from scipy.spatial.transform import Rotation  # noqa: F401
    return None


def test_mvei_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        rng = np.random.default_rng(0)
        for arr in [rng.random((7, 5)).astype(np.float32),
                    rng.integers(0, 255, (4, 6, 3)).astype(np.uint8)]:
            p = os.path.join(d, "x.mvei")
            sc.save_mvei(p, arr)
            back = sc.load_mvei(p)
            np.testing.assert_array_equal(back, arr)


def test_view_and_scene_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        cam = Camera(flen=0.92, rot=np.eye(3), trans=np.array([0.1, 0.2, 0.3]))
        v = sc.View(view_id=3, name="IMG_0003", camera=cam)
        v.set_image("undistorted",
                    np.random.default_rng(0).integers(
                        0, 255, (8, 10, 3)).astype(np.uint8))
        v.set_image("smvs-B2", np.linspace(0, 1, 80, dtype=np.float32
                                           ).reshape(8, 10))
        scene = sc.Scene(path=d, views=[v], bundle=sc.Bundle(
            cameras=[cam],
            features=[sc.Feature3D(pos=np.array([0.0, 0.0, 4.0]),
                                   color=np.array([255, 0, 0]), refs=[3])],
        ))
        scene.save()

        back = sc.Scene.load(d)
        assert len(back.views) == 1
        bv = back.views[0]
        assert bv.view_id == 3
        np.testing.assert_allclose(bv.camera.flen, 0.92)
        np.testing.assert_allclose(bv.camera.trans, cam.trans)
        np.testing.assert_allclose(bv.get_image("smvs-B2"),
                                   v.get_image("smvs-B2"))
        assert bv.get_image("undistorted").shape == (8, 10, 3)
        assert back.bundle is not None
        assert back.bundle.features[0].refs == [3]

        # checkpoint semantics: outputs listed, clean removes them
        assert bv.has_embedding("smvs-B2")
        back.clean_embeddings()
        assert not back.views[0].has_embedding("smvs-B2")
        assert back.views[0].has_embedding("undistorted")


def test_view_selection_position_based():
    cams = []
    for i in range(6):
        # cameras along x axis, all looking down +z
        cams.append(Camera(flen=1.0, rot=np.eye(3),
                           trans=np.array([-0.1 * i, 0.0, 0.0])))
    # one camera looking backwards
    flip = np.diag([1.0, -1.0, -1.0])
    cams.append(Camera(flen=1.0, rot=flip, trans=np.zeros(3)))
    nbrs = vs.position_based_selection(cams, 0,
                                       vs.ViewSelectionOptions(num_neighbors=3))
    assert len(nbrs) == 3
    assert 6 not in nbrs
    assert nbrs[0] == 1  # nearest first


def test_view_selection_bundle_based():
    cams = [Camera(flen=1.0, rot=np.eye(3),
                   trans=np.array([-0.05 * i, 0.0, 0.0])) for i in range(4)]
    sizes = [(100, 100)] * 4
    rng = np.random.default_rng(0)
    feats = []
    for k in range(60):
        p = np.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3),
                      rng.uniform(2.0, 3.0)])
        refs = [0, 1, 2] if k % 2 == 0 else [0, 1]
        feats.append(sc.Feature3D(pos=p, color=np.zeros(3), refs=refs))
    bundle = sc.Bundle(cameras=cams, features=feats)
    nbrs = vs.bundle_based_selection(cams, sizes, bundle, 0)
    assert 1 in nbrs and 2 in nbrs and 3 not in nbrs
    assert nbrs[0] == 1  # most shared features first


def test_ply_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        rng = np.random.default_rng(1)
        ps = ply.PointSet(
            vertices=rng.random((10, 3)).astype(np.float32),
            normals=rng.random((10, 3)).astype(np.float32),
            values=rng.random(10).astype(np.float32),
            confidences=rng.random(10).astype(np.float32),
        )
        p = os.path.join(d, "out.ply")
        ply.save_ply(p, ps)
        back = ply.load_ply(p)
        np.testing.assert_allclose(back.vertices, ps.vertices)
        np.testing.assert_allclose(back.normals, ps.normals)
        np.testing.assert_allclose(back.values, ps.values)


def test_fusion_reconstructs_world_points():
    # Fuse the synthetic scene's two ground-truth depth maps; fused points
    # from both views must lie on the same world plane.
    scene = make_two_view_scene(dim=120, rotate=True)
    depths = [scene.depths[0], scene.depths[1]]
    cams = scene.cameras
    h, w = depths[0].shape
    normals = [np.zeros((h, w, 3), np.float32) for _ in range(2)]
    for n in normals:
        n[..., 2] = -1.0  # facing the cameras (smvs convention pre-flip)
    ps = pc.fuse_views(depths, normals, cams,
                       opts=pc.FusionOptions(cut_surfaces=False))
    assert len(ps.vertices) > 1000
    # View 1's depth is the analytic plane; check view 0's backprojected
    # points are consistent with view 1's through the world frame:
    # project every fused point into camera 1 and compare depth to the plane.
    p_cam1 = ps.vertices @ cams[1].rot.T + cams[1].trans
    uv = cams[1].project(p_cam1, w, h)
    inb = (uv[:, 0] >= 0) & (uv[:, 0] < w) & (uv[:, 1] >= 0) & (uv[:, 1] < h)
    xi = np.clip(uv[inb, 0].astype(int), 0, w - 1)
    yi = np.clip(uv[inb, 1].astype(int), 0, h - 1)
    plane = scene.depths[1][yi, xi]
    err = np.abs(p_cam1[inb, 2] - plane) / plane
    assert np.median(err) < 0.01
    assert ps.values is not None and (ps.values[ps.values > 0] > 0).all()
    assert ps.confidences is not None


def test_aabb_clip():
    ps = ply.PointSet(vertices=np.array([[0, 0, 0], [2, 2, 2], [5, 5, 5]],
                                        np.float32))
    out = pc.clip_aabb(ps, [-1, -1, -1], [3, 3, 3])
    assert len(out.vertices) == 2
