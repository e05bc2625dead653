"""Depth-map triangulation + mesh pipeline tests."""

import os
import tempfile

import numpy as np

from smvs_tpu.core.camera import Camera
from smvs_tpu.mesh import pointcloud as pc
from smvs_tpu.mesh import triangulate as tri
from smvs_tpu.mesh.ply import save_ply, load_ply


def _cam():
    return Camera(flen=1.0, rot=np.eye(3), trans=np.zeros(3))


def test_full_triangulation_plane():
    h = w = 40
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    depth = 3.0 + 0.002 * xs
    ps = tri.full_triangulation(depth, _cam())
    assert len(ps.vertices) == h * w
    # grid of quads -> 2 triangles each
    assert len(ps.faces) == 2 * (h - 1) * (w - 1)
    # all faces consistently index valid vertices
    assert ps.faces.min() >= 0 and ps.faces.max() < len(ps.vertices)


def test_full_triangulation_respects_discontinuity():
    h = w = 30
    depth = np.full((h, w), 2.0)
    depth[:, 15:] = 8.0  # massive jump
    ps = tri.full_triangulation(depth, _cam())
    # no face connects the two sides
    v = ps.vertices
    for f in ps.faces:
        zs = v[f][:, 2]
        assert zs.max() - zs.min() < 1.0


def test_full_triangulation_skips_holes():
    depth = np.full((20, 20), 2.0)
    depth[5:8, 5:8] = 0.0
    ps = tri.full_triangulation(depth, _cam())
    assert len(ps.vertices) == 20 * 20 - 9


def test_approximate_triangulation_backprojects():
    h = w = 48
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    depth = 4.0 + 0.01 * xs + 0.005 * ys
    ps = tri.approximate_triangulation(depth, _cam())
    assert len(ps.faces) > 0
    # vertices lie on the plane in camera space: z == depth at projection
    assert np.all(ps.vertices[:, 2] > 3.9)
    assert np.all(ps.vertices[:, 2] < 4.0 + 0.01 * w + 0.005 * h)


def test_mesh_fusion_and_simplify_tool():
    h = w = 32
    depth = np.full((h, w), 2.5)
    ps = pc.fuse_views([depth], [np.zeros((h, w, 3))], [_cam()],
                       opts=pc.FusionOptions(cut_surfaces=False,
                                             create_triangle_mesh=True))
    assert ps.faces is not None and len(ps.faces) > 0

    from smvs_tpu.tools import simplify as stool

    with tempfile.TemporaryDirectory() as d:
        pin = os.path.join(d, "in.ply")
        pout = os.path.join(d, "out.ply")
        save_ply(pin, ps)
        rc = stool.main([pin, pout, "0.2"])
        assert rc == 0
        out = load_ply(pout)
        assert 0 < len(out.faces) <= 0.35 * len(ps.faces)
