"""Native meshing tests — counterpart of reference tests/gtest_triangulator.cc
(Delaunay invariants, approximate triangulation on a synthetic ramp)."""

import numpy as np
import pytest

native = pytest.importorskip("smvs_tpu.native")


def _circumcircle_contains(a, b, c, d):
    m = np.array([
        [a[0] - d[0], a[1] - d[1], (a[0] - d[0]) ** 2 + (a[1] - d[1]) ** 2],
        [b[0] - d[0], b[1] - d[1], (b[0] - d[0]) ** 2 + (b[1] - d[1]) ** 2],
        [c[0] - d[0], c[1] - d[1], (c[0] - d[0]) ** 2 + (c[1] - d[1]) ** 2],
    ])
    return np.linalg.det(m) > 1e-9


def test_delaunay_empty_circumcircle_property():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.0, 10.0, size=(40, 2))
    faces = native.delaunay(pts, bbox=(-1, -1, 11, 11))
    allpts = np.concatenate(
        [np.array([[-1, -1], [11, -1], [-1, 11], [11, 11]]), pts])
    assert len(faces) >= 2 * len(pts) * 0  # sanity
    # Delaunay invariant: no point strictly inside any triangle circumcircle.
    for f in faces[:: max(1, len(faces) // 50)]:
        a, b, c = allpts[f[0]], allpts[f[1]], allpts[f[2]]
        # orientation must be ccw
        det = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        assert det > 0
        for i, p in enumerate(allpts):
            if i in f:
                continue
            assert not _circumcircle_contains(a, b, c, p), (f, i)


def test_delaunay_covers_all_points():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0.0, 5.0, size=(25, 2))
    faces = native.delaunay(pts, bbox=(-1, -1, 6, 6))
    used = set(faces.reshape(-1).tolist())
    # every inserted point (ids 4..28) appears in some face
    for i in range(4, 29):
        assert i in used


def test_approximate_triangulation_ramp():
    # A planar ramp needs very few vertices (reference
    # gtest_triangulator.cc:115+).
    h = w = 64
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = 2.0 + 0.01 * xs + 0.02 * ys
    verts, faces = native.approximate_triangulation(depth)
    assert len(faces) > 0
    assert len(verts) < 0.02 * h * w  # far fewer vertices than pixels
    # Interpolation error small: check the plane is reproduced at vertices
    vx = verts[:, 0].astype(int)
    vy = verts[:, 1].astype(int)
    np.testing.assert_allclose(verts[:, 2], depth[vy, vx], rtol=1e-6)


def test_approximate_triangulation_step_refines_edge():
    # A depth step forces vertices along the discontinuity.
    h = w = 64
    depth = np.full((h, w), 2.0, np.float32)
    depth[:, 32:] = 4.0
    verts, faces = native.approximate_triangulation(depth)
    near_edge = np.abs(verts[:, 0] - 32) <= 2
    assert near_edge.sum() >= 4


def test_approximate_triangulation_empty_input():
    depth = np.zeros((32, 32), np.float32)
    verts, faces = native.approximate_triangulation(depth)
    assert len(verts) == 0 and len(faces) == 0


def test_simplify_reduces_faces_preserves_shape():
    # Dense grid mesh of a plane -> decimate -> vertices stay on the plane.
    n = 20
    ys, xs = np.mgrid[0:n, 0:n].astype(np.float32)
    verts = np.stack([xs.ravel(), ys.ravel(),
                      (0.3 * xs + 0.1 * ys).ravel()], axis=-1)
    faces = []
    for j in range(n - 1):
        for i in range(n - 1):
            v = j * n + i
            faces.append([v, v + 1, v + n])
            faces.append([v + 1, v + n + 1, v + n])
    faces = np.asarray(faces, np.int32)
    sv, sf = native.simplify_mesh(verts, faces, target_ratio=0.1)
    assert len(sf) <= 0.25 * len(faces)
    assert len(sf) > 0
    plane = 0.3 * sv[:, 0] + 0.1 * sv[:, 1]
    np.testing.assert_allclose(sv[:, 2], plane, atol=1e-3)
