"""End-to-end CLI test: synthetic MVE scene on disk -> smvsrecon -> PLY.

Counterpart of the reference's full `smvsrecon` invocation
(`app/smvsrecon.cc:388-752`), including the embedding checkpoint/rerun
semantics."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from smvs_tpu.core.synthetic import make_two_view_scene, save_as_mve_scene
from smvs_tpu import cli
from smvs_tpu.mesh.ply import load_ply


@pytest.fixture(scope="module")
def mve_scene(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("scene"))
    scene = make_two_view_scene(dim=160, rotate=True, texture="noise")
    save_as_mve_scene(scene, path)
    return path, scene


def test_cli_reconstructs_and_fuses(mve_scene):
    path, scene = mve_scene
    rc = cli.main([path, "--min-neighbors", "1", "-o", "4", "-d", "0"])
    assert rc == 0
    # per-view outputs checkpointed as embeddings
    assert os.path.exists(os.path.join(path, "views", "view_0000.mve",
                                       "smvs-B0.mvei"))
    assert os.path.exists(os.path.join(path, "views", "view_0001.mve",
                                       "smvs-sgm.mvei"))
    ply_path = os.path.join(path, "smvs-B0.ply")
    assert os.path.exists(ply_path)
    ps = load_ply(ply_path)
    assert len(ps.vertices) > 500
    assert ps.normals is not None and ps.values is not None

    # accuracy: project fused points into view 1, compare against analytic GT
    cam = scene.cameras[1]
    p_cam = ps.vertices @ cam.rot.T + cam.trans
    uv = cam.project(p_cam, scene.width, scene.height)
    inb = (uv[:, 0] >= 0) & (uv[:, 0] < scene.width) & \
        (uv[:, 1] >= 0) & (uv[:, 1] < scene.height) & (p_cam[:, 2] > 0)
    xi = np.clip(uv[inb, 0].astype(int), 0, scene.width - 1)
    yi = np.clip(uv[inb, 1].astype(int), 0, scene.height - 1)
    gt = scene.depths[1][yi, xi]
    ok = gt > 0
    rel = np.abs(p_cam[inb][ok, 2] - gt[ok]) / gt[ok]
    assert np.median(rel) < 0.02, f"median fused error {np.median(rel):.4f}"


def test_cli_resume_skips_reconstructed(mve_scene, capsys):
    path, _ = mve_scene
    rc = cli.main([path, "--min-neighbors", "1", "-o", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Skipping 2 views that are already reconstructed" in out


def test_cli_clean(mve_scene):
    path, _ = mve_scene
    rc = cli.main([path, "--clean", "--min-neighbors", "1"])
    assert rc == 0
    assert not os.path.exists(os.path.join(path, "views", "view_0000.mve",
                                           "smvs-B0.mvei"))


def test_cli_legacy_embedding_migration(mve_scene):
    """Legacy embeddings are migrated on load (reference
    `app/smvsrecon.cc:429-452`): debug embeddings removed, `sgm-depth`
    renamed to `smvs-sgm`."""
    from smvs_tpu.core import scene as sc

    path, _ = mve_scene
    scene = sc.Scene.load(path)
    v = scene.views[0]
    fake_sgm = np.full((8, 8), 2.5, np.float32)
    v.set_image("sgm-depth", fake_sgm)
    v.set_image("lighting-shaded", np.zeros((8, 8), np.float32))
    v.set_image("implicit-albedo", np.zeros((8, 8), np.float32))
    v.save()
    # has_embedding("smvs-sgm") would be satisfied by a stale result from an
    # earlier test; the fixture scene was cleaned by test_cli_clean above.
    assert not v.has_embedding("smvs-sgm")

    rc = cli.main([path, "--min-neighbors", "1", "-o", "4", "-r", "-l", "0"])
    assert rc == 0
    scene2 = sc.Scene.load(path)
    v2 = [w for w in scene2.views if w.view_id == v.view_id][0]
    assert not v2.has_embedding("sgm-depth")
    assert not v2.has_embedding("lighting-shaded")
    assert not v2.has_embedding("implicit-albedo")
    # migration preserved the legacy SGM payload under the new name...
    # unless reconstruction overwrote it at a different shape; either way
    # the embedding must exist.
    assert v2.has_embedding("smvs-sgm")


def test_resized_canvas_preserves_intrinsics():
    from smvs_tpu.core.camera import Camera

    rng = np.random.default_rng(0)
    q = rng.normal(size=(3, 3))
    u, _, vt = np.linalg.svd(q)
    cam = Camera(flen=1.2, rot=u @ vt, trans=np.array([0.3, -0.1, 0.05]))
    K = cam.calibration(1437, 1080)
    cam2 = cam.resized_canvas(1437, 1080, 1440, 1088)
    K2 = cam2.calibration(1440, 1088)
    np.testing.assert_allclose(K2, K, rtol=1e-12)


def test_cli_heterogeneous_sizes_share_bucket(tmp_path):
    """Views of different sizes are padded onto one canvas (exact camera
    adjustment) and reconstruct through the shared batched program
    (SURVEY section 7 hard part 5: no recompile per image size)."""
    from smvs_tpu.core import scene as sc

    path = str(tmp_path / "scene")
    scene = make_two_view_scene(dim=160, rotate=True, texture="noise")
    save_as_mve_scene(scene, path)
    # shrink view 0's image by a few pixels (right/bottom crop) and adjust
    # its stored camera for the smaller canvas
    loaded = sc.Scene.load(path)
    v0 = [v for v in loaded.views if v.view_id == 0][0]
    img = np.asarray(v0.get_image("undistorted"))[:153, :149]
    v0.set_image("undistorted", img)
    v0.camera = v0.camera.resized_canvas(160, 160, 149, 153)
    v0.save()
    # the bundle camera list stays as-is; view selection only needs
    # approximate footprints.
    rc = cli.main([path, "--min-neighbors", "1", "-o", "4",
                   "--pad-bucket", "32"])
    assert rc == 0
    ply_path = os.path.join(path, "smvs-B0.ply")
    ps = load_ply(ply_path)
    assert len(ps.vertices) > 400

    cam = scene.cameras[1]
    p_cam = ps.vertices @ cam.rot.T + cam.trans
    uv = cam.project(p_cam, scene.width, scene.height)
    inb = (uv[:, 0] >= 0) & (uv[:, 0] < scene.width) & \
        (uv[:, 1] >= 0) & (uv[:, 1] < scene.height) & (p_cam[:, 2] > 0)
    xi = np.clip(uv[inb, 0].astype(int), 0, scene.width - 1)
    yi = np.clip(uv[inb, 1].astype(int), 0, scene.height - 1)
    gt = scene.depths[1][yi, xi]
    ok = gt > 0
    rel = np.abs(p_cam[inb][ok, 2] - gt[ok]) / gt[ok]
    assert np.median(rel) < 0.02, f"median fused error {np.median(rel):.4f}"
