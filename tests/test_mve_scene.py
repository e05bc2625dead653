"""End-to-end on a realistic MVE-toolchain scene layout (VERDICT r3 #6).

`test_cli.py` proves the CLI round-trips scenes written by OUR writer;
this file layers on everything a scene produced by MVE's `makescene` +
`sfmrecon` contains that ours does not (reference loads arbitrary MVE
scenes at `app/smvsrecon.cc:399-421`):

- `original.jpg` photo embeddings next to `undistorted`,
- binary blob files (`exif.blob`) that image loading must ignore,
- a distorted-only view (no camera: `focal_length = 0`) that the driver
  must skip (`app/smvsrecon.cc:484-489` skips views without the input
  embedding/camera),
- meta.ini keys beyond the ones we parse,
- non-contiguous view ids,
- and the legacy single-file `.mve` container, which must fail loudly
  with upgrade guidance instead of silently dropping the view.
"""

import os

import numpy as np
import pytest

from smvs_tpu import cli
from smvs_tpu.core import scene as sc
from smvs_tpu.core.synthetic import make_two_view_scene, save_as_mve_scene
from smvs_tpu.mesh.ply import load_ply

pytestmark = pytest.mark.slow


def _make_realistic_scene(path):
    scene = make_two_view_scene(dim=128, rotate=True)
    save_as_mve_scene(scene, str(path))

    from PIL import Image

    for entry in sorted(os.listdir(path / "views")):
        vdir = path / "views" / entry
        # makescene keeps the original photo as a JPEG embedding
        img = np.asarray(Image.open(vdir / "undistorted.png"))
        Image.fromarray(img).save(vdir / "original.jpg", quality=92)
        # EXIF is stored as a binary blob; loaders must not trip on it
        (vdir / "exif.blob").write_bytes(b"\x00\x01MVE_BLOB\xff" * 16)
        # keys written by real MVE that our parser does not consume
        meta = (vdir / "meta.ini").read_text()
        meta = meta.replace(
            "[view]", "distortion = 0.1 0.05\n\n[view]", 1)
        (vdir / "meta.ini").write_text(meta)

    # a distorted-only view: original photo, no camera (sfmrecon failed
    # to register it) — must be skipped, not crash the driver
    nodir = path / "views" / "view_0009.mve"
    os.makedirs(nodir)
    Image.fromarray(np.zeros((16, 16), np.uint8)).save(
        nodir / "original.jpg")
    (nodir / "meta.ini").write_text(
        "# MVE view meta data is stored in INI-file syntax.\n\n"
        "[camera]\nfocal_length = 0\n\n[view]\nid = 9\nname = unreg\n")
    return scene


def test_cli_on_realistic_mve_layout(tmp_path):
    path = tmp_path / "scene"
    scene = _make_realistic_scene(path)

    loaded = sc.Scene.load(str(path))
    assert len(loaded.views) == 3  # 2 registered + 1 unregistered
    assert sum(v.camera is not None for v in loaded.views) == 2
    # blob/photo files are not reported as image embeddings of interest
    reg = [v for v in loaded.views if v.camera is not None][0]
    assert "undistorted" in reg.embedding_names()
    assert "exif" not in reg.embedding_names()

    rc = cli.main([str(path), "--min-neighbors", "1", "-o", "4", "-d", "0"])
    assert rc == 0
    ply_path = os.path.join(str(path), "smvs-B0.ply")
    assert os.path.exists(ply_path)
    ps = load_ply(ply_path)
    assert len(ps.vertices) > 200

    # fused points agree with the analytic ground truth of view 1
    cam = scene.cameras[1]
    p_cam = ps.vertices @ cam.rot.T + cam.trans
    uv = cam.project(p_cam, scene.width, scene.height)
    inb = ((uv[:, 0] >= 0) & (uv[:, 0] < scene.width)
           & (uv[:, 1] >= 0) & (uv[:, 1] < scene.height) & (p_cam[:, 2] > 0))
    xi = np.clip(uv[inb, 0].astype(int), 0, scene.width - 1)
    yi = np.clip(uv[inb, 1].astype(int), 0, scene.height - 1)
    gt = scene.depths[1][yi, xi]
    ok = gt > 0
    rel = np.abs(p_cam[inb][ok, 2] - gt[ok]) / gt[ok]
    assert np.median(rel) < 0.02, f"median fused error {np.median(rel):.4f}"


def test_corrupt_legacy_container_fails_loudly(tmp_path):
    path = tmp_path / "scene"
    _make_realistic_scene(path)
    legacy = path / "views" / "view_0005.mve"
    legacy.write_bytes(b"\x89MVE\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ValueError):
        sc.Scene.load(str(path))


def test_legacy_single_file_container_roundtrip(tmp_path):
    """A synthesized legacy single-file view container loads (VERDICT r4
    stretch #10; reference loads any MVE scene via mve::Scene,
    `/root/reference/app/smvsrecon.cc:399-421`) and Scene.save upgrades
    it to the modern directory layout in place."""
    path = tmp_path / "scene"
    _make_realistic_scene(path)
    loaded = sc.Scene.load(str(path))
    src = loaded.views[0]
    img = np.asarray(src.get_image("undistorted"))
    depth = (np.arange(64, dtype=np.float32).reshape(8, 8) + 1.0) / 7.0
    legacy_view = sc.View(view_id=97, name="legacy97", camera=src.camera)
    legacy_view.set_image("undistorted", img)
    legacy_view.set_image("smvs-sgm", depth)
    legacy_path = path / "views" / "view_0097.mve"
    sc.save_legacy_mve(legacy_view, str(legacy_path))

    scene2 = sc.Scene.load(str(path))
    got = [v for v in scene2.views if v.view_id == 97]
    assert len(got) == 1, "legacy view not loaded"
    v = got[0]
    assert v.name == "legacy97"
    np.testing.assert_array_equal(np.asarray(v.get_image("undistorted")), img)
    np.testing.assert_array_equal(np.asarray(v.get_image("smvs-sgm")), depth)
    assert v.camera is not None
    np.testing.assert_allclose(v.camera.rot, src.camera.rot)
    np.testing.assert_allclose(v.camera.trans, src.camera.trans)
    assert v.camera.flen == src.camera.flen

    # sceneupgrade-style conversion: save writes the directory layout,
    # keeps the original container as .orig, and a reload round-trips.
    scene2.save()
    assert (path / "views" / "view_0097.mve").is_dir()
    assert (path / "views" / "view_0097.mve.orig").is_file()
    scene3 = sc.Scene.load(str(path))
    v3 = [w for w in scene3.views if w.view_id == 97][0]
    np.testing.assert_allclose(np.asarray(v3.get_image("smvs-sgm")), depth)
