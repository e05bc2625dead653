"""Write the bench.py synthetic scene in a raw format for bench_reference.

Emits, per view i: view{i}.img (int32 w, h + uint8 grayscale data) and
view{i}.cam (text: flen / rot 9 / trans 3), plus gt1.bin (float64 z-depth
of view 1, the main view) — the exact same scene `bench.py` measures the
TPU pipeline on (same RNG, texture, cameras, slope law).
"""

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smvs_tpu.core.synthetic import make_two_view_scene  # noqa: E402


def write_scene(scene, out_dir, init=None):
    os.makedirs(out_dir, exist_ok=True)
    for i, (cam, img) in enumerate(zip(scene.cameras, scene.images)):
        u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        with open(os.path.join(out_dir, f"view{i}.img"), "wb") as f:
            f.write(struct.pack("<ii", u8.shape[1], u8.shape[0]))
            f.write(u8.tobytes())
        with open(os.path.join(out_dir, f"view{i}.cam"), "w") as f:
            f.write(f"{float(cam.flen)!r}\n")
            f.write(" ".join(repr(float(v))
                             for v in cam.rot.reshape(-1)) + "\n")
            f.write(" ".join(repr(float(v)) for v in cam.trans) + "\n")
    for i, d in enumerate(scene.depths):
        if d is None:
            continue
        gt = np.asarray(d, np.float64)
        with open(os.path.join(out_dir, f"gt{i}.bin"), "wb") as f:
            f.write(struct.pack("<ii", gt.shape[1], gt.shape[0]))
            f.write(gt.tobytes())
    if init is not None:
        init = np.asarray(init, np.float64)
        with open(os.path.join(out_dir, "init.bin"), "wb") as f:
            f.write(struct.pack("<ii", init.shape[1], init.shape[0]))
            f.write(init.tobytes())


def make_sphere(out_dir):
    """The shading e2e scene (Lambertian sphere + blurred-GT init)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from smvs_tpu.core.synthetic import make_lambertian_sphere_scene
    from smvs_tpu.image import ops as iops

    scene = make_lambertian_sphere_scene(n_views=3, dim=200)
    gt = np.asarray(scene.depths[1])
    gt_j = jnp.asarray(np.where(gt > 0, gt, 0.0))
    init = np.where(gt > 0, np.asarray(
        iops.gaussian_blur(jnp.where(gt_j > 0, gt_j, 3.9), 6.0)), 0.0)
    write_scene(scene, out_dir, init=init)
    print(f"sphere scene written to {out_dir}")


def make_plane(out_dir):
    """3-view textured plane at SMVS_BENCH_DIM — the flagship (-S, 2
    neighbors) bench scene shared by bench.py's shading pass."""
    from smvs_tpu.core.synthetic import make_plane_scene

    dim = int(os.environ.get("SMVS_BENCH_DIM", "1440"))
    scene = make_plane_scene(n_views=3, dim=dim)
    write_scene(scene, out_dir)
    gts = np.stack([d for d in scene.depths])
    lo = float(gts[gts > 0].min())
    hi = float(gts.max())
    print(f"plane scene written to {out_dir} (dim={dim}, "
          f"depth range [{lo:.3f}, {hi:.3f}])")


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/smvs_baseline_scene"
    if len(sys.argv) > 2 and sys.argv[2] == "sphere":
        make_sphere(out_dir)
        return
    if len(sys.argv) > 2 and sys.argv[2] == "plane":
        make_plane(out_dir)
        return
    dim = int(os.environ.get("SMVS_BENCH_DIM", "1440"))
    os.makedirs(out_dir, exist_ok=True)

    slope = 0.005 * 460.0 / dim  # bench.py's resolution-independent geometry
    scene = make_two_view_scene(
        dim=dim, rotate=True, texture="noise",
        depth_fn=lambda i, j: 5.0 + slope * i + slope * j)

    for i, (cam, img) in enumerate(zip(scene.cameras, scene.images)):
        u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        with open(os.path.join(out_dir, f"view{i}.img"), "wb") as f:
            f.write(struct.pack("<ii", u8.shape[1], u8.shape[0]))
            f.write(u8.tobytes())
        with open(os.path.join(out_dir, f"view{i}.cam"), "w") as f:
            f.write(f"{float(cam.flen)!r}\n")
            f.write(" ".join(repr(float(v)) for v in cam.rot.reshape(-1)) + "\n")
            f.write(" ".join(repr(float(v)) for v in cam.trans) + "\n")

    gt = np.asarray(scene.depths[1], np.float64)
    with open(os.path.join(out_dir, "gt1.bin"), "wb") as f:
        f.write(struct.pack("<ii", gt.shape[1], gt.shape[0]))
        f.write(gt.tobytes())
    print(f"scene written to {out_dir} (dim={dim})")


if __name__ == "__main__":
    main()
