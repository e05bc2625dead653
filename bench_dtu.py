"""DTU-scale end-to-end scene benchmark (BASELINE.md configs 3-4;
VERDICT r4 #2).

Generates a 49-view, ~2MP synthetic scan (7x7 camera grid over an
analytically-textured plane, MIXED view sizes so the CLI's shape
bucketing must form >= 2 buckets), writes it as an on-disk MVE scene,
and reconstructs it TWICE through the real `cli.main` batch path —
a cold pass (fresh process state, compile-cache loads included) and a
warm `--force` pass (all programs resident). This is the first proof the
bucketing + prewarm + batching machinery survives production scale
(reference analog: the per-view thread fanout at `app/smvsrecon.cc:
652-735`).

Prints ONE JSON line. Env: SMVS_DTU_VIEWS (49), SMVS_DTU_DIM (1440),
SMVS_DTU_DIM2 (1280), SMVS_DTU_SHADING (0), SMVS_DTU_SCALE (0 = work at
full resolution like bench.py; the reference default would auto-pick 1).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_dtu_scene(n_views, dims):
    """7xN camera grid over the analytic plane with per-view image dims.

    Same world model as `make_plane_scene` (exact per-pixel rendering, no
    resampling) with cameras on a 2D grid and per-view resolutions.
    """
    import numpy as np

    from smvs_tpu.core.camera import Camera
    from smvs_tpu.core.synthetic import SyntheticScene

    plane = (0.0, 0.05, 0.1, 5.0)
    nrm = np.array([plane[0], plane[1], 1.0])
    nrm /= np.linalg.norm(nrm)
    d_off = plane[3]

    def texture(x, y):
        return (
            0.55
            + 0.18 * np.sin(2.1 * x) * np.sin(1.7 * y)
            + 0.12 * np.sin(5.3 * x + 1.0) * np.cos(4.1 * y)
            + 0.08 * np.cos(9.7 * x - 2.0) * np.sin(8.3 * y + 0.7)
        )

    cols = 7
    rows = (n_views + cols - 1) // cols
    cameras = []
    for i in range(n_views):
        gx = i % cols - (cols - 1) / 2
        gy = i // cols - (rows - 1) / 2
        yaw = 0.03 * gx
        pitch = 0.02 * gy
        cy, sy = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        rot = (np.array([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]])
               @ np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]]))
        cam_pos = np.array([0.12 * gx, 0.10 * gy, 0.0])
        cameras.append(Camera(flen=1.0, rot=rot, trans=-rot @ cam_pos))

    images, depths = [], []
    for i, cam in enumerate(cameras):
        dim = dims[i]
        xs, ys = np.meshgrid(np.arange(dim), np.arange(dim), indexing="xy")
        inv = cam.inverse_calibration(dim, dim)
        dir_cam = np.stack(
            [inv[0, 0] * (xs + 0.5) + inv[0, 2],
             inv[1, 1] * (ys + 0.5) + inv[1, 2],
             np.ones_like(xs, dtype=np.float64)], axis=-1)
        dir_world = dir_cam @ cam.rot
        C = cam.cam_position()
        s = (d_off - nrm @ C) / (dir_world @ nrm)
        P = C + s[..., None] * dir_world
        depths.append(s.copy())
        images.append(texture(P[..., 0], P[..., 1]).astype(np.float32))
    return SyntheticScene(cameras=cameras, images=images, depths=depths,
                          width=dims[-1], height=dims[-1])


def measure_accuracy(scene_dir, scene, output_name):
    import numpy as np

    from smvs_tpu.core import scene as sc
    from smvs_tpu.core.camera import depth_mve_to_z

    loaded = sc.Scene.load(scene_dir)
    covs, errs, mp = [], [], 0.0
    for v in loaded.views:
        if not v.has_embedding(output_name):
            continue
        raw = np.asarray(v.get_image(output_name), np.float64)
        ic = v.camera.inverse_calibration(raw.shape[1], raw.shape[0])
        depth = depth_mve_to_z(raw, ic)
        gt = scene.depths[v.view_id]
        if depth.shape != gt.shape:  # working-scale output: pool GT
            f = gt.shape[0] // depth.shape[0]
            gt = gt[::f, ::f][: depth.shape[0], : depth.shape[1]]
        mask = depth > 0
        mp += depth.size / 1e6
        covs.append(float(mask.mean()))
        if mask.any():
            rel = np.abs(depth[mask] - gt[mask]) / gt[mask]
            errs.append(float(np.median(rel)))
    return (float(np.mean(covs)) if covs else 0.0,
            float(np.median(errs)) if errs else -1.0, mp, len(covs))


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from smvs_tpu import cli
    from smvs_tpu.core.synthetic import save_as_mve_scene

    n_views = int(os.environ.get("SMVS_DTU_VIEWS", "49"))
    dim1 = int(os.environ.get("SMVS_DTU_DIM", "1440"))
    dim2 = int(os.environ.get("SMVS_DTU_DIM2", "1280"))
    shading = os.environ.get("SMVS_DTU_SHADING", "0") == "1"
    in_scale = os.environ.get("SMVS_DTU_SCALE", "0")
    scene_dir = os.environ.get("SMVS_DTU_DIR", "/tmp/dtu_scene")

    # Mixed sizes: ~70/30 split forces two shape buckets.
    dims = [dim1 if (i % 10) < 7 else dim2 for i in range(n_views)]
    log(f"dtu bench: {n_views} views, dims {dim1}({dims.count(dim1)})/"
        f"{dim2}({dims.count(dim2)}), shading={shading}, "
        f"devices={jax.devices()}")

    t0 = time.time()
    scene = make_dtu_scene(n_views, dims)
    if not os.path.isdir(os.path.join(scene_dir, "views")):
        save_as_mve_scene(scene, scene_dir)
    log(f"scene generated+saved in {time.time()-t0:.1f}s -> {scene_dir}")

    args = [scene_dir, "-s", in_scale, "-n", "2", "--min-neighbors", "1",
            "-o", "2", "-r"]
    if shading:
        args.append("-S")
    # CLI names outputs by INPUT scale (reference `smvs-{B,S}{s}`
    # convention, app/smvsrecon.cc:503-515).
    output_name = ("smvs-S" if shading else "smvs-B") + in_scale

    t0 = time.time()
    rc = cli.main(args + ["-f"])
    t_cold = time.time() - t0
    assert rc == 0, "cold pass failed"
    cov, err, mp, n_done = measure_accuracy(scene_dir, scene, output_name)
    log(f"cold: {t_cold:.1f}s, {n_done} views, cov {cov:.1%}, err {err:.5f}")

    t0 = time.time()
    rc = cli.main(args + ["-f"])
    t_warm = time.time() - t0
    assert rc == 0, "warm pass failed"

    out = {
        "metric": "dtu_scene_throughput",
        "value": round(n_views / t_warm, 4),
        "unit": "views/s",
        "views": n_views,
        "dims": [dim1, dim2],
        "shading": shading,
        "input_scale": in_scale,
        "mp_total": round(mp, 1),
        "t_cold_s": round(t_cold, 1),
        "t_warm_s": round(t_warm, 1),
        "cold_over_warm": round(t_cold / t_warm, 2),
        "warm_mps": round(mp / t_warm, 4),
        "cold_views_per_s": round(n_views / t_cold, 4),
        "coverage": round(cov, 4),
        "median_rel_err": round(err, 6),
    }
    log(f"warm: {t_warm:.1f}s -> {out['value']} views/s, "
        f"{out['warm_mps']} MP/s")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
