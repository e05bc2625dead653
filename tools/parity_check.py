"""Reference-vs-TPU output parity (VERDICT r02 #5).

Runs the reference's own pipeline (baseline/build/bench_reference, the
unmodified `lib/*.cc` sources) AND the smvs_tpu pipeline on the SAME
scene with the SAME u8-quantized images and options, then diffs the two
depth maps directly:

- mutual coverage and coverage vs the analytic ground truth,
- median / mean absolute relative depth difference on common pixels,
- the fraction of common pixels where the TPU depth lies within 2x the
  reference's own per-pixel GT error (the "reference-equivalent" bound),
- median relative GT error for both pipelines.

Covers the base mode (two-view, SGM init) and the flagship -S mode
(3-view textured plane, 2 neighbors, shading term). Prints one JSON line
per mode; paste the numbers into PARITY.md.

Usage:
    python tools/parity_check.py [--dim 720] [--modes base,shading]
"""

import argparse
import json
import os
import struct
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def load_f32(path):
    with open(path, "rb") as f:
        w, h = struct.unpack("<ii", f.read(8))
        return np.frombuffer(f.read(w * h * 4), np.float32).reshape(h, w)


def load_u8_img(path):
    with open(path, "rb") as f:
        w, h = struct.unpack("<ii", f.read(8))
        return np.frombuffer(f.read(w * h), np.uint8).reshape(h, w)


def compare(name, ref, tpu, gt, t_ref, t_tpu):
    both = (ref > 0) & (tpu > 0)
    gt_ok = gt > 0
    out = {
        "mode": name,
        "coverage_ref": round(float((ref > 0).mean()), 4),
        "coverage_tpu": round(float((tpu > 0).mean()), 4),
        "mutual_coverage": round(float(both.mean()), 4),
        "t_ref_s": round(t_ref, 2),
        "t_tpu_s": round(t_tpu, 2),
    }
    if both.any():
        rel = np.abs(ref[both] - tpu[both]) / np.maximum(ref[both], 1e-9)
        out["median_rel_diff"] = round(float(np.median(rel)), 6)
        out["mean_rel_diff"] = round(float(rel.mean()), 6)
        # reference-equivalent bound: TPU error <= 2x the reference's own
        # per-pixel GT error (with an absolute floor of 0.1% to not divide
        # by the reference's zero-error pixels).
        m = both & gt_ok
        err_ref = np.abs(ref[m] - gt[m]) / gt[m]
        err_tpu = np.abs(tpu[m] - gt[m]) / gt[m]
        bound = np.maximum(2.0 * err_ref, 1e-3)
        out["pct_within_2x_ref_err"] = round(
            float((err_tpu <= bound).mean()), 4)
    for tag, d in (("ref", ref), ("tpu", tpu)):
        m = (d > 0) & gt_ok
        if m.any():
            out[f"median_gt_err_{tag}"] = round(float(np.median(
                np.abs(d[m] - gt[m]) / gt[m])), 6)
    return out


def run_reference(scene_dir, args_extra, dump):
    exe = os.path.join(ROOT, "baseline", "build", "bench_reference")
    if not os.path.exists(exe):
        subprocess.run(["make", "-j2"], cwd=os.path.join(ROOT, "baseline"),
                       check=True, capture_output=True)
    t0 = time.time()
    r = subprocess.run([exe, scene_dir, "--dump", dump] + args_extra,
                       capture_output=True, text=True, check=True)
    print(f"reference: {r.stdout.strip()}", file=sys.stderr)
    return time.time() - t0


def tpu_pipeline(scene, imgs_u8, main_id, sub_ids, sweep, min_scale,
                 shading):
    import jax.numpy as jnp

    from smvs_tpu.pipeline import optimizer as O
    from smvs_tpu.pipeline.views import make_view
    from smvs_tpu.sgm import stereo as sgm

    views = [make_view(scene.cameras[i], imgs_u8[i].astype(np.float32)
                       / 255.0, view_id=i)
             for i in range(len(imgs_u8))]
    main_v = views[main_id]
    subs = [views[i] for i in sub_ids]
    np.asarray(main_v.image[0, 0])

    t0 = time.time()
    acc = None
    for s in subs[:2]:
        d = np.asarray(sgm.reconstruct_auto(
            scene.cameras[main_id], scene.cameras[s.view_id],
            main_v.image * 255.0, s.image * 255.0,
            range_main=sweep, range_nbr=sweep))
        if acc is None:
            acc = d
        else:
            both = (acc > 0) & (d > 0)
            only2 = (acc == 0) & (d > 0)
            acc = np.where(both, (acc + d) * 0.5, np.where(only2, d, acc))
    sgm_depth = jnp.asarray(acc)

    opts = O.OptimizerOptions(
        regularization=0.01, light_surf_regularization=0.0,
        num_iterations=5, min_scale=min_scale, use_sgm=True,
        use_shading=shading, full_optimization=False,
        precond=os.environ.get("SMVS_PRECOND", O.OptimizerOptions.precond),
    )
    result = O.optimize_view(main_v, subs, opts, sgm_depth=sgm_depth)
    depth = np.asarray(result.depth)
    return depth, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int,
                    default=int(os.environ.get("SMVS_BENCH_DIM", "720")))
    ap.add_argument("--modes", default="base,shading")
    ap.add_argument("--platform", default=None,
                    help="cpu to force jax onto CPU")
    ap.add_argument("--save-maps", default=None,
                    help="directory to np.save the ref/tpu/gt maps into")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache_dir = os.path.join(ROOT, ".jax_cache")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"parity: dim={args.dim} devices={jax.devices()}",
          file=sys.stderr)

    os.environ["SMVS_BENCH_DIM"] = str(args.dim)
    results = []

    if "base" in args.modes:
        from smvs_tpu.core.synthetic import make_two_view_scene

        scene_dir = f"/tmp/parity_base_{args.dim}"
        subprocess.run([sys.executable,
                        os.path.join(ROOT, "baseline", "make_scene.py"),
                        scene_dir], check=True, env=os.environ)
        slope = 0.005 * 460.0 / args.dim
        scene = make_two_view_scene(
            dim=args.dim, rotate=True, texture="noise",
            depth_fn=lambda i, j: 5.0 + slope * i + slope * j)
        imgs = [load_u8_img(os.path.join(scene_dir, f"view{i}.img"))
                for i in range(2)]
        dump = os.path.join(scene_dir, "ref_depth.bin")
        t_ref = run_reference(scene_dir, ["--min-depth", "3.5",
                                          "--max-depth", "9.5"], dump)
        tpu, t_tpu = tpu_pipeline(scene, imgs, 1, [0], (3.5, 9.5), 2,
                                  False)
        gt = np.asarray(scene.depths[1])
        ref_map = load_f32(dump)
        if args.save_maps:
            os.makedirs(args.save_maps, exist_ok=True)
            np.save(os.path.join(args.save_maps, "base_ref.npy"), ref_map)
            np.save(os.path.join(args.save_maps, "base_tpu.npy"), tpu)
            np.save(os.path.join(args.save_maps, "base_gt.npy"), gt)
        results.append(compare("base", ref_map, tpu, gt, t_ref,
                               t_tpu))

    if "shading" in args.modes:
        from smvs_tpu.core.synthetic import make_plane_scene

        scene_dir = f"/tmp/parity_shading_{args.dim}"
        subprocess.run([sys.executable,
                        os.path.join(ROOT, "baseline", "make_scene.py"),
                        scene_dir, "plane"], check=True, env=os.environ)
        scene = make_plane_scene(n_views=3, dim=args.dim)
        imgs = [load_u8_img(os.path.join(scene_dir, f"view{i}.img"))
                for i in range(3)]
        dump = os.path.join(scene_dir, "ref_depth_S.bin")
        t_ref = run_reference(
            scene_dir, ["--shading", "--sub", "0", "--sub", "2",
                        "--min-depth", "3.4", "--max-depth", "6.6"], dump)
        tpu, t_tpu = tpu_pipeline(scene, imgs, 1, [0, 2], (3.4, 6.6), 2,
                                  True)
        gt = np.asarray(scene.depths[1])
        ref_map = load_f32(dump)
        if args.save_maps:
            os.makedirs(args.save_maps, exist_ok=True)
            np.save(os.path.join(args.save_maps, "shading_ref.npy"), ref_map)
            np.save(os.path.join(args.save_maps, "shading_tpu.npy"), tpu)
            np.save(os.path.join(args.save_maps, "shading_gt.npy"), gt)
        results.append(compare("shading", ref_map, tpu, gt, t_ref,
                               t_tpu))

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
