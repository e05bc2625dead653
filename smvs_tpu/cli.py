"""smvsrecon-compatible command line driver.

TPU-native counterpart of reference `app/smvsrecon.cc`: loads an MVE scene,
selects neighbors per view, runs SGM initialization and the shading-aware
depth optimizer per view (checkpointed as `smvs-*` embeddings), and fuses
all depth maps into a point cloud / mesh PLY.

Flag names mirror the reference (`app/smvsrecon.cc:85-140`); the added
``--platform`` selects the JAX backend.

Usage: python -m smvs_tpu.cli [OPTS] SCENE_DIR
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="smvsrecon", description="Shading aware Multi-View Stereo (TPU)")
    p.add_argument("scene", help="MVE scene directory")
    p.add_argument("-a", "--alpha", type=float, default=1.0,
                   help="Regularization parameter [1]")
    p.add_argument("-s", "--scale", type=int, default=-1,
                   help="Scale of input images [auto to <=1.7MP]")
    p.add_argument("-i", "--image", default="undistorted",
                   help="Image embedding [undistorted]")
    p.add_argument("-n", "--neighbors", type=int, default=6)
    p.add_argument("-o", "--output-scale", type=int, default=2)
    p.add_argument("-l", "--list-view", default="",
                   help="view IDs, e.g. \"0-10\" or \"1,3,5\"")
    p.add_argument("-t", "--threads", type=int, default=0,
                   help="accepted for smvsrecon compatibility; parallelism "
                        "comes from the device mesh")
    p.add_argument("-d", "--debug-lvl", type=int, default=0)
    p.add_argument("-r", "--recon-only", action="store_true")
    p.add_argument("-M", "--max-pixels", type=int, default=1700000)
    p.add_argument("-S", "--shading", action="store_true")
    p.add_argument("-R", "--regularize-lighting", type=float, default=0.0)
    p.add_argument("-g", "--gamma-srgb", action="store_true")
    p.add_argument("-m", "--mesh", action="store_true",
                   help="triangle mesh instead of point cloud")
    p.add_argument("-y", "--simplify", action="store_true")
    p.add_argument("-f", "--force", action="store_true")
    p.add_argument("--no-cut", action="store_true")
    p.add_argument("--aabb", default="")
    p.add_argument("--min-neighbors", type=int, default=3)
    p.add_argument("--no-sgm", action="store_true")
    p.add_argument("--force-sgm", action="store_true")
    p.add_argument("--sgm-scale", type=int, default=1)
    p.add_argument("--sgm-range", default="",
                   help="depth sweep range \"min,max\"")
    p.add_argument("--full-opt", action="store_true")
    p.add_argument("--clean", action="store_true")
    p.add_argument("--platform", default="",
                   help="JAX platform override (e.g. cpu)")
    p.add_argument("--batch-views", type=int, default=4,
                   help="reconstruct up to N same-shaped views as one "
                        "batched SPMD program (1 = sequential)")
    p.add_argument("--pad-bucket", type=int, default=32,
                   help="pad working images (edge mode, exact camera "
                        "adjustment) up to multiples of N pixels so "
                        "heterogeneous sizes share compiled programs "
                        "(1 = off)")
    return p


def parse_view_list(spec: str, n: int) -> list[int]:
    if not spec:
        return list(range(n))
    out: list[int] = []
    for part in spec.split(","):
        if "-" in part:
            a, b = part.split("-")
            out += list(range(int(a), int(b) + 1))
        else:
            out.append(int(part))
    return out


def main(argv=None) -> int:
    conf = build_parser().parse_args(argv)
    import jax

    # Surface depths need true f32 matmuls; the TPU MXU default
    # (bf16 passes) quantizes depth enough to break the boundary
    # cutting thresholds.
    jax.config.update("jax_default_matmul_precision", "highest")
    if conf.platform:
        import jax

        jax.config.update("jax_platforms", conf.platform)

    import jax.numpy as jnp

    from smvs_tpu.core import scene as sc
    from smvs_tpu.core.camera import depth_mve_to_z, depth_z_to_mve
    from smvs_tpu.image import ops as iops
    from smvs_tpu.mesh import pointcloud as pc
    from smvs_tpu.mesh.ply import save_ply
    from smvs_tpu.pipeline import optimizer as O
    from smvs_tpu.pipeline import view_selection as vs
    from smvs_tpu.pipeline.views import make_view
    from smvs_tpu.sgm import stereo as sgm

    scene = sc.Scene.load(conf.scene)
    views = scene.views
    if not views:
        print(f"error: no views in {conf.scene}", file=sys.stderr)
        return 1
    bundle = scene.bundle
    use_sgm = not conf.no_sgm
    sgm_range = None
    if conf.sgm_range:
        lo, hi = conf.sgm_range.split(",")
        sgm_range = (float(lo), float(hi))
    if bundle is None:
        print("Cannot load bundle file, forcing SGM.")
        use_sgm = True
        if sgm_range is None:
            print("Error: no bundle and no --sgm-range given.",
                  file=sys.stderr)
            return 1

    # ---- legacy-embedding migration (reference `app/smvsrecon.cc:429-452`):
    # drop pre-release debug embeddings and rename `sgm-depth` -> `smvs-sgm`.
    for v in views:
        for legacy in ("lighting-shaded", "lighting-sphere",
                       "implicit-albedo"):
            if v.has_embedding(legacy):
                v.remove_embedding(legacy)
        if v.has_embedding("sgm-depth") and not v.has_embedding("smvs-sgm"):
            v.set_image("smvs-sgm", np.asarray(v.get_image("sgm-depth")))
            v.remove_embedding("sgm-depth")
            if v.path:
                v.save()

    if conf.clean:
        print("Cleaning scene, removing all result embeddings.")
        scene.clean_embeddings()
        return 0

    by_id = {v.view_id: v for v in views}
    view_ids = [i for i in parse_view_list(conf.list_view,
                                           max(by_id) + 1)
                if i in by_id and by_id[i].camera is not None
                and by_id[i].has_embedding(conf.image)]

    # ---- input scale (reference `app/smvsrecon.cc:476-501`) ---------------
    # Sizes for EVERY view with an input image (not just the -l list):
    # view selection and the downscale pass cover neighbor views too.
    all_input_ids = [v.view_id for v in views
                     if v.camera is not None and v.has_embedding(conf.image)]
    sizes = {}
    for i in all_input_ids:
        img = by_id[i].get_image(conf.image)
        sizes[i] = img.shape[:2]
    if conf.scale < 0:
        avg = np.mean([h * w for (h, w) in
                       ((sizes[i]) for i in view_ids)])
        conf.scale = int(np.ceil(np.log2(avg / conf.max_pixels) / 2)) \
            if avg > conf.max_pixels else 0
        print(f"Automatic input scale: {conf.scale}")
    input_name = (f"undist-L{conf.scale}" if conf.scale > 0 else conf.image)
    output_name = ("smvs-S" if conf.shading else "smvs-B") + str(conf.scale)
    print(f"Input embedding: {input_name}")
    print(f"Output embedding: {output_name}")

    # ---- downscale inputs (reference :613-650) ----------------------------
    for i in all_input_ids:
        v = by_id[i]
        if conf.scale > 0 and not v.has_embedding(input_name):
            img = np.asarray(v.get_image(conf.image), np.float32)
            if img.dtype == np.uint8 or img.max() > 1.5:
                img = img / 255.0
            x = jnp.asarray(img)
            if x.ndim == 3:
                x = jnp.moveaxis(x, -1, 0)
            for _ in range(conf.scale):
                x = iops.rescale_half_size_gaussian(x)
            if x.ndim == 3:
                x = jnp.moveaxis(x, 0, -1)
            v.set_image(input_name,
                        np.clip(np.asarray(x) * 255, 0, 255).astype(np.uint8))

    # ---- view selection (reference :560-611) ------------------------------
    cam_list = [by_id[i].camera if i in by_id else None
                for i in range(max(by_id) + 1)]
    size_list = []
    for i in range(max(by_id) + 1):
        if i in sizes:
            h, w = sizes[i]
            size_list.append((w, h))
        else:
            size_list.append((0, 0))
    neighbors = {}
    for i in view_ids:
        nbrs = vs.get_neighbors_for_view(
            cam_list, size_list, bundle, i,
            vs.ViewSelectionOptions(num_neighbors=conf.neighbors))
        nbrs = [n for n in nbrs if n in by_id]
        if len(nbrs) < conf.min_neighbors:
            print(f"View {i}: only {len(nbrs)} neighbors, skipping.")
            continue
        neighbors[i] = nbrs

    recon_list = [i for i in neighbors
                  if conf.force or not by_id[i].has_embedding(output_name)]
    skipped = len(neighbors) - len(recon_list)
    if skipped:
        print(f"Skipping {skipped} views that are already reconstructed.")

    # ---- per-view reconstruction (reference :652-735) ---------------------
    def load_gray(i):
        img = np.asarray(by_id[i].get_image(input_name), np.float64)
        if img.max() > 1.5:
            img = img / 255.0
        return img.astype(np.float32)

    quantum = max(1, conf.pad_bucket)

    def padded_dims(h, w):
        return (-(-h // quantum) * quantum, -(-w // quantum) * quantum)

    def working_dims(i):
        h, w = sizes[i]
        if conf.scale > 0:
            for _ in range(conf.scale):
                h, w = (h + 1) // 2, (w + 1) // 2
        return h, w

    # One shared canvas (max padded working dims over all views): neighbor
    # image stacks need equal shapes, and a single canvas maximizes
    # compiled-program sharing across a heterogeneous scene — the
    # shape-bucketing policy of SURVEY section 7, hard part 5.
    if quantum > 1:
        all_wd = [working_dims(i) for i in all_input_ids] or [(0, 0)]
        canvas = padded_dims(max(h for h, _ in all_wd),
                             max(w for _, w in all_wd))
    else:
        canvas = None

    def stereo_view(i):
        img = load_gray(i)
        cam = by_id[i].camera
        h, w = img.shape[:2]
        ph, pw = canvas if canvas is not None else (h, w)
        if (ph, pw) != (h, w):
            pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (img.ndim - 2)
            img = np.pad(img, pad, mode="edge")
            cam = cam.resized_canvas(w, h, pw, ph)
        return make_view(cam, img, view_id=i,
                         gamma_correction=conf.gamma_srgb)

    def padded_gray(i):
        """Working image on the shared canvas + the adjusted camera."""
        img = load_gray(i)
        cam = by_id[i].camera
        h, w = img.shape[:2]
        ph, pw = canvas if canvas is not None else (h, w)
        if (ph, pw) != (h, w):
            img = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
            cam = cam.resized_canvas(w, h, pw, ph)
        return img, cam

    def prepare_init(i, oh, ow, h, w):
        """SGM (checkpointed) or bundle-splat init for view i.

        (oh, ow) are the original working dims, (h, w) the padded canvas.
        SGM runs on the canvas (exactly-adjusted cameras), so its depth
        upsamples straight to (h, w); a checkpointed `smvs-sgm` embedding
        from an unpadded run is upsampled to (oh, ow) and zero-padded.
        """
        sgm_depth = None
        init_depth = None
        if use_sgm:
            if conf.force_sgm or not by_id[i].has_embedding("smvs-sgm"):
                sgm_depth = reconstruct_sgm(conf, by_id, i, neighbors[i],
                                            padded_gray, bundle, sgm_range)
                by_id[i].set_image(
                    "smvs-sgm",
                    np.asarray(depth_z_to_mve(
                        np.asarray(sgm_depth, np.float64),
                        by_id[i].camera.inverse_calibration(
                            *sgm_depth.shape[::-1]))).astype(np.float32))
            else:
                raw = np.asarray(by_id[i].get_image("smvs-sgm"), np.float64)
                sgm_depth = depth_mve_to_z(
                    raw, by_id[i].camera.inverse_calibration(
                        raw.shape[1], raw.shape[0]))
            sgm_depth = np.asarray(sgm_depth, np.float32)
            sh, sw = sgm_depth.shape
            # Does the checkpointed map cover the padded canvas or only the
            # original working area (written by an unpadded/older run)?
            covers_canvas = abs(sh * (2**conf.sgm_scale) - h) <= \
                (2**conf.sgm_scale) and (h, w) != (oh, ow)
            th, tw = (h, w) if covers_canvas or (h, w) == (oh, ow) \
                else (oh, ow)
            if (sh, sw) != (th, tw):  # upsample to working res
                yy = (np.arange(th) * sh / th).astype(int)
                xx = (np.arange(tw) * sw / tw).astype(int)
                sgm_depth = sgm_depth[yy][:, xx]
            if sgm_depth.shape != (h, w):
                sgm_depth = np.pad(sgm_depth, ((0, h - sgm_depth.shape[0]),
                                               (0, w - sgm_depth.shape[1])))
            sgm_depth = jnp.asarray(sgm_depth)
        else:
            init_depth = bundle.splat_depth_map(i, by_id[i].camera, ow, oh)
            if (h, w) != (oh, ow):
                init_depth = np.pad(init_depth,
                                    ((0, h - oh), (0, w - ow)))
            init_depth = jnp.asarray(init_depth)
        return sgm_depth, init_depth

    def write_result(i, result, oh, ow):
        # Crop the padded canvas back to the view's working resolution.
        depth = np.asarray(result.depth, np.float64)[:oh, :ow]
        normals = np.asarray(result.normals, np.float32)[:oh, :ow]
        inv_cal = by_id[i].camera.inverse_calibration(ow, oh)
        by_id[i].set_image(output_name, np.asarray(
            depth_z_to_mve(depth, inv_cal), np.float32))
        by_id[i].set_image(output_name + "N", normals)
        if scene.path:
            by_id[i].save()

    opts = O.OptimizerOptions(
        regularization=0.01 * conf.alpha,
        light_surf_regularization=conf.regularize_lighting,
        num_iterations=5,
        min_scale=conf.output_scale,
        use_shading=conf.shading,
        use_sgm=use_sgm,
        full_optimization=conf.full_opt,
        debug_lvl=conf.debug_lvl,
    )
    log = print if conf.debug_lvl > 0 else None

    # Group same-shaped views into buckets; each bucket of >= 2 views runs
    # through the batched SPMD pipeline (the reference's per-view thread
    # fanout, `app/smvsrecon.cc:558`, mapped to the views mesh axis).
    from smvs_tpu.pipeline import batch as VB

    def working_dims(i):
        h, w = sizes[i]
        if conf.scale > 0:
            for _ in range(conf.scale):
                h, w = (h + 1) // 2, (w + 1) // 2
        return h, w

    buckets: dict = {}
    for i in recon_list:
        h, w = working_dims(i)
        buckets.setdefault((*padded_dims(h, w), len(neighbors[i])),
                           []).append(i)

    t_all = time.time()
    for key, ids in buckets.items():
        # Cap the vmapped group by working megapixels: the batched scale
        # programs hold B view-problems' worth of solver state live, and
        # past ~3 MP total the XLA batch pipeline additionally picks a
        # pathological stencil layout (32x tile padding -> HBM OOM at
        # 4 x 2 MP, measured r5 on the 49-view DTU scene). Sequential
        # views in a bucket still share compiled programs.
        mp = key[0] * key[1] / 1e6
        fit = max(1, int(float(os.environ.get("SMVS_BATCH_MP", "3.0"))
                         // mp))
        group_size = max(1, min(conf.batch_views, fit))
        for lo in range(0, len(ids), group_size):
            group = ids[lo : lo + group_size]
            t0 = time.time()
            mains = [stereo_view(i) for i in group]
            subs_list = [[stereo_view(n) for n in neighbors[i]]
                         for i in group]
            orig_dims = [working_dims(i) for i in group]
            inits = [prepare_init(i, oh, ow, m.height, m.width)
                     for i, (oh, ow), m in zip(group, orig_dims, mains)]
            if len(group) >= 2 and conf.debug_lvl <= 1:
                results = VB.optimize_view_batch(
                    mains, subs_list, opts,
                    sgm_depths=[s for s, _ in inits] if use_sgm else None,
                    init_depths=None if use_sgm else [d for _, d in inits],
                    log=log)
            else:
                results = []
                for m, subs, (sgm_d, init_d), i in zip(
                        mains, subs_list, inits, group):
                    debug_sink = None
                    if conf.debug_lvl > 1:
                        def debug_sink(name, img, _v=by_id[i]):
                            _v.set_image(name, np.asarray(img, np.float32))
                    results.append(O.optimize_view(
                        m, subs, opts, init_depth=init_d, sgm_depth=sgm_d,
                        log=log, debug_sink=debug_sink))
            for i, result, (oh, ow) in zip(group, results, orig_dims):
                write_result(i, result, oh, ow)
            print(f"Views {group} done in {time.time()-t0:.1f}s "
                  f"({key[2]} neighbors, "
                  f"{'batched' if len(group) >= 2 else 'sequential'})")
    print(f"Reconstruction took {time.time()-t_all:.1f}s")

    if conf.recon_only:
        return 0

    # ---- fusion (reference `generate_mesh`, :278-343) ---------------------
    depths, normals, cams, colors = [], [], [], []
    for i in sorted(neighbors):
        v = by_id[i]
        if not v.has_embedding(output_name):
            continue
        raw = np.asarray(v.get_image(output_name), np.float64)
        ic = v.camera.inverse_calibration(raw.shape[1], raw.shape[0])
        depths.append(depth_mve_to_z(raw, ic))
        normals.append(np.asarray(v.get_image(output_name + "N"), np.float32))
        cams.append(v.camera)
        colors.append(load_gray(i))
    ps = pc.fuse_views(depths, normals, cams, colors,
                       pc.FusionOptions(cut_surfaces=not conf.no_cut,
                                        create_triangle_mesh=conf.mesh,
                                        simplify=conf.simplify))
    if conf.aabb:
        vals = [float(x) for x in conf.aabb.split(",")]
        ps = pc.clip_aabb(ps, vals[:3], vals[3:])
    mesh_name = ("smvs-" + ("m-" if conf.mesh else "")
                 + ("S" if conf.shading else "B") + f"{conf.scale}.ply")
    out_path = os.path.join(scene.path or ".", mesh_name)
    save_ply(out_path, ps)
    print(f"Saved {len(ps.vertices)} points to {out_path}")
    return 0


def reconstruct_sgm(conf, by_id, i, nbrs, padded_gray, bundle, sgm_range):
    """SGM of up to 2 neighbors, averaged (reference `app/smvsrecon.cc:347-384`).

    Runs on the shared padded canvas (`padded_gray` returns image +
    exactly-adjusted camera) so heterogeneous view sizes share one
    compiled sweep.
    """
    import jax.numpy as jnp

    from smvs_tpu.sgm import stereo as sgm

    def at_sgm_scale(img):
        from smvs_tpu.image import ops as iops

        x = jnp.asarray(img * 255.0)
        for _ in range(conf.sgm_scale):
            x = iops.rescale_half_size(x)
        return x

    img_i, cam_i = padded_gray(i)
    main_img = at_sgm_scale(img_i)
    h, w = main_img.shape

    def depth_range(view_id, cam, width, height):
        if sgm_range is not None:
            return sgm_range
        d = bundle.feature_depths_for_view(view_id, cam, width, height)
        return sgm.depth_range_from_features(d)

    opts = sgm.SGMOptions(scale=conf.sgm_scale, debug_lvl=conf.debug_lvl)
    cams, imgs, ranges = [], [], []
    for n in nbrs[:2]:
        img_n, cam_n = padded_gray(n)
        nb_img = at_sgm_scale(img_n)
        hn, wn = nb_img.shape
        cams.append(cam_n)
        imgs.append(nb_img)
        ranges.append(depth_range(n, cam_n, wn, hn))
    # <=2 neighbors averaged, fused into one device program when the
    # pair geometry allows (reference app:347-384).
    return np.asarray(sgm.reconstruct_auto_multi(
        cam_i, cams, main_img, imgs,
        range_main=depth_range(i, cam_i, w, h), ranges_nbr=ranges,
        opts=opts))


if __name__ == "__main__":
    sys.exit(main())
