"""Flat-valley experiment (VERDICT r4 #6): score the reference's
shading-mode depth map and the TPU build's under ONE objective.

PARITY.md reports a 1.28% median map-vs-map difference in shading mode
and explains it as "two solvers in different spots of the same flat
valley". This experiment tests that with numbers: fit a Surface to each
pipeline's final depth map, fit lighting to its normals (the joint
optimum over lighting given geometry), and evaluate the SAME energy —
IRLS-L1 data + pairwise + shading terms with the reference's weight
formulas (`lib/gauss_newton_step.cc:334-516`) — on the mutual valid
region. If both maps score within a few percent, the 1.28% map
difference is benign (same valley); a large gap would mean a real
modeling delta.

Inputs: the shading-mode maps saved by
`tools/parity_check.py --modes shading --save-maps DIR`.

Usage: python tools/flat_valley.py [--dim 360] [--maps DIR]
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np


def surface_energy(depth, scene, imgs_u8, main_id, sub_ids, scale=2):
    """(E_L1 per term class, pixel count) of a depth map under the
    shading-mode objective, geometry fitted at `scale`."""
    from smvs_tpu.pipeline import optimizer as O
    from smvs_tpu.pipeline.views import make_view
    from smvs_tpu.shading.lighting import fit_lighting
    from smvs_tpu.solver import gn
    from smvs_tpu.surface import state as S

    dtype = jnp.float64
    main = make_view(scene.cameras[main_id],
                     imgs_u8[main_id].astype(np.float32) / 255.0,
                     view_id=main_id, dtype=dtype)
    subs = [make_view(scene.cameras[i],
                      imgs_u8[i].astype(np.float32) / 255.0,
                      view_id=i, dtype=dtype) for i in sub_ids]

    surf = S.create_from_depth(jnp.asarray(depth, dtype), scale)
    view = O._build_viewset(main, subs, scale, True, dtype)

    shading_img, _ = main.shading_images()
    nmap = S.normal_map(surf, 1.0 / main.flen())
    lighting = fit_lighting(nmap, shading_img.astype(dtype))

    ny, nx = surf.num_patches_y, surf.num_patches_x
    sampling = gn._sampling_for_scale(scale)
    px, py = gn._patch_pixel_coords(surf, sampling)
    params = S.patch_params(surf).reshape(ny * nx, 16)
    gm = gn.extract_patch_pixels(view.grad_main, surf, sampling).reshape(
        ny * nx, -1, 2)
    pix_u = jnp.asarray(px.reshape(ny * nx, -1) + 0.5, dtype)
    pix_v = jnp.asarray(py.reshape(ny * nx, -1) + 0.5, dtype)
    basis = __import__("smvs_tpu.surface.bicubic",
                       fromlist=["pixel_basis"]).pixel_basis(
        surf.patchsize, sampling, dtype=dtype)
    vis = jnp.ones((len(sub_ids),), dtype)
    opts = gn.GNOptions(regularization=0.01,
                        light_surf_regularization=0.0)

    pvalid = np.asarray(surf.patch_valid).reshape(-1)

    def residuals_for(i):
        vals = jnp.einsum("pkm,m->pk", basis, params[i])
        r, w = gn._patch_residuals(
            vals, pix_u[i], pix_v[i], gm[i], vis, view, lighting, opts,
            surf.width, surf.height, want_weights=True)
        return r, w

    n_sub = len(sub_ids)
    n_pairs = n_sub * (n_sub - 1) // 2
    C_data = 2 * n_sub + 2 * n_pairs

    res_fn = jax.jit(jax.vmap(residuals_for))
    idx = jnp.arange(ny * nx)
    r, w = res_fn(idx)
    r = np.array(r)
    w = np.array(w)
    r[~pvalid] = 0.0
    w[~pvalid] = 0.0

    # Energy: IRLS-reweighted squared residuals (= the objective each GN
    # step linearizes; ~ L1 away from the floor) and raw |r| sums.
    e_w = (w * r * r).sum(axis=(0, 1))
    parts = {
        "data_wsq": float(e_w[:C_data].sum()),
        "reg_wsq": float(e_w[C_data:C_data + 6].sum()),
        "shading_wsq": float(e_w[C_data + 6:].sum()),
    }
    parts["total_wsq"] = float(e_w.sum())
    parts["patches"] = int(pvalid.sum())
    return parts, np.asarray(surf.patch_valid)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=360)
    ap.add_argument("--maps", default=None)
    args = ap.parse_args()

    import struct
    import subprocess

    from smvs_tpu.core.synthetic import make_plane_scene

    maps_dir = args.maps or f"/tmp/parity_maps_{args.dim}"
    ref_p = os.path.join(maps_dir, "shading_ref.npy")
    if not os.path.exists(ref_p):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "parity_check.py"),
             "--dim", str(args.dim), "--modes", "shading",
             "--platform", "cpu", "--save-maps", maps_dir],
            check=True, env=env, timeout=3600)
    ref = np.load(ref_p)
    tpu = np.load(os.path.join(maps_dir, "shading_tpu.npy"))
    gt = np.load(os.path.join(maps_dir, "shading_gt.npy"))

    scene = make_plane_scene(n_views=3, dim=args.dim)
    scene_dir = f"/tmp/parity_shading_{args.dim}"

    def load_u8(i):
        with open(os.path.join(scene_dir, f"view{i}.img"), "rb") as f:
            w, h = struct.unpack("<ii", f.read(8))
            return np.frombuffer(f.read(), np.uint8).reshape(h, w)

    imgs = [load_u8(i) for i in range(3)]

    # Score each map on its own geometry; restrict to the mutual valid
    # region so coverage differences don't skew the energies.
    mutual = (ref > 0) & (tpu > 0)
    ref_m = np.where(mutual, ref, 0.0)
    tpu_m = np.where(mutual, tpu, 0.0)
    # A GT control: the energy of the true geometry (same fitting error).
    gt_m = np.where(mutual, gt, 0.0)

    out = {"dim": args.dim, "mutual_coverage": float(mutual.mean())}
    for name, d in (("ref", ref_m), ("tpu", tpu_m), ("gt", gt_m)):
        parts, _ = surface_energy(d, scene, imgs, 1, [0, 2])
        out[name] = parts
        print(f"{name}: {parts}", file=sys.stderr, flush=True)
    out["ref_over_tpu_total"] = round(
        out["ref"]["total_wsq"] / out["tpu"]["total_wsq"], 4)
    out["gt_over_tpu_total"] = round(
        out["gt"]["total_wsq"] / out["tpu"]["total_wsq"], 4)
    rel = np.abs(ref_m[mutual] - tpu_m[mutual]) / np.maximum(
        tpu_m[mutual], 1e-12)
    out["median_map_rel_diff"] = float(np.median(rel))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
