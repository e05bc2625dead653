"""r5 coverage: does half-res SGM init (the reference app's default,
sgm_scale=1) recover the border ring?"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", os.environ.get("PLATFORM", "cpu"))
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".jax_cache_cpu" if os.environ.get("PLATFORM", "cpu")
                 == "cpu" else ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools"))
from parity_check import load_u8_img  # noqa: E402

from smvs_tpu.core.synthetic import make_two_view_scene  # noqa: E402
from smvs_tpu.image import ops as iops  # noqa: E402
from smvs_tpu.pipeline import optimizer as O  # noqa: E402
from smvs_tpu.pipeline.views import make_view  # noqa: E402
from smvs_tpu.sgm import stereo as sgm  # noqa: E402


def main():
    dim = 720
    slope = 0.005 * 460.0 / dim
    scene = make_two_view_scene(
        dim=dim, rotate=True, texture="noise",
        depth_fn=lambda i, j: 5.0 + slope * i + slope * j)
    imgs = [load_u8_img(os.path.join(f"/tmp/parity_base_{dim}",
                                     f"view{i}.img")) for i in range(2)]
    views = [make_view(scene.cameras[i], imgs[i].astype(np.float32) / 255.0,
                       view_id=i) for i in range(2)]

    # --- SGM at HALF RES (reference app default sgm_scale=1,
    # `app/smvsrecon.cc:61, 693-709`), nearest-upsampled like the
    # reference's bilateral filter consumes it ---------------------------
    half = [np.asarray(iops.rescale_half_size_gaussian(
        jnp.asarray(imgs[i].astype(np.float32)))) for i in range(2)]
    hh, hw = half[0].shape
    cam_h = [scene.cameras[i] for i in range(2)]
    d_half = np.asarray(sgm.reconstruct_auto(
        cam_h[1], cam_h[0], jnp.asarray(half[1]), jnp.asarray(half[0]),
        range_main=(3.5, 9.5), range_nbr=(3.5, 9.5)))
    yy = (np.arange(dim) * hh / dim).astype(int)
    xx = (np.arange(dim) * hw / dim).astype(int)
    d_up = d_half[yy][:, xx]
    print(f"half-res SGM coverage {np.mean(d_half > 0):.3f} "
          f"upsampled {np.mean(d_up > 0):.3f}", file=sys.stderr)

    opts = O.OptimizerOptions(
        regularization=0.01, num_iterations=5, min_scale=2, use_sgm=True,
        full_optimization=False)
    result = O.optimize_view(views[1], [views[0]], opts,
                             sgm_depth=jnp.asarray(d_up))
    tpu = np.asarray(result.depth)
    gt = np.asarray(scene.depths[1])
    ref = np.load("/tmp/parity_maps_720/base_ref.npy")
    mask = tpu > 0
    rel = np.abs(tpu[mask] - gt[mask]) / gt[mask]
    print(json.dumps({
        "sgm": "half-res",
        "coverage": round(float(mask.mean()), 4),
        "median_rel_err": float(np.median(rel)),
        "missing_vs_ref": int(((ref > 0) & ~mask).sum()),
    }), flush=True)


if __name__ == "__main__":
    main()
