"""r5 coverage-gap ablation: which cut path deletes the border ring?

Runs the base parity config (dim 720) with one cut path disabled via
SMVS_ABLATE, reports coverage + GT err + how much of the reference-only
ring is recovered. Reference map from /tmp/parity_maps_720/base_ref.npy
(produced by tools/parity_check.py --save-maps).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools"))
from parity_check import load_u8_img, tpu_pipeline  # noqa: E402

from smvs_tpu.core.synthetic import make_two_view_scene  # noqa: E402


def main():
    dim = int(os.environ.get("DIM", "720"))
    scene_dir = f"/tmp/parity_base_{dim}"
    slope = 0.005 * 460.0 / dim
    scene = make_two_view_scene(
        dim=dim, rotate=True, texture="noise",
        depth_fn=lambda i, j: 5.0 + slope * i + slope * j)
    imgs = [load_u8_img(os.path.join(scene_dir, f"view{i}.img"))
            for i in range(2)]
    tpu, t = tpu_pipeline(scene, imgs, 1, [0], (3.5, 9.5), 2, False)
    gt = np.asarray(scene.depths[1])
    ref = np.load(f"/tmp/parity_maps_720/base_ref.npy")

    mask = tpu > 0
    rel = np.abs(tpu[mask] - gt[mask]) / gt[mask]
    miss = (ref > 0) & ~mask
    print(json.dumps({
        "ablate": os.environ.get("SMVS_ABLATE", ""),
        "coverage": round(float(mask.mean()), 4),
        "median_rel_err": float(np.median(rel)),
        "p90_rel_err": float(np.percentile(rel, 90)),
        "missing_vs_ref": int(miss.sum()),
        "t_s": round(t, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
