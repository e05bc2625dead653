"""Demo: reconstruct depth for a synthetic two-view scene.

Runs the full smvs_tpu pipeline end-to-end — SGM plane-sweep
initialization, then coarse-to-fine Gauss-Newton surface optimization —
and reports accuracy against the analytic ground-truth depth.

Usage:  python examples/two_view_demo.py [--platform cpu|tpu] [--sgm]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--sgm", action="store_true",
                    help="initialize from SGM instead of a coarse plane")
    ap.add_argument("--dim", type=int, default=232)
    ap.add_argument("--min-scale", type=int, default=4)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # else: keep the environment's platform (the TPU may be registered
    # under a plugin-specific name, e.g. JAX_PLATFORMS=axon here).

    import jax.numpy as jnp
    import numpy as np
    from smvs_tpu.core.synthetic import make_two_view_scene
    from smvs_tpu.pipeline import optimizer as O
    from smvs_tpu.pipeline.views import make_view
    from smvs_tpu.sgm import stereo as sgm
    from smvs_tpu.surface import state as S

    print(f"devices: {jax.devices()}")
    scene = make_two_view_scene(dim=args.dim, rotate=True,
                                texture="noise" if args.sgm else "checker")
    main_v = make_view(scene.cameras[1], scene.images[1], view_id=1)
    sub_v = make_view(scene.cameras[0], scene.images[0], view_id=0)
    gt = scene.depths[1]

    t0 = time.time()
    sgm_depth = None
    init_surface = None
    if args.sgm:
        sgm_depth = sgm.reconstruct_auto(
            scene.cameras[1], scene.cameras[0],
            jnp.asarray(scene.images[1] * 255.0),
            jnp.asarray(scene.images[0] * 255.0),
            range_main=(3.5, 9.0), range_nbr=(3.5, 9.0),
        )
        cov = float((np.asarray(sgm_depth) > 0).mean())
        print(f"SGM done in {time.time()-t0:.1f}s, coverage {cov:.1%}")
    else:
        init_surface = S.create_planar(6.0, main_v.width, main_v.height, 5)

    opts = O.OptimizerOptions(
        regularization=0.001,
        num_iterations=10 if not args.sgm else 5,
        min_scale=args.min_scale,
        use_sgm=args.sgm,
        full_optimization=True,
        max_newton_steps=50,
    )
    t0 = time.time()
    result = O.optimize_view(main_v, [sub_v], opts,
                             sgm_depth=sgm_depth,
                             init_surface=init_surface,
                             log=print)
    depth = np.asarray(result.depth)
    mask = depth > 0
    rel = np.abs(depth[mask] - gt[mask]) / gt[mask]
    print(f"optimization took {time.time()-t0:.1f}s")
    print(f"coverage:            {mask.mean():.1%}")
    print(f"median depth error:  {np.median(rel):.4%}")
    print(f"90th pct error:      {np.percentile(rel, 90):.4%}")
    return 0 if np.median(rel) < 0.01 else 1


if __name__ == "__main__":
    sys.exit(main())
