"""Benchmark: per-chip depth-map reconstruction throughput.

Runs the full per-view pipeline (SGM plane-sweep init + coarse-to-fine
Gauss-Newton surface optimization) on a synthetic two-view scene on the
default device (the real TPU chip under the driver), and reports megapixels
of depth map reconstructed per second.

The first pass warms the persistent compilation cache (kept in
``.jax_cache/`` so later rounds reuse it); the reported number is the
steady-state second pass.

Baseline: MEASURED from the reference's own pipeline code compiled and run
single-threaded (its per-view work unit) on this exact scene and options —
see baseline/README.md and baseline/BASELINE_MEASURED.json. Falls back to
the round-1 estimate if the measurement file is missing.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def baseline_cpu_mps() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "baseline", "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            return float(json.load(f)["result"]["mps_single_thread"])
    except (OSError, KeyError, ValueError):
        return 0.033  # round-1 estimate (2 MP / 60 s per thread)


BASELINE_CPU_MPS = baseline_cpu_mps()


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_shading_once(dim, min_scale, verbose=True):
    """Flagship configuration: shading-aware (-S) with 2 neighbors on the
    3-view textured plane scene (the reference's headline mode runs -S
    with multiple neighbors, `app/smvsrecon.cc:52, 713`)."""
    import jax.numpy as jnp
    import numpy as np

    from smvs_tpu.core.synthetic import make_plane_scene
    from smvs_tpu.pipeline import optimizer as O
    from smvs_tpu.pipeline.views import make_view
    from smvs_tpu.sgm import stereo as sgm

    scene = make_plane_scene(n_views=3, dim=dim)
    views = [make_view(scene.cameras[i], scene.images[i], view_id=i)
             for i in range(3)]
    main_v = views[1]
    subs = [views[0], views[2]]
    for v in views:  # ALL images resident before the clock starts (the
        np.asarray(v.image[0, 0])  # ~8MB tunnel uploads are not compute)

    t0 = time.time()
    # SGM of the 2 neighbors, averaged (reference app:347-384) — one
    # fused device program for both pairs (sgm.reconstruct_auto_multi).
    sgm_depth = sgm.reconstruct_auto_multi(
        scene.cameras[1], [scene.cameras[s.view_id] for s in subs],
        main_v.image * 255.0, [s.image * 255.0 for s in subs],
        (3.4, 6.6), [(3.4, 6.6)] * len(subs))
    np.asarray(sgm_depth[0, 0])
    t_sgm = time.time() - t0

    t0 = time.time()
    opts = O.OptimizerOptions(
        regularization=0.01, light_surf_regularization=0.0,
        num_iterations=5, min_scale=min_scale, use_sgm=True,
        use_shading=True, full_optimization=False,
        precond=os.environ.get("SMVS_PRECOND",
                               O.OptimizerOptions.precond),
    )
    result = O.optimize_view(main_v, subs, opts, sgm_depth=sgm_depth,
                             log=log if verbose else None)
    np.asarray(result.depth[0, 0])
    t_opt = time.time() - t0

    depth = np.asarray(result.depth)
    mask = depth > 0
    gt = scene.depths[1]
    rel = np.abs(depth[mask] - gt[mask]) / gt[mask]
    return t_sgm, t_opt, float(mask.mean()), float(np.median(rel))


def run_once(dim, min_scale, verbose=True):
    import jax.numpy as jnp
    import numpy as np

    from smvs_tpu.core.synthetic import make_two_view_scene
    from smvs_tpu.pipeline import optimizer as O
    from smvs_tpu.pipeline.views import make_view
    from smvs_tpu.sgm import stereo as sgm

    # Resolution-independent geometry: the default depth plane of
    # make_two_view_scene slopes per *pixel* (5 + 0.005*(i+j), the
    # reference harness convention at ~460px); at larger dims that runs
    # past the SGM sweep range. Fix the world geometry, vary only the
    # sampling resolution, so MP/s numbers are comparable across dims.
    slope = 0.005 * 460.0 / dim
    scene = make_two_view_scene(
        dim=dim, rotate=True, texture="noise",
        depth_fn=lambda i, j: 5.0 + slope * i + slope * j)
    main_v = make_view(scene.cameras[1], scene.images[1], view_id=1)
    sub_v = make_view(scene.cameras[0], scene.images[0], view_id=0)

    # ALL images resident before the clock starts (the ~8MB per-image
    # tunnel uploads are IO, not compute; the measured reference baseline
    # likewise excludes image loading).
    np.asarray(main_v.image[0, 0])
    np.asarray(sub_v.image[0, 0])

    t0 = time.time()
    # Reuse the device-resident view images (one upload per image, shared
    # with the optimizer) — the CLI pipeline does the same.
    sgm_depth = sgm.reconstruct_auto(
        scene.cameras[1], scene.cameras[0],
        main_v.image * 255.0, sub_v.image * 255.0,
        range_main=(3.5, 9.5), range_nbr=(3.5, 9.5),
    )
    np.asarray(sgm_depth[0, 0])  # force completion (block_until_ready is
    t_sgm = time.time() - t0  # unreliable under the axon tunnel)

    t0 = time.time()
    opts = O.OptimizerOptions(
        regularization=0.01, num_iterations=5, min_scale=min_scale,
        use_sgm=True, full_optimization=False,
        precond=os.environ.get("SMVS_PRECOND",
                               O.OptimizerOptions.precond),
    )
    result = O.optimize_view(main_v, [sub_v], opts, sgm_depth=sgm_depth,
                             log=log if verbose else None)
    np.asarray(result.depth[0, 0])  # force (see above)
    t_opt = time.time() - t0

    depth = np.asarray(result.depth)
    mask = depth > 0
    gt = scene.depths[1]
    rel = np.abs(depth[mask] - gt[mask]) / gt[mask]
    return t_sgm, t_opt, float(mask.mean()), float(np.median(rel))


def _retry(fn, *args, tries=2, **kw):
    """One retry for transient axon-tunnel failures (observed r4:
    'remote_compile: response body closed' killing an otherwise-green
    run mid-bench; the compile cache makes the retry cheap)."""
    for attempt in range(tries):
        try:
            return fn(*args, **kw)
        except Exception as e:  # noqa: BLE001 - last attempt re-raises
            if attempt + 1 == tries:
                raise
            log(f"transient failure ({type(e).__name__}: {e}); retrying")


def _measure(tag, fn, dim, min_scale, passes):
    """Median/min/max MP/s over `passes` silent measured passes.

    r3 shipped single-pass numbers whose run-to-run spread (base
    0.92-1.05 MP/s) was larger than the effects being decided on
    (VERDICT r3 weak #5); the median over >=3 passes is the headline.
    """
    mp = dim * dim / 1e6
    mps, cov, err = [], None, None
    for i in range(passes):
        t_sgm, t_opt, cov, err = _retry(fn, dim, min_scale,
                                         verbose=False)
        mps.append(mp / (t_sgm + t_opt))
        log(f"{tag} pass {i + 1}/{passes}: sgm={t_sgm:.2f}s "
            f"opt={t_opt:.2f}s -> {mps[-1]:.3f} MP/s "
            f"(coverage={cov:.1%} median_err={err:.5f})")
    mps.sort()
    return {
        "mps": round(mps[len(mps) // 2], 4),
        "mps_min": round(mps[0], 4),
        "mps_max": round(mps[-1], 4),
        "passes": passes,
        "coverage": round(cov, 4),
        "median_rel_err": round(err, 6),
    }


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Default to ~2MP: the reference's documented working resolution
    # (`app/smvsrecon.cc:48` max_pixels=1.7e6, README "around 2MP").
    dim = int(os.environ.get("SMVS_BENCH_DIM", "1440"))
    min_scale = int(os.environ.get("SMVS_BENCH_MIN_SCALE", "2"))
    passes = int(os.environ.get("SMVS_BENCH_PASSES", "3"))
    log(f"bench: devices={jax.devices()} dim={dim} min_scale={min_scale}")

    log("warmup pass (populates compile cache)...")
    t0 = time.time()
    _retry(run_once, dim, min_scale)
    log(f"warmup took {time.time()-t0:.1f}s")

    base = _measure("base", run_once, dim, min_scale, passes)
    base["neighbors"] = 1
    mps = base["mps"]
    coverage, med_err = base["coverage"], base["median_rel_err"]
    log(f"base: {base}")

    log("flagship (-S, 2 neighbors) warmup...")
    t0 = time.time()
    _retry(run_shading_once, dim, min_scale)
    log(f"shading warmup took {time.time()-t0:.1f}s")
    shading = _measure("shading", run_shading_once, dim, min_scale, passes)
    shading["neighbors"] = 2
    s_mps, s_cov, s_err = (shading["mps"], shading["coverage"],
                           shading["median_rel_err"])
    log(f"shading: {shading}")

    shading_baseline = None
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "baseline", "BASELINE_MEASURED.json")
        with open(path) as f:
            shading_baseline = json.load(f)["shading_flagship"][
                "mps_single_thread"]
    except (OSError, KeyError, ValueError):
        pass

    shading["vs_baseline"] = (None if not shading_baseline
                              else round(s_mps / shading_baseline, 2))
    print(json.dumps({
        "metric": "depth_map_throughput",
        "value": mps,
        "unit": "MP/s",
        "vs_baseline": round(mps / BASELINE_CPU_MPS, 2),
        "base": base,
        "shading_flagship": shading,
    }))


if __name__ == "__main__":
    main()
