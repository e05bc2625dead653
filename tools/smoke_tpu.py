"""On-chip smoke gate: run every Pallas entry point and one mg-precond
Newton step at PRODUCTION sizes on the real TPU.

Round 2 shipped a Pallas kernel validated only in interpreter mode on CPU;
it OOMed the scoped VMEM budget at bench scale on the real chip and the
round lost its perf capture (VERDICT r02). This gate exists so that never
happens again: run it on the real TPU before every snapshot and record the
result in PERF_NOTES.md.

Usage:  python tools/smoke_tpu.py            # full gate (~1 min cached)
        SMOKE_DIM=480 python tools/smoke_tpu.py   # smaller/faster variant

Exit code 0 iff every stage ran on the TPU backend without error.
Prints one JSON line: {"ok": bool, "stages": {name: ms | "FAIL: ..."}}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force(x):
    import numpy as np

    return np.asarray(x.ravel()[0])


def main() -> int:
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"smoke: device={dev}", file=sys.stderr, flush=True)
    on_tpu = dev.platform == "tpu"
    if not on_tpu:
        print("smoke: WARNING not a TPU device — gate is meaningless",
              file=sys.stderr)

    dim = int(os.environ.get("SMOKE_DIM", "1440"))
    D = 128
    results = {}
    ok = True

    def stage(name, fn):
        nonlocal ok
        t0 = time.time()
        try:
            out = fn()
            force(out)
            t_first = time.time() - t0
            t0 = time.time()
            force(fn())
            dt = time.time() - t0
            results[name] = round(dt * 1e3, 1)
            print(f"smoke: {name}: {dt*1e3:.1f} ms (first {t_first:.1f}s)",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — the gate reports, not raises
            ok = False
            msg = str(e).split("\n")[0][:160]
            results[name] = f"FAIL {type(e).__name__}: {msg}"
            print(f"smoke: {name}: FAIL {msg}", file=sys.stderr, flush=True)

    # --- Pallas SGM aggregation at bench scale --------------------------
    # Test volumes are generated ON DEVICE (pseudo-random via hashed iota):
    # host->device transfer of a 1 GB cost volume through the axon tunnel
    # takes minutes and is not what this gate tests.
    from smvs_tpu.sgm import pallas_agg

    @jax.jit
    def make_volumes():
        key = jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        cost1 = jax.random.randint(k1, (dim, dim, D), 0, 126, jnp.int32)
        inten1 = jax.random.randint(k2, (dim, dim), 0, 255, jnp.int32)
        cost2 = jax.random.randint(k3, (2, dim, dim, D), 0, 126,
                                   jnp.int16)
        inten2 = jax.random.randint(k4, (2, dim, dim), 0, 255, jnp.int32)
        return cost1, inten1, cost2, inten2

    cost1, inten1, cost2, inten2 = make_volumes()
    force(inten2)

    stage("pallas_aggregate", lambda: pallas_agg.aggregate(
        cost1, inten1, 6, 96))

    stage("pallas_aggregate_batch", lambda: pallas_agg.aggregate_batch(
        cost2, inten2, 6, 96))

    # scan_direction: the single-direction spec kernel (parity surface)
    c_small = cost1[:256, :256]
    i_small = inten1[:256, :256]
    stage("pallas_scan_direction", lambda: pallas_agg.scan_direction(
        c_small, i_small, 1, 6, 96))

    # --- One mg-preconditioned Newton step at bench-scale-2 grid --------
    from smvs_tpu.dist.testing import make_single_view_problem
    from smvs_tpu.pipeline import optimizer as O

    surf, view, vis, active = make_single_view_problem(
        dim=min(dim, 480), scale=2)
    opts = O.OptimizerOptions(regularization=0.01, precond="mg")
    step = jax.jit(lambda s, vw, vi, a: O._newton_step(
        s, vw, vi, a, opts, None))
    stage("newton_step_mg", lambda: step(surf, view, vis, active)[0])

    # --- Compacted-assembly tier on-chip (VERDICT r3 missing #4) ---------
    # The fixed-capacity working-set compaction (gn.assemble capacity=B//16)
    # only RUNS once the active set shrinks mid-solve; a full-active smoke
    # never exercises it on the TPU backend. Activate only a corner block
    # so lax.cond takes the smallest tier at a production patch count
    # (120x120 patches at dim 480 / scale 2 -> B=14400 >= 4096).
    act_small = (jnp.zeros_like(active).at[:12, :12].set(True)
                 & surf.node_valid)
    B_patches = surf.num_patches_y * surf.num_patches_x
    if B_patches >= 4096:
        stage("newton_step_compacted",
              lambda: step(surf, view, vis, act_small)[0])
    else:
        # The lax.cond tier ladder only exists for B >= 4096
        # (optimizer.py `_newton_step`); below that the stage would pass
        # without tracing the compaction path at all (advisor r4).
        results["newton_step_compacted"] = {
            "skipped": f"B={B_patches} < 4096: compaction tiers not "
                       "traced at this dim; raise SMOKE_DIM"}
        print("smoke: newton_step_compacted: SKIPPED (B < 4096)",
              file=sys.stderr, flush=True)

    # --- Batched (vmapped) pipeline on-chip (VERDICT r3 missing #4) ------
    # The DP view-batch scale programs had only ever run on the CPU
    # backend (tests) — run a tiny 2-view group end-to-end on the chip.
    from smvs_tpu.core.synthetic import make_plane_scene
    from smvs_tpu.pipeline import batch as Bp
    from smvs_tpu.pipeline.views import make_view

    scene = make_plane_scene(n_views=3, dim=240)
    views = [make_view(scene.cameras[i], scene.images[i], view_id=i)
             for i in range(3)]
    bmains = [views[0], views[2]]
    bsubs = [[views[1]], [views[1]]]
    binits = [jnp.asarray(scene.depths[i] * 1.02, jnp.float32)
              for i in (0, 2)]
    bopts = O.OptimizerOptions(regularization=0.01, num_iterations=2,
                               min_scale=4, use_sgm=False,
                               full_optimization=True, max_newton_steps=8)
    stage("batched_pipeline",
          lambda: Bp.optimize_view_batch(bmains, bsubs, bopts,
                                         init_depths=binits)[0].depth)

    print(json.dumps({"ok": ok, "tpu": on_tpu, "dim": dim,
                      "stages": results}))
    return 0 if (ok and on_tpu) else 1


if __name__ == "__main__":
    sys.exit(main())
