"""Scaling-efficiency harness for the view-batch path.

Measures throughput (Newton steps x views / second) of the sharded batched
step at different device counts — the multi-chip/multi-host scaling
measurement BASELINE.md asks for (>= 80% efficiency at 4 hosts). On real
hardware run under `jax.distributed`; on a dev box it validates the harness
over virtual devices.

Usage: python -m smvs_tpu.dist.scaling [--devices 1 2 4 8] [--views-per-dev 2]
"""

from __future__ import annotations

import argparse
import os
import time

if __name__ == "__main__":  # pragma: no cover - CLI entry setup
    # The container's sitecustomize imports jax at interpreter startup
    # targeting the tunneled TPU; flip to a virtual CPU mesh before any
    # computation runs (XLA_FLAGS may be too late if jax already chose a
    # backend — jax.config below handles the platform, the flag handles
    # the device count when honored).
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count="
            + os.environ.get("SMVS_SCALING_DEVICES", "8")).strip()

import jax

if __name__ == "__main__":  # pragma: no cover
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from smvs_tpu.dist import viewbatch
from smvs_tpu.dist.testing import make_view_batch
from smvs_tpu.solver import gn


def measure(n_devices: int, views_per_device: int, dim: int = 116,
            steps: int = 5) -> float:
    mesh = viewbatch.make_mesh(n_devices, patch_axis=1)
    n_views = n_devices * views_per_device
    template, batch = make_view_batch(n_views, dim=dim, scale=4)
    step = viewbatch.training_step_fn(template, gn.GNOptions(chunk=64), mesh)
    args = (batch["nodes"], batch["node_valid"], batch["patch_valid"],
            batch["vis"], batch["active"], batch["view"])
    out = step(*args)
    out.block_until_ready()  # compile
    t0 = time.time()
    nodes = batch["nodes"]
    for _ in range(steps):
        nodes = step(nodes, *args[1:])
    nodes.block_until_ready()
    dt = time.time() - t0
    return n_views * steps / dt


def measure_full_pipeline(n_devices: int, views_per_device: int,
                          dim: int = 96) -> float:
    """Views/second of the FULL batched coarse-to-fine pipeline
    (smvs_tpu.pipeline.batch) with views_per_device views per device."""
    import jax.numpy as jnp

    from smvs_tpu.core.synthetic import make_plane_scene
    from smvs_tpu.pipeline import batch as VB
    from smvs_tpu.pipeline import optimizer as O
    from smvs_tpu.pipeline.views import make_view

    mesh = VB.make_view_mesh(n_devices, patch_axis=1)
    n_views = n_devices * views_per_device
    scene = make_plane_scene(n_views=n_views + 1, dim=dim)
    views = [make_view(scene.cameras[i], scene.images[i], view_id=i)
             for i in range(n_views + 1)]
    center = n_views // 2
    mains, subs_list, inits = [], [], []
    for i in range(n_views + 1):
        if i == center or len(mains) == n_views:
            continue
        mains.append(views[i])
        subs_list.append([views[center]])
        inits.append(jnp.asarray(scene.depths[i] * 1.02, jnp.float32))
    opts = O.OptimizerOptions(regularization=0.01, num_iterations=2,
                              min_scale=4, use_sgm=False,
                              full_optimization=True, max_newton_steps=6)

    def run():
        out = VB.optimize_view_batch(mains, subs_list, opts,
                                     init_depths=inits, mesh=mesh)
        jax.block_until_ready([r.depth for r in out])

    run()  # compile
    t0 = time.time()
    run()
    return n_views / (time.time() - t0)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--views-per-dev", type=int, default=2)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--full", action="store_true",
                    help="measure the full batched pipeline, not one step")
    args = ap.parse_args(argv)
    avail = len(jax.devices())
    counts = args.devices or [d for d in (1, 2, 4, 8) if d <= avail]
    base = None
    print(f"devices available: {avail}")
    for n in counts:
        if args.full:
            thr = measure_full_pipeline(n, args.views_per_dev)
            unit = "views/s"
        else:
            thr = measure(n, args.views_per_dev, steps=args.steps)
            unit = "view-steps/s"
        if base is None:
            base = thr
        eff = thr / (base * n)
        print(f"  {n} devices: {thr:8.2f} {unit} "
              f"(scaling efficiency {eff:.0%})")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
