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
import time

import jax
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


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--views-per-dev", type=int, default=2)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args(argv)
    avail = len(jax.devices())
    counts = args.devices or [d for d in (1, 2, 4, 8) if d <= avail]
    base = None
    print(f"devices available: {avail}")
    for n in counts:
        thr = measure(n, args.views_per_dev, steps=args.steps)
        if base is None:
            base = thr
        eff = thr / (base * n)
        print(f"  {n} devices: {thr:8.2f} view-steps/s "
              f"(scaling efficiency {eff:.0%})")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
