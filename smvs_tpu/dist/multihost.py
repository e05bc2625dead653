"""Multi-host (multi-process) execution of the sharded view-batch step.

The reference is strictly single-process (SURVEY.md section 2); this module
adds the multi-host capability: each host joins a `jax.distributed` runtime,
the view-batch mesh spans all hosts (views axis across hosts = the DCN axis,
patch axis within a host = the ICI axis), and the same SPMD program from
`smvs_tpu.dist.viewbatch` runs unchanged — XLA routes the stencil halos and
CG psums over the right links.

Run as a worker (one process per "host"; on real pods the TPU runtime
supplies the process topology instead of the flags):

    python -m smvs_tpu.dist.multihost --coordinator 127.0.0.1:PORT \
        --num-processes 2 --process-id $I --local-devices 2

Each worker verifies its addressable output shards against a locally
computed single-process reference and prints ``MULTIHOST_OK``. This is the
CPU-simulated multi-host test SURVEY.md section 4 prescribes; pytest drives
it in `tests/test_dist.py`.
"""

from __future__ import annotations

import argparse
import os
import sys


def worker_main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--dim", type=int, default=116)
    args = ap.parse_args(argv)

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from smvs_tpu.dist import viewbatch
    from smvs_tpu.dist.testing import make_view_batch
    from smvs_tpu.solver import gn

    n_total = args.num_processes * args.local_devices
    assert len(jax.devices()) == n_total, (len(jax.devices()), n_total)

    # views axis spans processes (DCN analog), patch axis stays within a
    # process (ICI analog): jax.devices() orders by process_index, so the
    # (views, patch) reshape in make_mesh puts each process's local devices
    # on one mesh row.
    mesh = viewbatch.make_mesh(n_total, patch_axis=args.local_devices)
    n_views = mesh.shape["views"]

    template, batch = make_view_batch(n_views, dim=args.dim, scale=4)
    batch_np = jax.tree.map(np.asarray, batch)
    gn_opts = gn.GNOptions(chunk=32)

    # Local single-process reference on this process's default device.
    local_step = jax.jit(viewbatch.batched_newton_step(template, gn_opts))
    ref = np.asarray(local_step(batch["nodes"], batch["node_valid"],
                                batch["patch_valid"], batch["vis"],
                                batch["active"], batch["view"]))

    # Build the global (cross-process) arrays from the replicated numpy data.
    s_nodes, s_view = viewbatch.batch_shardings(mesh)

    def globalize(x, sharding):
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])

    g_args = (
        globalize(batch_np["nodes"], s_nodes),
        globalize(batch_np["node_valid"], s_nodes),
        globalize(batch_np["patch_valid"], s_view),
        globalize(batch_np["vis"], s_view),
        globalize(batch_np["active"], s_nodes),
        jax.tree.map(lambda x: globalize(x, s_view), batch_np["view"]),
    )

    step = viewbatch.training_step_fn(template, gn_opts, mesh)
    out = step(*g_args)
    out.block_until_ready()

    # Every process checks the shards it can address against the reference.
    # Tolerance: cross-process psum reduces in a different order than the
    # local program, and 200 f32 CG iterations on the GN system amplify
    # that rounding (single-process sharded-vs-local equality is separately
    # asserted at 1e-9 in tests/test_dist.py).
    checked = 0
    for shard in out.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), ref[shard.index], rtol=2e-3, atol=5e-5)
        checked += 1
    assert checked > 0
    print(f"MULTIHOST_OK process={args.process_id} shards={checked} "
          f"mesh={dict(mesh.shape)}", flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(worker_main())
