"""Distribution tests on the virtual 8-device CPU mesh.

The reference's only parallelism is one thread per view
(`app/smvsrecon.cc:558`); here the same independence is expressed as a
sharded SPMD program: DP over views x SP over patch-grid rows, with XLA
inserting the stencil halo exchanges. These tests pin numerical equality
between the sharded and single-device paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smvs_tpu.dist import viewbatch
from smvs_tpu.dist.testing import make_view_batch
from smvs_tpu.solver import gn

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def batch_problem():
    template, batch = make_view_batch(4, dim=116, scale=4, dtype=jnp.float64)
    return template, batch


def _run(template, batch, mesh):
    step = viewbatch.training_step_fn(template, gn.GNOptions(chunk=32), mesh)
    out = step(batch["nodes"], batch["node_valid"], batch["patch_valid"],
               batch["vis"], batch["active"], batch["view"])
    return np.asarray(out)


def test_sharded_matches_single_device(batch_problem):
    template, batch = batch_problem
    mesh_1 = viewbatch.make_mesh(1, patch_axis=1)
    mesh_dp = viewbatch.make_mesh(4, patch_axis=1)
    mesh_dpsp = viewbatch.make_mesh(8, patch_axis=2)
    ref = _run(template, batch, mesh_1)
    out_dp = _run(template, batch, mesh_dp)
    out_dpsp = _run(template, batch, mesh_dpsp)
    np.testing.assert_allclose(out_dp, ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(out_dpsp, ref, rtol=1e-9, atol=1e-11)


def test_step_actually_updates(batch_problem):
    template, batch = batch_problem
    mesh = viewbatch.make_mesh(8, patch_axis=2)
    out = _run(template, batch, mesh)
    delta = np.abs(out - np.asarray(batch["nodes"]))
    assert delta.max() > 0


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_multihost_two_process_simulation(tmp_path):
    """Two-process jax.distributed run (SURVEY.md section 4: multi-host via
    multi-process CPU simulation): views axis across processes, patch axis
    within; each worker checks its shards against a local reference."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = repo
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "smvs_tpu.dist.multihost",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--local-devices", "2"],
            cwd=repo, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out
