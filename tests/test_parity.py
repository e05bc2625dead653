"""Reference-vs-TPU output parity tolerance test (VERDICT r02 #5).

Runs the unmodified reference pipeline (compiled from `/root/reference/lib`
by the `baseline/` harness) and the smvs_tpu pipeline on the SAME scene with
the SAME u8-quantized images, then asserts the depth maps agree: mutual
coverage, median relative difference, and the fraction of pixels whose GT
error is within 2x the reference's own per-pixel GT error (the
"reference-equivalent output" bound; reference fusion consumes these maps at
`app/smvsrecon.cc:278-343`). Skipped when the reference checkout or a C++
toolchain is unavailable (e.g. public CI).
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_HAVE_REFERENCE = os.path.isdir("/root/reference/lib") and (
    shutil.which("g++") is not None)


@pytest.mark.skipif(not _HAVE_REFERENCE,
                    reason="reference checkout / toolchain unavailable")
def test_depth_parity_base_mode():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "parity_check.py"),
         "--dim", "240", "--modes", "base", "--platform", "cpu"],
        capture_output=True, text=True, env=env, timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["mode"] == "base"
    # Both pipelines reconstruct most of the frame and overlap broadly.
    assert out["coverage_tpu"] > 0.70, out
    assert out["mutual_coverage"] > 0.65, out
    # Depth maps agree directly: sub-0.5% median relative difference.
    assert out["median_rel_diff"] < 5e-3, out
    # Reference-equivalent accuracy: most common pixels within 2x the
    # reference's own per-pixel GT error (floored at 0.1%). Measured
    # 84.9% at dim 240 with the bf16 assembly gather (95.5% at dim 360,
    # parity_r4b.log) — the 240px scene has proportionally more
    # border/low-texture pixels where the floor binds.
    assert out["pct_within_2x_ref_err"] > 0.82, out


@pytest.mark.skipif(not _HAVE_REFERENCE,
                    reason="reference checkout / toolchain unavailable")
def test_depth_parity_shading_mode():
    """The reference's headline -S mode (`/root/reference/app/
    smvsrecon.cc:52, 278-343`) — the mode the r3 MG-damping commit
    silently regressed 3.5x in accuracy because only base mode had a
    parity tripwire (VERDICT r3 #3).

    Bounds are calibrated from the r3/r4 PARITY.md measurements: on the
    shading-mode plane scene both pipelines land at ~0.8% median GT error
    (the shading term makes the problem less determined; the two solvers
    sit in different spots of the same flat valley, so the map-vs-map
    diff is larger than in base mode).
    """
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "parity_check.py"),
         "--dim", "240", "--modes", "shading", "--platform", "cpu"],
        capture_output=True, text=True, env=env, timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["mode"] == "shading"
    # Both pipelines reconstruct most of the frame and overlap broadly.
    assert out["coverage_tpu"] > 0.80, out
    assert out["mutual_coverage"] > 0.75, out
    # Reference-equivalent accuracy: within 1.5x the reference's own
    # median GT error on this scene (ours measured at or below the
    # reference's), with an absolute quality floor.
    assert out["median_gt_err_tpu"] <= max(
        1.5 * out["median_gt_err_ref"], 5e-3), out
    assert out["median_gt_err_tpu"] < 0.02, out
    # And the maps themselves broadly agree (flat-valley bound).
    assert out["median_rel_diff"] < 0.03, out
