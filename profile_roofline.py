"""Roofline / MFU accounting for the top pipeline stages (VERDICT r4 #5).

For each hot stage, measures steady-state device time at bench scale and
compares it against an analytic model of (a) HBM bytes moved and (b)
compute ops, versus TPU v5e hardware limits. This turns "the stage is at
its design floor" claims (previously argued only by A/B elimination,
PERF_NOTES.md) into falsifiable fractions of hardware peak, and ranks
the next optimization lever by measured headroom.

v5e peaks used (public figures, jax-ml.github.io/scaling-book):
  HBM bandwidth  819 GB/s
  MXU            197 TFLOP/s bf16, ~49 TFLOP/s f32 ("highest" = 6-pass)
  VPU            ~4 T-op/s  (8 ops/cycle x 8x128 lanes x ~940 MHz; an
                 estimate — VPU peak is not published to the same
                 precision as MXU/HBM)

Interpretation column: which limit binds the stage —
  memory   : bytes/s within ~3x of HBM peak
  compute  : op/s within ~3x of the MXU/VPU peak
  issue    : dominated by XLA's scalar-gather issue rate (~5.3 ns/index
             measured floor, PERF_NOTES "GN assembly gather")
  latency  : serialized scan/loop steps, neither roofline binds

Run on the real chip: python profile_roofline.py   (~3 min warm cache)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

HBM_GBS = 819.0
MXU_F32_TFLOPS = 49.0
MXU_BF16_TFLOPS = 197.0
VPU_TOPS = 4.0
GATHER_NS_PER_INDEX = 5.3  # measured XLA row-gather floor (PERF_NOTES r3)


def force(out):
    jax.tree.map(lambda x: np.asarray(x[(0,) * x.ndim]), out)


def timeit(fn, *args, n=3):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    force(out)  # amortized force: a per-call element D2H costs ~20 ms
    dt = (time.time() - t0) / n  # of tunnel latency and would swamp
    return dt * 1e3  # small kernels. Milliseconds (row() expects ms).


def row(name, ms, gbytes=None, gops=None, engine="vpu", indices=None,
        note=""):
    import json as _json
    sec = ms / 1e3
    r = {"stage": name, "ms": round(ms, 2), "note": note}
    binds = []
    if gbytes is not None:
        gbs = gbytes / sec
        r["GB"] = round(gbytes, 3)
        r["GB/s"] = round(gbs, 1)
        r["pct_hbm"] = round(100.0 * gbs / HBM_GBS, 1)
        binds.append(("memory", r["pct_hbm"]))
    if gops is not None:
        tops = gops / sec / 1e3
        peak = {"vpu": VPU_TOPS, "mxu_f32": MXU_F32_TFLOPS,
                "mxu_bf16": MXU_BF16_TFLOPS}[engine]
        r["Gop"] = round(gops, 1)
        r["Top/s"] = round(tops, 2)
        r["pct_" + engine] = round(100.0 * tops / peak, 1)
        binds.append((engine, r["pct_" + engine]))
    if indices is not None:
        floor_ms = indices * GATHER_NS_PER_INDEX / 1e6
        r["gather_floor_ms"] = round(floor_ms, 1)
        r["pct_gather_floor"] = round(100.0 * floor_ms / ms, 1)
        binds.append(("issue", r["pct_gather_floor"]))
    if binds:
        r["binding"] = max(binds, key=lambda kv: kv[1])[0]
    print(_json.dumps(r), flush=True)
    return r


def main():
    dev = jax.devices()[0]
    print(f"roofline: device={dev}", file=sys.stderr, flush=True)
    rows = []

    from smvs_tpu.core.synthetic import make_two_view_scene
    from smvs_tpu.sgm import pallas_agg
    from smvs_tpu.sgm import rectify as R
    from smvs_tpu.sgm import stereo as sgm

    dim = int(os.environ.get("SMVS_BENCH_DIM", "1440"))
    D = 128
    HW = dim * dim

    slope = 0.005 * 460.0 / dim
    scene = make_two_view_scene(dim=dim, rotate=True, texture="noise",
                                depth_fn=lambda i, j: 5.0 + slope * i
                                + slope * j)
    main_img = jnp.asarray(scene.images[1] * 255.0)
    nbr_img = jnp.asarray(scene.images[0] * 255.0)
    rp = R.rectify_pair(scene.cameras[1], scene.cameras[0], dim, dim,
                        (3.5, 9.5), (3.5, 9.5))
    lo = float(rp.disp_lo)
    step = max((rp.disp_hi - lo) / (D - 1), 1e-3)
    shifts = jnp.asarray(lo + step * np.arange(D), jnp.float32)

    # --- SGM cost volume (census + shifted hamming, one direction) -----
    mh, ml = jax.jit(sgm.census_transform)(main_img)
    force((mh, ml))
    cost_fn = jax.jit(sgm._disparity_cost)
    ms = timeit(cost_fn, mh, ml, nbr_img, shifts)
    # ops/px/plane: 63 u32 compares + ~126 shift-or pack of the shifted
    # census + hamming popcounts (~190 measured-model, PERF_NOTES r4);
    # bytes: write [H, W, D] i16 + read census (2xu64) + image rows.
    rows.append(row(
        "sgm_cost_volume(1 dir)", ms,
        gbytes=(HW * D * 2 + HW * 16 * D / 8) / 1e9,
        gops=HW * D * 190 / 1e9, engine="vpu",
        note="per-plane census-compare+popcount; compute-bound on VPU"))
    cost = cost_fn(mh, ml, nbr_img, shifts)
    force(cost)

    # --- SGM 8-path aggregation (Pallas, batch=2) ----------------------
    cost2 = jnp.stack([jnp.asarray(cost, jnp.int16)] * 2)
    inten2 = jnp.stack([jnp.asarray(main_img, jnp.int32)] * 2)
    agg_fn = jax.jit(lambda c, i: pallas_agg.aggregate_batch(c, i, 6, 96))
    ms = timeit(agg_fn, cost2, inten2)
    # 4 fused passes x (read volume + write accumulator) x batch 2, i16;
    # ops: 8 paths x ~8 min-plus ops per (px, plane).
    rows.append(row(
        "sgm_aggregate(8 paths, B=2)", ms,
        gbytes=2 * (4 * 2 * HW * D * 2) / 1e9,
        gops=2 * HW * D * 8 * 8 / 1e9, engine="vpu",
        note="serialized line scans: latency-bound if both pcts low"))

    # --- GN assembly gather (the measured floor) -----------------------
    from smvs_tpu.image import ops as iops

    gh = jnp.zeros((dim, dim, 5), jnp.float32)
    gh_pair = iops.pack_gradhess_pair10(
        jnp.zeros((2, dim, dim), jnp.float32),
        jnp.zeros((3, dim, dim), jnp.float32))
    n_sites = 2_073_600  # 1440^2 pixel sites, 2 neighbors at scale 2
    key = jax.random.PRNGKey(0)
    xs = jax.random.uniform(key, (n_sites,), minval=1.0, maxval=dim - 2.0)
    ys = jax.random.uniform(key, (n_sites,), minval=1.0, maxval=dim - 2.0)

    g_fn = jax.jit(lambda img, x, y: iops.sample_gh(img, x, y))
    ms = timeit(g_fn, gh_pair, xs, ys)
    # bf16 pair-packed: 2 row-takes of 20B per site (plus write).
    rows.append(row(
        "assembly_gather(2.07M sites, bf16)", ms,
        gbytes=n_sites * (2 * 20 + 20) / 1e9,
        indices=n_sites * 2,
        note="2 row-gathers/site; measured XLA issue floor 5.3ns/idx"))

    # --- Assembly basis contraction (the two MXU matmuls) --------------
    from smvs_tpu.solver.gn import _SYM_PAIRS, _contraction_tensors

    ps, samp = 4, 1  # scale-2 patches
    basis_flat, gsym = _contraction_tensors(ps, samp, "float32")
    P = ps * ps
    B = (dim // ps) ** 2
    A_packed = jnp.ones((B, P * len(_SYM_PAIRS)), jnp.float32)
    b_packed = jnp.ones((B, P * 6), jnp.float32)
    gsym_j = jnp.asarray(gsym)
    basis_j = jnp.asarray(basis_flat)
    mm_fn = jax.jit(lambda a, b: (a @ gsym_j, b @ basis_j))
    ms = timeit(mm_fn, A_packed, b_packed)
    flops = 2.0 * B * (P * len(_SYM_PAIRS)) * 256 + 2.0 * B * (P * 6) * 16
    rows.append(row(
        "assembly_contraction(2 matmuls)", ms,
        gbytes=(A_packed.size + b_packed.size + B * (256 + 16)) * 4 / 1e9,
        gops=flops / 1e9, engine="mxu_f32",
        note=f"B={B} patches, K={P*len(_SYM_PAIRS)}"))

    # --- Stencil SpMV + MG V-cycle at the scale-2 grid ------------------
    from smvs_tpu.dist.testing import make_single_view_problem
    from smvs_tpu.pipeline import optimizer as O
    from smvs_tpu.solver import gn as gnm
    from smvs_tpu.solver import mg, stencil

    surf, view, vis, active = make_single_view_problem(dim=min(dim, 1440),
                                                       scale=2)
    act = active & surf.node_valid
    g, Hb = jax.jit(lambda: gnm.assemble(
        surf, view, vis, act, gnm.GNOptions(regularization=0.01), None))()
    force((g, Hb))
    x = jnp.ones_like(g)
    spmv_fn = jax.jit(lambda H, v: stencil.spmv(H, v))
    ms = timeit(spmv_fn, Hb, x)
    nd = Hb.shape[0] * Hb.shape[1]
    rows.append(row(
        "stencil_spmv", ms,
        gbytes=(Hb.size + 2 * x.size) * 4 / 1e9,
        gops=nd * 9 * 2 * 16 / 1e9, engine="vpu",
        note=f"{Hb.shape[0]}x{Hb.shape[1]} nodes, 9-pt block stencil"))

    levels = jax.jit(lambda H: mg.build(H, act, damp_rows=True))(Hb)
    force(levels.ops[0])
    # levels closed over (its .shapes tuple must stay static).
    mg_fn = jax.jit(lambda r: mg.apply(levels, r))
    ms = timeit(mg_fn, g)
    lvl_bytes = sum(float(h.size) * 4 for h in levels.ops)
    rows.append(row(
        "mg_vcycle_apply", ms,
        gbytes=(2 * lvl_bytes + 6 * g.size * 4) / 1e9,
        note="2 smooths+residual per level; Galerkin hierarchy"))

    # --- Full assembly (for context: the whole Newton-step build) ------
    asm_fn = jax.jit(lambda: gnm.assemble(
        surf, view, vis, act, gnm.GNOptions(regularization=0.01), None))
    ms = timeit(asm_fn, n=3)
    rows.append(row("gn_assemble(base, scale2, full)", ms,
                    note="gather + residual math + contraction combined"))

    with open("roofline_r5.json", "w") as f:
        json.dump({"dim": dim, "device": str(dev), "rows": rows}, f,
                  indent=1)
    print(f"wrote roofline_r5.json ({len(rows)} stages)", file=sys.stderr)


if __name__ == "__main__":
    main()
