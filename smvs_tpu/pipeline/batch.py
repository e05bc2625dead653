"""View-batch data parallelism for the real per-view pipeline.

The reference's entire parallelism model is one thread-pool task per view
(`app/smvsrecon.cc:558, 652-735`). The TPU-native mapping stacks same-shaped
views on a leading axis and runs the existing per-scale programs —
visibility, boundary cutting, the Newton outer/inner loops
(`smvs_tpu.pipeline.optimizer`) — as ONE SPMD program per scale, vmapped
over views and sharded over a ``('views', 'patch')`` device mesh:

- **views axis (DP)**: independent per-view problems — the thread pool
  analog, batched into one dispatch;
- **patch axis (SP)**: each view's node grid row-sharded; the 9-point
  stencil ops become 1-row halo exchanges and the CG dots become psums,
  inserted by the SPMD partitioner.

Views are grouped into buckets keyed by (height, width, n_neighbors): every
view in a bucket shares all static shapes, so a scene with heterogeneous
sizes compiles one program per bucket per scale, not per view (SURVEY
section 7, hard part 5).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smvs_tpu.image import bilateral
from smvs_tpu.pipeline import optimizer as O
from smvs_tpu.pipeline.views import StereoViewState
from smvs_tpu.shading.lighting import fit_lighting
from smvs_tpu.surface import state as S
from smvs_tpu.utils.timing import StageTimer


def bucket_key(main: StereoViewState, subs: Sequence[StereoViewState]):
    """Views with equal keys share every static shape of the pipeline."""
    return (main.height, main.width, len(subs))


def _stack(xs):
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *xs)


def _stack_surfaces(surfs: list[S.Surface]) -> S.Surface:
    """Batch surfaces with identical grid meta on a leading views axis."""
    template = surfs[0]
    return dataclasses.replace(
        template,
        nodes=jnp.stack([s.nodes for s in surfs]),
        node_valid=jnp.stack([s.node_valid for s in surfs]),
        patch_valid=jnp.stack([s.patch_valid for s in surfs]),
    )


def _unstack_surface(bsurf: S.Surface, i: int) -> S.Surface:
    return dataclasses.replace(bsurf, nodes=bsurf.nodes[i],
                               node_valid=bsurf.node_valid[i],
                               patch_valid=bsurf.patch_valid[i])


# ---------------------------------------------------------------------------
# batched per-scale programs (vmap over the leading views axis)


@partial(jax.jit, static_argnames=("use_sgm",))
def _batched_visibility(bsurf, bview, bsgm, use_sgm, bmain_img, bsub_imgs,
                        bsgm_zb):
    fn = lambda surf, view, sgm, mi, si, zb: O.compute_visibility(
        surf, view, sgm, use_sgm, mi, si, sgm_zbuffer=zb)
    return jax.vmap(fn)(bsurf, bview, bsgm, bmain_img, bsub_imgs, bsgm_zb)


@jax.jit
def _batched_cut_loop(bsurf, bview, bvis, binv_cal):
    return jax.vmap(O.cut_boundaries_loop)(bsurf, bview, bvis, binv_cal)


@partial(jax.jit, static_argnames=("opts",))
def _batched_scale_program(bsurf, bview, bvis, bsgm, bmain_img, bsub_imgs,
                           binv_cal, blighting, opts):
    fn = lambda surf, view, vis, sgm, mi, si, ic, li: O.scale_program(
        surf, view, vis, sgm, mi, si, ic, li, opts)
    return jax.vmap(fn)(bsurf, bview, bvis, bsgm, bmain_img, bsub_imgs,
                        binv_cal, blighting)


@jax.jit
def _batched_zbuffer(bview, bsrc):
    return jax.vmap(O.zbuffer_scatter)(bview, bsrc)


@jax.jit
def _batched_subdivide(bsurf):
    return jax.vmap(S.subdivide)(bsurf)


@jax.jit
def _batched_fill_from_depth(bsurf, bsrc):
    return jax.vmap(S.fill_patches_from_depth)(bsurf, bsrc)


@jax.jit
def _batched_extract(bsurf, binv_flen):
    depth = jax.vmap(S.depth_map)(bsurf)
    normals = jax.vmap(S.normal_map)(bsurf, binv_flen)
    return depth, normals


@jax.jit
def _batched_fit_lighting(bsurf, binv_flen, bshading_img):
    nmap = jax.vmap(S.normal_map)(bsurf, binv_flen)
    return jax.vmap(fit_lighting)(nmap, bshading_img)


def make_view_mesh(n_devices: Optional[int] = None,
                   patch_axis: int = 1) -> Mesh:
    """('views', 'patch') mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % patch_axis == 0, (n, patch_axis)
    arr = np.array(devs[:n]).reshape(n // patch_axis, patch_axis)
    return Mesh(arr, ("views", "patch"))


def _shard_batch(tree, mesh: Optional[Mesh]):
    """Place batched arrays: views on axis 0; node-grid rows (axis 1 of
    rank>=3 node arrays) on 'patch' where divisible."""
    if mesh is None:
        return tree

    n_patch = mesh.shape["patch"]

    def put(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        spec = [None] * x.ndim
        if x.shape[0] % mesh.shape["views"] == 0:
            spec[0] = "views"
        if (x.ndim >= 3 and n_patch > 1 and x.shape[1] % n_patch == 0
                and x.shape[1] > n_patch):
            spec[1] = "patch"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(put, tree)


def prewarm_async(
    mains: Sequence[StereoViewState],
    subs_list: Sequence[Sequence[StereoViewState]],
    opts: O.OptimizerOptions,
    mesh: Optional[Mesh] = None,
    depth_value: float = 5.0,
):
    """Compile (or persistent-cache-load) every batched per-scale program
    for this bucket in a background thread, overlapped with other work.

    Runs the full batched pipeline once on a constant-depth init of the
    SAME static shapes (batch size, image dims, neighbor count, opts) —
    compile keys depend only on shapes, so the real run then hits every
    jit cache. The reference starts computing immediately because it has
    no compile step (`app/smvsrecon.cc:652-735`); overlapping program
    loads with the SGM init (r3: 145 s of serialized cache loads on a
    10-view scene) is the TPU counterpart. Call before the SGM loop and
    ``join()`` the returned thread before timing warm dispatch.
    """
    import threading

    V = len(mains)
    h, w = mains[0].height, mains[0].width
    fake = [jnp.full((h, w), depth_value, jnp.float32) for _ in range(V)]

    def run():
        # One retry: transient tunnel failures ('remote_compile: response
        # body closed') can kill the surrogate mid-way; already-compiled
        # programs are cached, so the retry resumes where it died. A
        # dead surrogate silently costs the REAL first batch the whole
        # compile wall (observed r4: 3.7 s -> 305 s first group).
        for attempt in range(2):
            try:
                out = optimize_view_batch(
                    mains, subs_list, opts,
                    sgm_depths=fake if opts.use_sgm else None,
                    init_depths=None if opts.use_sgm else fake,
                    mesh=mesh)
                np.asarray(out[-1].depth[0, 0])  # drain the device queue
                return
            except Exception:  # pragma: no cover - diagnostic only
                import traceback

                traceback.print_exc()

    t = threading.Thread(target=run, daemon=True, name="smvs-prewarm")
    t.start()
    return t


def optimize_view_batch(
    mains: Sequence[StereoViewState],
    subs_list: Sequence[Sequence[StereoViewState]],
    opts: O.OptimizerOptions,
    sgm_depths: Optional[Sequence[jnp.ndarray]] = None,
    init_depths: Optional[Sequence[jnp.ndarray]] = None,
    mesh: Optional[Mesh] = None,
    log=None,
) -> list[O.DepthResult]:
    """Batched counterpart of :func:`optimizer.optimize_view`.

    All views must share a bucket key. Runs the identical coarse-to-fine
    pipeline (same jitted per-scale programs, vmapped) and returns one
    DepthResult per view. With ``mesh``, inputs are sharded DP(views) x
    SP(node-grid rows) and the scale programs run as one SPMD program.
    """
    V = len(mains)
    assert len(set(bucket_key(m, s) for m, s in zip(mains, subs_list))) == 1
    dtype = jnp.float32
    main0 = mains[0]

    # ---- initial surfaces (reference `lib/depth_optimizer.cc:36-51`) ------
    scale0 = O.initial_scale(main0.width, main0.height)
    surfs = []
    fill_srcs = []
    filt_sgms = []
    for i in range(V):
        if opts.use_sgm:
            assert sgm_depths is not None
            filt = bilateral.depthmap_bilateral_filter(
                jnp.asarray(sgm_depths[i], dtype),
                mains[i].image.astype(dtype))
            surfs.append(S.create_from_depth(filt, scale0))
            fill_srcs.append(filt)
            filt_sgms.append(filt)
        else:
            assert init_depths is not None
            init = jnp.asarray(init_depths[i], dtype)
            surfs.append(S.create_from_depth(init, scale0 + 1))
            fill_srcs.append(init)
    bsurf = _stack_surfaces(surfs)
    bfill = jnp.stack(fill_srcs) if fill_srcs else None
    bsgm = (jnp.stack(filt_sgms) if filt_sgms
            else jnp.zeros((V, main0.height, main0.width), dtype))

    binv_cal = jnp.stack([
        jnp.asarray(m.camera.inverse_calibration(m.width, m.height), dtype)
        for m in mains])
    binv_flen = jnp.stack([jnp.asarray(1.0 / m.flen(), dtype)
                           for m in mains])
    blighting = None
    bsgm_zb = None
    timer = StageTimer(sync_arrays=opts.debug_lvl >= 2)

    bsurf = _shard_batch(bsurf, mesh)
    bsgm = _shard_batch(bsgm, mesh)

    def run_scale(bsurf, bsgm_zb, blighting):
        scale = bsurf.scale
        if log:
            log(f"### batch of {V}: scale {scale}")
        with timer.stage(f"viewset@s{scale}"):
            bview = _stack([
                O._build_viewset(mains[i], list(subs_list[i]), scale,
                                 opts.use_shading, dtype,
                                 bf16_gather=opts.bf16_gather)
                for i in range(V)])
            bview = _shard_batch(bview, mesh)
            bmain_img = jnp.stack(
                [m.at_scale(scale).image for m in mains])
            bsub_imgs = jnp.stack(
                [jnp.stack([s.at_scale(scale).image for s in subs])
                 for subs in subs_list])
            timer.sync(bview.sub_gh)
        if opts.use_sgm and bsgm_zb is None:
            bsgm_zb = _batched_zbuffer(bview, bsgm)
        if opts.use_shading and scale < 4:
            with timer.stage(f"lighting@s{scale}"):
                bshading = jnp.stack(
                    [m.shading_images()[0].astype(dtype) for m in mains])
                blighting = _batched_fit_lighting(bsurf, binv_flen,
                                                  bshading)
        with timer.stage(f"visibility@s{scale}"):
            if bsgm_zb is not None:
                zb = bsgm_zb
            else:  # ignored when use_sgm is False; shape-only placeholder
                n_sub = bview.M.shape[1]
                sub_h, sub_w = bview.sub_gh.shape[2:4]
                zb = jnp.zeros((V, n_sub, (sub_h + 1) * (sub_w + 1)), dtype)
            bsurf2, bvis = _batched_visibility(
                bsurf, bview, bsgm, opts.use_sgm, bmain_img, bsub_imgs, zb)
            bsurf2, bvis = _batched_cut_loop(bsurf2, bview, bvis, binv_cal)
            timer.sync(bvis)
        with timer.stage(f"iterations@s{scale}"):
            nodes, node_valid, patch_valid, stats = _batched_scale_program(
                bsurf2, bview, bvis, bsgm, bmain_img, bsub_imgs, binv_cal,
                blighting, opts)
            timer.sync(nodes)
        if log and opts.debug_lvl >= 1:
            st = np.asarray(stats)  # [V, num_iters, 3]
            for i in range(V):
                rows = [f"{int(s)}st/{int(c)}cg" for s, c in
                        zip(st[i, :, 0], st[i, :, 2]) if s > 0]
                log(f"  view {i} s{scale}: " + " ".join(rows)
                    + f" -> {int(st[i, :, 1].max())} patches")
        bsurf2 = dataclasses.replace(bsurf2, nodes=nodes,
                                     node_valid=node_valid,
                                     patch_valid=patch_valid)
        return bsurf2, bsgm_zb, blighting

    bsurf, bsgm_zb, blighting = run_scale(bsurf, bsgm_zb, blighting)
    while bsurf.scale > opts.min_scale and bsurf.scale > 0:
        with timer.stage(f"subdivide@s{bsurf.scale}"):
            bsurf = _batched_subdivide(bsurf)
            if bfill is not None:
                bsurf = _batched_fill_from_depth(bsurf, bfill)
            timer.sync(bsurf.nodes)
        bsurf, bsgm_zb, blighting = run_scale(bsurf, bsgm_zb, blighting)

    with timer.stage("extract"):
        bdepth, bnormals = _batched_extract(bsurf, binv_flen)
        timer.sync(bnormals)
    if log:
        log(timer.report())

    return [
        O.DepthResult(
            depth=bdepth[i], normals=bnormals[i],
            surface=_unstack_surface(bsurf, i),
            lighting=None if blighting is None else blighting[i])
        for i in range(V)
    ]
