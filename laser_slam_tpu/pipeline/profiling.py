"""Per-stage device-time breakdown and roofline/MFU accounting.

The reference collects per-topic wall times through its Benchmarker
(laser_slam/src/benchmarker.cpp:92-152) but never relates them to the
hardware's limits.  Here every hot stage of the online step is timed as
its own device program, and the two hot kernels (exact-NN and the MXU
brute-force NN) get achieved-FLOP/s / achieved-HBM-bandwidth numbers
against the chip's published peaks — so "fast" is measured against the
roofline, not just against a CPU baseline (SURVEY §6: the build must
MEASURE).

Used by bench.py (the ``tpu_step_breakdown_ms`` / ``*_mfu`` extras) and
ad-hoc from experiments/.

Timing methodology — chained marginal, NOT single dispatch: over the
axon tunnel a single dispatch costs ~10-30 ms of host/transport floor
before any device work happens, which both drowns sub-ms stages and
understates kernel FLOP/s by ~10x.  Every number here therefore times
one jitted program that runs the stage K times inside a sequential
``lax.fori_loop`` whose inputs are perturbed by the loop index (so XLA
can neither hoist the loop-invariant body nor CSE iterations), at two
chain lengths, and reports ``(t[K_hi] - t[K_lo]) / (K_hi - K_lo)`` —
the dispatch floor and the fixed host time cancel in the difference.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

# TPU v5e (v5 lite) public peaks: 197 bf16 TFLOP/s per chip, 819 GB/s
# HBM bandwidth (jax-ml.github.io/scaling-book hardware tables).  f32
# work is reported against the bf16 peak — a conservative (lower-bound)
# utilization figure.
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_HBM_GBPS = 819.0
# VPU elementwise peak: (8,128) vector lanes x 4 independent ALUs x
# ~0.94 GHz ~= 3.85 Tops/s f32 (scaling-book TPU chapter).  This is the
# correct roofline for compare/select kernels that never touch the MXU.
V5E_PEAK_VPU_F32_TFLOPS = 3.85


def _perturb(tree, i):
    """Make every iteration's input depend on the fori_loop index so the
    stage body is neither loop-invariant (hoistable) nor CSE-able across
    iterations.  Float leaves get a +i*1e-6 nudge (microns on point
    clouds — semantically inert); if the tree has NO float leaves
    (e.g. packed uint16 range words), unsigned leaves get +(i&1) (one
    2 mm range unit) instead."""
    leaves, treedef = jax.tree.flatten(tree)
    eps = jnp.float32(1e-6) * (i + 1)
    any_float = any(jnp.issubdtype(l.dtype, jnp.floating) for l in leaves)
    out = []
    for l in leaves:
        if jnp.issubdtype(l.dtype, jnp.floating):
            out.append(l + eps.astype(l.dtype))
        elif not any_float and jnp.issubdtype(l.dtype, jnp.unsignedinteger):
            out.append(l + (i & 1).astype(l.dtype))
        else:
            out.append(l)
    return jax.tree.unflatten(treedef, out)


def _live_sum(tree):
    """Reduce a stage output to one f32 scalar that depends on every
    float leaf (falling back to integer leaves for index-only outputs),
    keeping the whole body live through the loop carry — a constant here
    would let XLA dead-code-eliminate the stage."""
    leaves = jax.tree.leaves(tree)
    floats = [l for l in leaves if jnp.issubdtype(l.dtype, jnp.floating)]
    if not floats:
        floats = [l.astype(jnp.float32) for l in leaves
                  if jnp.issubdtype(l.dtype, jnp.integer)]
    acc = jnp.float32(0.0)
    for l in floats:
        acc = acc + jnp.sum(l, dtype=jnp.float32)
    return acc


def _marginal_ms(stage, args, k_lo: int = 4, k_hi: int = 36,
                 reps: int = 5) -> float:
    """Per-call device ms of ``stage(*args)``, dispatch-floor-free.

    Times jit(fori_loop of K index-perturbed stage calls) at K=k_lo and
    K=k_hi; the marginal (t_hi - t_lo)/(k_hi - k_lo) cancels the fixed
    per-dispatch host/transport cost (~10-30 ms on the axon tunnel).
    K is a RUNTIME operand — both chain lengths share one compiled
    program (remote compiles over the tunnel cost tens of seconds each;
    fori_loop never unrolls, so a traced bound loses nothing)."""
    @jax.jit
    def chain(K, *a):
        def body(i, acc):
            out = stage(*_perturb(a, i))
            return acc + _live_sum(out) * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
    jax.block_until_ready(chain(jnp.int32(k_lo), *args))   # compile
    t = {}
    for K in (k_lo, k_hi):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(jnp.int32(K), *args))
            ts.append(time.perf_counter() - t0)
        t[K] = float(np.median(ts))
    return max(t[k_hi] - t[k_lo], 0.0) / (k_hi - k_lo) * 1e3


# Public alias: bench.py and experiments/ time ad-hoc stages with the
# same chained-marginal methodology.
marginal_ms = _marginal_ms


def full_step_device_ms(runner, points: np.ndarray,
                        odom_pose7: np.ndarray, reps: int = 5) -> float:
    """Device ms of ONE fused online step on a WARMED runner — the
    transport-independent e2e number (round-4 verdict ask #1c).

    Chains K genuinely data-dependent online_step calls (each feeds its
    state into the next) inside one jitted fori_loop at two chain
    lengths and reports the marginal — the per-dispatch host/transport
    floor cancels, so the number is comparable across rounds regardless
    of tunnel weather.  ``1e3 / result`` is the device-bound scans/s
    ceiling of the per-scan path at this density."""
    from laser_slam_tpu.ops import cloud as pc
    from laser_slam_tpu.pipeline import online

    cfg = runner.config
    scan_cap = cfg.laser_track.input_filters.scan_capacity
    pts_np = np.full((scan_cap, 3), pc.SENTINEL, np.float32)
    n = min(len(points), scan_cap)
    pts_np[:n] = np.asarray(points, np.float32)[:n]
    dev_pts = jax.device_put(pts_np)
    n_valid = jnp.int32(n)
    od = jax.device_put(np.asarray(odom_pose7, np.float32))
    tid = jnp.int32(0)
    odometry_free = not getattr(runner, 'use_odometry', True)
    k_lo, k_hi = (2, 10) if reps <= 2 else (4, 36)

    @jax.jit
    def full_chain(K, st):
        def body(i, st):
            st2, _ = online.online_step(
                st, dev_pts + jnp.float32(1e-6) * (i + 1), n_valid, od,
                cfg, tid, odometry_free=odometry_free)
            return st2
        return jax.lax.fori_loop(0, K, body, st).traj_poses

    jax.block_until_ready(
        full_chain(jnp.int32(k_lo), jax.tree.map(jnp.array, runner.state)))
    tt = {}
    for K in (k_lo, k_hi):
        ts = []
        for _ in range(reps):
            st_copy = jax.tree.map(jnp.array, runner.state)
            jax.block_until_ready(st_copy)
            t0 = time.perf_counter()
            jax.block_until_ready(full_chain(jnp.int32(K), st_copy))
            ts.append(time.perf_counter() - t0)
        tt[K] = float(np.median(ts))
    return max(tt[k_hi] - tt[k_lo], 0.0) / (k_hi - k_lo) * 1e3


def step_breakdown(runner, points: np.ndarray, odom_pose7: np.ndarray,
                   ranges_u16: Optional[np.ndarray] = None,
                   reps: int = 5) -> Dict[str, float]:
    """Stage-level device ms of one online step on a WARMED runner.

    Stages mirror the fused ``online_step`` (pipeline/online.py:353-536):
    ingest filters -> store decimate -> normals -> submap assembly ->
    reading prep -> scan-to-submap ICP -> window solve (the reference's
    scanCallback path, laser_slam_worker.cpp:96-253 + the 3x
    isam2_.update, incremental_estimator.cpp:151-163).  When
    ``ranges_u16`` is given, the packed uint16 -> xyz spherical decode
    stage (ops/spherical.py) is timed too.
    """
    from laser_slam_tpu.ops import cloud as pc
    from laser_slam_tpu.ops import icp as icp_mod
    from laser_slam_tpu.ops import range_image as ri
    from laser_slam_tpu.ops import se3
    from laser_slam_tpu.pipeline import online

    cfg = runner.config
    lt = cfg.laser_track
    f = lt.input_filters
    state = runner.state
    out: Dict[str, float] = {}

    scan_cap = f.scan_capacity
    pts_np = np.full((scan_cap, 3), pc.SENTINEL, np.float32)
    n = min(len(points), scan_cap)
    pts_np[:n] = np.asarray(points, np.float32)[:n]
    dev_pts = jax.device_put(pts_np)
    n_valid = jnp.int32(n)
    rng = jax.random.PRNGKey(0)
    od = jax.device_put(np.asarray(odom_pose7, np.float32))

    # Full fused step: a genuinely chained loop — each iteration feeds
    # its state into the next (real data dependence, nothing hoistable),
    # exactly what the live per-scan path does (see full_step_device_ms;
    # it matches the runner's online_step avals exactly — jnp.int32
    # track_id, same odometry_free flag — so the inner-jit trace cache
    # serves the jaxpr the warm runner already traced).
    k_lo, k_hi = (2, 10) if reps <= 2 else (4, 36)
    out['full_step'] = round(
        full_step_device_ms(runner, points, odom_pose7, reps=reps), 2)

    if ranges_u16 is not None and runner._beam_table is not None:
        from laser_slam_tpu.ops import spherical
        table = runner._beam_table
        unit = runner._range_unit_m or spherical.RANGE_UNIT_M
        words = jax.device_put(np.asarray(ranges_u16, np.uint16))
        dec = lambda w: spherical.decode_and_pack(w, table, unit)[0]
        out['decode_packed'] = round(
            _marginal_ms(dec, (words,), k_lo, k_hi, reps=reps), 2)

    @jax.jit
    def ingest(points, n_valid, rng):
        mask = jnp.arange(points.shape[0]) < n_valid
        scan = pc.Cloud(jnp.where(mask[:, None], points, pc.SENTINEL), mask)
        if f.chain:
            scan = pc.apply_filter_chain(scan, f.chain, rng)
        else:
            scan = pc.range_filter(scan, f.min_distance_m, f.max_distance_m)
            if f.random_sampling_ratio < 1.0:
                scan = pc.random_sampling_filter(
                    scan, f.random_sampling_ratio, rng)
        return scan
    out['ingest_filters'] = round(_marginal_ms(
        ingest, (dev_pts, n_valid, rng), k_lo, k_hi, reps=reps), 2)
    scan_full = ingest(dev_pts, n_valid, rng)

    store_cap = f.store_capacity or f.scan_capacity
    cd = jax.jit(functools.partial(pc.compact_decimate, capacity=store_cap))
    out['store_decimate'] = round(_marginal_ms(cd, (scan_full,), k_lo, k_hi,
                                               reps=reps), 2)
    scan = cd(scan_full)

    nrm_fn = jax.jit(lambda s: ri.compute_normals(s, lt.icp))
    out['normals'] = round(_marginal_ms(nrm_fn, (scan,), k_lo, k_hi,
                                        reps=reps), 2)

    @jax.jit
    def assemble(state):
        track_id = 0
        prev_traj = state.traj_poses[state.track_last_key[track_id]]
        T_a_w = se3.inverse(prev_traj)
        ring_keys = state.ring_keys[track_id]
        ring_rel = jax.vmap(lambda k: jnp.where(
            k >= 0,
            se3.compose(T_a_w, state.traj_poses[jnp.maximum(k, 0)]),
            se3.identity()))(ring_keys)
        pts = se3.apply(ring_rel[:, None, :], state.ring_points[track_id])
        nrm = se3.quat_rotate(ring_rel[:, None, :4],
                              state.ring_normals[track_id])
        ring_mask = state.ring_mask[track_id]
        K, N, _ = state.ring_points[track_id].shape
        submap = pc.Cloud(
            jnp.where(ring_mask[..., None], pts,
                      pc.SENTINEL).reshape(K * N, 3),
            ring_mask.reshape(K * N))
        return submap, nrm.reshape(K * N, 3)
    out['submap_assembly'] = round(_marginal_ms(assemble, (state,), k_lo,
                                                k_hi, reps=reps), 2)
    submap, submap_normals = assemble(state)

    @jax.jit
    def reading_prep(scan, rng):
        reading = scan
        if lt.icp.reading_sampling_ratio < 1.0:
            reading = pc.random_sampling_filter(
                reading, lt.icp.reading_sampling_ratio, rng)
        return pc.compact_decimate(reading, lt.icp.reading_capacity)
    out['reading_prep'] = round(_marginal_ms(reading_prep, (scan, rng),
                                             k_lo, k_hi, reps=reps), 2)
    reading = reading_prep(scan, rng)

    guess = jax.device_put(np.asarray(se3.identity(), np.float32))
    icp_fn = jax.jit(lambda rd, sm, nm, g: icp_mod.icp_point_to_plane(
        rd, sm, nm, g, lt.icp).T)
    out['icp'] = round(_marginal_ms(
        icp_fn, (reading, submap, submap_normals, guess), k_lo, k_hi,
        reps=reps), 2)

    ws = jax.jit(lambda st: online._window_solve(st, st.n_poses - 1,
                                                 cfg)[0])
    out['window_solve'] = round(_marginal_ms(ws, (state,), k_lo, k_hi,
                                             reps=reps), 2)

    # Place-recognition cadence stage (runs inside online_chunk when a
    # detector is attached, online.py's pr_kw path): descriptor build
    # from the stored scan + the full-database query einsum.  Timed at
    # the runner's OWN detector db size when one is attached, else at a
    # representative 4096-entry database — this is the per-scan device
    # cost the flagship PR configuration adds on top of ``full_step``.
    pr_cfg = getattr(getattr(runner, 'detector', None), 'config', None)
    if pr_cfg is None:
        from laser_slam_tpu.config import PlaceRecognitionConfig
        pr_cfg = PlaceRecognitionConfig()
    from laser_slam_tpu.ops import scan_context as sc
    det = getattr(runner, 'detector', None)
    if det is not None and det.db.shape[0] > 1:
        db, dbk = det.db, det.db_keys
    else:
        db = jnp.zeros((4096, pr_cfg.n_rings, pr_cfg.n_sectors),
                       jnp.float32)
        dbk = jnp.arange(4096, dtype=jnp.int32)
    sp = state.ring_points[0, -1]
    sm = state.ring_mask[0, -1]

    def pr_stage(pts, msk):
        desc, dist, shift = sc.descriptor_and_query(
            db, dbk, pts, msk, jnp.int32(db.shape[0]),
            n_rings=pr_cfg.n_rings, n_sectors=pr_cfg.n_sectors,
            max_radius_m=pr_cfg.max_radius_m, z_offset_m=pr_cfg.z_offset_m)
        return dist
    out['pr_query'] = round(_marginal_ms(pr_stage, (sp, sm), k_lo, k_hi,
                                         reps=reps), 2)
    return out


def nn_kernel_utilization(reading: np.ndarray, reference: np.ndarray,
                          reps: int = 5) -> Dict[str, float]:
    """Roofline numbers for the two exact-NN kernels at the headline
    workload (Q readings vs R reference points).

    brute (ops/neighbors.nn_brute): the q.r term is an MXU matmul —
    useful-FLOP count 2*3*Q*R per pass (f32-highest precision, reported
    against the bf16 peak: a conservative MFU).

    pallas (ops/pallas_nn.nn_indices): a VPU kernel; FLOPs ~8*Q*R
    (3 sub, 3 mul, 2 select per pair).  Its roofline is HBM: each query
    tile re-reads the full padded [8,R] reference slab from HBM/VMEM, so
    bytes >= (Q/q_tile) * 32*R; the achieved-GB/s figure says how close
    the kernel runs to the memory wall.
    """
    from laser_slam_tpu.ops import neighbors, pallas_nn

    q = jax.device_put(np.asarray(reading, np.float32))
    r = jax.device_put(np.asarray(reference, np.float32))
    Q, R = q.shape[0], r.shape[0]
    out: Dict[str, float] = {}

    k_lo, k_hi = (2, 10) if reps <= 2 else (4, 36)
    brute = lambda a, b: neighbors.nn_brute(a, b)[1]
    ms = max(_marginal_ms(brute, (q, r), k_lo, k_hi, reps=reps), 1e-3)
    flops = 2.0 * 3.0 * Q * R
    tf = flops / (ms * 1e-3) / 1e12
    out['tpu_nn_brute_achieved_tflops'] = round(tf, 2)
    out['tpu_nn_brute_mfu_vs_bf16_peak'] = round(tf / V5E_PEAK_BF16_TFLOPS,
                                                 4)
    # Raw bf16 MFU is the wrong yardstick for THIS shape: the K=3
    # contraction fills 3 of the MXU's 128 systolic rows (ceiling
    # 197*3/128 = 4.6 TF/s), and the library-wide 'highest' matmul
    # precision (required for geometry — see __init__.py) runs f32 as
    # 6 bf16 passes, so the achievable ceiling for [Q,3]x[3,R] at
    # highest precision is ~0.77 TF/s.  The fraction below is achieved
    # vs that shape+precision ceiling.
    shape_ceiling_tf = V5E_PEAK_BF16_TFLOPS * (3.0 / 128.0) / 6.0
    out['tpu_nn_brute_fraction_of_shape_ceiling'] = round(
        tf / shape_ceiling_tf, 3)
    # Point-pair distance evaluations per second (Q*R per pass) — NOT
    # scan pairs (the ICP-level pairs/s metrics elsewhere are scan pairs).
    out['tpu_nn_brute_point_comparisons_per_sec'] = round(
        Q * R / (ms * 1e-3), 0)

    if pallas_nn.on_tpu():
        pal = lambda a, b: pallas_nn.nn_indices(a, b)[0]
        ms = max(_marginal_ms(pal, (q, r), k_lo, k_hi, reps=reps), 1e-3)
        gflops = 8.0 * Q * R / (ms * 1e-3) / 1e9
        out['tpu_pallas_nn_achieved_gflops'] = round(gflops, 1)
        out['tpu_pallas_nn_vpu_fraction'] = round(
            gflops / 1e3 / V5E_PEAK_VPU_F32_TFLOPS, 4)
        q_tiles = max(Q // 256, 1)             # _QB preferred tile
        gbytes = q_tiles * 32.0 * R / 1e9
        gbps = gbytes / (ms * 1e-3)
        out['tpu_pallas_nn_achieved_hbm_gbps'] = round(gbps, 1)
        out['tpu_pallas_nn_hbm_fraction'] = round(gbps / V5E_PEAK_HBM_GBPS,
                                                  4)
    return out
