"""Device-resident online SLAM: zero host transfers per scan.

The flexible host API (core.laser_track / core.estimator / pipeline.worker)
mirrors the reference's object structure, but pays host<->device latency
several times per scan — ruinous when the accelerator sits behind a
high-latency link.  This module is the production fast path: the ENTIRE
per-scan pipeline (input filters -> normals -> scan-to-submap ICP ->
factor append -> incremental Gauss-Newton solve -> trajectory update) is
one jitted function over a device-resident state pytree.  The host only
feeds raw scans and odometry in; results come out in a single bulk
transfer at the end (or whenever the caller asks).

Capacities are fixed up front (pose/factor/scan budgets), so the step
compiles exactly once.  Functionally equivalent to the reference flow
scanCallback -> processPoseAndLaserScan -> estimate
(laser_slam_worker.cpp:96-253, laser_track.cpp:122-231,
incremental_estimator.cpp:151-163).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.config import EstimatorConfig
from laser_slam_tpu.graph.factors import FactorGraphData
from laser_slam_tpu.graph import solver as sv
from laser_slam_tpu.ops import cloud as pc
from laser_slam_tpu.ops import icp as icp_mod
from laser_slam_tpu.ops import se3


class OnlineState(NamedTuple):
    """All-device SLAM state (pose table, scan rings, factor graph).

    Multi-robot: keys live in ONE global pose table (as in the reference,
    where N LaserTracks share one iSAM2 graph — incremental_estimator.cpp:
    22-26); each track has its own scan ring and last-key cursor.
    """
    # Trajectory / pose table; key == index (global across tracks).
    traj_poses: jax.Array      # [C,7] current estimates
    pose_meas: jax.Array       # [C,7] raw odometry measurement per key
    n_poses: jax.Array         # int32 scalar
    # Per-track scan rings: the last K scans (newest at index -1).
    ring_points: jax.Array     # [T,K,N,3]
    ring_mask: jax.Array       # [T,K,N]
    ring_normals: jax.Array    # [T,K,N,3]
    ring_keys: jax.Array       # [T,K] int32 (-1 = empty)
    track_last_key: jax.Array  # [T] int32 (-1 = track has no scans yet)
    # Factor graph.
    rel_meas: jax.Array        # [F,7]
    rel_keys: jax.Array        # [F,2]
    rel_sqrt_info: jax.Array   # [F,6]
    rel_robust: jax.Array      # [F]
    rel_weight: jax.Array      # [F]
    n_rel: jax.Array           # int32
    prior_meas: jax.Array      # [P,7]
    prior_keys: jax.Array      # [P]
    prior_sqrt_info: jax.Array # [P,6]
    prior_weight: jax.Array    # [P]
    n_prior: jax.Array         # int32
    rng_key: jax.Array
    # Last-step diagnostics (stay on device).
    last_icp_valid: jax.Array
    last_icp_inliers: jax.Array
    last_error: jax.Array


class StepInfo(NamedTuple):
    key: jax.Array
    icp_valid: jax.Array
    icp_inliers: jax.Array
    solve_error: jax.Array


class ScanArchive(NamedTuple):
    """Downsampled per-key scan history for device-side loop-closure
    submap ICP (buildSubMapAroundTime needs scans far older than the
    submap ring keeps — laser_track.cpp:602-651).  Row k holds the scan
    whose pose key is k, strided down to a fixed point budget.

    The per-track index (``track_pos``/``track_keys``/``track_count``)
    lets submap gathering window over a track's OWN scan sequence: with N
    interleaved robots, a radius-R submap still holds R same-track scans,
    matching the reference's per-track scan radius
    (laser_track.cpp:602-651) instead of diluting by the global key
    interleaving."""
    points: jax.Array       # [A,M,3] sensor frame, SENTINEL-parked
    mask: jax.Array         # [A,M]
    normals: jax.Array      # [A,M,3]
    track: jax.Array        # [A] int32 owning track (-1 = empty row)
    track_pos: jax.Array    # [A] int32 scan's position within its track
    track_keys: jax.Array   # [T,A] int32 global key at track position (-1)
    track_count: jax.Array  # [T] int32 scans stored per track


def init_archive(pose_capacity: int, points_per_scan: int,
                 n_tracks: int = 1) -> ScanArchive:
    return ScanArchive(
        points=jnp.full((pose_capacity, points_per_scan, 3), pc.SENTINEL,
                        jnp.float32),
        mask=jnp.zeros((pose_capacity, points_per_scan), bool),
        normals=jnp.zeros((pose_capacity, points_per_scan, 3), jnp.float32),
        track=jnp.full((pose_capacity,), -1, jnp.int32),
        track_pos=jnp.zeros((pose_capacity,), jnp.int32),
        track_keys=jnp.full((n_tracks, pose_capacity), -1, jnp.int32),
        track_count=jnp.zeros((n_tracks,), jnp.int32))


@functools.partial(jax.jit, donate_argnums=(0,))
def archive_append(archive: ScanArchive, points: jax.Array,
                   mask: jax.Array, normals: jax.Array, key: jax.Array,
                   track_id: jax.Array) -> ScanArchive:
    """Store a (filtered) scan at its pose key, strided to the archive's
    point budget.  Valid points are packed first so the stride samples
    the real scan, not the padding."""
    N = points.shape[0]
    M = archive.points.shape[1]
    if N > M:
        # Sort-free pack (cumsum + scatter-drop, see cloud._pack_scatter)
        # then an even stride over the VALID count — striding over the
        # full packed range would dilute the archive by the scan's fill
        # ratio (only ~M*nv/N real points kept), and the argsort it
        # replaced was a multi-ms bitonic sort at 32k keys.
        dest = jnp.where(mask, jnp.cumsum(mask) - 1, N)
        ppts = jnp.full((N, 3), pc.SENTINEL, points.dtype
                        ).at[dest].set(points, mode='drop')
        pmsk = jnp.zeros((N,), bool).at[dest].set(mask, mode='drop')
        pnrm = jnp.zeros((N, 3), normals.dtype
                         ).at[dest].set(normals, mode='drop')
        nv = jnp.sum(mask)
        stride_rows = (jnp.arange(M, dtype=jnp.float32)
                       * (nv.astype(jnp.float32) / M)).astype(jnp.int32)
        rows = jnp.where(nv > M, jnp.clip(stride_rows, 0, N - 1),
                         jnp.arange(M))
        pts, msk, nrm = ppts[rows], pmsk[rows], pnrm[rows]
    else:
        pad = M - N
        pts = jnp.pad(points, ((0, pad), (0, 0)),
                      constant_values=pc.SENTINEL)
        msk = jnp.pad(mask, (0, pad))
        nrm = jnp.pad(normals, ((0, pad), (0, 0)))
    pts = jnp.where(msk[:, None], pts, pc.SENTINEL)
    pos = archive.track_count[track_id]
    return ScanArchive(
        points=archive.points.at[key].set(pts),
        mask=archive.mask.at[key].set(msk),
        normals=archive.normals.at[key].set(nrm),
        track=archive.track.at[key].set(track_id),
        track_pos=archive.track_pos.at[key].set(pos),
        track_keys=archive.track_keys.at[track_id, pos].set(key),
        track_count=archive.track_count.at[track_id].add(1))


def grow_archive(archive: ScanArchive, pose_capacity: int) -> ScanArchive:
    """Match a grown pose table (rows keyed by pose key)."""
    extra = pose_capacity - archive.points.shape[0]
    M = archive.points.shape[1]
    T = archive.track_keys.shape[0]
    return ScanArchive(
        points=jnp.concatenate(
            [archive.points,
             jnp.full((extra, M, 3), pc.SENTINEL, jnp.float32)]),
        mask=jnp.concatenate([archive.mask, jnp.zeros((extra, M), bool)]),
        normals=jnp.concatenate(
            [archive.normals, jnp.zeros((extra, M, 3), jnp.float32)]),
        track=jnp.concatenate(
            [archive.track, jnp.full((extra,), -1, jnp.int32)]),
        track_pos=jnp.concatenate(
            [archive.track_pos, jnp.zeros((extra,), jnp.int32)]),
        track_keys=jnp.concatenate(
            [archive.track_keys,
             jnp.full((T, extra), -1, jnp.int32)], axis=1),
        track_count=archive.track_count)


def init_state(config: EstimatorConfig, pose_capacity: int = 4096,
               factor_capacity: int = 8192, prior_capacity: int = 8,
               seed: int = 0, n_tracks: int = 1) -> OnlineState:
    lt = config.laser_track
    # Submap = second-last scan + nscan_in_sub_map-1 earlier scans
    # (laser_track.cpp:476-486) -> the ring holds nscan_in_sub_map scans.
    K = max(lt.nscan_in_sub_map, 1)
    N = lt.input_filters.store_capacity or lt.input_filters.scan_capacity
    T = n_tracks

    def eye_rows(n):
        # Distinct buffers per field: donation forbids aliased state leaves.
        return jnp.zeros((n, 7), jnp.float32).at[:, 0].set(1.0)

    return OnlineState(
        traj_poses=eye_rows(pose_capacity),
        pose_meas=eye_rows(pose_capacity), n_poses=jnp.int32(0),
        ring_points=jnp.full((T, K, N, 3), pc.SENTINEL, jnp.float32),
        ring_mask=jnp.zeros((T, K, N), bool),
        ring_normals=jnp.zeros((T, K, N, 3), jnp.float32),
        ring_keys=jnp.full((T, K), -1, jnp.int32),
        track_last_key=jnp.full((T,), -1, jnp.int32),
        rel_meas=eye_rows(factor_capacity),
        rel_keys=jnp.zeros((factor_capacity, 2), jnp.int32),
        rel_sqrt_info=jnp.zeros((factor_capacity, 6), jnp.float32),
        rel_robust=jnp.zeros((factor_capacity,), bool),
        rel_weight=jnp.zeros((factor_capacity,), jnp.float32),
        n_rel=jnp.int32(0),
        prior_meas=eye_rows(prior_capacity),
        prior_keys=jnp.zeros((prior_capacity,), jnp.int32),
        prior_sqrt_info=jnp.zeros((prior_capacity, 6), jnp.float32),
        prior_weight=jnp.zeros((prior_capacity,), jnp.float32),
        n_prior=jnp.int32(0),
        rng_key=jax.random.key(seed),
        last_icp_valid=jnp.bool_(False),
        last_icp_inliers=jnp.int32(0),
        last_error=jnp.float32(0.0),
    )


def _pad_rows(a: jax.Array, n_new: int) -> jax.Array:
    pad = [(0, n_new - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad)


def _pad_pose_rows(a: jax.Array, n_new: int) -> jax.Array:
    extra = jnp.zeros((n_new - a.shape[0], 7), a.dtype).at[:, 0].set(1.0)
    return jnp.concatenate([a, extra], axis=0)


def grow_state(state: OnlineState, pose_capacity: Optional[int] = None,
               factor_capacity: Optional[int] = None,
               prior_capacity: Optional[int] = None) -> OnlineState:
    """Re-bucket the device state to larger capacities.

    Out-of-bounds ``.at[]`` scatters are silently dropped under jit
    (promise_in_bounds), so exceeding a capacity would corrupt state
    without error; the host driver grows the buffers FIRST.  Growth
    doubles (power-of-two bucketing, CLAUDE.md invariant) and costs one
    recompile of ``online_step`` at the new shapes.
    """
    P = pose_capacity or state.traj_poses.shape[0]
    F = factor_capacity or state.rel_meas.shape[0]
    R = prior_capacity or state.prior_meas.shape[0]
    return state._replace(
        traj_poses=_pad_pose_rows(state.traj_poses, P),
        pose_meas=_pad_pose_rows(state.pose_meas, P),
        rel_meas=_pad_pose_rows(state.rel_meas, F),
        rel_keys=_pad_rows(state.rel_keys, F),
        rel_sqrt_info=_pad_rows(state.rel_sqrt_info, F),
        rel_robust=_pad_rows(state.rel_robust, F),
        rel_weight=_pad_rows(state.rel_weight, F),
        prior_meas=_pad_pose_rows(state.prior_meas, R),
        prior_keys=_pad_rows(state.prior_keys, R),
        prior_sqrt_info=_pad_rows(state.prior_sqrt_info, R),
        prior_weight=_pad_rows(state.prior_weight, R))


def _graph_view(state: OnlineState) -> FactorGraphData:
    """The state's factor arrays as a solver graph (no copies under jit).

    fixed_a is unused in the online path (no out-of-window factors)."""
    return FactorGraphData(
        rel_meas=state.rel_meas, rel_keys=state.rel_keys,
        rel_sqrt_info=state.rel_sqrt_info, rel_robust=state.rel_robust,
        rel_fixed_a=jnp.zeros_like(state.rel_robust),
        rel_weight=state.rel_weight,
        prior_meas=state.prior_meas, prior_keys=state.prior_keys,
        prior_sqrt_info=state.prior_sqrt_info,
        prior_weight=state.prior_weight)


def _window_solve(state: OnlineState, i: jax.Array,
                  config: EstimatorConfig):
    """Solve the sliding window as a compact dense subproblem.

    Gathers the last ``window + margin`` poses into a small table (plus
    ``ANCHORS`` extra rows holding out-of-window poses referenced by
    loop-closure factors, each converted to a frozen anchor), remaps the
    contiguous factor slice's keys into it, runs the dense direct solver
    (solver._solve_dense) and scatters the window back.  Frozen margin
    poses gauge the window exactly as the full-table masked solve did.
    Returns (new traj_poses, final error).
    """
    import dataclasses
    W = config.solver.window
    MARGIN, ANCHORS = 8, 8
    C = state.traj_poses.shape[0]
    Mw = min(W + MARGIN, C)
    base = jnp.clip(i + 1 - Mw, 0, C - Mw)
    Fw = min(2 * W + 2, state.rel_meas.shape[0])
    start_f = jnp.clip(state.n_rel - Fw, 0, state.rel_meas.shape[0] - Fw)

    rel_meas = jax.lax.dynamic_slice(state.rel_meas, (start_f, 0), (Fw, 7))
    rel_keys = jax.lax.dynamic_slice(state.rel_keys, (start_f, 0), (Fw, 2))
    rel_sqrt = jax.lax.dynamic_slice(state.rel_sqrt_info, (start_f, 0),
                                     (Fw, 6))
    rel_robust = jax.lax.dynamic_slice(state.rel_robust, (start_f,), (Fw,))
    rel_weight = jax.lax.dynamic_slice(state.rel_weight, (start_f,), (Fw,))

    keys_l = rel_keys - base
    Mt = Mw + ANCHORS
    # Factors whose key_a predates the compact table (loop closures into
    # the past) anchor against a gathered copy of that pose; key_b is
    # always recent for chronologically appended factors — factors with
    # BOTH keys out of table are dropped (all-frozen, contribute nothing).
    b_in = (keys_l[:, 1] >= 0) & (keys_l[:, 1] < Mw)
    need = (keys_l[:, 0] < 0) & b_in & (rel_weight > 0)
    slot = jnp.cumsum(need.astype(jnp.int32)) - 1
    ok = need & (slot < ANCHORS)
    key_a_l = jnp.where(ok, Mw + slot, keys_l[:, 0])
    weight = jnp.where((need & ~ok) | ~b_in |
                       ((keys_l[:, 0] < 0) & ~need), 0.0, rel_weight)
    anchors = jnp.zeros((ANCHORS, 7), state.traj_poses.dtype) \
        .at[:, 0].set(1.0) \
        .at[jnp.where(ok, slot, ANCHORS)].set(
            state.traj_poses[jnp.clip(rel_keys[:, 0], 0, C - 1)],
            mode='drop')
    key_a_l = jnp.clip(key_a_l, 0, Mt - 1)
    key_b_l = jnp.clip(keys_l[:, 1], 0, Mt - 1)

    pk_l = state.prior_keys - base
    p_in = (pk_l >= 0) & (pk_l < Mw)
    prior_weight = jnp.where(p_in, state.prior_weight, 0.0)
    prior_keys_l = jnp.clip(pk_l, 0, Mt - 1)

    graph_w = FactorGraphData(
        rel_meas=rel_meas,
        rel_keys=jnp.stack([key_a_l, key_b_l], axis=1),
        rel_sqrt_info=rel_sqrt, rel_robust=rel_robust,
        rel_fixed_a=jnp.zeros((Fw,), bool), rel_weight=weight,
        prior_meas=state.prior_meas, prior_keys=prior_keys_l,
        prior_sqrt_info=state.prior_sqrt_info, prior_weight=prior_weight)

    poses_tab = jnp.concatenate(
        [jax.lax.dynamic_slice(state.traj_poses, (base, 0), (Mw, 7)),
         anchors])
    g_idx = base + jnp.arange(Mw)
    mask_w = (g_idx < i + 1) & (g_idx >= i + 1 - W)
    mask_tab = jnp.concatenate([mask_w, jnp.zeros((ANCHORS,), bool)])

    scfg = dataclasses.replace(config.solver, method='dense')
    result = sv.solve(graph_w, poses_tab, mask_tab, scfg)
    new_window = jnp.where(mask_w[:, None], result.poses[:Mw],
                           poses_tab[:Mw])
    new_traj = jax.lax.dynamic_update_slice(state.traj_poses, new_window,
                                            (base, 0))
    return new_traj, result.error_final


@functools.partial(jax.jit, static_argnames=('config', 'odometry_free'),
                   donate_argnums=(0,))
def online_step(state: OnlineState, points: jax.Array, n_valid: jax.Array,
                odom_pose7: jax.Array, config: EstimatorConfig,
                track_id: jax.Array = jnp.int32(0),
                odometry_free: bool = False
                ) -> Tuple[OnlineState, StepInfo]:
    """Integrate one scan of one track.  ``points`` padded to capacity.

    ``odometry_free``: ignore ``odom_pose7`` and propagate by constant
    velocity — the relative motion between the last two solved poses is
    replayed as the pseudo-odometry measurement (the reference's
    odometry-free mode, laser_slam_worker.cpp:135-162, where the CV-
    extrapolated pose feeds processPoseAndLaserScan in place of tf)."""
    lt = config.laser_track
    key_rng, sub1, sub2 = jax.random.split(state.rng_key, 3)

    # --- ingest: filters + normals (laser_track.cpp:146) ---------------
    f = lt.input_filters
    mask = jnp.arange(points.shape[0]) < n_valid
    scan = pc.Cloud(jnp.where(mask[:, None], points, pc.SENTINEL), mask)
    if f.chain:
        # Configurable ordered chain (laser_track.cpp:24-30 parity).
        scan = pc.apply_filter_chain(scan, f.chain, sub1)
    else:
        scan = pc.range_filter(scan, f.min_distance_m, f.max_distance_m)
        if f.random_sampling_ratio < 1.0:
            scan = pc.random_sampling_filter(scan, f.random_sampling_ratio,
                                             sub1)
    store_cap = f.store_capacity or f.scan_capacity
    if store_cap < scan.points.shape[0]:
        # Shape-level decimation (see InputFilterConfig.store_capacity):
        # even stride over the packed valid points — a plain compact
        # would keep only the first beams of a ring-major scan
        # (cloud.compact_decimate docstring).
        scan = pc.compact_decimate(scan, store_cap)
    from laser_slam_tpu.ops import range_image as ri
    normals = ri.compute_normals(scan, lt.icp)

    i = state.n_poses
    prev_key = state.track_last_key[track_id]
    odom = se3.normalize(odom_pose7)

    def first_branch(state):
        prior_T = odom
        if lt.force_priors:
            # Offset tracks along y (laser_track.cpp:166-170).
            offset = (jnp.float32(lt.distance_between_prior_poses_m) *
                      track_id.astype(jnp.float32))
            prior_T = jnp.concatenate(
                [jnp.asarray([1.0, 0, 0, 0, 0.0], jnp.float32),
                 offset[None], jnp.zeros((1,), jnp.float32)])
        state = state._replace(
            traj_poses=state.traj_poses.at[i].set(prior_T),
            pose_meas=state.pose_meas.at[i].set(odom),
            prior_meas=state.prior_meas.at[state.n_prior].set(prior_T),
            prior_keys=state.prior_keys.at[state.n_prior].set(i),
            prior_sqrt_info=state.prior_sqrt_info.at[state.n_prior].set(
                1.0 / config.prior_noise_sigma),
            prior_weight=state.prior_weight.at[state.n_prior].set(1.0),
            n_prior=state.n_prior + 1,
            last_icp_valid=jnp.bool_(True),
            last_icp_inliers=jnp.int32(0))
        return state

    def normal_branch(state):
        prev_meas = state.pose_meas[prev_key]
        prev_traj = state.traj_poses[prev_key]
        if odometry_free:
            # Constant velocity: replay the last solved relative motion
            # (identity until two poses exist).
            ring_keys_t = state.ring_keys[track_id]
            prev2_key = (ring_keys_t[-2] if ring_keys_t.shape[0] >= 2
                         else jnp.int32(-1))
            prev2 = state.traj_poses[jnp.maximum(prev2_key, 0)]
            rel = jnp.where(prev2_key >= 0,
                            se3.normalize(se3.compose(se3.inverse(prev2),
                                                      prev_traj)),
                            se3.identity())
            odom_eff = se3.normalize(se3.compose(prev_meas, rel))
        else:
            rel = se3.compose(se3.inverse(prev_meas), odom)
            odom_eff = odom
        propagated = se3.normalize(se3.compose(prev_traj, rel))

        # Scan-to-submap ICP in the previous scan's frame
        # (laser_track.cpp:466-519).
        T_a_w = se3.inverse(prev_traj)
        ring_keys = state.ring_keys[track_id]
        ring_points = state.ring_points[track_id]
        ring_mask = state.ring_mask[track_id]
        ring_normals = state.ring_normals[track_id]
        ring_rel = jax.vmap(lambda k: jnp.where(
            k >= 0,
            se3.compose(T_a_w, state.traj_poses[jnp.maximum(k, 0)]),
            se3.identity()))(ring_keys)
        pts = se3.apply(ring_rel[:, None, :], ring_points)
        nrm = se3.quat_rotate(ring_rel[:, None, :4], ring_normals)
        K, N, _ = ring_points.shape
        submap = pc.Cloud(
            jnp.where(ring_mask[..., None], pts,
                      pc.SENTINEL).reshape(K * N, 3),
            ring_mask.reshape(K * N))
        submap_normals = nrm.reshape(K * N, 3)

        reading = scan
        if lt.icp.reading_sampling_ratio < 1.0:
            reading = pc.random_sampling_filter(
                reading, lt.icp.reading_sampling_ratio, sub2)
        # Even decimation: prefix-compacting a ring-major beam scan to the
        # reading budget would keep only the top rings (no ground) and
        # bias ICP (cloud.compact_decimate docstring).
        reading = pc.compact_decimate(reading, lt.icp.reading_capacity)

        icp_res = icp_mod.icp_point_to_plane(
            reading, submap, submap_normals, rel, lt.icp)

        # Factors (laser_track.cpp:211-222).
        n_rel = state.n_rel
        odo_sig = 1.0 / jnp.asarray(lt.odometry_noise_model, jnp.float32)
        icp_sig = 1.0 / jnp.asarray(lt.icp_noise_model, jnp.float32)
        keys_ab = jnp.stack([prev_key, i])
        state = state._replace(
            rel_meas=state.rel_meas.at[n_rel].set(rel)
            .at[n_rel + 1].set(icp_res.T),
            rel_keys=state.rel_keys.at[n_rel].set(keys_ab)
            .at[n_rel + 1].set(keys_ab),
            rel_sqrt_info=state.rel_sqrt_info.at[n_rel].set(odo_sig)
            .at[n_rel + 1].set(icp_sig),
            rel_robust=state.rel_robust.at[n_rel].set(
                lt.add_m_estimator_on_odom)
            .at[n_rel + 1].set(lt.add_m_estimator_on_icp),
            rel_weight=state.rel_weight.at[n_rel].set(
                1.0 if lt.use_odom_factors else 0.0)
            .at[n_rel + 1].set(
                jnp.where(icp_res.valid,
                          1.0 if lt.use_icp_factors else 0.0, 0.0)),
            n_rel=n_rel + 2,
            traj_poses=state.traj_poses.at[i].set(propagated),
            pose_meas=state.pose_meas.at[i].set(odom_eff),
            last_icp_valid=icp_res.valid,
            last_icp_inliers=icp_res.num_inliers)
        return state

    state = jax.lax.cond(prev_key < 0, first_branch, normal_branch, state)

    # --- incremental solve (incremental_estimator.cpp:151-163) ----------
    if config.solver.window > 0:
        # Sliding window as a COMPACT subproblem: the newest `window`
        # poses (plus a margin of frozen predecessors and a few anchor
        # slots for loop-closure factors reaching further back) are
        # gathered into a ~(window+16)-row pose table and solved with the
        # dense direct method — one small Cholesky per GN step instead of
        # a capacity-sized PCG/cyclic-reduction chain.  Because the online
        # path appends factors chronologically (2 per scan), the window's
        # factors are a contiguous dynamic slice.
        new_traj, err = _window_solve(state, i, config)
        result_poses, result_error = new_traj, err
    else:
        idx = jnp.arange(state.traj_poses.shape[0])
        pose_mask = idx < (i + 1)
        result = sv.solve(_graph_view(state), state.traj_poses, pose_mask,
                          config.solver)
        result_poses, result_error = result.poses, result.error_final
    state = state._replace(
        traj_poses=result_poses,
        n_poses=i + 1,
        rng_key=key_rng,
        last_error=result_error,
        # Ring push for this track (newest scan last).
        ring_points=state.ring_points.at[track_id].set(
            jnp.roll(state.ring_points[track_id], -1, axis=0)
            .at[-1].set(scan.points)),
        ring_mask=state.ring_mask.at[track_id].set(
            jnp.roll(state.ring_mask[track_id], -1, axis=0)
            .at[-1].set(scan.mask)),
        ring_normals=state.ring_normals.at[track_id].set(
            jnp.roll(state.ring_normals[track_id], -1, axis=0)
            .at[-1].set(normals)),
        ring_keys=state.ring_keys.at[track_id].set(
            jnp.roll(state.ring_keys[track_id], -1).at[-1].set(i)),
        track_last_key=state.track_last_key.at[track_id].set(i))
    info = StepInfo(key=i, icp_valid=state.last_icp_valid,
                    icp_inliers=state.last_icp_inliers,
                    solve_error=state.last_error)
    return state, info


def _apply_group_alignment(state: OnlineState, key_a, key_b, a_T_a_b,
                           align_mask) -> OnlineState:
    """Rigidly pre-align the absorbed group's poses so the new linking
    factor is already satisfied when the solve starts.

    Why: a cross-track linking closure demands a ~100 m correction of
    every pose of the absorbed track.  Solving that from the parked
    state is a near-zero-curvature valley (rotate/translate the WHOLE
    rigid track, resisted only by the one new factor), and with
    interleaved multi-robot keys none of the track's odometry factors
    sit on the block-tridiagonal chain (``key_b == key_a + 1`` never
    holds), so the chain preconditioner can't carry the long-range mode
    either — measured: 12 GN x 128 PCG refine iterations plateaued at
    ~28 m linked-map ATE (experiments/multirobot_ate_probe.py).  The
    rigid correction C = T_a meas T_b^-1 applied to the absorbed
    group's poses is exactly the transform the closure asserts; after
    it the solve only polishes residual strain.  This mirrors the
    reference's frame semantics: each worker keeps its trajectory in
    its own odom frame and a closure shifts the whole frame via
    world_to_odom (laser_slam_worker.cpp:522-540), not pose by pose.
    """
    T_w_a = state.traj_poses[key_a]
    T_w_b = state.traj_poses[key_b]
    # Move whichever side the mask covers (the absorbed group): C_b
    # aligns key_b's side onto key_a's frame, C_a the reverse.
    C_b = se3.compose(T_w_a, se3.compose(a_T_a_b, se3.inverse(T_w_b)))
    C_a = se3.compose(T_w_b, se3.compose(se3.inverse(a_T_a_b),
                                         se3.inverse(T_w_a)))
    C = jnp.where(align_mask[key_b], C_b, C_a)
    aligned = se3.normalize(
        jax.vmap(lambda p: se3.compose(C, p))(state.traj_poses))
    return state._replace(traj_poses=jnp.where(align_mask[:, None],
                                               aligned, state.traj_poses))


def _append_lc_factor(state: OnlineState, key_a: jax.Array,
                      key_b: jax.Array, a_T_a_b: jax.Array,
                      config: EstimatorConfig,
                      remove_prior_slot: jax.Array,
                      use_association: bool
                      ) -> Tuple[OnlineState, jax.Array]:
    """Append one loop-closure factor (frame of key_a); returns the new
    factor's index.

    Cross-track linking closures use the tighter first-association sigmas
    and deactivate the absorbed track's prior — pass
    remove_prior_slot >= 0 + use_association=True
    (incremental_estimator.cpp:240-258)."""
    if use_association:
        sig = 1.0 / jnp.asarray(config.first_association_noise_model,
                                jnp.float32)
        robust = False
    else:
        sig = 1.0 / jnp.asarray(config.loop_closure_noise_model, jnp.float32)
        robust = config.add_m_estimator_on_loop_closures
    n_rel = state.n_rel
    state = state._replace(
        rel_meas=state.rel_meas.at[n_rel].set(a_T_a_b),
        rel_keys=state.rel_keys.at[n_rel].set(jnp.stack([key_a, key_b])),
        rel_sqrt_info=state.rel_sqrt_info.at[n_rel].set(sig),
        rel_robust=state.rel_robust.at[n_rel].set(robust),
        rel_weight=state.rel_weight.at[n_rel].set(1.0),
        n_rel=n_rel + 1,
        # Negative slot -> out-of-bounds write, dropped (negative indices
        # would otherwise wrap).
        prior_weight=state.prior_weight.at[
            jnp.where(remove_prior_slot >= 0, remove_prior_slot,
                      state.prior_weight.shape[0])].set(0.0, mode='drop'))
    return state, n_rel


def _append_lc_and_solve(state: OnlineState, key_a: jax.Array,
                         key_b: jax.Array, a_T_a_b: jax.Array,
                         config: EstimatorConfig,
                         remove_prior_slot: jax.Array,
                         use_association: bool,
                         align_mask=None
                         ) -> Tuple[OnlineState, StepInfo]:
    """Append one loop-closure factor and full-solve (cold preconditioner
    build each time; :func:`_append_lc_and_solve_cached` is the
    iSAM2-equivalent reuse path)."""
    if align_mask is not None:
        state = _apply_group_alignment(state, key_a, key_b, a_T_a_b,
                                       align_mask)
    state, _ = _append_lc_factor(state, key_a, key_b, a_T_a_b, config,
                                 remove_prior_slot, use_association)
    pose_mask = jnp.arange(state.traj_poses.shape[0]) < state.n_poses
    result = sv.solve(_graph_view(state), state.traj_poses, pose_mask,
                      config.solver)
    state = state._replace(traj_poses=result.poses,
                           last_error=result.error_final)
    info = StepInfo(key=key_b, icp_valid=jnp.bool_(True),
                    icp_inliers=jnp.int32(0),
                    solve_error=result.error_final)
    return state, info


def _append_lc_and_solve_cached(state: OnlineState, cache, key_a, key_b,
                                a_T_a_b, config: EstimatorConfig,
                                remove_prior_slot, use_association: bool,
                                align_mask=None):
    """Cached-preconditioner loop-closure solve: absorb the new factor
    into the persisted WoodburyCache (rank-6 capacitance extension) and
    solve with it — the TPU analogue of iSAM2 updating its Bayes tree
    instead of re-factorizing (incremental_estimator.cpp:151-163)."""
    if align_mask is not None:
        state = _apply_group_alignment(state, key_a, key_b, a_T_a_b,
                                       align_mask)
    state, idx = _append_lc_factor(state, key_a, key_b, a_T_a_b, config,
                                   remove_prior_slot, use_association)
    pose_mask = jnp.arange(state.traj_poses.shape[0]) < state.n_poses
    graph = _graph_view(state)
    if config.solver.closure_solve == 'delta':
        # Relinearize-skip fast path (solver.solve_closure_cached):
        # absorbs the factor and solves H delta = -g_newfactor against
        # the cached factorization — the iSAM2 relinearizeThreshold
        # analogue, a fraction of the launches of the full GN step.
        cache, result = sv.solve_closure_cached(
            graph, state.traj_poses, pose_mask, cache, idx, config.solver)
    else:
        cache = sv.extend_cache(graph, state.traj_poses, pose_mask, cache,
                                idx, config.solver)
        result = sv.solve_cached(graph, state.traj_poses, pose_mask, cache,
                                 config.solver)
    state = state._replace(traj_poses=result.poses,
                           last_error=result.error_final)
    info = StepInfo(key=key_b, icp_valid=jnp.bool_(True),
                    icp_inliers=jnp.int32(0),
                    solve_error=result.error_final)
    return state, cache, info


@functools.partial(jax.jit,
                   static_argnames=('config', 'odometry_free',
                                    'range_unit_m'),
                   donate_argnums=(0,))
def online_step_ranges(state: OnlineState, ranges_u16: jax.Array,
                       table, odom_pose7: jax.Array,
                       config: EstimatorConfig,
                       track_id: jax.Array = jnp.int32(0),
                       odometry_free: bool = False,
                       range_unit_m: float = None
                       ) -> Tuple[OnlineState, StepInfo]:
    """:func:`online_step` fed by the sensor's native encoding: a uint16
    range image ``[B, A]`` (0 = no echo) plus a device-resident
    :class:`ops.spherical.BeamTable`, decoded to Cartesian points as the
    first fused stage of the same program.

    Why: over a bandwidth-limited host->device transport the xyz upload
    dominates the whole step at high density (12 B/point f32 vs the
    sensor's 2 B/point — see ops/spherical.py).  The decode lands the
    points in the same packed ring-major layout the xyz path uses, so
    everything downstream (rng-consuming filters included) is shared and
    the two paths differ only by the range quantization
    (test_packed_ingest_matches_xyz_ingest).
    """
    from laser_slam_tpu.ops import spherical
    if range_unit_m is None:
        range_unit_m = spherical.RANGE_UNIT_M
    points, n_valid = spherical.decode_and_pack(ranges_u16, table,
                                                range_unit_m)
    return online_step(state, points, n_valid, odom_pose7, config,
                       track_id, odometry_free=odometry_free)


@functools.partial(jax.jit, static_argnames=('range_unit_m',))
def decode_ranges_chunk(ranges_u16: jax.Array, table,
                        range_unit_m: float = None):
    """Decode a chunk of range images ``[C, B, A]`` into device-resident
    ``(points [C, B*A, 3], n_valid [C])`` for :func:`online_chunk` — the
    chunked analogue of :func:`online_step_ranges` (one small upload +
    one decode dispatch per chunk; the chunk step then runs on device
    arrays with zero further transfer)."""
    from laser_slam_tpu.ops import spherical
    if range_unit_m is None:
        range_unit_m = spherical.RANGE_UNIT_M
    return spherical.decode_and_pack(ranges_u16, table, range_unit_m)


@functools.partial(jax.jit, static_argnames=('config',),
                   donate_argnums=(0,))
def online_solve(state: OnlineState, config: EstimatorConfig
                 ) -> Tuple[OnlineState, jax.Array]:
    """Re-run the full-graph solve on the current state — no new factors.

    A large correction (e.g. a cross-track linking closure moving an
    absorbed track ~100 m into the shared frame) is outside one solve's
    Gauss-Newton trust region: translation converges but chain rotations
    can retain degree-level error.  In live operation the next scans'
    solves absorb it (the reference likewise leans on its 3x-per-scan
    isam2 updates, incremental_estimator.cpp:156-159); for offline use or
    end-of-run polishing, call this directly (OnlineRunner.refine).
    Returns (state, final solve error).
    """
    pose_mask = jnp.arange(state.traj_poses.shape[0]) < state.n_poses
    result = sv.solve(_graph_view(state), state.traj_poses, pose_mask,
                      config.solver)
    return state._replace(traj_poses=result.poses,
                          last_error=result.error_final), result.error_final


@functools.partial(jax.jit, static_argnames=('config', 'use_association'),
                   donate_argnums=(0,))
def online_loop_closure(state: OnlineState, key_a: jax.Array,
                        key_b: jax.Array, w_T_a_b: jax.Array,
                        config: EstimatorConfig,
                        remove_prior_slot: jax.Array = jnp.int32(-1),
                        use_association: bool = False,
                        align_mask=None
                        ) -> Tuple[OnlineState, StepInfo]:
    """Add a loop-closure factor between two existing keys and re-solve.

    ``w_T_a_b`` is the world-frame alignment from place recognition; it is
    converted to the relative frame of key_a exactly as
    incremental_estimator.cpp:83-87.  For submap-ICP refinement of the
    alignment on device, use :func:`online_loop_closure_refined`.
    ``align_mask`` ([N] bool, linking closures): poses to rigidly
    pre-align by the closure's world correction — the absorbed group
    (see :func:`_apply_group_alignment`).
    """
    T_w_a = state.traj_poses[key_a]
    T_w_b = state.traj_poses[key_b]
    a_T_a_b = se3.compose(se3.inverse(T_w_a),
                          se3.compose(se3.normalize(w_T_a_b), T_w_b))
    return _append_lc_and_solve(state, key_a, key_b, a_T_a_b, config,
                                remove_prior_slot, use_association,
                                align_mask)


@functools.partial(jax.jit, static_argnames=('config', 'use_association'),
                   donate_argnums=(0, 1))
def online_loop_closure_cached(state: OnlineState, cache, key_a: jax.Array,
                               key_b: jax.Array, w_T_a_b: jax.Array,
                               config: EstimatorConfig,
                               remove_prior_slot: jax.Array = jnp.int32(-1),
                               use_association: bool = False,
                               align_mask=None):
    """:func:`online_loop_closure` with a persisted solver cache
    (solver.WoodburyCache): the new factor extends the cached capacitance
    factorization instead of triggering a preconditioner rebuild.
    Returns (state, cache, info)."""
    T_w_a = state.traj_poses[key_a]
    T_w_b = state.traj_poses[key_b]
    a_T_a_b = se3.compose(se3.inverse(T_w_a),
                          se3.compose(se3.normalize(w_T_a_b), T_w_b))
    return _append_lc_and_solve_cached(state, cache, key_a, key_b, a_T_a_b,
                                       config, remove_prior_slot,
                                       use_association, align_mask)


def _gather_submap(state: OnlineState, archive: ScanArchive,
                   center_key: jax.Array, frame_T_inv: jax.Array,
                   radius: int):
    """Submap around a key from the archive, in ``frame_T_inv``'s frame
    (buildSubMapAroundTime, laser_track.cpp:602-651): the ``radius``
    preceding and following scans OF THE CENTER KEY'S TRACK, transformed
    by their current pose estimates.

    The window runs over the track's own scan sequence (the archive's
    per-track key index), so interleaved multi-robot streams get
    full-density submaps — matching the reference's per-track radius
    semantics exactly."""
    A = archive.points.shape[0]
    tid = jnp.maximum(archive.track[center_key], 0)
    cpos = archive.track_pos[center_key]
    ps = cpos + jnp.arange(-radius, radius + 1)
    ks = archive.track_keys[tid, jnp.clip(ps, 0, A - 1)]
    ksc = jnp.clip(ks, 0, A - 1)
    valid_k = ((ps >= 0) & (ps < archive.track_count[tid]) &
               (ks >= 0) & (ks < state.n_poses) &
               (archive.track[center_key] >= 0))
    pts = archive.points[ksc]                      # [2R+1,M,3]
    msk = archive.mask[ksc] & valid_k[:, None]
    nrm = archive.normals[ksc]
    rel = jax.vmap(lambda k: se3.compose(
        frame_T_inv, state.traj_poses[k]))(ksc)
    wpts = se3.apply(rel[:, None, :], pts)
    wnrm = se3.quat_rotate(rel[:, None, :4], nrm)
    cloud = pc.Cloud(
        jnp.where(msk[..., None], wpts, pc.SENTINEL).reshape(-1, 3),
        msk.reshape(-1))
    return cloud, wnrm.reshape(-1, 3)


@functools.partial(jax.jit,
                   static_argnames=('config', 'odometry_free',
                                    'with_archive', 'return_scans',
                                    'pr_config'),
                   donate_argnums=(0, 1))
def online_chunk(state: OnlineState, archive, points: jax.Array,
                 n_valid: jax.Array, odom_pose7s: jax.Array,
                 track_ids: jax.Array, config: EstimatorConfig,
                 odometry_free: bool = False, with_archive: bool = True,
                 return_scans: bool = False, pr_db=None, pr_keys=None,
                 pr_n=None, pr_config=None):
    """Integrate C scans in ONE dispatched program (lax.scan over the
    online step).  points [C,N,3], n_valid [C], odom_pose7s [C,7],
    track_ids [C].

    Why this exists: over a remote-dispatch transport (the axon tunnel
    this framework is benched on — and any disaggregated serving setup),
    per-call overhead scales with the argument pytree's ARRAY COUNT
    (~0.5-0.7 ms per array handle; the ~40-array OnlineState costs
    ~20 ms/call pipelined, measured), which dwarfs the ~10 ms of device
    compute a KITTI-density scan needs.  Scanning C scans inside one
    program amortizes the marshalling C× while computing bit-identically
    to C sequential :func:`online_step` calls (same rng path, same
    donation).  The single-scan path stays for latency-critical live use;
    this is the replay/serving fast path.

    ``return_scans``: additionally stack each scan's stored (filtered)
    points/mask and the pose solved AT THAT STEP — device-resident
    outputs for a chunked DeviceMapper accumulate (the ring only
    retains the last nscan_in_sub_map scans, so a post-hoc read cannot
    recover every chunk scan).

    ``pr_db/pr_keys/pr_n`` + static ``pr_config`` (a
    PlaceRecognitionConfig) run the scan-context detector cadence
    ON DEVICE as additional scanned stages: every scan's descriptor is
    added to the database, every ``detect_every``-th key is queried
    against it, and the per-scan best-match rows accumulate like
    ``return_scans`` — ONE [C,3] readback per chunk instead of a
    dispatch per scan, so chunked transport amortization and automatic
    loop closing compose (the reference runs detection in a separate
    segmatch node, incremental_estimator.cpp:63-149; candidate
    acceptance/verification/injection stays host-side at chunk
    boundaries, see OnlineRunner.flush_detections).

    Returns
    (state, archive, infos[, (scan_pts [C,N,3], scan_msk [C,N],
    pose7s [C,7])][, (pr_db, pr_keys, pr_n, pr_rows [C,3])]).
    """
    inputs = (points, n_valid, odom_pose7s, track_ids)
    use_pr = pr_config is not None
    if use_pr:
        from laser_slam_tpu.ops import scan_context as sc
    else:
        # Zero-size placeholders keep one carry structure for both modes.
        pr_db = jnp.zeros((1, 1, 1), jnp.float32)
        pr_keys = jnp.full((1,), -1, jnp.int32)
        pr_n = jnp.int32(0)

    def step(st, inp):
        pts, nv, od, tid = inp
        st, info = online_step(st, pts, nv, od, config, tid,
                               odometry_free=odometry_free)
        out = info
        if return_scans:
            out = (info, (st.ring_points[tid, -1], st.ring_mask[tid, -1],
                          st.traj_poses[info.key]))
        return st, out

    def body(carry, inp):
        st, ar, db, dbk, dbn = carry
        st, out = step(st, inp)
        info = out[0] if return_scans else out
        tid = inp[3]
        if with_archive:
            ar = archive_append(ar, st.ring_points[tid, -1],
                                st.ring_mask[tid, -1],
                                st.ring_normals[tid, -1], info.key, tid)
        if use_pr:
            c = pr_config
            scan_pts = st.ring_points[tid, -1]
            scan_msk = st.ring_mask[tid, -1]
            desc, dist, shift = sc.descriptor_and_query(
                db, dbk, scan_pts, scan_msk,
                info.key - jnp.int32(c.exclude_recent_keys),
                n_rings=c.n_rings, n_sectors=c.n_sectors,
                max_radius_m=c.max_radius_m, z_offset_m=c.z_offset_m)
            i = jnp.argmin(dist)
            yaw = sc.yaw_from_shift(shift[i], c.n_sectors)
            row = jnp.stack([dbk[i].astype(jnp.float32), dist[i], yaw])
            do_q = ((info.key % max(c.detect_every, 1) == 0) & (dbn > 0))
            # Sentinel row (key -1) = "not queried"; to_detection rejects
            # it.  Cooldown filtering happens host-side at flush time
            # (injection order isn't known until then).
            row = jnp.where(do_q, row,
                            jnp.array([-1.0, jnp.inf, 0.0], jnp.float32))
            db = db.at[dbn].set(desc)
            dbk = dbk.at[dbn].set(info.key)
            dbn = dbn + 1
            out = (out, row)
        return (st, ar, db, dbk, dbn), out

    (state, archive, pr_db, pr_keys, pr_n), outs = jax.lax.scan(
        body, (state, archive, pr_db, pr_keys, pr_n), inputs)
    if use_pr:
        outs, pr_rows = outs
    ret = [state, archive]
    if return_scans:
        infos, scans = outs
        ret += [infos, scans]
    else:
        ret.append(outs)
    if use_pr:
        ret.append((pr_db, pr_keys, pr_n, pr_rows))
    return tuple(ret)


def _refine_lc_meas(state: OnlineState, archive: ScanArchive,
                    key_a, key_b, w_T_a_b, config: EstimatorConfig):
    """Device-side submap-ICP refinement of a loop-closure alignment
    (incremental_estimator.cpp:90-115): radius submaps around both keys
    are built from the scan archive, registered point-to-plane with the
    place-recognition alignment as the initial guess.  A failed ICP falls
    back to the guess (the reference's ConvergenceError path,
    laser_track.cpp:495-502).  Returns (meas, icp_result)."""
    R = config.loop_closures_sub_maps_radius
    T_w_a = state.traj_poses[key_a]
    T_w_b = state.traj_poses[key_b]
    guess = se3.compose(se3.inverse(T_w_a),
                        se3.compose(se3.normalize(w_T_a_b), T_w_b))
    submap_a, normals_a = _gather_submap(state, archive, key_a,
                                         se3.inverse(T_w_a), R)
    submap_b, _ = _gather_submap(state, archive, key_b,
                                 se3.inverse(T_w_b), R)
    reading = pc.compact(submap_b, config.laser_track.icp.reading_capacity)
    icp_res = icp_mod.icp_point_to_plane(reading, submap_a, normals_a,
                                         guess, config.laser_track.icp)
    return jnp.where(icp_res.valid, icp_res.T, guess), icp_res


@functools.partial(jax.jit, static_argnames=('config', 'use_association'),
                   donate_argnums=(0,))
def online_loop_closure_refined(state: OnlineState, archive: ScanArchive,
                                key_a: jax.Array, key_b: jax.Array,
                                w_T_a_b: jax.Array,
                                config: EstimatorConfig,
                                remove_prior_slot: jax.Array = jnp.int32(-1),
                                use_association: bool = False,
                                align_mask=None
                                ) -> Tuple[OnlineState, StepInfo]:
    """Loop closure with device-side submap-ICP refinement of the
    alignment (see :func:`_refine_lc_meas`)."""
    meas, icp_res = _refine_lc_meas(state, archive, key_a, key_b, w_T_a_b,
                                    config)
    state, info = _append_lc_and_solve(state, key_a, key_b, meas, config,
                                       remove_prior_slot, use_association,
                                       align_mask)
    return state, info._replace(icp_valid=icp_res.valid,
                                icp_inliers=icp_res.num_inliers)


@functools.partial(jax.jit, static_argnames=('config', 'use_association'),
                   donate_argnums=(0, 2))
def online_loop_closure_refined_cached(state: OnlineState,
                                       archive: ScanArchive, cache,
                                       key_a: jax.Array, key_b: jax.Array,
                                       w_T_a_b: jax.Array,
                                       config: EstimatorConfig,
                                       remove_prior_slot: jax.Array
                                       = jnp.int32(-1),
                                       use_association: bool = False,
                                       align_mask=None):
    """:func:`online_loop_closure_refined` with a persisted solver cache
    (see :func:`online_loop_closure_cached`).  Returns
    (state, cache, info)."""
    meas, icp_res = _refine_lc_meas(state, archive, key_a, key_b, w_T_a_b,
                                    config)
    state, cache, info = _append_lc_and_solve_cached(
        state, cache, key_a, key_b, meas, config, remove_prior_slot,
        use_association, align_mask)
    return state, cache, info._replace(icp_valid=icp_res.valid,
                                       icp_inliers=icp_res.num_inliers)


@functools.partial(jax.jit, static_argnames=('config',))
def verify_closure(state: OnlineState, archive: ScanArchive,
                   key_a: jax.Array, key_b: jax.Array, w_T_a_b: jax.Array,
                   config: EstimatorConfig) -> jax.Array:
    """Geometric verification of a loop-closure CANDIDATE (no state
    change): submap ICP from the candidate alignment, scored by fit.

    The reference trusts whatever segmatch sends (processLoopClosure has
    no rejection path, incremental_estimator.cpp:63-149); with in-tree
    detection a gate is required — descriptor matching is subject to
    perceptual aliasing (rotationally symmetric rooms, corridors), and a
    wrong closure corrupts the graph.  A truly co-located pair has high
    submap overlap (large trimmed-inlier fraction, small residual); an
    aliased pair tens of metres away has next to none.

    Returns [4] f32: (icp_valid, mean |p2pl residual| m, inlier fraction
    of the reading, reading point count)."""
    R = config.loop_closures_sub_maps_radius
    T_w_a = state.traj_poses[key_a]
    T_w_b = state.traj_poses[key_b]
    guess = se3.compose(se3.inverse(T_w_a),
                        se3.compose(se3.normalize(w_T_a_b), T_w_b))
    submap_a, normals_a = _gather_submap(state, archive, key_a,
                                         se3.inverse(T_w_a), R)
    submap_b, _ = _gather_submap(state, archive, key_b,
                                 se3.inverse(T_w_b), R)
    reading = pc.compact(submap_b, config.laser_track.icp.reading_capacity)
    res = icp_mod.icp_point_to_plane(reading, submap_a, normals_a, guess,
                                     config.laser_track.icp)
    n_read = jnp.maximum(jnp.sum(reading.mask), 1).astype(jnp.float32)
    frac = res.num_inliers.astype(jnp.float32) / n_read
    return jnp.stack([res.valid.astype(jnp.float32), res.mean_error,
                      frac, n_read])


def extract_trajectory(state: OnlineState) -> np.ndarray:
    """One bulk device->host transfer: the valid trajectory [n,7]."""
    n = int(state.n_poses)
    return np.asarray(state.traj_poses[:n])


class OnlineRunner:
    """Host driver for the online fast path: distance gating on host
    odometry, everything else on device.  Supports N tracks (multi-robot)
    sharing one pose table and graph, with the reference's linked-worker
    prior-removal semantics (incremental_estimator.cpp:165-266) handled
    through host bookkeeping + device weight writes."""

    def __init__(self, config: EstimatorConfig, pose_capacity: int = 4096,
                 factor_capacity: int = 8192,
                 minimum_distance_to_add_pose: float = 0.0, seed: int = 0,
                 n_tracks: int = 1, archive_points: int = 0,
                 use_odometry_information: bool = True,
                 map_config=None, place_recognition=None):
        """``archive_points`` > 0 keeps a per-key downsampled scan archive
        on device and enables submap-ICP refinement of loop closures when
        ``config.do_icp_step_on_loop_closures`` is set.
        ``use_odometry_information=False`` switches to the constant-
        velocity odometry-free mode (pass ``odom_pose7=None`` to
        process_scan).  ``map_config`` (a WorkerConfig) attaches a
        device-resident local/distant map (pipeline.device_map).
        ``place_recognition`` (a PlaceRecognitionConfig) attaches the
        in-tree scan-context detector: loop closures are then DETECTED
        and injected automatically (pipeline.place_recognition replaces
        the reference's external segmatch node); pair with
        ``archive_points`` so detections get submap-ICP refinement."""
        self.config = config
        self.n_tracks = n_tracks
        self.state = init_state(config, pose_capacity, factor_capacity,
                                seed=seed, n_tracks=n_tracks)
        self.min_dist = minimum_distance_to_add_pose
        self.use_odometry = use_odometry_information
        self.archive = (init_archive(pose_capacity, archive_points,
                                     n_tracks)
                        if archive_points > 0 else None)
        self.mapper = None
        if map_config is not None:
            from laser_slam_tpu.pipeline.device_map import DeviceMapper
            self.mapper = DeviceMapper(map_config, n_tracks=n_tracks)
        self.detector = None
        self.detections: list = []       # (key_a, key_b, distance, yaw)
        # Candidates that failed ICP verification:
        # (key_a, key_b, distance, inlier_fraction, mean_residual_m).
        self.rejected_detections: list = []
        self._pr_pending: list = []      # unfetched (key, device [3]) rows
        if place_recognition is not None:
            from laser_slam_tpu.pipeline.place_recognition import (
                ScanContextDetector)
            self.detector = ScanContextDetector(place_recognition)
        self._last_odom: list = [None] * n_tracks
        # (track_id, time_ns) per key, in key order.
        self.key_info: list = []
        self.scan_cap = config.laser_track.input_filters.scan_capacity
        # Multi-robot bookkeeping (mirrors IncrementalEstimator).
        self._linked_groups: list = []
        self._prior_slot_of_track: dict = {}
        self._n_priors_seen = 0
        self._tracks_seen: set = set()
        # Host mirror of the device factor counter (2 per normal scan,
        # 1 per loop closure) for capacity guarding.
        self._n_rel_host = 0
        # Background growth-precompile (see _maybe_prefetch_growth).
        self.prefetch_growth_compile = True
        self._prefetch_thread = None
        self._prefetched: set = set()
        # Packed (uint16 range-image) ingest — see enable_packed_ingest.
        self._beam_table = None
        self._range_unit_m = None
        # Persisted loop-closure solver cache (solver.WoodburyCache):
        # built on the first full-graph solve, extended rank-6 per new
        # closure, rebuilt after cache_rebuild_after appended factors or
        # any capacity growth.
        self._solver_cache = None
        self._cache_rel_count = 0

    def enable_packed_ingest(self, elev_deg, n_azimuth: int,
                             range_unit_m: float = None) -> None:
        """Accept scans as sensor-native uint16 range images.

        After this call, :meth:`process_scan` / :meth:`process_scans`
        treat a 2-D uint16 ``points`` payload ``[n_beams, n_azimuth]``
        (0 = no echo, else range in ``range_unit_m`` units — the raw
        Velodyne word) as a packed scan: it is uploaded as-is (2 B/point
        vs 12 B for xyz) and decoded to Cartesian on device inside the
        fused online step (ops/spherical.py has the bandwidth math).
        Float ``[N, 3]`` payloads keep working unchanged, so mixed
        streams are fine.  ``elev_deg`` is the sensor's per-ring
        elevation table (e.g. velodyne_sim.HDL64_ELEV_DEG).
        """
        from laser_slam_tpu.ops import spherical
        self._beam_table = spherical.beam_table(elev_deg, n_azimuth)
        self._range_unit_m = float(range_unit_m if range_unit_m is not None
                                   else spherical.RANGE_UNIT_M)

    def _is_packed_scan(self, points) -> bool:
        packed = (getattr(points, 'dtype', None) == np.uint16
                  and getattr(points, 'ndim', 0) == 2)
        if packed and self._beam_table is None:
            raise ValueError('uint16 range-image scan received but packed '
                             'ingest is not configured; call '
                             'enable_packed_ingest(elev_deg, n_azimuth) '
                             'first')
        return packed

    def _ensure_capacity(self, new_poses: int = 0, new_rels: int = 0,
                         new_priors: int = 0) -> None:
        """Grow device buffers before an append would overflow them.

        Silent truncation is the alternative (JAX drops out-of-bounds
        scatters), so this MUST run before every state-mutating step.
        """
        P = self.state.traj_poses.shape[0]
        F = self.state.rel_meas.shape[0]
        R = self.state.prior_meas.shape[0]
        n_poses = len(self.key_info)
        kw = {}
        if n_poses + new_poses > P:
            kw['pose_capacity'] = max(P * 2, n_poses + new_poses)
        if self._n_rel_host + new_rels > F:
            kw['factor_capacity'] = max(F * 2, self._n_rel_host + new_rels)
        if self._n_priors_seen + new_priors > R:
            kw['prior_capacity'] = max(R * 2,
                                       self._n_priors_seen + new_priors)
        if kw:
            if self._prefetch_thread is not None:
                # A background precompile may be mid-flight for exactly
                # these shapes; let it finish so the step below is a
                # cache hit instead of a duplicate concurrent compile.
                self._prefetch_thread.join()
                self._prefetch_thread = None
            self.state = grow_state(self.state, **kw)
            if self.archive is not None and 'pose_capacity' in kw:
                self.archive = grow_archive(self.archive,
                                            kw['pose_capacity'])
            # Rebucketed shapes invalidate the solver cache (its chain
            # factorization is sized to the old pose capacity).
            self._solver_cache = None

    def marginal_covariances(self, keys, exact: bool = False) -> np.ndarray:
        """Per-key 6x6 marginal covariances of the current device graph
        (PCG probes, solver.marginal_covariance) — online counterpart of
        IncrementalEstimator.marginal_covariances.  keys: sequence of
        global pose keys -> [K,6,6] numpy.

        ``exact=True`` routes to the host-side sparse f64 path
        (solver.marginal_covariance_exact — the reference's own tool
        class): required for ABSOLUTE marginals on weakly-anchored
        graphs, where f32 device probes saturate on the weak modes
        (see marginal_covariance's accuracy envelope).

        When the runner holds a live Woodbury solver cache (woodbury
        preconditioner + a past loop-closure solve), the device probes
        run ENTIRELY against it (solver.marginal_covariance_cached):
        zero O(F) work per query.  The covariances are then those of
        the graph as absorbed into the cache — closures are absorbed by
        extend_cache as they land; odometry factors appended since the
        last rebuild are not reflected until the cache_rebuild_after
        cadence rebuilds (bounded drift, see the solver docstring)."""
        pose_mask = np.arange(self.state.traj_poses.shape[0]) < int(
            self.state.n_poses)
        if exact:
            return sv.marginal_covariance_exact(
                _graph_view(self.state), self.state.traj_poses,
                jnp.asarray(pose_mask),
                np.asarray(keys, np.int32), self.config.solver)
        if self._solver_cache is not None:
            covs = sv.marginal_covariance_cached(
                _graph_view(self.state), self.state.traj_poses,
                jnp.asarray(pose_mask),
                jnp.asarray(np.asarray(keys, np.int32)),
                self._solver_cache, self.config.solver)
        else:
            covs = sv.marginal_covariance(
                _graph_view(self.state), self.state.traj_poses,
                jnp.asarray(pose_mask),
                jnp.asarray(np.asarray(keys, np.int32)),
                self.config.solver)
        return np.asarray(covs)

    def refine(self, iterations: int = 1,
               gn_iterations: Optional[int] = None,
               pcg_iterations: Optional[int] = None,
               pcg_tolerance: Optional[float] = None) -> float:
        """Extra full-graph solve passes (see :func:`online_solve`).

        The optional overrides run a STRONGER solver than the per-scan
        config without changing it — e.g. after a cross-track linking
        closure (a ~100 m correction), ``refine(1, gn_iterations=6,
        pcg_iterations=256, pcg_tolerance=1e-10)`` converges the linked
        map to centimeters where the online 3x48 budget leaves meter-
        level chain rotation error.  Returns the last solve's error.
        """
        cfg = self.config
        overrides = (gn_iterations, pcg_iterations, pcg_tolerance)
        if any(o is not None for o in overrides):
            # `is not None` rather than truthiness: an explicit 0/0.0 is a
            # literal override, not "use the config default".
            import dataclasses
            s = cfg.solver
            s = dataclasses.replace(
                s,
                gn_iterations=(s.gn_iterations if gn_iterations is None
                               else gn_iterations),
                pcg_iterations=(s.pcg_iterations if pcg_iterations is None
                                else pcg_iterations),
                pcg_tolerance=(s.pcg_tolerance if pcg_tolerance is None
                               else pcg_tolerance))
            cfg = dataclasses.replace(cfg, solver=s)
        err = float('nan')
        for _ in range(max(iterations, 1)):
            self.state, e = online_solve(self.state, cfg)
            err = float(e)
        return err

    def _maybe_prefetch_growth(self) -> None:
        """Warm the jit cache for the NEXT capacity bucket in a background
        thread once occupancy crosses 50%.

        Growing re-buckets the state to new shapes, and the next
        ``online_step`` pays a full XLA recompile — ~10 s over this
        deployment's remote-compile tunnel, a visible stall in a live
        stream.  Tracing/compiling is thread-safe and releases the GIL
        inside XLA, so a background dummy step at the grown shapes
        overlaps the compile with real scan processing; by the time
        growth actually happens the executable is cached.  (Threads are
        fine here — the one-process-per-TPU rule is about processes.)

        Only pays off when half a bucket's worth of scans takes longer
        than one compile (e.g. >= ~2048 poses at ~11 ms/scan vs ~10 s
        compiles): smaller buckets grow before the background compile
        finishes and the growth path simply joins it (measured: no gain
        but no harm in the 64->512 soak).  The thread is non-daemon on
        purpose — a daemon thread torn down mid-XLA-compile aborts the
        interpreter (observed: 'terminate called after throwing' at
        exit); Python joins non-daemon threads cleanly instead.
        """
        if not self.prefetch_growth_compile:
            return
        if (self._prefetch_thread is not None
                and self._prefetch_thread.is_alive()):
            return
        P = self.state.traj_poses.shape[0]
        F = self.state.rel_meas.shape[0]
        P2 = P * 2 if len(self.key_info) >= P // 2 else P
        F2 = F * 2 if self._n_rel_host >= F // 2 else F
        if (P2, F2) == (P, F) or (P2, F2) in self._prefetched:
            return
        self._prefetched.add((P2, F2))
        import threading

        cfg = self.config
        R = self.state.prior_meas.shape[0]
        scan_cap, n_tracks = self.scan_cap, self.n_tracks
        odometry_free = not self.use_odometry
        beam_table = self._beam_table
        range_unit_m = self._range_unit_m

        def work():
            try:
                dummy = init_state(cfg, P2, F2, prior_capacity=R,
                                   n_tracks=n_tracks)
                if beam_table is not None:
                    # Packed ingest: the hot path is online_step_ranges
                    # on the [B,A] uint16 image — precompile THAT shape
                    # (the xyz step would be a cache miss at growth time).
                    B = beam_table.sin_elev.shape[0]
                    A = beam_table.cos_az.shape[0]
                    img = jnp.zeros((B, A), jnp.uint16)
                    s2, _ = online_step_ranges(
                        dummy, img, beam_table,
                        jnp.asarray(se3.identity()), cfg, jnp.int32(0),
                        odometry_free=odometry_free,
                        range_unit_m=range_unit_m)
                else:
                    pts = jnp.full((scan_cap, 3), pc.SENTINEL, jnp.float32)
                    s2, _ = online_step(dummy, pts, jnp.int32(0),
                                        jnp.asarray(se3.identity()), cfg,
                                        jnp.int32(0),
                                        odometry_free=odometry_free)
                jax.block_until_ready(s2.traj_poses)
            except Exception:
                pass  # best-effort: growth falls back to a foreground compile

        self._prefetch_thread = threading.Thread(target=work, daemon=False)
        self._prefetch_thread.start()

    def process_scan(self, time_ns: int, points: np.ndarray,
                     odom_pose7: Optional[np.ndarray] = None,
                     track_id: int = 0) -> bool:
        # Benchmarker topic parity with the host worker (C5); dispatch is
        # async, so this measures HOST cost per scan, not device time —
        # use bench.device_trace for kernels.
        from laser_slam_tpu.core import benchmarker as _bench
        with _bench.scoped_timer('online.process_scan'):
            return self._process_scan(time_ns, points, odom_pose7, track_id)

    def process_scans(self, frames, track_id: int = 0,
                      chunk_size: int = 8) -> int:
        """Chunked streaming ingestion: integrate
        ``(time_ns, points, odom_pose7)`` tuples (or ScanFrame-likes) as
        ``chunk_size``-scan device dispatches via :func:`online_chunk`
        (any remainder runs through the per-scan step, so only ONE chunk
        shape ever compiles regardless of the list length).

        Semantically identical to calling :meth:`process_scan` per frame
        (same rng path, same factors; enforced by
        test_process_scans_chunk_matches_sequential); the difference is
        host cost — per-dispatch argument marshalling is paid once per
        chunk instead of once per scan, which wins when the transport
        makes dispatch expensive (measured trade in
        experiments/chunked_e2e.py; on a local-attached chip the
        per-scan path pipelines fine and chunking is optional).  Returns
        the number of scans accepted (min-distance gating applies).

        An attached DeviceMapper accumulates chunk scans in one extra
        dispatch per chunk (online_chunk's ``return_scans`` outputs feed
        ``DeviceMapper.accumulate_chunk`` — device-resident end to end,
        same per-step poses as the sequential path).
        """
        frames = [(f.time_ns, f.points, f.odom_pose7)
                  if hasattr(f, 'points') else f for f in frames]
        from laser_slam_tpu.core import benchmarker as _bench
        with _bench.scoped_timer('online.process_scans'):
            accepted = []
            for t, p, o in frames:
                if o is None:
                    if self.use_odometry:
                        raise ValueError('odometry pose required when '
                                         'use_odometry_information is set')
                    o = np.asarray(se3.identity(), np.float32)
                else:
                    o = np.asarray(o, np.float32)
                    last = self._last_odom[track_id]
                    if (last is not None and self.min_dist > 0
                            and np.linalg.norm(o[4:] - last[4:])
                            <= self.min_dist):
                        continue
                    self._last_odom[track_id] = o
                accepted.append((t, p, o))
            if not accepted:
                return 0
            C = len(accepted)
            chunk_size = max(int(chunk_size), 1)
            # Chunks must be payload-homogeneous (a packed chunk uploads
            # one uint16 [C,B,A] stack, an xyz chunk one f32 [C,N,3]
            # stack), so a mixed stream is split into same-kind runs and
            # chunked within each run.
            runs = []
            for frame in accepted:
                kind = self._is_packed_scan(frame[1])
                if runs and runs[-1][0] == kind:
                    runs[-1][1].append(frame)
                else:
                    runs.append((kind, [frame]))
            for _, run in runs:
                n_chunks = (len(run) // chunk_size if chunk_size > 1
                            else 0)
                for ci in range(n_chunks):
                    self._dispatch_chunk(
                        run[ci * chunk_size:(ci + 1) * chunk_size],
                        track_id)
                for t, p, o in run[n_chunks * chunk_size:]:
                    self._integrate_one(t, p, o, track_id)
            return C

    def _dispatch_chunk(self, chunk, track_id: int) -> None:
        """One online_chunk dispatch over pre-gated frames."""
        C = len(chunk)
        first_scan_of_track = track_id not in self._tracks_seen
        self._tracks_seen.add(track_id)
        self._ensure_capacity(
            new_poses=C,
            new_rels=2 * C - (2 if first_scan_of_track else 0),
            new_priors=1 if first_scan_of_track else 0)
        self._n_rel_host += 2 * C - (2 if first_scan_of_track else 0)
        odos = np.stack([o for _, _, o in chunk]).astype(np.float32)
        if self._is_packed_scan(chunk[0][1]):
            # Packed chunk: one small uint16 upload + one decode dispatch;
            # online_chunk then consumes the decoded device arrays with no
            # further host transfer (see online_step_ranges).
            ranges = np.stack([p for _, p, _ in chunk])
            dev_pts, dev_nv = decode_ranges_chunk(
                jnp.asarray(ranges), self._beam_table,
                range_unit_m=self._range_unit_m)
        else:
            padded = np.full((C, self.scan_cap, 3), pc.SENTINEL, np.float32)
            nv = np.zeros((C,), np.int32)
            for k, (t, p, o) in enumerate(chunk):
                pts = np.asarray(p, np.float32)
                n = min(len(pts), self.scan_cap)
                padded[k, :n] = pts[:n]
                nv[k] = n
            dev_pts, dev_nv = jnp.asarray(padded), jnp.asarray(nv)
        tids = np.full((C,), track_id, np.int32)
        archive = self.archive
        with_archive = archive is not None
        if not with_archive:
            archive = init_archive(1, 1, self.n_tracks)
        pr_kw = {}
        if self.detector is not None:
            # Detection cadence runs ON DEVICE inside the chunk (adds +
            # every-detect_every queries as scanned stages); candidate
            # rows come back as one [C,3] array and injection happens at
            # the chunk boundary via flush_detections.
            self.detector.ensure_room(C)
            pr_kw = dict(pr_db=self.detector.db,
                         pr_keys=self.detector.db_keys,
                         pr_n=jnp.int32(self.detector.n),
                         pr_config=self.detector.config)
        out = online_chunk(
            self.state, archive, dev_pts, dev_nv,
            jnp.asarray(odos), jnp.asarray(tids), self.config,
            odometry_free=not self.use_odometry,
            with_archive=with_archive,
            return_scans=self.mapper is not None, **pr_kw)
        out = list(out)
        if self.detector is not None:
            db, dbk, dbn, pr_rows = out.pop()
            self.detector.db = db
            self.detector.db_keys = dbk
            self.detector.n += C
        if self.mapper is not None:
            self.state, archive, infos, scans = out
            self.mapper.accumulate_chunk(*scans, track_id=track_id)
        else:
            self.state, archive, infos = out
        if with_archive:
            self.archive = archive
        base_key = len(self.key_info)
        for t, _, _ in chunk:
            self.key_info.append((track_id, t))
        if self.detector is not None:
            self._pr_pending.append(
                (list(range(base_key, base_key + C)), pr_rows))
            de = max(self.detector.config.detect_every, 1)
            n_queries = sum(1 for ks, _ in self._pr_pending
                            for k in ks if k % de == 0)
            if n_queries >= max(self.detector.config.fetch_every, 1):
                self.flush_detections()
        if first_scan_of_track:
            if track_id > 0:
                self._prior_slot_of_track[track_id] = self._n_priors_seen
            self._n_priors_seen += 1
            self._linked_groups.append([track_id])
        self._maybe_prefetch_growth()

    def _process_scan(self, time_ns: int, points: np.ndarray,
                      odom_pose7: Optional[np.ndarray] = None,
                      track_id: int = 0) -> bool:
        if odom_pose7 is None:
            if self.use_odometry:
                raise ValueError('odometry pose required when '
                                 'use_odometry_information is set')
            odom_pose7 = np.asarray(se3.identity(), np.float32)
        else:
            odom_pose7 = np.asarray(odom_pose7, np.float32)
            last = self._last_odom[track_id]
            if last is not None and self.min_dist > 0:
                if np.linalg.norm(odom_pose7[4:] - last[4:]) <= self.min_dist:
                    return False
            self._last_odom[track_id] = odom_pose7
        return self._integrate_one(time_ns, points, odom_pose7, track_id)

    def _integrate_one(self, time_ns: int, points: np.ndarray,
                       odom_pose7: np.ndarray, track_id: int = 0) -> bool:
        """Single online_step dispatch for an already-GATED frame
        (process_scan applies the min-distance gate; process_scans gates
        its whole batch up front, so its remainder frames must not be
        re-gated — the accept loop already advanced _last_odom)."""
        first_scan_of_track = track_id not in self._tracks_seen
        self._tracks_seen.add(track_id)
        self._ensure_capacity(new_poses=1,
                              new_rels=0 if first_scan_of_track else 2,
                              new_priors=1 if first_scan_of_track else 0)
        if not first_scan_of_track:
            self._n_rel_host += 2
        if self._is_packed_scan(points):
            self.state, info = online_step_ranges(
                self.state, jnp.asarray(points), self._beam_table,
                jnp.asarray(odom_pose7), self.config, jnp.int32(track_id),
                odometry_free=not self.use_odometry,
                range_unit_m=self._range_unit_m)
        else:
            pts = np.asarray(points, np.float32)
            n = min(len(pts), self.scan_cap)
            padded = np.full((self.scan_cap, 3), pc.SENTINEL, np.float32)
            padded[:n] = pts[:n]
            self.state, info = online_step(
                self.state, jnp.asarray(padded), jnp.int32(n),
                jnp.asarray(odom_pose7), self.config, jnp.int32(track_id),
                odometry_free=not self.use_odometry)
        if self.archive is not None:
            self.archive = archive_append(
                self.archive, self.state.ring_points[track_id, -1],
                self.state.ring_mask[track_id, -1],
                self.state.ring_normals[track_id, -1],
                info.key, jnp.int32(track_id))
        if self.mapper is not None:
            self.mapper.accumulate(self.state, track_id)
        self.key_info.append((track_id, time_ns))
        if first_scan_of_track:
            # Prior slots are allocated in first-scan order
            # (registerPrior, incremental_estimator.cpp:268-291).
            if track_id > 0:
                self._prior_slot_of_track[track_id] = self._n_priors_seen
            self._n_priors_seen += 1
            self._linked_groups.append([track_id])
        if self.detector is not None:
            self._pr_scan(track_id, len(self.key_info) - 1)
        self._maybe_prefetch_growth()
        return True

    def _pr_scan(self, track_id: int, key: int) -> None:
        """Feed the newest filtered scan (sensor frame, already on device
        in the submap ring) to the scan-context detector; query results
        accumulate ON DEVICE and are fetched ``fetch_every`` at a time in
        one transfer (the host boundary costs ~full link latency per
        fetch — docs/design.md §4)."""
        pts = self.state.ring_points[track_id, -1]
        msk = self.state.ring_mask[track_id, -1]
        pr_cfg = self.detector.config
        cooldown = (self.detections and
                    key - self.detections[-1][1]
                    < pr_cfg.min_keys_between_detections)
        do_query = (key % max(pr_cfg.detect_every, 1) == 0
                    and self.detector.n > 0 and not cooldown)
        if not do_query:
            self.detector.add(pts, msk, key)
            return
        res = self.detector.query_async(pts, msk, key, add=True)
        if res is not None:
            self._pr_pending.append(([key], res[None]))
        if len(self._pr_pending) >= max(pr_cfg.fetch_every, 1):
            self.flush_detections()

    def flush_detections(self) -> None:
        """Fetch all pending place-recognition query results in ONE
        device->host transfer and inject the closures that pass the
        threshold + cooldown + ICP-verification gates.  Called
        automatically every ``fetch_every`` queries; call manually to
        drain before reading final results.  Pending entries are
        (keys, rows [len(keys),3]) batches — a single row from the
        per-scan path or a whole chunk's accumulated rows."""
        if not self._pr_pending:
            return
        from laser_slam_tpu.core import benchmarker as _bench
        with _bench.scoped_timer('online.flush_detections'):
            pending, self._pr_pending = self._pr_pending, []
            keys = [k for ks, _ in pending for k in ks]
            rows = np.asarray(jnp.concatenate([r for _, r in pending],
                                              axis=0))
            for key, row in zip(keys, rows):
                det = self.detector.to_detection(row)
                if det is None:
                    continue
                pr_cfg = self.detector.config
                if (self.detections and
                        key - self.detections[-1][1]
                        < pr_cfg.min_keys_between_detections):
                    continue
                self._inject_detection(det, key)

    def _inject_detection(self, det, key: int) -> None:
        """Verify one detection and add it as a loop closure."""
        pr_cfg = self.detector.config
        # w_T_a_b from the current estimates and the matched yaw:
        # a_T_a_b ~= Rz(yaw) (same place, heading differs), and the
        # estimator converts back via T_w_a^-1 . w_T_a_b . T_w_b
        # (incremental_estimator.cpp:83-87) — so
        # w_T_a_b = T_w_a . Rz(yaw) . T_w_b^-1.
        pair = np.asarray(self.state.traj_poses[
            jnp.asarray([det.key, key])])
        # Odometry-consistency gate (see PlaceRecognitionConfig): the
        # candidate asserts co-location, so the implied correction equals
        # the keys' estimated separation; same-track corrections beyond
        # what accumulated odometry drift can explain are aliasing by
        # construction.  Runs first — it is free and catches the perfect-
        # aliasing case the ICP gate is blind to (identical geometry
        # registers with zero residual).
        k_sig = pr_cfg.odom_consistency_sigmas
        if k_sig > 0 and self.key_info[det.key][0] == self.key_info[key][0]:
            sigma_t = max(self.config.laser_track.odometry_noise_model[3:6])
            allowed = k_sig * sigma_t * float(np.sqrt(abs(key - det.key)))
            sep_m = float(np.linalg.norm(pair[0][4:] - pair[1][4:]))
            if sep_m > allowed:
                # frac=-1 marks a consistency (not ICP) rejection; the
                # last field carries the offending separation in metres.
                self.rejected_detections.append(
                    (det.key, key, det.distance, -1.0, sep_m))
                return
        half = 0.5 * det.yaw_rad
        rz = np.array([np.cos(half), 0.0, 0.0, np.sin(half),
                       0.0, 0.0, 0.0], np.float32)
        w_T_a_b = np.asarray(se3.compose(
            jnp.asarray(pair[0]),
            se3.compose(jnp.asarray(rz),
                        se3.inverse(jnp.asarray(pair[1])))))
        if pr_cfg.verify_with_icp and self.archive is not None:
            from laser_slam_tpu.core import benchmarker as _bench
            with _bench.scoped_timer('online.verify_closure'):
                ok, mean_err, frac, _ = np.asarray(verify_closure(
                    self.state, self.archive, jnp.int32(det.key),
                    jnp.int32(key), jnp.asarray(w_T_a_b), self.config))
            if not (ok > 0.5 and frac >= pr_cfg.min_inlier_fraction
                    and mean_err <= pr_cfg.max_mean_residual_m):
                self.rejected_detections.append(
                    (det.key, key, det.distance, float(frac),
                     float(mean_err)))
                return
        self.detections.append((det.key, key, det.distance, det.yaw_rad))
        self.add_loop_closure(det.key, key, w_T_a_b)

    def add_loop_closure(self, key_a: int, key_b: int,
                         w_T_a_b: np.ndarray,
                         verify_with_icp: bool = False,
                         min_inlier_fraction: float = 0.3,
                         max_mean_residual_m: float = 0.3) -> bool:
        """Inject a loop closure (keys are global).  Cross-track closures
        that link two previously unlinked groups remove the absorbed
        group's prior and use the first-association noise model
        (estimateAndRemove semantics).  With a scan archive and
        ``do_icp_step_on_loop_closures``, the alignment is refined by
        device-side submap ICP first (incremental_estimator.cpp:90-115).

        ``verify_with_icp``: opt-in geometric gate on this MANUAL
        closure (requires a scan archive).  The reference trusts every
        caller-supplied closure (processLoopClosure has no rejection
        path, incremental_estimator.cpp:63-149) and so does the default
        here; with the gate on, the candidate is scored by
        :func:`verify_closure` against the given thresholds and dropped
        (recorded in ``rejected_detections``, returns False) when the
        submaps do not actually align.  Returns True when injected."""
        if verify_with_icp:
            if self.archive is None:
                raise ValueError('verify_with_icp needs a scan archive '
                                 '(archive_points > 0)')
            ok, mean_err, frac, _ = np.asarray(verify_closure(
                self.state, self.archive, jnp.int32(key_a),
                jnp.int32(key_b),
                jnp.asarray(np.asarray(w_T_a_b, np.float32)), self.config))
            if not (ok > 0.5 and frac >= min_inlier_fraction
                    and mean_err <= max_mean_residual_m):
                self.rejected_detections.append(
                    (key_a, key_b, float('nan'), float(frac),
                     float(mean_err)))
                return False
        self._ensure_capacity(new_rels=1)
        self._n_rel_host += 1
        track_a = self.key_info[key_a][0]
        track_b = self.key_info[key_b][0]
        remove_slot = -1
        use_assoc = False
        align_mask = None
        if track_a != track_b:
            ga = self._find_group(track_a)
            gb = self._find_group(track_b)
            if ga is not gb:
                keep, drop = (ga, gb) if 0 in ga else (gb, ga)
                for tid in drop:
                    if tid in self._prior_slot_of_track:
                        remove_slot = self._prior_slot_of_track.pop(tid)
                        use_assoc = True
                # Rigidly pre-align the absorbed group's poses by the
                # closure's world correction before solving (see
                # _apply_group_alignment: the parked->linked jump is a
                # frame shift, not a per-pose optimization problem).
                dropped = set(drop)
                m = np.zeros((self.state.traj_poses.shape[0],), bool)
                m[[k for k, (t, _) in enumerate(self.key_info)
                   if t in dropped]] = True
                align_mask = jnp.asarray(m)
                keep.extend(drop)
                self._linked_groups.remove(drop)
        old_lasts = None
        if self.mapper is not None:
            # Last-pose snapshot of EVERY track: the solve moves all
            # linked tracks, and each track's map must be re-rigidified by
            # ITS OWN correction (per-worker updateLocalMap,
            # laser_slam_worker.cpp:522-540).
            old_lasts = self.state.traj_poses[
                jnp.maximum(self.state.track_last_key, 0)]
        from laser_slam_tpu.core import benchmarker as _bench
        cache = self._lc_solver_cache()
        refined = (self.archive is not None
                   and self.config.do_icp_step_on_loop_closures)
        _lc_timer = _bench.scoped_timer('online.lc_solve_dispatch')
        _lc_timer.__enter__()
        # (closed by the matching __exit__ below; the dispatch calls
        # between them don't raise in normal operation and the timer is
        # diagnostics-only, so a try/finally indent isn't warranted)
        if cache is not None and refined:
            self.state, self._solver_cache, _ = (
                online_loop_closure_refined_cached(
                    self.state, self.archive, cache, jnp.int32(key_a),
                    jnp.int32(key_b),
                    jnp.asarray(np.asarray(w_T_a_b, np.float32)),
                    self.config, remove_prior_slot=jnp.int32(remove_slot),
                    use_association=use_assoc, align_mask=align_mask))
        elif cache is not None:
            self.state, self._solver_cache, _ = online_loop_closure_cached(
                self.state, cache, jnp.int32(key_a), jnp.int32(key_b),
                jnp.asarray(np.asarray(w_T_a_b, np.float32)), self.config,
                remove_prior_slot=jnp.int32(remove_slot),
                use_association=use_assoc, align_mask=align_mask)
        elif refined:
            self.state, _ = online_loop_closure_refined(
                self.state, self.archive, jnp.int32(key_a),
                jnp.int32(key_b),
                jnp.asarray(np.asarray(w_T_a_b, np.float32)), self.config,
                remove_prior_slot=jnp.int32(remove_slot),
                use_association=use_assoc, align_mask=align_mask)
        else:
            self.state, _ = online_loop_closure(
                self.state, jnp.int32(key_a), jnp.int32(key_b),
                jnp.asarray(np.asarray(w_T_a_b, np.float32)), self.config,
                remove_prior_slot=jnp.int32(remove_slot),
                use_association=use_assoc, align_mask=align_mask)
        _lc_timer.__exit__(None, None, None)
        if self.mapper is not None:
            # Re-rigidify each track's device map by that track's own
            # (new_last * old_last^-1) (updateLocalMap,
            # laser_slam_worker.cpp:522-540 — one call per worker).
            new_lasts = self.state.traj_poses[
                jnp.maximum(self.state.track_last_key, 0)]
            for tid in range(self.n_tracks):
                if int(self.state.track_last_key[tid]) < 0:
                    continue  # track has no scans (and no map) yet
                self.mapper.rigidify(
                    se3.compose(new_lasts[tid],
                                se3.inverse(old_lasts[tid])), tid)
        return True

    def warmup_closure_path(self, use_association: bool = False) -> None:
        """Pre-compile the loop-closure injection programs so the FIRST
        real closure of a live stream doesn't stall it for the jit
        compile (several seconds over a remote-compile link).

        Compiles exactly the variants :meth:`add_loop_closure` will
        dispatch for the current config — the ICP verification gate
        (when a detector with ``verify_with_icp`` is attached), and the
        refined / cached / plain full-graph solve — and builds the
        persistent solver cache when ``preconditioner='woodbury'``.
        The closure programs donate their state buffers, so the warmup
        runs them on device-side copies and discards the results; the
        runner's state is untouched.  Call after a few scans have been
        processed (>= 2 keys must exist) and the capacities have
        settled — a capacity growth recompiles these programs anyway.
        """
        if len(self.key_info) < 2:
            raise ValueError('warmup_closure_path needs >= 2 keys '
                             '(process some scans first)')
        ka, kb = jnp.int32(0), jnp.int32(1)
        ident = jnp.asarray(se3.identity())
        slot = jnp.int32(-1)
        # Cross-track (use_association) injections also pass the
        # absorbed-group alignment mask — warm up the same traced
        # variant add_loop_closure will dispatch.
        amask = (jnp.zeros((self.state.traj_poses.shape[0],), bool)
                 if use_association else None)
        sink = []
        if (self.archive is not None and self.detector is not None
                and self.detector.config.verify_with_icp):
            sink.append(verify_closure(self.state, self.archive, ka, kb,
                                       ident, self.config))
        cache = self._lc_solver_cache()
        refined = (self.archive is not None
                   and self.config.do_icp_step_on_loop_closures)
        st = jax.tree_util.tree_map(jnp.copy, self.state)
        if cache is not None and refined:
            c2 = jax.tree_util.tree_map(jnp.copy, cache)
            s2, c2, _ = online_loop_closure_refined_cached(
                st, self.archive, c2, ka, kb, ident, self.config,
                remove_prior_slot=slot, use_association=use_association,
                align_mask=amask)
        elif cache is not None:
            c2 = jax.tree_util.tree_map(jnp.copy, cache)
            s2, c2, _ = online_loop_closure_cached(
                st, c2, ka, kb, ident, self.config,
                remove_prior_slot=slot, use_association=use_association,
                align_mask=amask)
        elif refined:
            s2, _ = online_loop_closure_refined(
                st, self.archive, ka, kb, ident, self.config,
                remove_prior_slot=slot, use_association=use_association,
                align_mask=amask)
        else:
            s2, _ = online_loop_closure(
                st, ka, kb, ident, self.config,
                remove_prior_slot=slot, use_association=use_association,
                align_mask=amask)
        sink.append(s2.traj_poses)
        jax.block_until_ready(sink)

    def _lc_solver_cache(self):
        """The persisted WoodburyCache for loop-closure full solves, or
        None when the configured preconditioner isn't 'woodbury' (the
        plain solve path builds its own preconditioner per call).

        Builds lazily on first use and rebuilds once
        ``cache_rebuild_after`` factors have been appended since the last
        build (appended chain factors ride identity rows in the cached
        chain factorization — stale but convergence-safe)."""
        s = self.config.solver
        if s.preconditioner != 'woodbury':
            return None
        if (self._solver_cache is None
                or self._n_rel_host - self._cache_rel_count
                > max(s.cache_rebuild_after, 0)):
            from laser_slam_tpu.core import benchmarker as _bench
            with _bench.scoped_timer('online.lc_cache_build'):
                pose_mask = (jnp.arange(self.state.traj_poses.shape[0])
                             < self.state.n_poses)
                self._solver_cache = sv.build_cache(
                    _graph_view(self.state), self.state.traj_poses,
                    pose_mask, s)
            self._cache_rel_count = self._n_rel_host
        return self._solver_cache

    def _find_group(self, track_id: int) -> list:
        for g in self._linked_groups:
            if track_id in g:
                return g
        g = [track_id]
        self._linked_groups.append(g)
        return g

    def trajectory(self, track_id: Optional[int] = None) -> dict:
        """{time_ns: pose7}; pass track_id to select one robot's track."""
        if self.detector is not None:
            self.flush_detections()      # apply any pending closures first
        poses = extract_trajectory(self.state)
        return {t: poses[i] for i, (tid, t) in enumerate(self.key_info)
                if track_id is None or tid == track_id}
