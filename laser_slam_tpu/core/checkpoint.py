"""Checkpoint / resume for the full SLAM state.

The reference has export-only paths (trajectory CSV dumps and the
GetLaserTrackSrv snapshot, laser_slam_worker.cpp:260-317,551-603) but no
reload (SURVEY §5).  Here checkpointing is first-class: the complete
estimator + track + worker state round-trips through one ``.npz`` file —
graph factors, pose table, trajectories, measurement logs, scans (with
normals), scan rings, multi-robot link bookkeeping, and worker map state
— so a crashed or suspended run resumes exactly where it stopped.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.config import Config
from laser_slam_tpu.core.estimator import IncrementalEstimator
from laser_slam_tpu.core.types import LaserScan, Pose, RelativePose
from laser_slam_tpu.ops import cloud as pc

_FORMAT_VERSION = 2


def _relposes_to_arrays(rels: Sequence[RelativePose]):
    """Split pose (float32 [N,7]) from times/keys (int64 [N,6]).

    Times are epoch nanoseconds and exceed float64's 2**53 integer range;
    storing them in a float array would round them and break the exact
    time-key lookups (trajectory.key_at, _pose_measurement_at) on resume.
    """
    poses = np.zeros((len(rels), 7), np.float32)
    meta = np.zeros((len(rels), 6), np.int64)
    for i, r in enumerate(rels):
        poses[i] = r.T_a_b
        meta[i] = (r.time_a_ns, r.time_b_ns, r.key_a, r.key_b,
                   r.track_id_a, r.track_id_b)
    return poses, meta


def _relposes_from_arrays(poses: np.ndarray,
                          meta: np.ndarray) -> List[RelativePose]:
    return [RelativePose(T_a_b=p.astype(np.float32),
                         time_a_ns=int(m[0]), time_b_ns=int(m[1]),
                         key_a=int(m[2]), key_b=int(m[3]),
                         track_id_a=int(m[4]), track_id_b=int(m[5]))
            for p, m in zip(poses, meta)]


def save_online_checkpoint(path: str, runner) -> None:
    """Checkpoint the device-resident fast path (pipeline.online).

    One bulk device->host transfer of the ``OnlineState`` pytree plus the
    ``OnlineRunner``'s host bookkeeping; :func:`load_online_checkpoint`
    resumes mid-sequence with bit-identical subsequent steps (the RNG key
    round-trips through ``jax.random.key_data``).  The reference's closest
    analog is the export-only GetLaserTrackSrv snapshot
    (laser_slam_worker.cpp:260-317); resume has no reference equivalent.
    """
    import jax
    state = runner.state
    data = {'online_format_version': 1,
            'n_tracks': runner.n_tracks,
            'min_dist': np.float64(runner.min_dist),
            'scan_cap': np.int64(runner.scan_cap),
            'n_rel_host': np.int64(runner._n_rel_host),
            'n_priors_seen': np.int64(runner._n_priors_seen),
            'tracks_seen': np.asarray(sorted(runner._tracks_seen), np.int64),
            'key_info': np.asarray(runner.key_info, np.int64).reshape(-1, 2),
            'linked_flat': np.asarray(
                [t for g in runner._linked_groups for t in g], np.int64),
            'linked_sizes': np.asarray(
                [len(g) for g in runner._linked_groups], np.int64),
            'prior_slot_keys': np.asarray(
                list(runner._prior_slot_of_track.keys()), np.int64),
            'prior_slot_vals': np.asarray(
                list(runner._prior_slot_of_track.values()), np.int64),
            'last_odom_valid': np.asarray(
                [o is not None for o in runner._last_odom]),
            'last_odom': np.stack(
                [o if o is not None else np.zeros(7, np.float32)
                 for o in runner._last_odom])}
    data['use_odometry'] = np.bool_(runner.use_odometry)
    for name, leaf in state._asdict().items():
        if name == 'rng_key':
            leaf = jax.random.key_data(leaf)
        data['s_' + name] = np.asarray(leaf)
    if runner.archive is not None:
        for name, leaf in runner.archive._asdict().items():
            data['a_' + name] = np.asarray(leaf)
    if runner.mapper is not None:
        data['mapper_n_tracks'] = np.int64(runner.mapper.n_tracks)
        for t in range(runner.mapper.n_tracks):
            for pre, m in ((f'ml{t}_', runner.mapper.local_maps[t]),
                           (f'md{t}_', runner.mapper.distant_maps[t])):
                for name, leaf in m._asdict().items():
                    data[pre + name] = np.asarray(leaf)
    if getattr(runner, 'detector', None) is not None:
        # Pending (unfetched) detection queries must land before the
        # snapshot, or their closures would be lost on resume.
        runner.flush_detections()
        data['pr_db'] = np.asarray(runner.detector.db)
        data['pr_keys'] = np.asarray(runner.detector.db_keys)
        data['pr_n'] = np.int64(runner.detector.n)
    data['detections'] = np.asarray(
        getattr(runner, 'detections', []), np.float64).reshape(-1, 4)
    np.savez_compressed(path, **data)


def load_online_checkpoint(path: str, config, map_config=None,
                           place_recognition=None):
    """Rebuild an ``OnlineRunner`` from :func:`save_online_checkpoint`.

    ``config`` must be the run's ``EstimatorConfig`` (capacities are taken
    from the checkpoint arrays themselves, so a grown state restores at
    its grown size).  Pass the run's ``map_config`` (WorkerConfig) to
    restore an attached device map, and its ``place_recognition``
    (PlaceRecognitionConfig) to restore the scan-context database.
    """
    import jax
    from laser_slam_tpu.pipeline import online
    z = np.load(path, allow_pickle=False)
    version = int(z['online_format_version'])
    if version != 1:
        raise ValueError(
            f'unsupported online checkpoint format version {version} '
            f'(this build reads version 1)')
    runner = online.OnlineRunner.__new__(online.OnlineRunner)
    runner.config = config
    runner.prefetch_growth_compile = True
    runner._prefetch_thread = None
    runner._prefetched = set()
    runner.n_tracks = int(z['n_tracks'])
    runner.use_odometry = (bool(z['use_odometry'])
                           if 'use_odometry' in z else True)
    runner.archive = None
    if 'a_points' in z:
        leaves = {}
        for name in online.ScanArchive._fields:
            if 'a_' + name in z:
                leaves[name] = jnp.asarray(z['a_' + name])
        if 'track_pos' not in leaves:
            # Pre-per-track-index checkpoint: rebuild the track index from
            # the archive's track column (keys were appended in ascending
            # global order).
            track = np.asarray(z['a_track'])
            A = len(track)
            T = int(z['n_tracks'])
            tpos = np.zeros((A,), np.int32)
            tkeys = np.full((T, A), -1, np.int32)
            counts = np.zeros((T,), np.int32)
            for k in range(A):
                t = int(track[k])
                if t < 0:
                    continue
                tpos[k] = counts[t]
                tkeys[t, counts[t]] = k
                counts[t] += 1
            leaves['track_pos'] = jnp.asarray(tpos)
            leaves['track_keys'] = jnp.asarray(tkeys)
            leaves['track_count'] = jnp.asarray(counts)
        runner.archive = online.ScanArchive(**leaves)
    runner.mapper = None
    has_maps = 'ml0_points' in z or 'ml_points' in z
    if has_maps and map_config is None:
        raise ValueError(
            'checkpoint contains device-map state but map_config is None; '
            'pass the run\'s WorkerConfig to restore the map (resuming '
            'without it would silently continue with an empty map)')
    if has_maps:
        from laser_slam_tpu.pipeline import device_map
        n_map_tracks = int(z.get('mapper_n_tracks', 1))
        runner.mapper = device_map.DeviceMapper(map_config,
                                                n_tracks=n_map_tracks)
        for t in range(n_map_tracks):
            # 'ml_'/'md_' (no index) is the pre-per-track format; it maps
            # onto track 0.
            lp = f'ml{t}_' if f'ml{t}_points' in z else 'ml_'
            dp = f'md{t}_' if f'md{t}_points' in z else 'md_'
            runner.mapper.local_maps[t] = device_map.MapState(**{
                name: jnp.asarray(z[lp + name])
                for name in device_map.MapState._fields})
            runner.mapper.distant_maps[t] = device_map.MapState(**{
                name: jnp.asarray(z[dp + name])
                for name in device_map.MapState._fields})
    runner.detector = None
    runner.detections = ([(int(r[0]), int(r[1]), float(r[2]), float(r[3]))
                          for r in z['detections']]
                         if 'detections' in z else [])
    runner.rejected_detections = []
    runner._pr_pending = []
    if 'pr_db' in z and place_recognition is None:
        raise ValueError(
            'checkpoint contains a place-recognition database but '
            'place_recognition is None; pass the run\'s '
            'PlaceRecognitionConfig (resuming without it would silently '
            'stop detecting loop closures)')
    if 'pr_db' in z:
        from laser_slam_tpu.pipeline.place_recognition import (
            ScanContextDetector)
        runner.detector = ScanContextDetector(place_recognition)
        runner.detector.db = jnp.asarray(z['pr_db'])
        runner.detector.db_keys = jnp.asarray(z['pr_keys'])
        runner.detector.n = int(z['pr_n'])
    runner.min_dist = float(z['min_dist'])
    runner.scan_cap = int(z['scan_cap'])
    runner._n_rel_host = int(z['n_rel_host'])
    runner._n_priors_seen = int(z['n_priors_seen'])
    runner._tracks_seen = {int(t) for t in z['tracks_seen']}
    runner.key_info = [(int(a), int(b)) for a, b in z['key_info']]
    groups, off = [], 0
    for size in z['linked_sizes']:
        groups.append([int(t) for t in z['linked_flat'][off:off + size]])
        off += int(size)
    runner._linked_groups = groups
    runner._prior_slot_of_track = {
        int(k): int(v) for k, v in zip(z['prior_slot_keys'],
                                       z['prior_slot_vals'])}
    runner._last_odom = [
        np.asarray(o, np.float32) if ok else None
        for o, ok in zip(z['last_odom'], z['last_odom_valid'])]
    leaves = {}
    for name in online.OnlineState._fields:
        arr = jnp.asarray(z['s_' + name])
        if name == 'rng_key':
            arr = jax.random.wrap_key_data(arr)
        leaves[name] = arr
    runner.state = online.OnlineState(**leaves)
    return runner


def save_checkpoint(path: str, estimator: IncrementalEstimator,
                    workers: Optional[Sequence] = None,
                    include_scans: bool = True) -> None:
    data = {'format_version': _FORMAT_VERSION,
            'n_workers': estimator.n_workers,
            'n_keys': estimator._n_keys,
            'poses': estimator._poses[:estimator._n_keys],
            'linked_workers_flat': np.asarray(
                [w for g in estimator._linked_workers for w in g], np.int64),
            'linked_workers_sizes': np.asarray(
                [len(g) for g in estimator._linked_workers], np.int64),
            'prior_factor_keys': np.asarray(
                list(estimator._prior_factor_of_worker.keys()), np.int64),
            'prior_factor_vals': np.asarray(
                list(estimator._prior_factor_of_worker.values()), np.int64)}

    g = estimator.graph
    data.update(
        g_n_rel=g.n_rel, g_n_prior=g.n_prior,
        g_rel_meas=g.rel_meas[:g.n_rel], g_rel_keys=g.rel_keys[:g.n_rel],
        g_rel_sqrt_info=g.rel_sqrt_info[:g.n_rel],
        g_rel_robust=g.rel_robust[:g.n_rel],
        g_rel_fixed_a=g.rel_fixed_a[:g.n_rel],
        g_rel_weight=g.rel_weight[:g.n_rel],
        g_prior_meas=g.prior_meas[:g.n_prior],
        g_prior_keys=g.prior_keys[:g.n_prior],
        g_prior_sqrt_info=g.prior_sqrt_info[:g.n_prior],
        g_prior_weight=g.prior_weight[:g.n_prior])

    for i, track in enumerate(estimator.laser_tracks):
        p = f't{i}_'
        traj = track.trajectory
        data[p + 'traj_times'] = traj._times[:traj.size]
        data[p + 'traj_poses'] = traj._poses[:traj.size]
        data[p + 'traj_keys'] = traj._keys[:traj.size]
        data[p + 'pose_meas_times'] = np.asarray(
            track.pose_measurement_times, np.int64)
        data[p + 'pose_meas'] = (np.stack(track.pose_measurements)
                                 if track.pose_measurements
                                 else np.zeros((0, 7), np.float32))
        for name, rels in (('odom', track.odometry_measurements),
                           ('icp', track.icp_transformations),
                           ('lc', track.loop_closures)):
            rp, rm = _relposes_to_arrays(rels)
            data[p + name] = rp
            data[p + name + '_meta'] = rm
        data[p + 'ring_times'] = track._ring_times
        if include_scans:
            data[p + 'scan_times'] = np.asarray(
                [s.time_ns for s in track.scans], np.int64)
            data[p + 'scan_keys'] = np.asarray(
                [s.key for s in track.scans], np.int64)
            if track.scans:
                data[p + 'scan_points'] = np.stack(
                    [np.asarray(s.cloud.points) for s in track.scans])
                data[p + 'scan_masks'] = np.stack(
                    [np.asarray(s.cloud.mask) for s in track.scans])
                data[p + 'scan_normals'] = np.stack(
                    [np.asarray(s.normals) for s in track.scans])

    if workers:
        for i, w in enumerate(workers):
            p = f'w{i}_'
            data[p + 'world_to_odom'] = w.world_to_odom
            data[p + 'base_time'] = np.int64(
                w._base_time_ns if w._base_time_ns is not None else -1)
            data[p + 'last_pose'] = (w._last_pose if w._last_pose is not None
                                     else np.full(7, np.nan, np.float32))
            data[p + 'map_points'] = w._map_points[:w._map_count]
            data[p + 'distant_points'] = w._distant_points

    np.savez_compressed(path, **data)


def load_checkpoint(path: str, config: Config,
                    workers_cls=None):
    """Rebuild (estimator, workers) from a checkpoint.

    ``workers_cls`` defaults to pipeline.worker.LaserSlamWorker (imported
    lazily to avoid a cycle); pass None workers if only the estimator is
    needed.
    """
    z = np.load(path, allow_pickle=False)
    version = int(z['format_version'])
    if version != _FORMAT_VERSION:
        raise ValueError(
            f'unsupported checkpoint format version {version} '
            f'(this build reads version {_FORMAT_VERSION})')
    n_workers = int(z['n_workers'])
    est = IncrementalEstimator(config.estimator, n_workers)

    n_keys = int(z['n_keys'])
    while est._pose_capacity < n_keys:
        est._pose_capacity *= 2
    est._poses = np.zeros((est._pose_capacity, 7), np.float32)
    est._poses[:, 0] = 1.0
    est._poses[:n_keys] = z['poses']
    est._n_keys = n_keys

    groups, off = [], 0
    for size in z['linked_workers_sizes']:
        groups.append([int(x) for x in
                       z['linked_workers_flat'][off:off + size]])
        off += size
    est._linked_workers = groups
    est._prior_factor_of_worker = {
        int(k): int(v) for k, v in zip(z['prior_factor_keys'],
                                       z['prior_factor_vals'])}

    g = est.graph
    n_rel, n_prior = int(z['g_n_rel']), int(z['g_n_prior'])
    while g._rel_cap < n_rel:
        g._grow_rel()
    while g._prior_cap < n_prior:
        g._grow_prior()
    g.n_rel, g.n_prior = n_rel, n_prior
    g.rel_meas[:n_rel] = z['g_rel_meas']
    g.rel_keys[:n_rel] = z['g_rel_keys']
    g.rel_sqrt_info[:n_rel] = z['g_rel_sqrt_info']
    g.rel_robust[:n_rel] = z['g_rel_robust']
    g.rel_fixed_a[:n_rel] = z['g_rel_fixed_a']
    g.rel_weight[:n_rel] = z['g_rel_weight']
    g.prior_meas[:n_prior] = z['g_prior_meas']
    g.prior_keys[:n_prior] = z['g_prior_keys']
    g.prior_sqrt_info[:n_prior] = z['g_prior_sqrt_info']
    g.prior_weight[:n_prior] = z['g_prior_weight']

    for i, track in enumerate(est.laser_tracks):
        p = f't{i}_'
        times = z[p + 'traj_times']
        for t, pose, key in zip(times, z[p + 'traj_poses'],
                                z[p + 'traj_keys']):
            track.trajectory.extend(int(t), pose, int(key))
        track.pose_measurement_times = [int(t) for t in
                                        z[p + 'pose_meas_times']]
        track.pose_measurements = [row for row in z[p + 'pose_meas']]
        track.odometry_measurements = _relposes_from_arrays(
            z[p + 'odom'], z[p + 'odom_meta'])
        track.icp_transformations = _relposes_from_arrays(
            z[p + 'icp'], z[p + 'icp_meta'])
        track.loop_closures = _relposes_from_arrays(
            z[p + 'lc'], z[p + 'lc_meta'])
        track._ring_times = z[p + 'ring_times'].copy()
        if p + 'scan_points' in z:
            pts = z[p + 'scan_points']
            msk = z[p + 'scan_masks']
            nrm = z[p + 'scan_normals']
            for k in range(len(z[p + 'scan_times'])):
                track.scans.append(LaserScan(
                    cloud=pc.Cloud(jnp.asarray(pts[k]), jnp.asarray(msk[k])),
                    time_ns=int(z[p + 'scan_times'][k]),
                    key=int(z[p + 'scan_keys'][k]),
                    normals=jnp.asarray(nrm[k])))
            # Rebuild the device scan ring from the most recent scans.
            # The checkpoint's scan capacity wins over the config's (a
            # mismatched config would otherwise break the ring shapes —
            # full RESUMING still requires the original config).
            K = track._ring_points.shape[0]
            n_ckpt = pts.shape[1]
            if n_ckpt != track._ring_points.shape[1]:
                track._ring_points = jnp.full((K, n_ckpt, 3), pc.SENTINEL,
                                              jnp.float32)
                track._ring_mask = jnp.zeros((K, n_ckpt), bool)
                track._ring_normals = jnp.zeros((K, n_ckpt, 3), jnp.float32)
            for s in track.scans[-K:]:
                track._push_ring(s)
            track._ring_times = z[p + 'ring_times'].copy()

    workers = None
    if f'w0_world_to_odom' in z:
        if workers_cls is None:
            from laser_slam_tpu.pipeline.worker import LaserSlamWorker
            workers_cls = LaserSlamWorker
        workers = []
        for i in range(n_workers):
            p = f'w{i}_'
            w = workers_cls(config.worker, est, i)
            w.world_to_odom = z[p + 'world_to_odom']
            bt = int(z[p + 'base_time'])
            w._base_time_ns = None if bt < 0 else bt
            lp = z[p + 'last_pose']
            w._last_pose = None if np.isnan(lp[0]) else lp
            mp = z[p + 'map_points']
            w._map_points[:len(mp)] = mp
            w._map_count = len(mp)
            w._distant_points = z[p + 'distant_points']
            workers.append(w)
    return est, workers
