"""Worker + replay pipeline tests (scanCallback semantics end-to-end)."""

import os

import numpy as np
import pytest

from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                   InputFilterConfig, LaserTrackConfig,
                                   SolverConfig, WorkerConfig)
from laser_slam_tpu.core.estimator import IncrementalEstimator
from laser_slam_tpu.pipeline import replay
from laser_slam_tpu.pipeline.worker import LaserSlamWorker


def small_setup(use_icp=True, use_odom_info=True, n_workers=1,
                odom_sigmas=(0.005, 0.005, 0.005, 0.0015, 0.0015, 0.0015)):
    est_cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            odometry_noise_model=odom_sigmas,
            use_icp_factors=use_icp, nscan_in_sub_map=3,
            input_filters=InputFilterConfig(min_distance_m=0.5,
                                            max_distance_m=60.0,
                                            scan_capacity=2048),
            icp=IcpConfig(reading_sampling_ratio=0.5, reading_capacity=1024,
                          matcher='brute')),
        do_icp_step_on_loop_closures=False,
        solver=SolverConfig(gn_iterations=2, pcg_iterations=40,
                            pose_capacity=64, factor_capacity=256))
    worker_cfg = WorkerConfig(
        minimum_distance_to_add_pose=0.5, voxel_size_m=0.2,
        distance_to_consider_fixed=30.0,
        use_odometry_information=use_odom_info,
        local_map_capacity=1 << 16)
    est = IncrementalEstimator(est_cfg, n_workers)
    workers = [LaserSlamWorker(worker_cfg, est, i) for i in range(n_workers)]
    return est, workers


def test_replay_distance_gate(rng):
    est, (worker,) = small_setup(use_icp=False)
    # Stationary robot: only the first scan passes the gate.
    stream = replay.SyntheticStream(n_scans=5, points_per_scan=1024,
                                    trajectory='line', seed=1)
    frames = list(stream)
    for f in frames:
        f.odom_pose7 = frames[0].odom_pose7  # no motion
    n = replay.run_worker_on_stream(worker, frames)
    assert n == 1


def test_worker_tracks_ground_truth(rng):
    est, (worker,) = small_setup(use_icp=True)
    stream = replay.SyntheticStream(n_scans=6, points_per_scan=2048,
                                    trajectory='line', noise_m=0.005,
                                    odom_noise=0.005, seed=2)
    frames = list(stream)
    n = replay.run_worker_on_stream(worker, frames)
    assert n == 6
    traj = sorted(worker.get_trajectory().items())
    # Compare against ground truth (rebased times).
    errs = []
    for (t, p), f in zip(traj, frames):
        errs.append(np.linalg.norm(p[4:] - f.gt_pose7[4:]))
    assert max(errs) < 0.08, errs
    # world_to_odom correction reflects accumulated odometry drift.
    assert worker.world_to_odom.shape == (7,)


def test_local_map_accumulates_and_filters(rng):
    est, (worker,) = small_setup(use_icp=False)
    stream = replay.SyntheticStream(n_scans=4, points_per_scan=1024,
                                    trajectory='line', seed=3)
    replay.run_worker_on_stream(worker, stream)
    queued = worker.get_queued_points()
    assert len(queued) == 4
    fmap = worker.get_filtered_map()
    assert fmap.shape[1] == 3
    assert len(fmap) > 100
    # Second call with distant separation keeps working.
    fmap2 = worker.get_filtered_map()
    assert len(fmap2) > 0
    worker.clear_local_map()
    assert len(worker.get_local_map_filtered()) == 0


def test_odometry_free_mode(rng):
    # Odometry-free: the constant-velocity pseudo-odometry is unreliable,
    # so its noise model must be loose or the (Cauchy-robust) ICP factor
    # gets outvoted by a confident-but-wrong odometry factor.
    est, (worker,) = small_setup(use_icp=True, use_odom_info=False,
                                 odom_sigmas=(0.5,) * 3 + (1.0,) * 3)
    # Small steps: with no odometry prior at all, ICP must recover each
    # step from an identity guess, which needs the step well below the
    # scene's point spacing.
    stream = replay.SyntheticStream(n_scans=6, points_per_scan=2048,
                                    trajectory='line', noise_m=0.005,
                                    step_m=0.3, seed=4)
    frames = list(stream)
    for f in frames:
        f.odom_pose7 = None
    n = replay.run_worker_on_stream(worker, frames)
    assert n == 6
    # Total ground-truth motion is 1.5 m; require most of it recovered.
    traj = sorted(worker.get_trajectory().items())
    xs = [p[4] for _, p in traj]
    assert xs[-1] > 1.0, xs


def test_trajectory_export(tmp_path, rng):
    est, (worker,) = small_setup(use_icp=False)
    replay.run_worker_on_stream(
        worker, replay.SyntheticStream(n_scans=3, points_per_scan=512,
                                       trajectory='line', seed=5))
    path = os.path.join(tmp_path, 'traj.csv')
    worker.export_trajectory(path)
    data = np.loadtxt(path, delimiter=',')
    assert data.shape == (3, 4)
    head = os.path.join(tmp_path, 'head.csv')
    worker.export_trajectory_head(int(1e8), head)
    assert os.path.exists(head)


def test_get_laser_tracks_data(rng):
    est, (worker,) = small_setup(use_icp=False)
    replay.run_worker_on_stream(
        worker, replay.SyntheticStream(n_scans=3, points_per_scan=512,
                                       trajectory='line', seed=6))
    data = worker.get_laser_tracks_data()
    assert len(data) == 3
    t, pts, pose = data[0]
    assert pts.shape[1] == 3 and pose.shape == (7,)
    assert [d[0] for d in data] == sorted(d[0] for d in data)


def test_npz_stream_roundtrip(tmp_path, rng):
    frames = list(replay.SyntheticStream(n_scans=3, points_per_scan=256,
                                         seed=7))
    path = os.path.join(tmp_path, 'stream.npz')
    replay.save_npz_stream(frames, path)
    loaded = replay.load_npz_stream(path)
    assert len(loaded) == 3
    np.testing.assert_allclose(loaded[1].points, frames[1].points)
    np.testing.assert_allclose(loaded[1].odom_pose7, frames[1].odom_pose7)


def test_update_local_map_rerigidify(rng):
    est, (worker,) = small_setup(use_icp=False)
    replay.run_worker_on_stream(
        worker, replay.SyntheticStream(n_scans=3, points_per_scan=512,
                                       trajectory='line', seed=8))
    t_end = worker.laser_track.get_max_time()
    before = worker.laser_track.evaluate(t_end)
    map_before = worker._map_points[:worker._map_count].copy()
    # Simulate a loop-closure shifting the trajectory by +1 in x.
    worker.laser_track.trajectory._poses[:, 4] += 1.0
    worker.update_local_map(before, t_end)
    map_after = worker._map_points[:worker._map_count]
    np.testing.assert_allclose(map_after[:, 0], map_before[:, 0] + 1.0,
                               atol=1e-4)


def test_scan_callback_lock(rng):
    est, (worker,) = small_setup(use_icp=False)
    frames = list(replay.SyntheticStream(n_scans=2, points_per_scan=512,
                                         trajectory='line', seed=9))
    worker.set_lock_scan_callback(True)
    assert not worker.process_scan(frames[0].time_ns, frames[0].points,
                                   frames[0].odom_pose7)
    worker.set_lock_scan_callback(False)
    assert worker.process_scan(frames[0].time_ns, frames[0].points,
                               frames[0].odom_pose7)


def test_point_cloud_of_time_interval(rng):
    est, (worker,) = small_setup(use_icp=False)
    replay.run_worker_on_stream(
        worker, replay.SyntheticStream(n_scans=3, points_per_scan=512,
                                       trajectory='line', seed=10))
    track = worker.laser_track
    c = track.get_point_cloud_of_time_interval(0, track.get_max_time())
    assert int(c.count()) > 0
    c_none = track.get_point_cloud_of_time_interval(int(1e15), int(2e15))
    assert int(c_none.count()) == 0


def test_per_scan_covariance_updates(rng):
    """update_covariances wires appendCovariances per estimate
    (laser_track.cpp:421-429, declared-but-dead in the reference;
    opt-in live path here).  Covariances must be SPD-ish and grow with
    distance from the gauge prior."""
    est_cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            use_icp_factors=False, nscan_in_sub_map=3,
            update_covariances=True,
            input_filters=InputFilterConfig(scan_capacity=1024),
            icp=IcpConfig(reading_capacity=512, matcher='brute')),
        solver=SolverConfig(gn_iterations=2, pcg_iterations=40,
                            pose_capacity=64, factor_capacity=256))
    worker_cfg = WorkerConfig(minimum_distance_to_add_pose=0.0,
                              create_filtered_map=False,
                              local_map_capacity=1 << 12)
    est = IncrementalEstimator(est_cfg, 1)
    worker = LaserSlamWorker(worker_cfg, est, 0)
    frames = list(replay.SyntheticStream(
        n_scans=5, points_per_scan=1024, trajectory='line', step_m=0.6,
        odom_noise=0.01, seed=21))
    replay.run_worker_on_stream(worker, frames)
    covs = worker.laser_track.get_covariances()
    # One covariance per solve, the prior registration included; the
    # first key is gauge-pinned so its marginal is ~0.
    assert len(covs) == 5
    for c in covs:
        assert c.shape == (6, 6)
        np.testing.assert_allclose(c, c.T, atol=1e-6)
        assert np.all(np.linalg.eigvalsh(c) > -1e-8)
    assert np.trace(covs[0]) < 1e-6
    # Uncertainty accumulates along the odometry chain away from the
    # prior: the newest pose's covariance dominates the second's.
    assert np.trace(covs[-1]) > np.trace(covs[1])
