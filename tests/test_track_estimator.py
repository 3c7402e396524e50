"""End-to-end tests of LaserTrack + IncrementalEstimator on synthetic data,
mirroring the reference call flow (scanCallback -> processPoseAndLaserScan
-> estimate / registerPrior; processLoopClosure)."""

import jax.numpy as jnp
import numpy as np
import pytest

from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                   InputFilterConfig, LaserTrackConfig,
                                   SolverConfig)
from laser_slam_tpu.core.estimator import IncrementalEstimator
from laser_slam_tpu.core.types import Pose, RelativePose
from laser_slam_tpu.ops import se3


def small_config(use_icp=True, n_workers_force_priors=False):
    return EstimatorConfig(
        laser_track=LaserTrackConfig(
            use_icp_factors=use_icp,
            nscan_in_sub_map=3,
            force_priors=n_workers_force_priors,
            input_filters=InputFilterConfig(
                min_distance_m=0.0, max_distance_m=100.0,
                scan_capacity=1024),
            icp=IcpConfig(reading_sampling_ratio=1.0, reading_capacity=1024,
                          matcher='brute', max_correspondence_dist_m=3.0),
        ),
        do_icp_step_on_loop_closures=use_icp,
        loop_closures_sub_maps_radius=1,
        solver=SolverConfig(gn_iterations=3, pcg_iterations=50,
                            pose_capacity=64, factor_capacity=256),
    )


def make_world(rng, n=1024):
    n4 = n // 4
    pts = np.concatenate([
        np.stack([rng.uniform(-15, 15, n4), rng.uniform(-15, 15, n4),
                  np.zeros(n4)], 1),
        np.stack([rng.uniform(-15, 15, n4), np.full(n4, 15.0),
                  rng.uniform(0, 4, n4)], 1),
        np.stack([np.full(n4, -15.0), rng.uniform(-15, 15, n4),
                  rng.uniform(0, 4, n4)], 1),
        np.stack([rng.uniform(2, 5, n - 3 * n4), rng.uniform(2, 5, n - 3 * n4),
                  np.full(n - 3 * n4, 2.0)], 1),
    ]).astype(np.float32)
    pts[:, 2] -= 1.5  # sensor above ground
    return pts


def gt_pose(i):
    """Simple forward path with slight turn."""
    xi = jnp.asarray([0.0, 0.0, 0.05 * i, 1.0 * i, 0.1 * i, 0.0], jnp.float32)
    return se3.exp(xi)


def scan_at(world, T_w, rng, noise=0.005):
    local = np.array(se3.apply(se3.inverse(T_w), jnp.asarray(world)))
    return local + rng.normal(size=local.shape).astype(np.float32) * noise


def run_sequence(estimator, world, rng, n_scans=5, worker_id=0,
                 odom_noise=0.0):
    track = estimator.get_laser_track(worker_id)
    for i in range(n_scans):
        T = gt_pose(i)
        if odom_noise and i > 0:
            T = se3.compose(T, se3.exp(jnp.asarray(
                rng.normal(size=6).astype(np.float32) * odom_noise)))
        pose = Pose(T_w=np.asarray(T), time_ns=int(1e9 * i), key=0)
        pts = scan_at(world, gt_pose(i), rng)
        factors, values, is_prior = track.process_pose_and_laser_scan(
            pose, pts)
        if is_prior:
            result = estimator.register_prior(factors, values, worker_id)
        else:
            result = estimator.estimate(factors, values)
        track.update_from_values(result)
    return track


def test_single_track_odometry_only(rng):
    est = IncrementalEstimator(small_config(use_icp=False), 1)
    world = make_world(rng)
    track = run_sequence(est, world, rng, n_scans=4)
    assert track.get_num_scans() == 4
    traj = track.get_trajectory()
    assert len(traj) == 4
    # With exact odometry, trajectory matches ground truth.
    for i, (t, p) in enumerate(sorted(traj.items())):
        np.testing.assert_allclose(p[4:], np.asarray(gt_pose(i))[4:],
                                   atol=1e-3)


def test_single_track_with_icp(rng):
    est = IncrementalEstimator(small_config(use_icp=True), 1)
    world = make_world(rng)
    track = run_sequence(est, world, rng, n_scans=4, odom_noise=0.01)
    # ICP factors must exist and trajectory should stay near ground truth
    # despite noisy odometry.
    assert len(track.icp_transformations) == 3
    traj = sorted(track.get_trajectory().items())
    err = [np.linalg.norm(p[4:] - np.asarray(gt_pose(i))[4:])
           for i, (t, p) in enumerate(traj)]
    assert max(err) < 0.1, err


def test_scan_matching_times_recorded(rng):
    est = IncrementalEstimator(small_config(use_icp=True), 1)
    track = run_sequence(est, make_world(rng), rng, n_scans=3)
    # One entry per non-first scan (laser_track.cpp:208-209).
    assert len(track.scan_matching_times) == 2


def test_loop_closure_single_track(rng):
    est = IncrementalEstimator(small_config(use_icp=True), 1)
    world = make_world(rng)
    track = run_sequence(est, world, rng, n_scans=5, odom_noise=0.02)

    # Loop closure between scan 0 and scan 4, given in world frame:
    # w_T_a_b = I means "the clouds align as-is in world frame" — the
    # estimator converts to the relative frame (cpp:83-87).
    before = track.get_trajectory()
    lc = RelativePose(T_a_b=np.asarray(se3.identity()),
                      time_a_ns=0, time_b_ns=int(4e9),
                      track_id_a=0, track_id_b=0)
    est.process_loop_closure(lc)
    after = track.get_trajectory()
    # The closed trajectory must stay accurate (the pre-closure error is
    # already sub-centimeter thanks to the ICP factors, so assert absolute
    # quality rather than strict improvement).
    gt4 = np.asarray(gt_pose(4))[4:]
    err_after = np.linalg.norm(after[int(4e9)][4:] - gt4)
    assert err_after < 0.05, err_after
    assert len(track.loop_closures) == 1


def test_multi_robot_linking(rng):
    """Two tracks with forced priors 100 m apart; a cross-track loop
    closure links them and removes track 1's prior
    (incremental_estimator.cpp:165-266)."""
    cfg = small_config(use_icp=False, n_workers_force_priors=True)
    est = IncrementalEstimator(cfg, 2)
    world = make_world(rng)

    for wid in range(2):
        run_sequence(est, world, rng, n_scans=3, worker_id=wid)

    t0, t1 = est.get_laser_track(0), est.get_laser_track(1)
    # Forced priors: track 1 starts offset by 100 in y
    # (laser_track.cpp:166-170).
    p1_start = t1.get_trajectory()[0]
    assert abs(p1_start[5] - 100.0) < 1.0

    # Cross-track loop closure: both robots are physically at gt_pose(2),
    # so the true relative pose a_T_a_b is identity.  The place-recognition
    # input is the WORLD-frame alignment w_T_a_b (the transform that moves
    # b's cloud onto a's in the current world estimates,
    # incremental_estimator.cpp:80-87): w_T_a_b = T_w_a * T_w_b^-1.
    T_w_a = jnp.asarray(t0.evaluate(int(2e9)))
    T_w_b = jnp.asarray(t1.evaluate(int(2e9)))
    w_T_a_b = se3.compose(T_w_a, se3.inverse(T_w_b))
    lc = RelativePose(T_a_b=np.asarray(w_T_a_b),
                      time_a_ns=int(2e9), time_b_ns=int(2e9),
                      track_id_a=0, track_id_b=1)
    est.process_loop_closure(lc)

    # Track 1's prior was removed, groups merged.
    assert est._prior_factor_of_worker == {}
    assert len(est._linked_workers) == 1
    assert sorted(est._linked_workers[0]) == [0, 1]
    # Track 1 should have been pulled toward track 0's frame: its node at
    # time 2 must now (nearly) coincide with track 0's.
    pa = t0.get_trajectory()[int(2e9)][4:]
    pb = t1.get_trajectory()[int(2e9)][4:]
    assert np.linalg.norm(pa - pb) < 1.0, (pa, pb)


def test_covariances(rng):
    est = IncrementalEstimator(small_config(use_icp=False), 1)
    track = run_sequence(est, make_world(rng), rng, n_scans=3)
    covs = est.marginal_covariances(track.trajectory.keys())
    assert covs.shape == (3, 6, 6)
    # Later poses less certain than the anchored first.
    assert np.trace(covs[2]) > np.trace(covs[0])


def test_save_icp_results_debug_dumps(rng, tmp_path, monkeypatch):
    """save_icp_results dumps ICP debug clouds (laser_track.cpp:504-513)."""
    import os
    cfg = small_config(use_icp=True)
    lt = cfg.laser_track
    cfg = cfg.__class__(**{**cfg.__dict__,
                           'laser_track': lt.__class__(
                               **{**lt.__dict__, 'save_icp_results': True})})
    est = IncrementalEstimator(cfg, 1)
    run_sequence(est, make_world(rng), rng, n_scans=2)
    out = '/tmp/laser_slam_tpu_icp'
    assert os.path.exists(os.path.join(out, 'last_scan.xyz'))
    assert os.path.exists(os.path.join(
        out, 'last_scan_aligned_by_solution.xyz'))
