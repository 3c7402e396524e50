"""North-star accuracy parity: <1 cm / <0.1 deg trajectory divergence.

Replays the same 100-scan loop-closing sequence through (a) the float64
reference-equivalent oracle (tests/oracle.py: cKDTree ICP with the exact
icp_default.yaml pipeline + dense Gauss-Newton with the reference noise
models and 3-update schedule, laser_track.cpp:466-519 +
incremental_estimator.cpp:151-163) and (b) this framework's production
device path (pipeline.online.OnlineRunner), then asserts the final
trajectories agree within the BASELINE.json north-star clause:
<1 cm translation and <0.1 degree rotation at every pose.

Measured divergences are recorded in PARITY.md.
"""

import numpy as np
import pytest

from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                   InputFilterConfig, LaserTrackConfig,
                                   SolverConfig)
from laser_slam_tpu.ops import se3
from laser_slam_tpu.pipeline import online, replay

from oracle import OracleSlam

N_SCANS = 100
N_POINTS = 2048


def parity_config():
    """Reference-equivalent settings: exact-NN matcher, kNN(10) PCA
    normals, sort trim, no stochastic sampling, full-graph solve."""
    return EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=3,
            input_filters=InputFilterConfig(
                scan_capacity=N_POINTS, min_distance_m=0.0,
                max_distance_m=1e6, random_sampling_ratio=1.0),
            icp=IcpConfig(matcher='brute', reading_capacity=N_POINTS,
                          reading_sampling_ratio=1.0,
                          normal_method='knn', normal_knn=10,
                          trim_method='sort')),
        solver=SolverConfig(gn_iterations=3, pcg_iterations=128,
                            pcg_tolerance=1e-10, window=0))


def quat_angle_deg(q1, q2):
    d = np.abs(np.clip(np.sum(q1 * q2, axis=-1), -1.0, 1.0))
    return np.degrees(2.0 * np.arccos(d))


def make_frames():
    # Two laps of the same circle so the second lap revisits first-lap
    # poses mid-sequence (realistic place-recognition cadence keeps the
    # drift each closure corrects small, as in the reference deployment).
    return list(replay.SyntheticStream(
        n_scans=N_SCANS, points_per_scan=N_POINTS, trajectory='circle',
        radius_m=15.0, noise_m=0.005, odom_noise=0.002, seed=7, laps=2))


def measured_closure(frames, est_traj, i, j):
    """Shared loop-closure input: place recognition measures the TRUE
    relative pose between scans i and j; expressed as the world-frame
    alignment w_T_a_b = T_w_a_est * true_rel * T_w_b_est^-1 (the segmatch
    contract — converting with the current estimates recovers true_rel,
    incremental_estimator.cpp:83-87)."""
    rel = se3.compose(se3.inverse(np.asarray(frames[i].gt_pose7)),
                      np.asarray(frames[j].gt_pose7))
    T_a = np.asarray(est_traj[frames[i].time_ns], np.float32)
    T_b = np.asarray(est_traj[frames[j].time_ns], np.float32)
    return np.asarray(se3.compose(
        T_a, se3.compose(rel, se3.inverse(T_b))), np.float32)


@pytest.mark.slow
def test_final_trajectory_parity_vs_float64_oracle():
    frames = make_frames()
    half = N_SCANS // 2
    closures = [(i - half, i) for i in range(half + 10, N_SCANS, 10)]

    cfg = parity_config()
    runner = online.OnlineRunner(cfg, pose_capacity=128,
                                 factor_capacity=512)
    lt = cfg.laser_track
    oracle = OracleSlam(
        nscan_in_sub_map=lt.nscan_in_sub_map,
        odometry_sigmas=lt.odometry_noise_model,
        icp_sigmas=lt.icp_noise_model,
        loop_closure_sigmas=cfg.loop_closure_noise_model,
        prior_sigma=cfg.prior_noise_sigma,
        robust_icp=lt.add_m_estimator_on_icp,
        robust_lc=cfg.add_m_estimator_on_loop_closures,
        knn=lt.icp.normal_knn,
        solver_iterations=cfg.solver.gn_iterations)

    closure_at = {b: (a, b) for a, b in closures}
    for idx, f in enumerate(frames):
        runner.process_scan(f.time_ns, f.points, f.odom_pose7)
        oracle.process_scan(f.time_ns, f.points, f.odom_pose7)
        if idx in closure_at:
            a, b = closure_at[idx]
            # One shared measurement for both systems (anchored on the
            # runner's live estimates, as an external module would be).
            w_T_a_b = measured_closure(frames, runner.trajectory(), a, b)
            runner.add_loop_closure(a, b, w_T_a_b)
            oracle.add_loop_closure(a, b, w_T_a_b)

    traj_tpu = runner.trajectory()
    traj_ora = oracle.trajectory()
    assert len(traj_tpu) == len(traj_ora) == N_SCANS

    ttpu = np.stack([traj_tpu[f.time_ns] for f in frames])
    tora = np.stack([traj_ora[f.time_ns] for f in frames])
    trans_err = np.linalg.norm(ttpu[:, 4:] - tora[:, 4:], axis=1)
    rot_err = quat_angle_deg(ttpu[:, :4], tora[:, :4])

    print(f'\nparity vs float64 oracle over {N_SCANS} scans, '
          f'{len(closures)} closures:')
    print(f'  translation: mean {trans_err.mean()*1000:.2f} mm, '
          f'max {trans_err.max()*1000:.2f} mm')
    print(f'  rotation:    mean {rot_err.mean():.4f} deg, '
          f'max {rot_err.max():.4f} deg')

    # North-star clause (BASELINE.json): <1 cm / <0.1 deg.
    assert trans_err.max() < 0.01, trans_err.max()
    assert rot_err.max() < 0.1, rot_err.max()

    # Sanity: both also track ground truth (not two equal-but-wrong runs).
    gt = np.stack([f.gt_pose7 for f in frames])
    gt_err = np.linalg.norm(ttpu[:, 4:] - gt[:, 4:], axis=1)
    print(f'  vs ground truth: mean {gt_err.mean()*1000:.1f} mm, '
          f'max {gt_err.max()*1000:.1f} mm, final '
          f'{gt_err[-1]*1000:.1f} mm')
    # Peak drift happens mid-first-lap (no closures yet, ~0.13% of the
    # 188 m path); the closures of lap 2 must pull the tail back down.
    assert gt_err.max() < 0.35, gt_err.max()
    assert gt_err[-1] < 0.15, gt_err[-1]


def test_oracle_icp_matches_framework_icp():
    """Single-pair cross-check: framework f32 exact-NN ICP lands within
    ~1 mm of the float64 cKDTree oracle ICP from the same inputs."""
    import jax.numpy as jnp
    from oracle import icp_point_to_plane as oracle_icp
    from oracle import knn_pca_normals, pose7_to_T, T_to_pose7
    from laser_slam_tpu.ops import cloud as pc
    from laser_slam_tpu.ops import icp as icp_mod

    rng = np.random.default_rng(3)
    stream = replay.SyntheticStream(n_scans=2, points_per_scan=N_POINTS,
                                    trajectory='line', step_m=0.5,
                                    noise_m=0.01, seed=3)
    frames = list(stream)
    ref_np = frames[0].points.astype(np.float64)
    read_np = frames[1].points.astype(np.float64)
    # gt relative transform as initial-guess neighborhood
    rel_gt = np.asarray(se3.compose(
        se3.inverse(frames[0].gt_pose7), frames[1].gt_pose7))

    T_oracle, ok = oracle_icp(read_np, ref_np, knn_pca_normals(ref_np),
                              pose7_to_T(rel_gt))
    assert ok

    cfg = parity_config().laser_track.icp
    ref = pc.make_cloud(frames[0].points, capacity=N_POINTS)
    rd = pc.make_cloud(frames[1].points, capacity=N_POINTS)
    normals = pc.estimate_normals(ref, knn=10)
    res = icp_mod.icp(rd, ref, normals, jnp.asarray(rel_gt), cfg)
    assert bool(res.valid)

    p_oracle = T_to_pose7(T_oracle)
    p_tpu = np.asarray(res.T)
    assert np.linalg.norm(p_oracle[4:] - p_tpu[4:]) < 2e-3
    assert quat_angle_deg(p_oracle[:4], p_tpu[:4]) < 0.02


@pytest.mark.slow
def test_kitti_replay_parity_vs_float64_oracle(tmp_path):
    """The north-star clause on the KITTI workload itself: a KITTI-format
    sequence read by the production ``KittiStream`` reader feeds both the
    float64 oracle and the device ``OnlineRunner``; final trajectories
    must agree within <1 cm / <0.1 deg (BASELINE.json)."""
    from test_kitti import make_kitti_fixture

    n_scans = 12
    make_kitti_fixture(str(tmp_path), n_scans=n_scans)
    frames = list(replay.KittiStream(str(tmp_path), '00'))
    assert len(frames) == n_scans

    n_pts = 4096  # fixture density (test_kitti.N_POINTS)
    cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=3,
            input_filters=InputFilterConfig(
                scan_capacity=n_pts, min_distance_m=0.0,
                max_distance_m=1e6, random_sampling_ratio=1.0),
            icp=IcpConfig(matcher='brute', reading_capacity=n_pts,
                          reading_sampling_ratio=1.0,
                          normal_method='knn', normal_knn=10,
                          trim_method='sort')),
        solver=SolverConfig(gn_iterations=3, pcg_iterations=128,
                            pcg_tolerance=1e-10, window=0))
    runner = online.OnlineRunner(cfg, pose_capacity=16, factor_capacity=64)
    lt = cfg.laser_track
    oracle = OracleSlam(
        nscan_in_sub_map=lt.nscan_in_sub_map,
        odometry_sigmas=lt.odometry_noise_model,
        icp_sigmas=lt.icp_noise_model,
        loop_closure_sigmas=cfg.loop_closure_noise_model,
        prior_sigma=cfg.prior_noise_sigma,
        robust_icp=lt.add_m_estimator_on_icp,
        robust_lc=cfg.add_m_estimator_on_loop_closures,
        knn=lt.icp.normal_knn,
        solver_iterations=cfg.solver.gn_iterations)

    for f in frames:
        runner.process_scan(f.time_ns, f.points, f.odom_pose7)
        oracle.process_scan(f.time_ns, f.points, f.odom_pose7)

    traj_tpu = runner.trajectory()
    traj_ora = oracle.trajectory()
    ttpu = np.stack([traj_tpu[f.time_ns] for f in frames])
    tora = np.stack([traj_ora[f.time_ns] for f in frames])
    trans_err = np.linalg.norm(ttpu[:, 4:] - tora[:, 4:], axis=1)
    rot_err = quat_angle_deg(ttpu[:, :4], tora[:, :4])
    print(f'\nKITTI-replay parity: trans max {trans_err.max()*1000:.2f} mm,'
          f' rot max {rot_err.max():.4f} deg')
    assert trans_err.max() < 0.01, trans_err.max()
    assert rot_err.max() < 0.1, rot_err.max()


@pytest.mark.slow
def test_production_config_parity_on_beam_sequence():
    """Parity bound for the PRODUCTION fast path (VERDICT r2 missing #4):
    projective matcher + image_pca normals + reading sampling + window=32
    solve with gn_tolerance early-exit, on a loop-closing 64-beam
    ray-cast sequence — vs the float64 reference-equivalent oracle
    running the exact icp_default.yaml pipeline on the same frames.

    The production path trades exact NN + full-graph solves for ~10x
    throughput; this test pins the measured accuracy cost so any drift
    regression fails loudly.  Measured bound recorded in PARITY.md
    (the reference-equivalent config meets <1 cm/<0.1 deg in
    test_final_trajectory_parity_vs_float64_oracle; the production bound
    here is looser and documented as the speed/accuracy trade)."""
    from laser_slam_tpu.pipeline import velodyne_sim as vs

    n_scans = 80
    stream = vs.BeamStream(n_scans=n_scans, n_beams=64, n_azimuth=256,
                           trajectory='circle', radius_m=15.0,
                           world_size_m=60.0, range_noise_m=0.01,
                           odom_noise=0.003, seed=21, laps=2)
    frames = list(stream)
    half = n_scans // 2
    closures = [(i - half, i) for i in range(half + 10, n_scans, 10)]

    elev_min = float(np.deg2rad(vs.HDL64_ELEV_DEG.min()) - 0.01)
    elev_max = float(np.deg2rad(vs.HDL64_ELEV_DEG.max()) + 0.01)
    cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=5,
            odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
            icp_noise_model=(0.005,) * 6,
            input_filters=InputFilterConfig(scan_capacity=16384),
            icp=IcpConfig(matcher='projective', reading_capacity=4096,
                          reading_sampling_ratio=0.5,
                          normal_method='image_pca',
                          normal_image_rows=32, normal_image_cols=256,
                          range_image_rows=64, range_image_cols=512,
                          range_image_elev_min=elev_min,
                          range_image_elev_max=elev_max,
                          coarse_capacity=512, gn_steps_per_match=4)),
        solver=SolverConfig(gn_iterations=3, gn_tolerance=1e-4,
                            pcg_iterations=32, window=32))
    runner = online.OnlineRunner(cfg, pose_capacity=128,
                                 factor_capacity=512)
    lt = cfg.laser_track
    oracle = OracleSlam(
        nscan_in_sub_map=lt.nscan_in_sub_map,
        odometry_sigmas=lt.odometry_noise_model,
        icp_sigmas=lt.icp_noise_model,
        loop_closure_sigmas=cfg.loop_closure_noise_model,
        prior_sigma=cfg.prior_noise_sigma,
        robust_icp=lt.add_m_estimator_on_icp,
        robust_lc=cfg.add_m_estimator_on_loop_closures,
        knn=10, solver_iterations=3)

    closure_at = {b: (a, b) for a, b in closures}
    for idx, f in enumerate(frames):
        runner.process_scan(f.time_ns, f.points, f.odom_pose7)
        oracle.process_scan(f.time_ns, f.points, f.odom_pose7)
        if idx in closure_at:
            a, b = closure_at[idx]
            w_T_a_b = measured_closure(frames, runner.trajectory(), a, b)
            runner.add_loop_closure(a, b, w_T_a_b)
            oracle.add_loop_closure(a, b, w_T_a_b)

    traj_tpu = runner.trajectory()
    traj_ora = oracle.trajectory()
    ttpu = np.stack([traj_tpu[f.time_ns] for f in frames])
    tora = np.stack([traj_ora[f.time_ns] for f in frames])
    trans_err = np.linalg.norm(ttpu[:, 4:] - tora[:, 4:], axis=1)
    rot_err = quat_angle_deg(ttpu[:, :4], tora[:, :4])
    gt = np.stack([f.gt_pose7 for f in frames])
    gt_err = np.linalg.norm(ttpu[:, 4:] - gt[:, 4:], axis=1)
    gt_err_ora = np.linalg.norm(tora[:, 4:] - gt[:, 4:], axis=1)
    print(f'\nproduction-config parity over {n_scans} beam scans, '
          f'{len(closures)} closures:')
    print(f'  vs oracle: trans mean {trans_err.mean()*100:.2f} cm, '
          f'max {trans_err.max()*100:.2f} cm; rot max {rot_err.max():.3f} deg')
    print(f'  vs gt: production mean {gt_err.mean()*100:.2f} cm / '
          f'oracle mean {gt_err_ora.mean()*100:.2f} cm')

    # Measured bound (TPU r3, this seed): see PARITY.md production-config
    # section.  Fails loudly if the fast path drifts beyond the recorded
    # speed/accuracy trade.
    assert trans_err.max() < 0.10, trans_err.max()
    assert rot_err.max() < 1.0, rot_err.max()
    # And the production path must track ground truth about as well as
    # the oracle itself (the trade costs throughput-path accuracy
    # headroom, not actual trajectory quality).
    assert gt_err.mean() < max(2.5 * gt_err_ora.mean(), 0.05), (
        gt_err.mean(), gt_err_ora.mean())
