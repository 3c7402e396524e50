"""Checkpoint/resume round-trip tests: resumed runs must continue
identically to uninterrupted ones."""

import os

import numpy as np

from laser_slam_tpu.config import (Config, EstimatorConfig, IcpConfig,
                                   InputFilterConfig, LaserTrackConfig,
                                   SolverConfig, WorkerConfig)
from laser_slam_tpu.core import checkpoint as ckpt
from laser_slam_tpu.core.estimator import IncrementalEstimator
from laser_slam_tpu.pipeline import replay
from laser_slam_tpu.pipeline.worker import LaserSlamWorker


def make_config():
    return Config(
        estimator=EstimatorConfig(
            laser_track=LaserTrackConfig(
                use_icp_factors=True, nscan_in_sub_map=3,
                input_filters=InputFilterConfig(scan_capacity=2048),
                icp=IcpConfig(matcher='brute', reading_capacity=1024,
                              reading_sampling_ratio=1.0)),
            solver=SolverConfig(gn_iterations=2, pcg_iterations=30,
                                pose_capacity=64, factor_capacity=256)),
        worker=WorkerConfig(minimum_distance_to_add_pose=0.3,
                            local_map_capacity=1 << 15))


def run(worker, frames):
    return replay.run_worker_on_stream(worker, frames)


def test_checkpoint_roundtrip_and_resume(tmp_path, rng):
    cfg = make_config()
    frames = list(replay.SyntheticStream(
        n_scans=6, points_per_scan=2048, trajectory='line', step_m=0.6,
        noise_m=0.005, seed=11))

    # Run A: all 6 scans straight through.
    est_a = IncrementalEstimator(cfg.estimator, 1)
    worker_a = LaserSlamWorker(cfg.worker, est_a, 0)
    run(worker_a, frames)

    # Run B: 3 scans, checkpoint, reload, 3 more.
    est_b = IncrementalEstimator(cfg.estimator, 1)
    worker_b = LaserSlamWorker(cfg.worker, est_b, 0)
    run(worker_b, frames[:3])
    path = os.path.join(tmp_path, 'state.npz')
    ckpt.save_checkpoint(path, est_b, [worker_b])

    est_c, (worker_c,) = ckpt.load_checkpoint(path, cfg)
    run(worker_c, frames[3:])

    traj_a = sorted(worker_a.get_trajectory().items())
    traj_c = sorted(worker_c.get_trajectory().items())
    assert len(traj_a) == len(traj_c) == 6
    for (ta, pa), (tc, pc_) in zip(traj_a, traj_c):
        assert ta == tc
        # Identical up to the stochastic reading-sampling RNG state (here
        # sampling is 1.0, so the runs must match almost exactly).
        np.testing.assert_allclose(pa[4:], pc_[4:], atol=5e-3)

    # Graph state carried over: factor counts match.
    assert est_c.graph.n_rel == est_a.graph.n_rel
    assert est_c.graph.n_prior == est_a.graph.n_prior
    assert est_c.num_keys == est_a.num_keys


def test_checkpoint_without_workers(tmp_path, rng):
    cfg = make_config()
    est = IncrementalEstimator(cfg.estimator, 1)
    worker = LaserSlamWorker(cfg.worker, est, 0)
    run(worker, list(replay.SyntheticStream(
        n_scans=3, points_per_scan=1024, trajectory='line', step_m=0.6,
        seed=12)))
    path = os.path.join(tmp_path, 'est_only.npz')
    ckpt.save_checkpoint(path, est)
    est2, workers = ckpt.load_checkpoint(path, cfg)
    assert workers is None
    assert est2.num_keys == est.num_keys
    np.testing.assert_allclose(est2.pose_values(), est.pose_values())
    # The resumed estimator can keep solving.
    values = est2.estimate([], {})
    assert np.all(np.isfinite(values))


def test_online_checkpoint_resume_bit_identical(tmp_path, rng):
    """Kill-and-resume of the device-resident fast path: the resumed run's
    trajectory must match the uninterrupted run bit-for-bit (the RNG key
    round-trips, so even stochastic sampling stays aligned)."""
    from laser_slam_tpu.pipeline import online
    cfg = make_config().estimator
    frames = list(replay.SyntheticStream(
        n_scans=8, points_per_scan=2048, trajectory='circle', radius_m=8.0,
        noise_m=0.005, odom_noise=0.003, seed=21))

    run_a = online.OnlineRunner(cfg, pose_capacity=32, factor_capacity=64)
    for f in frames:
        run_a.process_scan(f.time_ns, f.points, f.odom_pose7)
    run_a.add_loop_closure(0, 7, np.asarray(
        [1, 0, 0, 0, 0, 0, 0], np.float32))

    run_b = online.OnlineRunner(cfg, pose_capacity=32, factor_capacity=64)
    for f in frames[:4]:
        run_b.process_scan(f.time_ns, f.points, f.odom_pose7)
    path = os.path.join(tmp_path, 'online.npz')
    ckpt.save_online_checkpoint(path, run_b)
    run_c = ckpt.load_online_checkpoint(path, cfg)
    for f in frames[4:]:
        run_c.process_scan(f.time_ns, f.points, f.odom_pose7)
    run_c.add_loop_closure(0, 7, np.asarray(
        [1, 0, 0, 0, 0, 0, 0], np.float32))

    traj_a = run_a.trajectory()
    traj_c = run_c.trajectory()
    assert list(traj_a) == list(traj_c)
    for t in traj_a:
        np.testing.assert_array_equal(traj_a[t], traj_c[t])
    assert run_c._n_rel_host == run_a._n_rel_host
    assert int(run_c.state.n_rel) == int(run_a.state.n_rel)


def test_online_checkpoint_multi_track(tmp_path, rng):
    """Multi-robot bookkeeping (linked groups, prior slots) survives."""
    from laser_slam_tpu.pipeline import online
    cfg = make_config().estimator
    s0 = list(replay.SyntheticStream(n_scans=3, points_per_scan=1024,
                                     trajectory='line', step_m=0.6, seed=31))
    s1 = list(replay.SyntheticStream(n_scans=3, points_per_scan=1024,
                                     trajectory='line', step_m=0.6, seed=32))
    r = online.OnlineRunner(cfg, pose_capacity=32, factor_capacity=64,
                            n_tracks=2, archive_points=512)
    for f0, f1 in zip(s0, s1):
        r.process_scan(f0.time_ns, f0.points, f0.odom_pose7, track_id=0)
        r.process_scan(f1.time_ns, f1.points, f1.odom_pose7, track_id=1)
    path = os.path.join(tmp_path, 'online2.npz')
    ckpt.save_online_checkpoint(path, r)
    r2 = ckpt.load_online_checkpoint(path, cfg)
    assert r2._linked_groups == r._linked_groups
    assert r2._prior_slot_of_track == r._prior_slot_of_track
    assert r2._tracks_seen == r._tracks_seen
    # Scan archive round-trips (enables refined LCs after resume).
    np.testing.assert_array_equal(np.asarray(r2.archive.track),
                                  np.asarray(r.archive.track))
    np.testing.assert_array_equal(np.asarray(r2.archive.points),
                                  np.asarray(r.archive.points))
    # Cross-track loop closure on the resumed runner works (links groups).
    r2.add_loop_closure(0, 1, np.asarray([1, 0, 0, 0, 0, 0, 0], np.float32))
    assert len(r2._linked_groups) == 1


def test_csvio_roundtrip(tmp_path, rng):
    from laser_slam_tpu.core import csvio
    import os
    m = rng.normal(size=(5, 3))
    path = os.path.join(tmp_path, 'm.csv')
    csvio.write_matrix_csv(m, path)
    m2 = csvio.load_matrix_csv(path)
    np.testing.assert_allclose(m2, m, rtol=1e-6)
    rows = [['a', 'b'], ['1', '2']]
    path2 = os.path.join(tmp_path, 's.csv')
    csvio.write_csv(rows, path2)
    assert csvio.load_csv(path2) == rows
    tv = csvio.time_value_map_to_matrix({10: 1.5, 5: 0.5})
    np.testing.assert_allclose(tv, [[5, 0.5], [10, 1.5]])


def test_laser_to_map_tool(tmp_path, rng):
    """checkpoint -> occupancy map via the CLI tool (laser_to_octomap
    equivalent).  Invoked in-process through main(argv) — same CLI
    surface, but no second interpreter: a child python would load the
    axon plugin and recompile every XLA kernel from scratch (no
    persistent CPU cache, see conftest), which both times out and risks
    the concurrent-process segfaults documented in CLAUDE.md."""
    import importlib.util as _ilu
    cfg = make_config()
    est = IncrementalEstimator(cfg.estimator, 1)
    worker = LaserSlamWorker(cfg.worker, est, 0)
    run(worker, list(replay.SyntheticStream(
        n_scans=3, points_per_scan=512, trajectory='line', step_m=0.6,
        seed=13)))
    state = os.path.join(tmp_path, 'state.npz')
    ckpt.save_checkpoint(state, est, [worker])
    out = os.path.join(tmp_path, 'map.xyz')
    spec = _ilu.spec_from_file_location(
        'laser_to_map_tool', '/root/repo/tools/laser_to_map.py')
    mod = _ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main(['laser_to_map.py', state, out,
                   'resolution', '0.25', 'sensor_max_range', '30'])
    assert rc == 0
    assert os.path.getsize(out) > 0


def test_relpose_epoch_ns_times_roundtrip(tmp_path):
    """Absolute epoch-ns timestamps exceed float64's 2**53 integer range;
    they must survive save/load EXACTLY or exact-time lookups break."""
    from laser_slam_tpu.core.checkpoint import (_relposes_from_arrays,
                                                _relposes_to_arrays)
    from laser_slam_tpu.core.types import RelativePose
    t_a = 1_755_350_000_123_456_789   # epoch ns, > 2**53
    t_b = t_a + 100_000_003
    rel = RelativePose(
        T_a_b=np.array([1, 0, 0, 0, 0.1, 0.2, 0.3], np.float32),
        time_a_ns=t_a, time_b_ns=t_b, key_a=4, key_b=5,
        track_id_a=0, track_id_b=1)
    poses, meta = _relposes_to_arrays([rel])
    (back,) = _relposes_from_arrays(poses, meta)
    assert back.time_a_ns == t_a
    assert back.time_b_ns == t_b
    assert (back.key_a, back.key_b) == (4, 5)
    assert (back.track_id_a, back.track_id_b) == (0, 1)
    np.testing.assert_allclose(back.T_a_b, rel.T_a_b)


def test_trajectory_export_kitti_tum_formats(tmp_path):
    """KITTI (12-float [R|t] rows) and TUM (t xyz qxyzw) exporters
    round-trip pose values exactly."""
    from laser_slam_tpu.core import csvio
    from laser_slam_tpu.ops import se3
    import jax.numpy as jnp
    rng2 = np.random.default_rng(5)
    tp = []
    for i in range(4):
        xi = rng2.normal(0, 0.4, 6).astype(np.float32)
        tp.append((int(1e9 * i), np.asarray(se3.exp(jnp.asarray(xi)))))

    kitti = os.path.join(tmp_path, 'poses_kitti.txt')
    csvio.write_trajectory_kitti(tp, kitti)
    rows = np.loadtxt(kitti).reshape(-1, 3, 4)
    assert rows.shape[0] == 4
    for (_, p), R_t in zip(tp, rows):
        T = np.asarray(se3.to_matrix(jnp.asarray(p)))
        np.testing.assert_allclose(R_t, T[:3], atol=1e-6)
        # Rotation block orthonormal
        np.testing.assert_allclose(R_t[:, :3] @ R_t[:, :3].T, np.eye(3),
                                   atol=1e-5)

    tum = os.path.join(tmp_path, 'poses_tum.txt')
    csvio.write_trajectory_tum(tp, tum)
    rows = np.loadtxt(tum)
    for (t_ns, p), r in zip(tp, rows):
        assert abs(r[0] - t_ns * 1e-9) < 1e-9
        np.testing.assert_allclose(r[1:4], p[4:], atol=1e-6)
        np.testing.assert_allclose(r[4:8], [p[1], p[2], p[3], p[0]],
                                   atol=1e-6)
