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
    equivalent)."""
    import subprocess
    import sys as _sys
    cfg = make_config()
    est = IncrementalEstimator(cfg.estimator, 1)
    worker = LaserSlamWorker(cfg.worker, est, 0)
    run(worker, list(replay.SyntheticStream(
        n_scans=3, points_per_scan=512, trajectory='line', step_m=0.6,
        seed=13)))
    state = os.path.join(tmp_path, 'state.npz')
    ckpt.save_checkpoint(state, est, [worker])
    out = os.path.join(tmp_path, 'map.xyz')
    import os as _os
    env = dict(_os.environ, PYTHONPATH='/root/repo:' +
               _os.environ.get('PYTHONPATH', ''),
               JAX_PLATFORMS='cpu')
    res = subprocess.run(
        [_sys.executable, '/root/repo/tools/laser_to_map.py', state, out,
         'resolution', '0.25', 'sensor_max_range', '30'],
        capture_output=True, text=True, env=env, timeout=300)
    assert res.returncode == 0, res.stderr[-500:]
    assert _os.path.getsize(out) > 0


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
