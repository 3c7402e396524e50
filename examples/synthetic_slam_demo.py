"""End-to-end demo: synthetic LiDAR replay through the full SLAM stack.

Runs a circular trajectory with noisy odometry, integrates scans through
the worker (ICP odometry + incremental graph solve), injects a loop
closure at the revisit, and reports trajectory error vs ground truth.

Usage:  PYTHONPATH=. python examples/synthetic_slam_demo.py [--cpu]
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cpu', action='store_true',
                        help='force the CPU backend')
    parser.add_argument('--scans', type=int, default=20)
    parser.add_argument('--matcher', default='projective')
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    import jax.numpy as jnp
    from laser_slam_tpu.config import (Config, EstimatorConfig, IcpConfig,
                                       InputFilterConfig, LaserTrackConfig,
                                       SolverConfig, WorkerConfig)
    from laser_slam_tpu.core.estimator import IncrementalEstimator
    from laser_slam_tpu.core.types import RelativePose
    from laser_slam_tpu.core import benchmarker as bench
    from laser_slam_tpu.ops import se3
    from laser_slam_tpu.pipeline import replay
    from laser_slam_tpu.pipeline.worker import LaserSlamWorker

    print('device:', jax.devices()[0])

    # Noise models must reflect the actual sensor: the simulated odometry
    # drifts at ~1 cm/1 mrad per step while ICP is good to ~mm, so ICP
    # carries tighter sigmas than odometry (with the reference's default
    # equal-and-tight sigmas plus Cauchy, the robust kernel would simply
    # reject whichever factor disagrees — i.e. follow odometry).
    est_cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=3,
            odometry_noise_model=(0.02, 0.02, 0.02, 0.05, 0.05, 0.05),
            icp_noise_model=(0.005, 0.005, 0.005, 0.005, 0.005, 0.005),
            input_filters=InputFilterConfig(scan_capacity=8192),
            icp=IcpConfig(matcher=args.matcher, reading_capacity=4096,
                          reading_sampling_ratio=0.5)),
        loop_closure_noise_model=(0.005,) * 3 + (0.005,) * 3,
        solver=SolverConfig(gn_iterations=3, pcg_iterations=40))
    worker_cfg = WorkerConfig(minimum_distance_to_add_pose=0.5)

    estimator = IncrementalEstimator(est_cfg, 1)
    worker = LaserSlamWorker(worker_cfg, estimator, 0)
    bench.enable()

    stream = replay.SyntheticStream(
        n_scans=args.scans, points_per_scan=8192, trajectory='circle',
        radius_m=12.0, noise_m=0.01, odom_noise=0.01, seed=3)
    frames = list(stream)

    t0 = time.time()
    n = replay.run_worker_on_stream(worker, frames)
    dt = time.time() - t0
    print(f'integrated {n} scans in {dt:.1f}s ({n / dt:.1f} scans/s '
          f'incl. compile)')

    # Loop closure: last scan revisits the start region.
    t_first = 0
    t_last = worker.laser_track.get_max_time()
    T_w_a = jnp.asarray(worker.laser_track.evaluate(t_first))
    T_w_b = jnp.asarray(worker.laser_track.evaluate(t_last))
    # Place recognition would supply the world-frame alignment; build it
    # from ground truth (identity residual in this noiseless-world demo).
    gt_a = jnp.asarray(frames[0].gt_pose7)
    gt_b = jnp.asarray(frames[-1].gt_pose7)
    true_rel = se3.compose(se3.inverse(gt_a), gt_b)
    w_T_a_b = se3.compose(T_w_a, se3.compose(true_rel, se3.inverse(T_w_b)))
    estimator.process_loop_closure(RelativePose(
        T_a_b=np.asarray(w_T_a_b), time_a_ns=t_first, time_b_ns=t_last,
        track_id_a=0, track_id_b=0))

    traj = sorted(worker.get_trajectory().items())
    errs = [np.linalg.norm(p[4:] - f.gt_pose7[4:])
            for (t, p), f in zip(traj, frames)]
    print(f'trajectory error vs ground truth: mean {np.mean(errs) * 100:.1f} cm, '
          f'max {np.max(errs) * 100:.1f} cm')
    print('benchmarker statistics:')
    for k, (mean, std, count) in bench.statistics().items():
        print(f'  {k}: {mean:.2f} ms (+-{std:.2f}) n={count}')
    assert np.max(errs) < 0.5, 'trajectory diverged'
    print('OK')


if __name__ == '__main__':
    main()
