"""Fully-autonomous SLAM demo: loop closures DETECTED in-tree.

Where synthetic_slam_demo.py builds its loop closure from ground truth
(standing in for the reference's external segmatch node), this demo runs
the device-resident online path with the scan-context detector attached:
revisits are recognized, yaw-seeded, ICP-refined and injected into the
graph automatically — no external place-recognition module, no ground
truth.

Usage:  PYTHONPATH=. python examples/auto_loop_closure_demo.py [--cpu]
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cpu', action='store_true',
                        help='force the CPU backend')
    parser.add_argument('--scans', type=int, default=48)
    parser.add_argument('--laps', type=int, default=2)
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                       InputFilterConfig, LaserTrackConfig,
                                       PlaceRecognitionConfig, SolverConfig)
    from laser_slam_tpu.core import evaluation as ev
    from laser_slam_tpu.pipeline import online, replay

    print('device:', jax.devices()[0])

    est_cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=3,
            odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
            icp_noise_model=(0.005,) * 6,
            input_filters=InputFilterConfig(scan_capacity=8192),
            icp=IcpConfig(matcher='brute', reading_capacity=4096,
                          reading_sampling_ratio=0.5)),
        loop_closure_noise_model=(0.005,) * 6,
        solver=SolverConfig(gn_iterations=3, pcg_iterations=40))
    # 0.06 splits true revisits (~0.02) from the square room's
    # rotational aliasing (~0.08, see test_place_recognition).
    pr_cfg = PlaceRecognitionConfig(detect_every=1, exclude_recent_keys=12,
                                    distance_threshold=0.06)

    lap = args.scans // args.laps
    # Off-center loop: a circle centered on the square room is exactly
    # 180-deg rotationally aliased (opposite viewpoints indistinguishable).
    frames = list(replay.SyntheticStream(
        n_scans=args.scans, points_per_scan=8192, trajectory='circle',
        radius_m=12.0, center_m=(8.0, 5.0), laps=args.laps, noise_m=0.01,
        odom_noise=0.01, seed=3))

    def run(pr):
        runner = online.OnlineRunner(
            est_cfg, pose_capacity=128, factor_capacity=512,
            archive_points=1024, place_recognition=pr)
        t0 = time.time()
        for f in frames:
            runner.process_scan(f.time_ns, f.points, f.odom_pose7)
        dt = time.time() - t0
        gt = {f.time_ns: f.gt_pose7 for f in frames}
        res = ev.ate(runner.trajectory(), gt, align='none')
        return runner, dt, res

    runner, dt, with_pr = run(pr_cfg)
    print(f'{len(frames)} scans in {dt:.1f}s ({len(frames) / dt:.1f} '
          f'scans/s incl. compile)')
    print(f'detections ({len(runner.detections)}):')
    for key_a, key_b, dist, yaw in runner.detections:
        print(f'  key {key_b} recognized key {key_a} '
              f'(lap distance {key_b - key_a}, sc-dist {dist:.3f}, '
              f'yaw {np.degrees(yaw):.1f} deg)')
    _, _, without = run(None)
    print(f'ATE without detector: mean {without.translation.mean * 100:.1f} '
          f'cm, max {without.translation.max * 100:.1f} cm')
    print(f'ATE with detector:    mean {with_pr.translation.mean * 100:.1f} '
          f'cm, max {with_pr.translation.max * 100:.1f} cm')

    assert runner.detections, 'no loop closures detected'
    for key_a, key_b, _, _ in runner.detections:
        assert abs((key_b - key_a) - lap) <= 2, 'detection paired wrong keys'
    assert with_pr.translation.max < 0.5, 'trajectory diverged'
    print('OK')


if __name__ == '__main__':
    main()
