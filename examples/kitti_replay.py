"""Replay a KITTI odometry sequence through the online SLAM fast path.

Usage:
    PYTHONPATH=. python examples/kitti_replay.py --root /data/kitti \
        --sequence 05 --max-scans 500 --map-out /tmp/kitti05_map.ply

Reads velodyne .bin scans (through the native C++ prefetch loader when
built), uses the sequence poses as odometry (or dead-reckons without),
runs the device-resident pipeline, reports trajectory stats, and
optionally exports the occupancy map.
"""

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--root', required=True, help='KITTI odometry root')
    p.add_argument('--sequence', default='05')
    p.add_argument('--max-scans', type=int, default=None)
    p.add_argument('--matcher', default='projective')
    p.add_argument('--window', type=int, default=64)
    p.add_argument('--scan-capacity', type=int, default=32768)
    p.add_argument('--reading-capacity', type=int, default=8192)
    p.add_argument('--reading-sampling', type=float, default=0.25)
    p.add_argument('--min-distance', type=float, default=2.5)
    p.add_argument('--cpu', action='store_true',
                   help='force the CPU backend (tests/small fixtures)')
    p.add_argument('--place-recognition', action='store_true',
                   help='detect + inject loop closures in-tree '
                        '(scan-context, ICP-verified)')
    p.add_argument('--pr-threshold', type=float, default=0.2,
                   help='scan-context acceptance distance')
    p.add_argument('--pr-every', type=int, default=4,
                   help='query cadence in scans (D2H fetch per query)')
    p.add_argument('--pr-exclude', type=int, default=50,
                   help='temporal exclusion window in keys')
    p.add_argument('--map-out', default=None,
                   help='occupancy map output (.ply/.pcd/.xyz/.npz)')
    p.add_argument('--traj-out', default=None, help='trajectory CSV out')
    args = p.parse_args()

    import jax
    if args.cpu:
        # The axon plugin ignores JAX_PLATFORMS from the env; the config
        # API is the only working override (CLAUDE.md).
        jax.config.update('jax_platforms', 'cpu')
    from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                       InputFilterConfig, LaserTrackConfig,
                                       SolverConfig)
    from laser_slam_tpu.pipeline import online, replay
    from laser_slam_tpu.core import benchmarker as bench

    cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=5,
            odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
            icp_noise_model=(0.005,) * 6,
            input_filters=InputFilterConfig(
                min_distance_m=args.min_distance, max_distance_m=70.0,
                scan_capacity=args.scan_capacity),
            icp=IcpConfig(matcher=args.matcher,
                          reading_capacity=args.reading_capacity,
                          reading_sampling_ratio=args.reading_sampling,
                          range_image_rows=64, range_image_cols=1024,
                          range_image_elev_min=-0.45,
                          range_image_elev_max=0.10)),
        solver=SolverConfig(gn_iterations=3, pcg_iterations=32,
                            window=args.window))

    stream = replay.KittiStream(args.root, args.sequence,
                                max_scans=args.max_scans)
    pr_cfg = None
    if args.place_recognition:
        from laser_slam_tpu.config import PlaceRecognitionConfig
        pr_cfg = PlaceRecognitionConfig(
            detect_every=args.pr_every,
            distance_threshold=args.pr_threshold,
            exclude_recent_keys=args.pr_exclude, max_radius_m=80.0)
    runner = online.OnlineRunner(
        cfg, pose_capacity=1 << 13, factor_capacity=1 << 15,
        minimum_distance_to_add_pose=1.0,
        archive_points=1024 if pr_cfg else 0,
        place_recognition=pr_cfg)
    bench.enable()

    print(f'device: {jax.devices()[0]}, scans: {len(stream)}')
    t0 = time.time()
    n = 0
    gts = {}
    for frame in stream:
        if runner.process_scan(frame.time_ns, frame.points,
                               frame.odom_pose7):
            if frame.gt_pose7 is not None:
                gts[frame.time_ns] = frame.gt_pose7
            n += 1
            if n % 100 == 0:
                print(f'  {n} scans, {n / (time.time() - t0):.1f} scans/s')
    dt = time.time() - t0
    print(f'integrated {n} scans in {dt:.1f}s ({n / dt:.1f} scans/s '
          f'incl. compile)')
    if args.place_recognition:
        print(f'loop closures: {len(runner.detections)} accepted, '
              f'{len(runner.rejected_detections)} rejected by ICP gate')
        for key_a, key_b, dist, yaw in runner.detections:
            print(f'  key {key_b} -> key {key_a} (sc-dist {dist:.3f}, '
                  f'yaw {np.degrees(yaw):.1f} deg)')

    traj = runner.trajectory()
    if gts:
        from laser_slam_tpu.core import evaluation as ev
        # align='none': KITTI ground truth and the runner share the first
        # pose as origin, and unaligned ATE is the honest SLAM error.
        res = ev.ate(traj, gts, align='none')
        print(f'ATE vs KITTI poses: mean {res.translation.mean:.3f} m, '
              f'max {res.translation.max:.3f} m over {res.translation.n} '
              f'poses (rmse {res.translation.rmse:.3f} m, rot mean '
              f'{res.rotation_deg.mean:.3f} deg)')
        try:
            rpe = ev.rpe(traj, gts, delta=10.0, delta_unit='m')
            print(f'RPE per 10 m: {rpe.translation.mean * 100:.2f}% trans, '
                  f'{rpe.rotation_deg.mean:.3f} deg')
        except ValueError:
            pass  # trajectory shorter than the 10 m delta

    if args.traj_out:
        rows = np.asarray([[t, *traj[t][4:]] for t in sorted(traj)])
        np.savetxt(args.traj_out, rows, delimiter=',', fmt='%.9g')
        print('trajectory ->', args.traj_out)

    if args.map_out:
        from laser_slam_tpu.pipeline import occupancy as occ
        grid = occ.OccupancyGrid(resolution=0.2, max_range=50.0)
        for i, frame in enumerate(replay.KittiStream(
                args.root, args.sequence, max_scans=args.max_scans)):
            if frame.time_ns in traj:
                grid.insert_scan(frame.points[::4], traj[frame.time_ns])
        grid.save(args.map_out)
        print('map ->', args.map_out)


if __name__ == '__main__':
    main()
