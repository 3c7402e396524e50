"""Multi-robot demo: two robots, one graph, device-resident fast path.

Two robots map the same world from different starting points.  Each gets
a forced prior 100 m apart (the reference's multi-robot bootstrap,
laser_track.cpp:166-170), scans interleave into ONE device pose table +
factor graph, and a cross-track loop closure (place recognition finding
the shared location) links the tracks: robot 1's prior is removed and
its whole trajectory is pulled into robot 0's frame — the reference's
estimateAndRemove semantics (incremental_estimator.cpp:165-266) running
as device weight writes.

Usage:  PYTHONPATH=. python examples/multi_robot_demo.py [--cpu]
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--scans', type=int, default=12)
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    else:
        jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')

    import jax.numpy as jnp
    from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                       InputFilterConfig, LaserTrackConfig,
                                       SolverConfig)
    from laser_slam_tpu.ops import se3
    from laser_slam_tpu.pipeline import online, replay

    print('device:', jax.devices()[0])
    cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=3, force_priors=True,
            odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
            icp_noise_model=(0.005,) * 6,
            input_filters=InputFilterConfig(scan_capacity=8192),
            icp=IcpConfig(matcher='projective', reading_capacity=4096,
                          reading_sampling_ratio=0.5)),
        solver=SolverConfig(gn_iterations=3, pcg_iterations=48))
    runner = online.OnlineRunner(cfg, pose_capacity=128,
                                 factor_capacity=512, n_tracks=2)

    # Both robots traverse the SAME world; robot 1 runs the loop from the
    # opposite phase so the two meet mid-sequence.
    n = args.scans
    world_frames = list(replay.SyntheticStream(
        n_scans=2 * n, points_per_scan=8192, world_points=65536,
        trajectory='circle', radius_m=12.0, noise_m=0.005,
        odom_noise=0.004, seed=42, laps=2))
    robots = [world_frames[:n], world_frames[n:2 * n]]

    t0 = time.perf_counter()
    for i in range(n):
        for t in (0, 1):
            f = robots[t][i]
            runner.process_scan(f.time_ns + t, f.points, f.odom_pose7,
                                track_id=t)
    jax.block_until_ready(runner.state.traj_poses)
    print(f'integrated 2 x {n} scans in {time.perf_counter() - t0:.1f}s')

    # Before linking: robot 1 lives at its forced prior, 100 m away.
    p1_before = list(runner.trajectory(1).values())[0]
    print(f'robot 1 frame offset before linking: y = {p1_before[5]:.1f} m')

    # Cross-track closure at the shared place: lap 2's first scan (robot
    # 1, index 0) revisits lap 1's first scan (robot 0, index 0).  Place
    # recognition reports the world alignment computed from the current
    # estimates + the true relative pose (the segmatch contract).
    keys0 = [i for i, (t, _) in enumerate(runner.key_info) if t == 0]
    keys1 = [i for i, (t, _) in enumerate(runner.key_info) if t == 1]
    key_a, key_b = keys0[0], keys1[0]
    rel = se3.compose(se3.inverse(jnp.asarray(robots[0][0].gt_pose7)),
                      jnp.asarray(robots[1][0].gt_pose7))
    poses = online.extract_trajectory(runner.state)
    w_T_a_b = se3.compose(jnp.asarray(poses[key_a]),
                          se3.compose(rel, se3.inverse(
                              jnp.asarray(poses[key_b]))))
    runner.add_loop_closure(key_a, key_b, np.asarray(w_T_a_b))
    print('cross-track closure added: groups =', runner._linked_groups,
          '| remaining priors =', runner._prior_slot_of_track)
    # The 100 m linking jump exceeds the per-scan solver budget (3 GN x
    # 48 PCG leaves meter-level chain rotation); one strong polish solve
    # converges the linked map (live streams instead absorb it over the
    # next scans' solves).
    runner.refine(1, gn_iterations=6, pcg_iterations=256,
                  pcg_tolerance=1e-10)

    # After linking: both tracks share robot 0's gauge frame (its forced
    # prior pins key 0 at identity while ground truth starts elsewhere on
    # the circle), so align the shared frame to ground truth via robot
    # 0's first pose before comparing.
    poses2 = online.extract_trajectory(runner.state)
    T_align = se3.compose(jnp.asarray(robots[0][0].gt_pose7),
                          se3.inverse(jnp.asarray(poses2[keys0[0]])))
    errs = []
    for t, keys in ((0, keys0), (1, keys1)):
        for f, k in zip(robots[t], keys):
            p = np.asarray(se3.compose(T_align, jnp.asarray(poses2[k])))
            errs.append(np.linalg.norm(p[4:] - f.gt_pose7[4:]))
    errs = np.asarray(errs)
    print(f'combined-map error vs ground truth: mean {errs.mean()*100:.1f} '
          f'cm, max {errs.max()*100:.1f} cm')
    assert errs.max() < 0.10, 'multi-robot map did not converge'
    print('OK')


if __name__ == '__main__':
    main()
