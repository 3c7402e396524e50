"""KITTI-density e2e tuning: where do the 57 ms/scan go, what wins?

Variants over the bench.py KITTI-density config (131072-pt scans,
projective matcher, image_pca normals, window=64 solve).  Run ALONE.
"""

import time

import numpy as np


def run_variant(name, cfg, frames, online, jax):
    runner = online.OnlineRunner(cfg, pose_capacity=2048,
                                 factor_capacity=8192)
    for f in frames[:6]:
        runner.process_scan(f.time_ns, f.points, f.odom_pose7)
    jax.block_until_ready(runner.state.traj_poses)
    t0 = time.perf_counter()
    for f in frames[6:]:
        runner.process_scan(f.time_ns, f.points, f.odom_pose7)
    jax.block_until_ready(runner.state.traj_poses)
    rate = (len(frames) - 6) / (time.perf_counter() - t0)
    # Solution sanity: last-pose drift vs gt.
    traj = runner.trajectory()
    err = [float(np.linalg.norm(traj[f.time_ns][4:] - f.gt_pose7[4:]))
           for f in frames]
    print(f'{name:28s} {rate:6.2f} scans/s  max|err| {max(err)*100:.1f} cm')
    return rate


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
    import laser_slam_tpu  # noqa: F401
    from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                       InputFilterConfig, LaserTrackConfig,
                                       SolverConfig)
    from laser_slam_tpu.pipeline import online, replay

    def make_cfg(**icp_kw):
        solver_kw = dict(gn_iterations=3, pcg_iterations=32, window=64)
        solver_kw.update(icp_kw.pop('solver_kw', {}))
        lt_kw = icp_kw.pop('lt_kw', {})
        base_icp = dict(matcher='projective', reading_capacity=8192,
                        reading_sampling_ratio=0.25,
                        normal_method='image_pca',
                        normal_image_rows=64, normal_image_cols=1024,
                        range_image_rows=64, range_image_cols=1024)
        base_icp.update(icp_kw)
        lt_base = dict(nscan_in_sub_map=5)
        lt_base.update(lt_kw)
        lt_kw = lt_base
        return EstimatorConfig(
            laser_track=LaserTrackConfig(
                odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
                icp_noise_model=(0.005,) * 6,
                input_filters=InputFilterConfig(scan_capacity=131072,
                                                store_capacity=32768),
                icp=IcpConfig(**base_icp), **lt_kw),
            solver=SolverConfig(**solver_kw))

    frames = list(replay.SyntheticStream(
        n_scans=26, points_per_scan=131072, world_points=262144,
        trajectory='circle', radius_m=20.0, noise_m=0.01,
        odom_noise=0.005, seed=6))

    # --- component decomposition (what does 50 ms/scan buy?) ----------
    run_variant('baseline (as benched)', make_cfg(), frames, online, jax)
    run_variant('no ICP factors (odom only)', make_cfg(
        lt_kw=dict(use_icp_factors=False)), frames, online, jax)
    run_variant('cheap normals (cross-prod)', make_cfg(
        normal_method='range_image'), frames, online, jax)
    run_variant('pcg16 gn2', make_cfg(
        solver_kw=dict(pcg_iterations=16, gn_iterations=2)),
        frames, online, jax)
    run_variant('pixel-pca + pcg16 gn2', make_cfg(
        solver_kw=dict(pcg_iterations=16, gn_iterations=2)),
        frames, online, jax)


if __name__ == '__main__':
    main()
