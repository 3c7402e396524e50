"""Headline batch-size sweep + 500-scan online soak test.  Run ALONE.

Measured (TPU v5e-1, 2026-08-17): B=32 ~1100 pairs/s, B=128 ~910,
B=64 ~345 (reproducible XLA scheduling pathology — avoid B=64).
Soak: 6-8 scans/s in blocks where capacity growth recompiles
online_step (~10 s/growth over the tunnel), then 106-117 scans/s
steady-state; drift 0.45% of path without loop closures.

Part 1: the batched ICP headline (bench.py's batch32 config) at B=32/64/128
to check whether the chip has headroom left at larger batches.

Part 2: a 500-scan online run at 16k points with deliberately small initial
capacities, exercising pose/factor growth re-bucketing mid-run; reports
sustained scans/s over the last 400 scans and the trajectory error.
"""

import time

import numpy as np


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
    import jax.numpy as jnp
    import laser_slam_tpu  # noqa: F401
    from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                       InputFilterConfig, LaserTrackConfig,
                                       SolverConfig)
    from laser_slam_tpu.ops import cloud as pc
    from laser_slam_tpu.ops import icp as icp_mod
    from laser_slam_tpu.ops import range_image as ri
    from laser_slam_tpu.ops import se3
    from laser_slam_tpu.pipeline import online, replay

    # ---- Part 1: batch sweep -----------------------------------------
    REF_N, READ_N = 65536, 8192
    rng = np.random.default_rng(11)
    world = np.stack([rng.uniform(-50, 50, REF_N),
                      rng.uniform(-50, 50, REF_N),
                      rng.uniform(0, 6, REF_N)], 1).astype(np.float32)
    ref = pc.make_cloud(world, capacity=REF_N)
    normals = pc.estimate_normals(ref, knn=10)
    cfg_b = IcpConfig(matcher='projective', reading_capacity=READ_N,
                      reading_sampling_ratio=1.0,
                      range_image_window='cross',
                      coarse_capacity=512, gn_steps_per_match=4)
    image = ri.build_range_image(
        ref, normals, rows=cfg_b.range_image_rows,
        cols=cfg_b.range_image_cols, elev_min=cfg_b.range_image_elev_min,
        elev_max=cfg_b.range_image_elev_max,
        window=cfg_b.range_image_window)

    for B in (32, 64, 128):
        vsolve = jax.jit(jax.vmap(lambda p, m: icp_mod.icp_point_to_plane(
            pc.Cloud(p, m), ref, normals, se3.identity(), cfg_b,
            prebuilt_image=image)))
        batches = []
        for rep in range(4):
            sel = rng.integers(0, REF_N, (B, READ_N))
            pts = world[sel] + rng.normal(0, 0.01, (B, READ_N, 3)).astype(
                np.float32)
            batches.append((jnp.asarray(pts),
                            jnp.ones((B, READ_N), bool)))
        jax.block_until_ready(vsolve(*batches[0]))
        t0 = time.perf_counter()
        outs = [vsolve(*b) for b in batches]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        print(f'B={B:4d}: {4 * B / dt:8.1f} pairs/s')

    # ---- Part 2: soak ------------------------------------------------
    cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=3,
            input_filters=InputFilterConfig(scan_capacity=16384),
            icp=IcpConfig(matcher='projective', reading_capacity=4096,
                          reading_sampling_ratio=0.25,
                          normal_method='image_pca')),
        solver=SolverConfig(gn_iterations=3, pcg_iterations=32, window=64))
    # Start tiny: growth re-buckets 64->512 poses and 256->2048 factors.
    runner = online.OnlineRunner(cfg, pose_capacity=64, factor_capacity=256)
    frames = list(replay.SyntheticStream(
        n_scans=500, points_per_scan=16384, world_points=131072,
        trajectory='circle', radius_m=25.0, noise_m=0.01,
        odom_noise=0.003, seed=9, laps=5))
    rates = []
    for blk in range(5):
        t0 = time.perf_counter()
        for f in frames[blk * 100:(blk + 1) * 100]:
            runner.process_scan(f.time_ns, f.points, f.odom_pose7)
        jax.block_until_ready(runner.state.traj_poses)
        rates.append(100 / (time.perf_counter() - t0))
        print(f'  scans {blk*100}-{blk*100+99}: {rates[-1]:.1f} scans/s '
              f'(caps {runner.state.traj_poses.shape[0]}p/'
              f'{runner.state.rel_meas.shape[0]}f)')
    rate = float(np.mean(rates[1:]))
    traj = runner.trajectory()
    errs = [float(np.linalg.norm(traj[f.time_ns][4:] - f.gt_pose7[4:]))
            for f in frames]
    print(f'soak: {rate:.1f} scans/s sustained over 400 scans '
          f'(capacities grew to {runner.state.traj_poses.shape[0]} poses / '
          f'{runner.state.rel_meas.shape[0]} factors); '
          f'drift mean {np.mean(errs)*100:.1f} cm max {np.max(errs)*100:.1f} cm')


if __name__ == '__main__':
    main()
