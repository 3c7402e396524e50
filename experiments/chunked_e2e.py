"""Measure chunked streaming (OnlineRunner.process_scans / online_chunk)
against the per-scan path on the real TPU, at both bench densities.

Motivation (round 3): profiling showed the per-scan e2e path pays a
~20 ms/scan host+dispatch floor over the axon tunnel (per-array handle
marshalling of the ~40-array OnlineState), dwarfing the ~10 ms device
compute of a KITTI-density scan.  online_chunk lax.scans C scans inside
one program, paying the marshalling once per chunk.

Run:  PYTHONPATH="$PYTHONPATH:/root/repo" \
      JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
      python experiments/chunked_e2e.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                   InputFilterConfig, LaserTrackConfig,
                                   SolverConfig)
from laser_slam_tpu.pipeline import online
from laser_slam_tpu.pipeline import velodyne_sim as vs


def beam_cfg(scan_cap, store_cap, ri_cols, ni_cols):
    elev_min = float(np.deg2rad(vs.HDL64_ELEV_DEG.min()) - 0.01)
    elev_max = float(np.deg2rad(vs.HDL64_ELEV_DEG.max()) + 0.01)
    return EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=5,
            odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
            icp_noise_model=(0.005,) * 6,
            input_filters=InputFilterConfig(scan_capacity=scan_cap,
                                            store_capacity=store_cap),
            icp=IcpConfig(matcher='projective', reading_capacity=8192,
                          reading_sampling_ratio=0.5,
                          normal_method='image_pca',
                          normal_image_rows=32, normal_image_cols=ni_cols,
                          range_image_rows=64, range_image_cols=ri_cols,
                          range_image_elev_min=elev_min,
                          range_image_elev_max=elev_max)),
        solver=SolverConfig(gn_iterations=3, gn_tolerance=1e-4,
                            pcg_iterations=32, window=64))


def run(cfg, frames, n_warm, chunk):
    r = online.OnlineRunner(cfg, pose_capacity=2048, factor_capacity=8192)
    for f in frames[:n_warm]:
        r.process_scan(f.time_ns, f.points, f.odom_pose7)
    timed = frames[n_warm:]
    n_timed = (len(timed) // chunk) * chunk if chunk > 1 else len(timed)
    timed = timed[:n_timed]
    # compile the chunk shape outside the timed region
    if chunk > 1:
        r.process_scans([(f.time_ns, f.points, f.odom_pose7)
                         for f in timed[:chunk]])
        timed = timed[chunk:]
    np.asarray(r.state.traj_poses)  # true sync (design.md trap #5)
    t0 = time.perf_counter()
    if chunk > 1:
        for i in range(0, len(timed), chunk):
            r.process_scans([(f.time_ns, f.points, f.odom_pose7)
                             for f in timed[i:i + chunk]])
    else:
        for f in timed:
            r.process_scan(f.time_ns, f.points, f.odom_pose7)
    np.asarray(r.state.traj_poses)  # true sync (design.md trap #5)
    rate = len(timed) / (time.perf_counter() - t0)
    traj = online.extract_trajectory(r.state)
    n_used = n_warm + (len(timed) + (chunk if chunk > 1 else 0))
    errs = np.linalg.norm(
        traj[:n_used, 4:]
        - np.stack([f.gt_pose7[4:] for f in frames[:n_used]]), axis=1)
    return rate, float(errs.mean())


def main():
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
    print('device:', jax.devices()[0].device_kind)

    s16 = vs.BeamStream(n_scans=128, n_beams=64, n_azimuth=256,
                        trajectory='circle', radius_m=20.0,
                        world_size_m=80.0, range_noise_m=0.01,
                        odom_noise=0.005, seed=11)
    frames_16k = list(s16)
    sk = vs.BeamStream(n_scans=116, n_beams=64, n_azimuth=2048,
                       trajectory='circle', radius_m=20.0,
                       world_size_m=80.0, range_noise_m=0.01,
                       odom_noise=0.005, seed=12)
    frames_kitti = list(sk)

    cfg16 = beam_cfg(16384, 16384, 512, 256)
    cfgk = beam_cfg(131072, 32768, 1024, 1024)

    for name, cfg, frames, n_warm in (('16k', cfg16, frames_16k, 8),
                                      ('kitti', cfgk, frames_kitti, 10)):
        for chunk in (1, 8, 16):
            t0 = time.time()
            rate, err = run(cfg, frames, n_warm, chunk)
            print(f'{name} chunk={chunk:2d}: {rate:7.2f} scans/s  '
                  f'mean_err={err*100:.1f} cm  (wall {time.time()-t0:.0f}s)',
                  flush=True)


if __name__ == '__main__':
    main()
