"""Reproduce the r5 PR-leg trajectory explosion (BENCH_FULL first TPU
run: tpu_e2e_beam16k_pr_mean_err_m = 2855 m, 27 rejected detections vs
r04's 7 accepted / 0 rejected).

Hypothesis: the leg's switch to closure_solve='delta'
(solver.solve_closure_cached) is the cause — the delta solve diverges
once whitened closure lever arms leave the f32-stable range (see
experiments/delta_divergence_probe.py), and ONE exploded closure solve
poisons the trajectory, after which every later detection fails the ICP
gate (the 27 rejections are a symptom, not a defense success).

Runs the bench's exact 16k PR configuration at full shapes on the CPU
backend with closure_solve in {'delta', 'full'} and prints detections /
rejections / mean trajectory error for each.

Run:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      PYTHONPATH=/root/repo python experiments/pr_delta_repro.py

Findings (2026-08-20, CPU backend, full 16k shapes, 128-scan 2-lap
stream):
  PRE-FIX   delta: det=2 rej=22 mean_err=1503.5 m  |  full: det=7
            rej=0 mean_err=0.030 m — confirmed: one diverged delta
            solve poisons the trajectory and every later detection
            fails the gate.
  POST-FIX  (guarded refinement + gradient-norm acceptance):
            delta: det=7 rej=0 mean_err=0.032 m  |  full: det=7 rej=0
            mean_err=0.030 m — the hardened delta path matches the
            full path on this stream.  The bench PR legs still run
            'full' (the measured lc_solve share is ~3 ms/run — there
            is nothing to win), but 'delta' is no longer a
            trajectory-safety hazard.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from dataclasses import replace as dc_replace

import laser_slam_tpu  # noqa: F401
from laser_slam_tpu.config import PlaceRecognitionConfig
from laser_slam_tpu.pipeline import online
from laser_slam_tpu.pipeline import velodyne_sim as vs


def beam_cfg(scan_cap, store_cap, ri_cols, ni_cols):
    # Mirror bench.beam_cfg (bench.py:794-810) for the 16k leg.
    from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                       InputFilterConfig, LaserTrackConfig,
                                       SolverConfig)
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


def run(mode):
    frames = list(vs.BeamStream(
        n_scans=128, n_beams=64, n_azimuth=256, trajectory='circle',
        radius_m=20.0, center_m=(8.0, 5.0), laps=2, world_size_m=80.0,
        range_noise_m=0.01, odom_noise=0.005, seed=21))
    cfg = beam_cfg(16384, 16384, 512, 256)
    pr = PlaceRecognitionConfig(detect_every=2, fetch_every=4,
                                exclude_recent_keys=24,
                                min_keys_between_detections=10)
    cfg = dc_replace(cfg, solver=dc_replace(
        cfg.solver, preconditioner='woodbury', closure_solve=mode,
        compute_errors=False))
    r = online.OnlineRunner(cfg, pose_capacity=2048, factor_capacity=8192,
                            archive_points=2048, place_recognition=pr)
    chunk = 8
    n_warm = 8
    for f in frames[:n_warm]:
        r.process_scan(f.time_ns, f.points, f.odom_pose7)
    timed = frames[n_warm:]
    timed = timed[:(len(timed) // chunk) * chunk]
    t0 = time.perf_counter()
    for k in range(0, len(timed), chunk):
        r.process_scans([(f.time_ns, f.points, f.odom_pose7)
                         for f in timed[k:k + chunk]])
    r.flush_detections()
    jax.block_until_ready(r.state.traj_poses)
    dt = time.perf_counter() - t0
    traj = online.extract_trajectory(r.state)
    gt = np.stack([f.gt_pose7[4:] for f in frames])
    n = min(len(traj), len(gt))
    errs = np.linalg.norm(traj[:n, 4:] - gt[:n], axis=1)
    print(f'{mode:6s}: det={len(r.detections)} rej='
          f'{len(r.rejected_detections)} mean_err={errs.mean():.3f} m '
          f'max_err={errs.max():.3f} m  ({len(timed)/dt:.1f} scans/s '
          'incl. compile)')


if __name__ == '__main__':
    for mode in ('delta', 'full'):
        run(mode)
