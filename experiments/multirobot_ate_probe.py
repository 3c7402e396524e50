"""Probe the multirobot linked-map ATE (BENCH r5 first TPU run:
tpu_multirobot_linked_ate_m = 27.4 m vs 0.897 m for the same code at
full shapes on the CPU backend).

The linking closure is a ~100 m correction — far outside one warm GN
step's trust region — absorbed by refine() passes after injection.  The
hypothesis: the budget (2 passes x 6 GN x 128 PCG) sits right at the
convergence edge and backend-dependent f32 rounding decides whether it
lands; more refine passes should close it on either backend.

Run (TPU):
  PYTHONPATH=/root/repo JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
      python experiments/multirobot_ate_probe.py
CPU: prefix env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu.

Findings (2026-08-20):
  PRE-FIX, identical plateau on BOTH backends (so not tunnel weather):
  TPU 52.1 m after closure -> 36.3 / 27.4 / 26.7 / 27.6 / 28.4 / 26.8 m
  over 6 refine passes; CPU 52.1 -> 27.8-29.2 m.  Diagnosis
  (/tmp-level instrumented run): prior removed, closure factor
  satisfied to 0.13 m, per-track internal drift 4 cm — but the whole
  absorbed track sat ROTATED about the closure pose.  With interleaved
  multi-robot keys NO track factor lands on the block-tridiagonal
  chain (key_b == key_a+1 never holds across interleaving), so the
  chain preconditioner cannot carry the track-global rotation mode and
  12 GN x 128 PCG leave it unconverged.
  POST-FIX (_apply_group_alignment: rigidly pre-align the absorbed
  group by the closure's world correction before the solve — the
  reference's world_to_odom frame-shift semantics,
  laser_slam_worker.cpp:522-540): ATE 0.035 m immediately after the
  closure solve, stable under further refines, both backends.
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
from laser_slam_tpu.ops import se3
from laser_slam_tpu.pipeline import online
from laser_slam_tpu.pipeline import velodyne_sim as vs


def main():
    # TPU only — XLA:CPU AOT (de)serialization is broken in this
    # environment (see CLAUDE.md).
    if jax.devices()[0].platform != 'cpu':
        jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
    from experiments.pr_delta_repro import beam_cfg
    cfg16 = beam_cfg(16384, 16384, 512, 256)
    mr_cfg = dc_replace(cfg16, laser_track=dc_replace(
        cfg16.laser_track, force_priors=True))
    mr_scene = vs.make_beam_scene(seed=31, world_size_m=80.0)
    MR_N = 64
    mr_streams = [list(vs.BeamStream(
        n_scans=MR_N, n_beams=64, n_azimuth=256, trajectory='circle',
        radius_m=20.0, center_m=(6.0 * t, 4.0 * t), laps=1,
        world_size_m=80.0, range_noise_m=0.01, odom_noise=0.005,
        seed=31 + t, scene=mr_scene)) for t in range(2)]

    r = online.OnlineRunner(mr_cfg, pose_capacity=2048,
                            factor_capacity=8192, n_tracks=2,
                            archive_points=1024)
    for i in range(MR_N):
        for t in range(2):
            f = mr_streams[t][i]
            r.process_scan(f.time_ns + t, f.points, f.odom_pose7,
                           track_id=t)
    gt = [np.stack([f.gt_pose7 for f in s]) for s in mr_streams]
    keys_of = [[k for k, (t, _) in enumerate(r.key_info) if t == tid]
               for tid in range(2)]
    d2 = np.linalg.norm(gt[0][:, None, 4:] - gt[1][None, :, 4:], axis=-1)
    ia, ib = np.unravel_index(np.argmin(d2), d2.shape)
    ka, kb = keys_of[0][ia], keys_of[1][ib]
    poses = online.extract_trajectory(r.state)
    rel_true = se3.compose(se3.inverse(jnp.asarray(gt[0][ia])),
                           jnp.asarray(gt[1][ib]))
    w_T_a_b = np.asarray(se3.compose(
        jnp.asarray(poses[ka]),
        se3.compose(rel_true, se3.inverse(jnp.asarray(poses[kb])))))
    r.warmup_closure_path(use_association=True)
    t0 = time.perf_counter()
    assert r.add_loop_closure(ka, kb, w_T_a_b)
    jax.block_until_ready(r.state.traj_poses)
    print(f'link closure: {(time.perf_counter() - t0) * 1e3:.1f} ms')

    def ate():
        p2 = online.extract_trajectory(r.state)
        Ta2 = jnp.asarray(p2[ka])
        errs = []
        for j, kbj in enumerate(keys_of[1]):
            exp = se3.compose(Ta2, se3.compose(
                se3.inverse(jnp.asarray(gt[0][ia])), jnp.asarray(gt[1][j])))
            errs.append(np.linalg.norm(np.asarray(exp)[4:] - p2[kbj][4:]))
        return float(np.mean(errs))

    print(f'ATE after closure, no refine: {ate():.3f} m')
    for k in range(1, 7):
        t0 = time.perf_counter()
        r.refine(1, gn_iterations=6, pcg_iterations=128,
                 pcg_tolerance=1e-8)
        jax.block_until_ready(r.state.traj_poses)
        print(f'ATE after refine pass {k}: {ate():.3f} m '
              f'({(time.perf_counter() - t0) * 1e3:.0f} ms)')


if __name__ == '__main__':
    main()
