"""Where do the PR-on 16k e2e milliseconds go? (round-5 ask #4)

Round 4 measured PR-on at 14.92 scans/s vs 46.56 plain at 16k (3.1x)
with no breakdown.  This runs the EXACT bench leg (run_e2e_pr config,
2-lap off-center circle, chunk=8) with the Benchmarker enabled and
reports, per host-side stage, total ms across the run:

  online.process_scans      chunk dispatch host cost (everything)
  online.flush_detections   candidate fetch + decisions (incl. below)
  online.verify_closure     ICP verification dispatches
  online.lc_cache_build     Woodbury cache (re)builds
  online.lc_solve_dispatch  closure extend+solve dispatches

plus detection counts, so (flush - verify - builds - solves) isolates
the pure fetch/sync cost and the PR-off run anchors the base rate.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/pr16k_attribution.py
"""
import time

import numpy as np
import jax

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import laser_slam_tpu  # noqa: F401
from laser_slam_tpu.core import benchmarker as bench_reg
from laser_slam_tpu.config import PlaceRecognitionConfig
from laser_slam_tpu.pipeline import online
from laser_slam_tpu.pipeline import velodyne_sim as vs
from experiments.chunked_e2e import beam_cfg


def run(frames, cfg, with_pr: bool, chunk=8, n_warm=8):
    import dataclasses
    kw = {}
    if with_pr:
        pr = PlaceRecognitionConfig(detect_every=2, fetch_every=4,
                                    exclude_recent_keys=24,
                                    min_keys_between_detections=10)
        cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
            cfg.solver, preconditioner='woodbury'))
        kw = dict(archive_points=2048, place_recognition=pr)
    r = online.OnlineRunner(cfg, pose_capacity=2048, factor_capacity=8192,
                            **kw)
    for f in frames[:n_warm]:
        r.process_scan(f.time_ns, f.points, f.odom_pose7)
    timed = frames[n_warm:]
    timed = timed[:(len(timed) // chunk) * chunk]
    r.process_scans([(f.time_ns, f.points, f.odom_pose7)
                     for f in timed[:chunk]])
    if with_pr:
        r.warmup_closure_path()
    timed = timed[chunk:]
    np.asarray(r.state.traj_poses)   # TRUE sync: block_until_ready can
    # return before enqueued donated-state chunks execute (design.md
    # trap #5) — a D2H fetch orders behind all pending work.
    bench_reg.enable()
    bench_reg.reset_topic()
    t0 = time.perf_counter()
    for k in range(0, len(timed), chunk):
        r.process_scans([(f.time_ns, f.points, f.odom_pose7)
                         for f in timed[k:k + chunk]])
    if with_pr:
        r.flush_detections()
    np.asarray(r.state.traj_poses)   # true completion
    dt = time.perf_counter() - t0
    rate = len(timed) / dt
    stats = dict(bench_reg.statistics())
    bench_reg.disable()
    return rate, dt, stats, r


def main():
    frames = list(vs.BeamStream(
        n_scans=128, n_beams=64, n_azimuth=256, trajectory='circle',
        radius_m=20.0, center_m=(8.0, 5.0), laps=2, world_size_m=80.0,
        range_noise_m=0.01, odom_noise=0.005, seed=21))
    cfg = beam_cfg(16384, 16384, 512, 256)

    rate0, dt0, _, _ = run(frames, cfg, with_pr=False)
    print(f'PR-off: {rate0:7.2f} scans/s ({dt0*1e3:.0f} ms total)',
          flush=True)

    rate1, dt1, stats, r = run(frames, cfg, with_pr=True)
    print(f'PR-on:  {rate1:7.2f} scans/s ({dt1*1e3:.0f} ms total); '
          f'{len(r.detections)} injected, '
          f'{len(r.rejected_detections)} rejected', flush=True)
    for topic in ('online.process_scans', 'online.flush_detections',
                  'online.verify_closure', 'online.lc_cache_build',
                  'online.lc_solve_dispatch'):
        if topic in stats:
            mean, sd, cnt = stats[topic]
            print(f'  {topic:28s} {mean*cnt:8.0f} ms total '
                  f'({cnt} x {mean:.1f} ms)', flush=True)


if __name__ == '__main__':
    main()
