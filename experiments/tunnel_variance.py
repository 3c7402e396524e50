"""Probe run-to-run and within-process variance of the e2e per-scan and
chunked legs on the live tunnel.

Round-4 continuation: the same 16k per-scan leg measured 77.67 scans/s
inside a full bench.py run and 1165 scans/s in a fresh process 30 min
later; chunked=8 measured 40 then 85.  This script times each dispatch
individually (enqueue cost) plus the end-to-end blocked rate, repeated
R times in ONE process, to show whether the spread is transport noise,
queue-depth pipelining, or process-state accumulation.

Run:  PYTHONPATH="$PYTHONPATH:/root/repo" python experiments/tunnel_variance.py

PREREQUISITE — live-tunnel probe: this script imports jax at module load,
and when the TPU tunnel is DOWN the axon sitecustomize can hang every
python startup indefinitely (CLAUDE.md environment rules).  Check tunnel
health FIRST with

    timeout 120 python -c "import jax; print(jax.devices())"

and only run this script when that prints a TPU device.  (Running under
``timeout 600 python experiments/tunnel_variance.py`` is a reasonable
belt-and-suspenders.)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from experiments.chunked_e2e import beam_cfg
from laser_slam_tpu.pipeline import online
from laser_slam_tpu.pipeline import velodyne_sim as vs


def main():
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
    print('device:', jax.devices()[0].device_kind, flush=True)
    s16 = vs.BeamStream(n_scans=128, n_beams=64, n_azimuth=256,
                        trajectory='circle', radius_m=20.0,
                        world_size_m=80.0, range_noise_m=0.01,
                        odom_noise=0.005, seed=11)
    frames = list(s16)
    cfg = beam_cfg(16384, 16384, 512, 256)

    for rep in range(3):
        r = online.OnlineRunner(cfg, pose_capacity=2048,
                                factor_capacity=8192)
        for f in frames[:8]:
            r.process_scan(f.time_ns, f.points, f.odom_pose7)
        np.asarray(r.state.traj_poses)  # true sync (design.md trap #5)
        # (a) enqueue-only per-scan latencies (async dispatch cost)
        enq = []
        t0 = time.perf_counter()
        for f in frames[8:]:
            t1 = time.perf_counter()
            r.process_scan(f.time_ns, f.points, f.odom_pose7)
            enq.append(time.perf_counter() - t1)
        np.asarray(r.state.traj_poses)  # true sync (design.md trap #5)
        wall = time.perf_counter() - t0
        enq = np.array(enq) * 1e3
        print(f'rep{rep} per-scan: {len(enq)/wall:8.2f} scans/s  '
              f'enqueue ms p50={np.percentile(enq,50):.2f} '
              f'p90={np.percentile(enq,90):.2f} max={enq.max():.2f}  '
              f'block-tail={wall - enq.sum()/1e3:.3f}s', flush=True)
        # (b) fully synchronous per-scan (block every scan): the
        # no-pipelining latency story
        r2 = online.OnlineRunner(cfg, pose_capacity=2048,
                                 factor_capacity=8192)
        for f in frames[:8]:
            r2.process_scan(f.time_ns, f.points, f.odom_pose7)
        np.asarray(r2.state.traj_poses)  # true sync (design.md trap #5)
        lat = []
        for f in frames[8:40]:
            t1 = time.perf_counter()
            r2.process_scan(f.time_ns, f.points, f.odom_pose7)
            np.asarray(r2.state.traj_poses)  # true sync (design.md trap #5)
            lat.append(time.perf_counter() - t1)
        lat = np.array(lat) * 1e3
        print(f'rep{rep} sync    : p50={np.percentile(lat,50):7.2f} ms '
              f'p90={np.percentile(lat,90):7.2f} max={lat.max():7.2f}',
              flush=True)
        # (c) chunked=8
        r3 = online.OnlineRunner(cfg, pose_capacity=2048,
                                 factor_capacity=8192)
        for f in frames[:8]:
            r3.process_scan(f.time_ns, f.points, f.odom_pose7)
        timed = frames[8:]
        timed = timed[:(len(timed) // 8) * 8]
        r3.process_scans([(f.time_ns, f.points, f.odom_pose7)
                          for f in timed[:8]])
        timed = timed[8:]
        np.asarray(r3.state.traj_poses)  # true sync (design.md trap #5)
        lat = []
        for k in range(0, len(timed), 8):
            t1 = time.perf_counter()
            r3.process_scans([(f.time_ns, f.points, f.odom_pose7)
                              for f in timed[k:k + 8]])
            np.asarray(r3.state.traj_poses)  # true sync (design.md trap #5)
            lat.append(time.perf_counter() - t1)
        lat = np.array(lat) * 1e3
        print(f'rep{rep} chunk8  : {8e3/np.median(lat):8.2f} scans/s  '
              f'per-chunk ms p50={np.percentile(lat,50):.1f} '
              f'max={lat.max():.1f}', flush=True)


if __name__ == '__main__':
    main()
