"""Decompose chunked-vs-per-scan e2e cost on TPU: device compute,
H2D upload, dispatch pipelining.  Follow-up to chunked_e2e.py whose
first run showed per-scan 773 scans/s at 16k (pipelined dispatch is NOT
the bottleneck after the r3 solver work) while chunked was *slower*.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" \
     JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
     python experiments/chunk_probe.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from laser_slam_tpu.pipeline import online
from laser_slam_tpu.pipeline import velodyne_sim as vs
from experiments.chunked_e2e import beam_cfg


def main():
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
    dev = jax.devices()[0]
    print('device:', dev.device_kind, flush=True)

    s16 = vs.BeamStream(n_scans=128, n_beams=64, n_azimuth=256,
                        trajectory='circle', radius_m=20.0,
                        world_size_m=80.0, range_noise_m=0.01,
                        odom_noise=0.005, seed=11)
    frames = list(s16)
    cfg = beam_cfg(16384, 16384, 512, 256)

    # --- H2D: padded scan upload cost --------------------------------
    for shape in ((16384, 3), (8, 16384, 3)):
        buf = np.zeros(shape, np.float32)
        jax.device_put(buf).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            jax.device_put(buf).block_until_ready()
        dt = (time.perf_counter() - t0) / 10
        mb = buf.nbytes / 1e6
        print(f'h2d {shape}: {dt*1e3:.2f} ms ({mb/dt:.0f} MB/s)', flush=True)

    # --- per-scan path: pipelined vs per-call sync -------------------
    def run_per_scan(sync):
        r = online.OnlineRunner(cfg, pose_capacity=2048,
                                factor_capacity=8192)
        for f in frames[:8]:
            r.process_scan(f.time_ns, f.points, f.odom_pose7)
        jax.block_until_ready(r.state.traj_poses)
        t0 = time.perf_counter()
        for f in frames[8:]:
            r.process_scan(f.time_ns, f.points, f.odom_pose7)
            if sync:
                jax.block_until_ready(r.state.traj_poses)
        jax.block_until_ready(r.state.traj_poses)
        return 120 / (time.perf_counter() - t0)

    for rep in range(2):
        print(f'per-scan pipelined: {run_per_scan(False):7.1f} scans/s',
              flush=True)
    print(f'per-scan per-call-sync: {run_per_scan(True):7.1f} scans/s',
          flush=True)

    # --- chunked: device-only cost, DISTINCT staged chunks -----------
    # (repeating one chunk converges ICP/GN instantly — the early-exit
    # while_loops collapse and the timing is meaningless; first run of
    # this probe measured 0.14 ms/chunk that way.)
    from laser_slam_tpu.pipeline.online import init_archive, online_chunk

    def stage(chunk_frames, C):
        padded = np.full((C, 16384, 3), 1e6, np.float32)
        nv = np.zeros((C,), np.int32)
        odos = np.zeros((C, 7), np.float32)
        for k, f in enumerate(chunk_frames):
            pts = np.asarray(f.points, np.float32)
            n = min(len(pts), 16384)
            padded[k, :n] = pts[:n]
            nv[k] = n
            odos[k] = f.odom_pose7
        return (jax.device_put(padded), jax.device_put(nv),
                jax.device_put(odos), jnp.zeros((C,), jnp.int32))

    for C in (8, 16):
        r = online.OnlineRunner(cfg, pose_capacity=2048,
                                factor_capacity=8192)
        for f in frames[:8]:
            r.process_scan(f.time_ns, f.points, f.odom_pose7)
        chunks = [stage(frames[8 + i * C:8 + (i + 1) * C], C)
                  for i in range((len(frames) - 8) // C)]
        ar = init_archive(1, 1, 1)
        cur, ar, _ = online_chunk(r.state, ar, *chunks[0], r.config,
                                  odometry_free=False, with_archive=False)
        jax.block_until_ready(cur.traj_poses)       # compiled
        t0 = time.perf_counter()
        for ch in chunks[1:]:
            cur, ar, _ = online_chunk(cur, ar, *ch, r.config,
                                      odometry_free=False,
                                      with_archive=False)
        jax.block_until_ready(cur.traj_poses)
        dt = (time.perf_counter() - t0) / (len(chunks) - 1)
        print(f'chunk C={C:2d} staged distinct: {dt*1e3:7.2f} ms/chunk '
              f'= {dt/C*1e3:6.2f} ms/scan ({C/dt:7.1f} scans/s)', flush=True)


if __name__ == '__main__':
    main()
