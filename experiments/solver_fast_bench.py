"""Measure the round-3 solver paths on TPU.

1. Compact dense window solve (the per-scan incremental cost) vs the old
   full-table sliced PCG solve.
2. 10k-pose full/incremental solve: woodbury vs tridiagonal preconditioner.

Run ALONE (one TPU process): PYTHONPATH=. python experiments/solver_fast_bench.py
"""

import os
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_tpu_cache')

import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
import numpy as np

import laser_slam_tpu  # noqa: F401  (sets matmul precision)
from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                   InputFilterConfig, LaserTrackConfig,
                                   SolverConfig)
from laser_slam_tpu.graph import factors as fg
from laser_slam_tpu.graph import solver as sv
from laser_slam_tpu.pipeline import online, replay

rng = np.random.default_rng(0)
print('device:', jax.devices()[0])

# ---------------------------------------------------------------------------
# 1. Window solve: drive an online runner to a realistic state, then time
#    _window_solve exactly as online_step invokes it.
# ---------------------------------------------------------------------------
cfg = EstimatorConfig(
    laser_track=LaserTrackConfig(
        nscan_in_sub_map=5,
        odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
        icp_noise_model=(0.005,) * 6,
        input_filters=InputFilterConfig(scan_capacity=16384),
        icp=IcpConfig(matcher='projective', reading_capacity=8192,
                      reading_sampling_ratio=0.5,
                      normal_method='image_pca',
                      normal_image_rows=32, normal_image_cols=512)),
    solver=SolverConfig(gn_iterations=3, pcg_iterations=32, window=64))
runner = online.OnlineRunner(cfg, pose_capacity=2048, factor_capacity=8192)
frames = list(replay.SyntheticStream(
    n_scans=96, points_per_scan=16384, trajectory='circle', radius_m=20.0,
    noise_m=0.01, odom_noise=0.005, seed=5))
for f in frames:
    runner.process_scan(f.time_ns, f.points, f.odom_pose7)
jax.block_until_ready(runner.state.traj_poses)

st = runner.state
i_now = st.n_poses - 1
import dataclasses
for gn, gtol in ((3, 0.0), (2, 0.0), (1, 0.0), (3, 1e-4)):
    cfg_v = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, gn_iterations=gn,
                                        gn_tolerance=gtol))
    wsolve = jax.jit(lambda s, i, c=cfg_v: online._window_solve(s, i, c))
    out = jax.block_until_ready(wsolve(st, i_now))
    # distinct inputs per rep (execution-cache safety)
    states = []
    for rep in range(10):
        p = np.asarray(st.traj_poses).copy()
        p[:int(st.n_poses), 4:] += rng.normal(
            size=(int(st.n_poses), 3)).astype(np.float32) * 1e-3
        states.append(st._replace(traj_poses=jnp.asarray(p)))
    t0 = time.perf_counter()
    outs = [wsolve(s, i_now) for s in states]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 10 * 1e3
    print(f'window64 dense compact solve gn={gn} gtol={gtol}: '
          f'{dt:.2f} ms/scan', flush=True)

# e2e throughput with the new path
runner2 = online.OnlineRunner(cfg, pose_capacity=2048, factor_capacity=8192)
for f in frames[:8]:
    runner2.process_scan(f.time_ns, f.points, f.odom_pose7)
jax.block_until_ready(runner2.state.traj_poses)
t0 = time.perf_counter()
for f in frames[8:]:
    runner2.process_scan(f.time_ns, f.points, f.odom_pose7)
jax.block_until_ready(runner2.state.traj_poses)
print(f'e2e fast 16k: {(len(frames)-8)/(time.perf_counter()-t0):.1f} scans/s')

# ---------------------------------------------------------------------------
# 2. 10k-pose graph: tridiagonal vs woodbury
# ---------------------------------------------------------------------------
NP_ = 10_000
g = fg.HostGraph(rel_capacity=1 << 15, prior_capacity=16)
poses = np.zeros((1 << 14, 7), np.float32)
poses[:, 0] = 1.0
poses[:NP_, 4] = np.arange(NP_, dtype=np.float32)
g.add_prior(0, poses[0], np.full(6, 1e-7, np.float32))
sig = np.full(6, 0.01, np.float32)
step = np.array([1, 0, 0, 0, 1, 0, 0], np.float32)
for i in range(NP_ - 1):
    g.add_relative(i, i + 1, step, sig)
for i in range(0, NP_ - 100, 500):
    lc = np.array([1, 0, 0, 0, 100, 0, 0], np.float32)
    g.add_relative(i, i + 100, lc, sig)
mask = np.zeros((1 << 14,), bool)
mask[:NP_] = True
poses[:NP_, 4:] += rng.normal(size=(NP_, 3)).astype(np.float32) * 0.05
data = g.to_device()
jmask = jnp.asarray(mask)

for precond in ('tridiagonal', 'woodbury'):
    scfg = SolverConfig(gn_iterations=3, pcg_iterations=32,
                        pcg_tolerance=1e-4, preconditioner=precond)
    inits = []
    for rep in range(5):
        p = poses.copy()
        p[:NP_, 4:] += rng.normal(size=(NP_, 3)).astype(np.float32) * 0.01
        inits.append(jnp.asarray(p))
    out = jax.block_until_ready(sv.solve(data, inits[0], jmask, scfg))
    t0 = time.perf_counter()
    outs = [sv.solve(data, p, jmask, scfg) for p in inits]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 5 * 1e3
    print(f'10k solve [{precond}]: {dt:.2f} ms  '
          f'(err {float(outs[0].error_final):.3g}, '
          f'pcg_iters {int(outs[0].pcg_iterations)})')
