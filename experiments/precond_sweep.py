"""Time-to-equal-error sweep of the 10k-pose solve configurations.

solver_fast_bench.py showed woodbury reaching 17x lower final error than
tridiagonal at similar PCG iteration counts but ~1.7x the wall time —
so the fair comparison is time at MATCHED error, not time at matched
iterations.  This sweeps (preconditioner, pcg_iterations) and prints
(ms, err) so the bench's 10k-solve config can be chosen on the pareto
front.  Run ALONE (one TPU process):

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/precond_sweep.py
"""

import os
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_tpu_cache')

import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
import numpy as np

import laser_slam_tpu  # noqa: F401
from laser_slam_tpu.config import SolverConfig
from laser_slam_tpu.graph import factors as fg
from laser_slam_tpu.graph import solver as sv

rng = np.random.default_rng(0)
print('device:', jax.devices()[0])

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

inits = []
for rep in range(5):
    p = poses.copy()
    p[:NP_, 4:] += rng.normal(size=(NP_, 3)).astype(np.float32) * 0.01
    inits.append(jnp.asarray(p))

for precond in ('tridiagonal', 'woodbury'):
    for gn, pits in ((3, 32), (3, 16), (3, 8), (2, 16), (2, 8), (2, 6),
                     (1, 12), (1, 8)):
        scfg = SolverConfig(gn_iterations=gn, pcg_iterations=pits,
                            pcg_tolerance=1e-4, preconditioner=precond)
        out = jax.block_until_ready(sv.solve(data, inits[0], jmask, scfg))
        t0 = time.perf_counter()
        outs = [sv.solve(data, p, jmask, scfg) for p in inits]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / len(inits) * 1e3
        print(f'{precond:12s} gn={gn} pcg<={pits:3d}: {dt:7.2f} ms  '
              f'err {float(outs[0].error_final):.4g}  '
              f'iters {int(outs[0].pcg_iterations)}', flush=True)
