"""Preconditioner accuracy + incremental-convergence experiment (round 3).

Measures (a) the relative error of one preconditioner application vs the
true H^-1 action (f32 cyclic reduction accuracy at depth log2(N)), and
(b) the honest incremental per-scan cost: warm-started solve with ONE new
loop-closure factor, tolerance-exited PCG, tri vs woodbury at several
iteration caps.

Run ALONE: PYTHONPATH=. python experiments/precond_accuracy.py
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
print('device:', jax.devices()[0], flush=True)


def build(NP_, cap, perturb=0.05):
    g = fg.HostGraph(rel_capacity=cap, prior_capacity=16)
    poses = np.zeros((cap // 2, 7), np.float32)
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
    mask = np.zeros((cap // 2,), bool)
    mask[:NP_] = True
    poses[:NP_, 4:] += rng.normal(size=(NP_, 3)).astype(np.float32) * perturb
    return g, jnp.asarray(poses), jnp.asarray(mask)


# --- (a) preconditioner accuracy ------------------------------------------
for NP_, cap in ((1024, 4096), (10_000, 1 << 15)):
    g, poses, mask = build(NP_, cap)
    data = g.to_device()

    @jax.jit
    def residuals(data, poses, mask, x):
        lin = sv._linearize(data, poses, mask, 1.0)
        damping = jnp.float32(1e-6)
        x = x * lin.free[:, None]
        r = sv._hessian_matvec(lin, x, damping)
        out = {}
        for kind in ('tridiagonal', 'woodbury'):
            apply_M = sv._make_preconditioner(
                lin, damping, SolverConfig(preconditioner=kind))
            e = apply_M(r) - x
            out[kind] = jnp.linalg.norm(e) / jnp.linalg.norm(x)
        return out

    x = jnp.asarray(rng.normal(size=(poses.shape[0], 6)).astype(np.float32))
    out = jax.block_until_ready(residuals(data, poses, mask, x))
    for kind, v in out.items():
        print(f'N={NP_} {kind:12s} rel precond err: {float(v):.3e}',
              flush=True)

# --- (b) incremental warm-start cost --------------------------------------
NP_, cap = 10_000, 1 << 15
g, poses, mask = build(NP_, cap, perturb=0.05)
data = g.to_device()
# converge first (strong solve)
warm = sv.solve(data, poses, mask,
                SolverConfig(gn_iterations=6, pcg_iterations=64,
                             pcg_tolerance=1e-6)).poses
# one new LC factor = the per-scan incremental event
g.add_relative(1234, 8765, np.concatenate(
    [[1, 0, 0, 0], [8765.0 - 1234.0, 0.05, 0]]).astype(np.float32),
    np.full(6, 0.01, np.float32))
data2 = g.to_device()

for kind, caps in (('tridiagonal', (32, 12)), ('woodbury', (32, 12, 6))):
    for cap_it in caps:
        scfg = SolverConfig(gn_iterations=3, pcg_iterations=cap_it,
                            pcg_tolerance=1e-4, preconditioner=kind)
        warms = []
        for rep in range(5):
            p = np.asarray(warm).copy()
            p[:NP_, 4:] += rng.normal(
                size=(NP_, 3)).astype(np.float32) * 1e-4
            warms.append(jnp.asarray(p))
        out = jax.block_until_ready(sv.solve(data2, warms[0], mask, scfg))
        t0 = time.perf_counter()
        outs = [sv.solve(data2, w, mask, scfg) for w in warms]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / 5 * 1e3
        print(f'incremental [{kind} cap{cap_it}]: {dt:.2f} ms '
              f'(err {float(outs[0].error_final):.4g}, '
              f'iters {int(outs[0].pcg_iterations)})', flush=True)


# --- (c) with GN early-out + the NaN/scaling fixes -------------------------
print('--- gn_tolerance variants ---', flush=True)
for kind, cap_it, gtol in (('woodbury', 8, 1e-3), ('woodbury', 8, 0.0),
                           ('tridiagonal', 32, 1e-3)):
    scfg = SolverConfig(gn_iterations=3, pcg_iterations=cap_it,
                        pcg_tolerance=1e-4, preconditioner=kind,
                        gn_tolerance=gtol)
    warms = []
    for rep in range(5):
        p = np.asarray(warm).copy()
        p[:NP_, 4:] += rng.normal(size=(NP_, 3)).astype(np.float32) * 1e-4
        warms.append(jnp.asarray(p))
    out = jax.block_until_ready(sv.solve(data2, warms[0], mask, scfg))
    t0 = time.perf_counter()
    outs = [sv.solve(data2, w, mask, scfg) for w in warms]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 5 * 1e3
    print(f'incremental [{kind} cap{cap_it} gtol{gtol}]: {dt:.2f} ms '
          f'(err {float(outs[0].error_final):.4g}, '
          f'iters {int(outs[0].pcg_iterations)})', flush=True)

# cold full solve (the loop-closure event cost)
print('--- cold solves ---', flush=True)
for kind in ('tridiagonal', 'woodbury'):
    scfg = SolverConfig(gn_iterations=3, pcg_iterations=32,
                        pcg_tolerance=1e-4, preconditioner=kind)
    g3, poses3, mask3 = build(NP_, cap, perturb=0.05)
    inits = []
    for rep in range(5):
        p = np.asarray(poses3).copy()
        p[:NP_, 4:] += rng.normal(size=(NP_, 3)).astype(np.float32) * 0.01
        inits.append(jnp.asarray(p))
    d3 = g3.to_device()
    out = jax.block_until_ready(sv.solve(d3, inits[0], mask3, scfg))
    t0 = time.perf_counter()
    outs = [sv.solve(d3, p, mask3, scfg) for p in inits]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 5 * 1e3
    print(f'cold [{kind}]: {dt:.2f} ms (err {float(outs[0].error_final):.4g},'
          f' iters {int(outs[0].pcg_iterations)})', flush=True)
