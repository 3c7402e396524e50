"""Direct-Woodbury incremental solve + covariance probes (round-5 ask #2/#3).

The round-4 verdict measured the cached incremental 10k-pose solve at
13.4 ms device vs the CPU cached-backsolve anchor at 3.24 ms, and marginal
covariance at ~92 ms/key.  Both spend their time in PCG iterations whose
preconditioner (the Woodbury chain+low-rank factorization) is already a
near-exact H^-1 — so this experiment measures using it DIRECTLY:
``pcg_init='precond'`` starts PCG at x0 = M(b); with pcg_tolerance met at
the start the loop exits after 0-1 iterations and the solve costs ~2
preconditioner applies instead of 12.

Legs (all device ms via the chained-marginal methodology,
pipeline/profiling.marginal_ms — dispatch-floor-free):
  inc/zero      extend_cache + solve_cached, r04 config (gn=1, pcg<=12)
  inc/precond   same with pcg_init='precond' (budget kept as fallback)
  cov/zero      marginal_covariance one-shot, 8 keys (r04 config)
  cov/precond   one-shot with precond init
  covc/precond  marginal_covariance_cached with precond init
plus error_final / pcg_iterations / covariance max-rel-diff vs a
high-budget reference solve, so speed is never quoted without accuracy.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/direct_solve_bench.py
(TPU; probe tunnel health first — CLAUDE.md environment rules.)
"""

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import laser_slam_tpu  # noqa: F401
from laser_slam_tpu.config import SolverConfig
from laser_slam_tpu.graph import solver as sv
from laser_slam_tpu.pipeline import profiling as prof
from experiments.solver_incremental_profile import build_graph


def main():
    g, poses_np, mask_np = build_graph()
    rng = np.random.default_rng(3)
    data = g.to_device()
    mask = jnp.asarray(mask_np)
    NP_ = 10_000

    # Warm optimum to start from (as bench.py does).
    cfg_cold = SolverConfig(gn_iterations=2, pcg_iterations=16,
                            pcg_tolerance=1e-4, preconditioner='woodbury')
    warm = sv.solve(data, jnp.asarray(poses_np), mask, cfg_cold).poses
    jax.block_until_ready(warm)

    # One new closure appended (the incremental workload).
    sig = np.full(6, 0.01, np.float32)
    ia, ib = 1234, 8765
    new_idx = g.add_relative(ia, ib, np.concatenate(
        [[1, 0, 0, 0], [float(ib - ia), 0.05, 0]]).astype(np.float32), sig)
    data2 = g.to_device()
    fidx = jnp.int32(new_idx)

    cfg_zero = SolverConfig(gn_iterations=1, gn_tolerance=1e-4,
                            pcg_iterations=12, pcg_tolerance=1e-4,
                            preconditioner='woodbury')
    cfg_pre = dataclasses.replace(cfg_zero, pcg_init='precond')

    cache = sv.build_cache(data, warm, mask, cfg_zero)
    jax.block_until_ready(cache.chol_inv)

    # Reference solution: generous budget, zero init.
    cfg_ref = dataclasses.replace(cfg_zero, pcg_iterations=128,
                                  pcg_tolerance=1e-10, gn_tolerance=0.0)
    ref = sv.solve(data2, warm, mask, cfg_ref)
    jax.block_until_ready(ref.poses)
    print(f'ref solve: err {float(ref.error_final):.4f} '
          f'pcg_iters {int(ref.pcg_iterations)}', flush=True)

    # Fixed-cost probe: pcg_iterations=0 still pays linearize + gradient
    # + matvec build + ONE preconditioner apply (the z0 setup) — the
    # per-call floor every iteration-count improvement is bounded by.
    cfg_fix = dataclasses.replace(cfg_zero, pcg_iterations=0)
    # Production candidates: the f32 residual floor sits above
    # pcg_tolerance*||b|| on warm starts (the tolerance exit never
    # fires — observed pcg_iterations == budget on CPU and TPU), so the
    # direct path is precond init + a SMALL budget, not a tolerance
    # exit.  'fast' additionally skips the two graph_error passes.
    cfg_pre2 = dataclasses.replace(cfg_pre, pcg_iterations=2)
    cfg_fast = dataclasses.replace(cfg_pre2, compute_errors=False)

    for name, cfg in (('inc/zero', cfg_zero), ('inc/precond', cfg_pre),
                      ('inc/precond2', cfg_pre2), ('inc/fast', cfg_fast),
                      ('inc/fixed0', cfg_fix)):
        def inc_stage(w, c, cfg=cfg):
            ext = sv.extend_cache(data2, w, mask, c, fidx, cfg)
            return sv.solve_cached(data2, w, mask, ext, cfg).poses
        ms = prof.marginal_ms(inc_stage, (warm, cache), k_lo=2, k_hi=10,
                              reps=3)
        ext = sv.extend_cache(data2, warm, mask, cache, fidx, cfg)
        out = sv.solve_cached(data2, warm, mask, ext, cfg)
        dpos = float(jnp.max(jnp.linalg.norm(
            out.poses[:NP_, 4:] - ref.poses[:NP_, 4:], axis=-1)))
        print(f'{name:12s} {ms:7.2f} ms  err {float(out.error_final):.4f}  '
              f'pcg {int(out.pcg_iterations):3d}  max|t-ref| {dpos:.5f} m',
              flush=True)

    # ---- marginal covariance ------------------------------------------
    mkeys = jnp.asarray([0, NP_ // 8, NP_ // 4, NP_ // 2, ia, ib,
                         NP_ - 100, NP_ - 1], jnp.int32)
    ext = sv.extend_cache(data2, warm, mask, cache, fidx, cfg_pre)
    jax.block_until_ready(ext.chol_inv)

    cfg_cref = dataclasses.replace(cfg_zero, pcg_iterations=96,
                                   pcg_tolerance=1e-9)
    cov_ref = sv.marginal_covariance(data2, ref.poses, mask, mkeys, cfg_cref)
    jax.block_until_ready(cov_ref)
    scale = jnp.maximum(jnp.max(jnp.abs(cov_ref)), 1e-12)

    cfg_pre3 = dataclasses.replace(cfg_pre, pcg_iterations=3)
    legs = [
        ('cov/zero', lambda p: sv.marginal_covariance(
            data2, p, mask, mkeys, cfg_zero)),
        ('cov/precond3', lambda p: sv.marginal_covariance(
            data2, p, mask, mkeys, cfg_pre3)),
        ('covc/precond3', lambda p: sv.marginal_covariance_cached(
            data2, p, mask, mkeys, ext, cfg_pre3)),
        ('covc/zero', lambda p: sv.marginal_covariance_cached(
            data2, p, mask, mkeys, ext, cfg_zero)),
    ]
    for name, fn in legs:
        ms = prof.marginal_ms(fn, (ref.poses,), k_lo=1, k_hi=4, reps=3)
        cov = fn(ref.poses)
        rel = float(jnp.max(jnp.abs(cov - cov_ref)) / scale)
        print(f'{name:12s} {ms:7.2f} ms ({ms/8:.2f}/key)  '
              f'max rel diff {rel:.2e}', flush=True)


if __name__ == '__main__':
    main()
