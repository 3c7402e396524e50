"""TPU floor decomposition of the cached incremental solve (round 5).

direct_solve_bench measured extend+solve_cached at ~13.3 ms device and
INSENSITIVE to the PCG iteration budget (zero/precond/2-iter all within
0.3 ms) — the cost is a fixed per-call floor, not iterations.  This
probe times, chained-marginal on the live TPU:

  solve0        solve_cached, pcg_iterations=0 (floor incl. 1 apply)
  solve0_noerr  same with compute_errors=False
  solve12       full budget (warm start -> tolerance exits ~2 iters)
  extend        extend_cache alone
  apply         one preconditioner apply
  chainbuild    _make_matvec build + 1 apply (the per-step chain build)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/inc_floor_probe.py
"""
import dataclasses

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
    data = g.to_device()
    mask = jnp.asarray(mask_np)
    cfg_cold = SolverConfig(gn_iterations=2, pcg_iterations=16,
                            pcg_tolerance=1e-4, preconditioner='woodbury')
    warm = sv.solve(data, jnp.asarray(poses_np), mask, cfg_cold).poses
    jax.block_until_ready(warm)

    sig = np.full(6, 0.01, np.float32)
    idx = g.add_relative(1234, 8765, np.concatenate(
        [[1, 0, 0, 0], [7531.0, 0.05, 0]]).astype(np.float32), sig)
    data2 = g.to_device()
    fidx = jnp.int32(idx)

    base = SolverConfig(gn_iterations=1, gn_tolerance=1e-4,
                        pcg_iterations=12, pcg_tolerance=1e-4,
                        preconditioner='woodbury')
    cache = sv.build_cache(data, warm, mask, base)
    jax.block_until_ready(cache.chol_inv)
    ext = sv.extend_cache(data2, warm, mask, cache, fidx, base)
    jax.block_until_ready(ext.chol_inv)

    legs = {
        'solve0': dataclasses.replace(base, pcg_iterations=0),
        'solve0_noerr': dataclasses.replace(base, pcg_iterations=0,
                                            compute_errors=False),
        'solve12': base,
        'solve12_noerr': dataclasses.replace(base, compute_errors=False),
    }
    for name, cfg in legs.items():
        fn = lambda w, cfg=cfg: sv.solve_cached(data2, w, mask, ext,
                                                cfg).poses
        ms = prof.marginal_ms(fn, (warm,), k_lo=2, k_hi=10, reps=3)
        out = sv.solve_cached(data2, warm, mask, ext, cfg)
        print(f'{name:14s} {ms:7.2f} ms  pcg {int(out.pcg_iterations)}',
              flush=True)

    ms = prof.marginal_ms(
        lambda w: sv.extend_cache(data2, w, mask, cache, fidx,
                                  base).chol_inv,
        (warm,), k_lo=2, k_hi=10, reps=3)
    print(f'{"extend":14s} {ms:7.2f} ms', flush=True)

    aM = sv._apply_from_cache(ext)
    r_probe = jnp.ones((warm.shape[0], 6), jnp.float32)
    ms = prof.marginal_ms(lambda r: aM(r), (r_probe,), k_lo=2, k_hi=18,
                          reps=3)
    print(f'{"apply":14s} {ms:7.2f} ms', flush=True)

    damping = jnp.float32(base.damping)

    def chainbuild(w, r):
        lin = sv._linearize(data2, w, mask, base.cauchy_k)
        mv = sv._make_matvec(lin, damping, base)
        return mv(r)
    ms = prof.marginal_ms(chainbuild, (warm, r_probe), k_lo=2, k_hi=10,
                          reps=3)
    print(f'{"chainbuild":14s} {ms:7.2f} ms', flush=True)


if __name__ == '__main__':
    main()
