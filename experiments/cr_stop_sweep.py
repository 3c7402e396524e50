"""Sweep the cyclic-reduction dense-root size (_CR_STOP) and count the
PCG iterations solve_cached actually runs (round-4 ask #1 follow-up).

After the chain-form matvec (solver._make_matvec) cut the PCG matvec
from 1.82 ms to 0.07 ms at the 10k-pose graph, the cached incremental
solve is bound by (a) the preconditioner APPLY — a cyclic-reduction
sweep whose cost is kernel-launch latency x 2*levels, ~0.52 ms per
apply at stop=64 — and (b) how many PCG iterations the tolerance needs.
Each doubling of the stop removes one level pair from every apply and
grows the one dense [6*stop]^2 root matmul (MXU, cheap until ~3k).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/cr_stop_sweep.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import laser_slam_tpu  # noqa: F401
from laser_slam_tpu.config import SolverConfig
from laser_slam_tpu.graph import solver as sv
from experiments.solver_incremental_profile import build_graph, marginal_ms


def main():
    g, poses_np, mask_np = build_graph()
    data = g.to_device()
    poses = jnp.asarray(poses_np)
    mask = jnp.asarray(mask_np)
    cfg_inc = SolverConfig(gn_iterations=1, gn_tolerance=1e-4,
                           pcg_iterations=12, pcg_tolerance=1e-4,
                           preconditioner='woodbury')
    damping = jnp.float32(cfg_inc.damping)
    r_probe = jnp.ones((poses.shape[0], 6), jnp.float32)

    for stop in (64, 256, 512, 1024):
        sv._CR_STOP = stop
        cache = jax.jit(sv.build_cache, static_argnames=('config',))(
            data, poses, mask, cfg_inc)
        jax.block_until_ready(cache.chol_inv)
        apply_M = sv._apply_from_cache(cache)

        def f_apply(x, i, c):
            y = apply_M(r_probe + 1e-9 * c)
            return c + y[0, 0]
        a_ms = marginal_ms(f_apply, poses)

        def f_sc(x, i, c):
            out = sv.solve_cached(data, x + 1e-6 * c, mask, cache, cfg_inc)
            return c + out.error_final * 1e-9
        s_ms = marginal_ms(f_sc, poses, k1=1, k2=3)

        out = sv.solve_cached(data, poses, mask, cache, cfg_inc)
        n_it = int(out.pcg_iterations)
        err = float(out.error_final)

        def f_bc(x, i, c):
            e = sv.build_cache(data, x + 1e-6 * c, mask, cfg_inc)
            return c + e.chol_inv[0, 0] * 1e-9
        b_ms = marginal_ms(f_bc, poses, k1=1, k2=3)
        print(f'stop={stop:5d}  apply {a_ms:6.2f} ms  solve_cached '
              f'{s_ms:6.2f} ms  build {b_ms:6.2f} ms  pcg_iters {n_it}  '
              f'err {err:.3f}', flush=True)


if __name__ == '__main__':
    main()
