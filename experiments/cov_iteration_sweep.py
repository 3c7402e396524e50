"""Sweep the PCG iteration budget of the 10k-pose marginal-covariance
probes (bench legs tpu_marginal_cov_*).

Motivation (round-5 bench): one-shot 93.6 ms/key, cached 107.7 ms/key —
the cached path's zero O(F) setup saves nothing because the cost is the
probe PCG itself: ~26 preconditioner/matvec applies of [N,6,6]x[N,6,48]
einsums whose 6-wide contractions leave the MXU ~99% idle
(small-matmul-throughput-bound, not launch-bound: the whole batch is ONE
jitted call).  Under vmap the while_loop runs until the SLOWEST of the
48 lanes converges, so the tolerance exit never fires early and the
budget is paid in full.  The lever left is the budget itself: covariance
consumers (closure gating, introspection) tolerate percent-level error,
so sweep iterations and record wall time + deviation vs a 24-iteration
reference.

Run (TPU):
  PYTHONPATH=/root/repo python experiments/cov_iteration_sweep.py

Findings (2026-08-20; iteration sweep on TPU, boost sweep + f64 sparse
ground truth on the CPU backend):

1. The probes were NEVER converged at practical budgets.  Relative to
   a 64-iteration run, 12 iterations still deviate 45-79%; relative to
   the f64 sparse TRUTH, every f32 variant deviates ~100% on the large
   entries.
2. The truth has enormous weak-mode entries: end-of-chain lateral
   variance 4.2e3 m^2, rot-trans cross terms to 4.2e3 (rot drift x
   7.5 km lever) — while x-variance and near-anchor entries are 0.1-
   0.25 and ARE recovered by the probes.
3. The failure is dynamic range, not the boost: sweeping _CR_BOOST
   1e-3 -> 1e-7 moved the f32 saturation ceiling only 2.4 -> 15 (vs
   4229 truth); boost 0 made cyclic reduction go indefinite (NaN).
   f32 rounding inside the chain factorization acts as an effective
   boost on its own.
4. Resolution: exact absolute marginals are an f64 computation by
   nature — added solver.marginal_covariance_exact (host sparse f64,
   the reference's own tool class, gtsam Marginals on CPU).  The f32
   device probes stay for well-observed modes (window-local
   uncertainty, near-anchor keys, closure-constrained directions) with
   the envelope documented in marginal_covariance's docstring and
   pinned by test_marginal_covariance_exact_recovers_weak_modes.
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
from laser_slam_tpu.config import SolverConfig
from laser_slam_tpu.graph import solver as sv
from experiments.delta_divergence_probe import build_bench_graph


def main():
    if jax.devices()[0].platform != 'cpu':
        jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
    NP_ = 10_000
    g, poses, mask, sig = build_bench_graph(NP_)
    scfg = SolverConfig(gn_iterations=2, pcg_iterations=16,
                        pcg_tolerance=1e-4, preconditioner='woodbury')
    data = g.to_device()
    jmask = jnp.asarray(mask)
    warm = jax.block_until_ready(
        sv.solve(data, jnp.asarray(poses), jmask, scfg)).poses
    ia, ib = 1234, 8765
    new_idx = g.add_relative(ia, ib, np.asarray(np.concatenate(
        [[1, 0, 0, 0], [float(ib - ia), 0.05, 0]]).astype(np.float32)), sig)
    data2 = g.to_device()
    base = SolverConfig(gn_iterations=1, gn_tolerance=1e-4,
                        pcg_iterations=12, pcg_tolerance=1e-4,
                        preconditioner='woodbury')
    cache = sv.build_cache(data2, warm, jmask, base)
    keys = jnp.asarray([0, NP_ // 8, NP_ // 4, NP_ // 2, ia, ib,
                        NP_ - 100, NP_ - 1], jnp.int32)

    def run(fn, cfg, reps=3):
        out = jax.block_until_ready(fn(cfg))            # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(cfg)
        jax.block_until_ready(out)
        return np.asarray(out), (time.perf_counter() - t0) / reps * 1e3

    oneshot = lambda cfg: sv.marginal_covariance(data2, warm, jmask, keys,
                                                 cfg)
    ref, _ = run(oneshot, dc_replace(base, pcg_iterations=64,
                                     pcg_tolerance=1e-9), reps=1)
    scale = np.abs(ref).max()
    print(f'reference: 64-iteration one-shot (boost 1e-3); '
          f'max |cov| = {scale:.3e}')
    for boost in (1e-3, 1e-4, 1e-5, 1e-6):
        sv._CR_BOOST = boost
        jax.clear_caches()   # _CR_BOOST is baked in at trace time
        # Rebuild the cache under this boost (its factors bake it in).
        cache_b = sv.build_cache(data2, warm, jmask, base)
        cached = lambda cfg: sv.marginal_covariance_cached(
            data2, warm, jmask, keys, cache_b, cfg)
        # Solver sanity under this boost: warm cached solve must converge.
        sres = sv.solve_cached(data2, warm, jmask, cache_b, base)
        serr = float(jax.block_until_ready(sres).error_final)
        print(f'boost {boost:.0e}: solve_cached error {serr:.3f}')
        print(f'{"it":>4} {"oneshot ms":>11} {"dev":>9} {"cached ms":>10} '
              f'{"dev":>9}')
        for it in (2, 3, 4, 12):
            cfg = dc_replace(base, pcg_iterations=it)
            o, t_o = run(oneshot, cfg)
            c, t_c = run(cached, cfg)
            dev_o = np.abs(o - ref).max() / scale
            dev_c = np.abs(c - ref).max() / scale
            print(f'{it:>4} {t_o:>11.1f} {dev_o:>9.1e} {t_c:>10.1f} '
                  f'{dev_c:>9.1e}')
    sv._CR_BOOST = 1e-3


if __name__ == '__main__':
    main()
