"""Reproduce + dissect the delta-solve divergence BENCH r5 exposed.

BENCH_FULL (first r5 TPU run) recorded tpu_gn_solve_delta_error=1.6e19
and delta_vs_full=2.3e7 m on the 10k-pose bench graph: the
relinearize-skip solve (solver.solve_closure_cached) EXPLODED where the
PCG-based solve_cached on the SAME extended cache converged to err 0.09.
The suspect is the Richardson refinement ``delta += M(b - H_stale d)``:
its contraction factor is the spectral radius of (I - M H_stale), which
f32 rounding pushes past 1 when whitened lever arms reach
|t_b - t_a| / sigma ~ 7.5e5 (kappa(H) ~ 1e8; M only approximates H^-1 to
~kappa * eps_f32 ~ 10).

This probe rebuilds the bench's exact graph (bench.py:475-494) and
reports the stale-Hessian residual norm ||b - H d|| after the one-shot
apply and after each of 0..4 refinement steps, plus the retracted
trajectory error — on the CPU backend (f32 semantics match the TPU for
this program; no MXU in these ops).

Run:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      PYTHONPATH=/root/repo python experiments/delta_divergence_probe.py

Findings (2026-08-20, CPU backend, f32):
  residual ||b - H_stale d|| after one-shot apply_M(b): 7.7e2 (|b|=7.8e4
  -> one apply contracts ~100x); refinement 1: 1.9e5; refinement 2:
  1.3e8; refinement 3: 8.7e10 — each Richardson step AMPLIFIES ~700x.
  rho(I - M H_stale) >> 1 at this conditioning: M (inverse-factor
  Woodbury apply, f32) and H_stale (unboosted chain + unscaled low-rank)
  disagree at O(kappa * eps) ~ 10, so the design assumption
  "contraction ~ 0.16" (measured at small lever arms) does not transfer.
  => fix: guarded refinement in solve_closure_cached — keep a refined
  delta only when its stale residual SHRANK, else keep the previous
  delta (jnp.where on the two norms).  Cost: one extra stale matvec +
  two dots per step; behavior: monotone, never worse than one apply.

POST-FIX (guarded refinement + gradient-norm step acceptance in
solve_closure_cached, same day): the raw Richardson iterates still
diverge (printed for the record), but the packaged solve now lands
max|t - t_full| = 7.6e-4 m at EVERY delta_refine setting — the guard
rejects all refinements on this stress case and the acceptance test
keeps the sane one-shot step.  Residual error_final 4.0e4 vs the full
solve's 0.057 is ~2 mm of whitened residual left on the 7.5 km factor:
one-shot preconditioner quality, exactly the documented contract.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import laser_slam_tpu  # noqa: F401  (sets matmul precision)
from laser_slam_tpu.config import SolverConfig
from laser_slam_tpu.graph import factors as fg
from laser_slam_tpu.graph import solver as sv


def build_bench_graph(NP_=10_000, GCAP=1 << 14, seed=0):
    rng = np.random.default_rng(seed)
    g = fg.HostGraph(rel_capacity=GCAP, prior_capacity=16)
    poses = np.zeros((GCAP, 7), np.float32)
    poses[:, 0] = 1.0
    xs = np.cumsum(np.ones(NP_, np.float32))
    poses[:NP_, 4] = xs - 1.0
    g.add_prior(0, poses[0], np.full(6, 1e-7, np.float32))
    sig = np.full(6, 0.01, np.float32)
    step = np.array([1, 0, 0, 0, 1, 0, 0], np.float32)
    for i in range(NP_ - 1):
        g.add_relative(i, i + 1, step, sig)
    for i in range(0, NP_ - 100, 500):
        lc = np.array([1, 0, 0, 0, 100, 0, 0], np.float32)
        g.add_relative(i, i + 100, lc, sig)
    mask = np.zeros((GCAP,), bool)
    mask[:NP_] = True
    poses[:NP_, 4:] += rng.normal(size=(NP_, 3)).astype(np.float32) * 0.05
    return g, poses, mask, sig


def main():
    NP_ = 10_000
    g, poses, mask, sig = build_bench_graph(NP_)
    scfg = SolverConfig(gn_iterations=2, pcg_iterations=16,
                        pcg_tolerance=1e-4, preconditioner='woodbury')
    data = g.to_device()
    jmask = jnp.asarray(mask)
    warm = jax.block_until_ready(
        sv.solve(data, jnp.asarray(poses), jmask, scfg)).poses
    print('warm error:', float(sv.graph_error(g.to_device(), warm)))

    ia, ib = 1234, 8765
    new_idx = g.add_relative(ia, ib, np.asarray(np.concatenate(
        [[1, 0, 0, 0], [float(ib - ia), 0.05, 0]]).astype(np.float32)), sig)
    data2 = g.to_device()
    scfg_inc = SolverConfig(gn_iterations=1, gn_tolerance=1e-4,
                            pcg_iterations=12, pcg_tolerance=1e-4,
                            preconditioner='woodbury')
    cache = sv.build_cache(data, warm, jmask, scfg_inc)
    fidx = jnp.int32(new_idx)
    ext = sv.extend_cache(data2, warm, jmask, cache, fidx, scfg_inc)

    # Reference: PCG-based cached solve on the same extended cache.
    ref = sv.solve_cached(data2, warm, jmask, ext, scfg_inc)
    print('solve_cached error:', float(ref.error_final))

    # Dissect the delta path's linear solve by hand.
    apply_M = sv._apply_from_cache(ext)
    mv = sv._stale_matvec(ext)
    lin = sv._linearize(data2, warm, jmask, scfg_inc.cauchy_k)
    b = -sv._gradient(lin)
    print('|b| =', float(jnp.linalg.norm(b)))
    d = apply_M(b)
    for k in range(5):
        r = b - mv(d)
        print(f'refine {k}: |delta| = {float(jnp.linalg.norm(d)):.4e}  '
              f'|b - H_stale delta| = {float(jnp.linalg.norm(r)):.4e}')
        d = d + apply_M(r)

    # End-to-end: the packaged delta solve at each refine count.
    for dr in (0, 1, 2, 3):
        cfg = SolverConfig(gn_iterations=1, gn_tolerance=1e-4,
                           pcg_iterations=12, pcg_tolerance=1e-4,
                           preconditioner='woodbury', delta_refine=dr)
        _, out = sv.solve_closure_cached(data2, warm, jmask, cache, fidx,
                                         cfg)
        dvf = float(jnp.max(jnp.linalg.norm(
            out.poses[:NP_, 4:] - ref.poses[:NP_, 4:], axis=-1)))
        print(f'delta_refine={dr}: error_final={float(out.error_final):.4e}'
              f'  max|t - t_full|={dvf:.4e} m')


if __name__ == '__main__':
    main()
