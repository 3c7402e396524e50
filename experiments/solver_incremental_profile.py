"""Where does the 10k-pose solve time go? (round-4 ask #1 groundwork)

BENCH_r03: tpu_gn_solve_10k_cold_ms 90.11, tpu_gn_solve_10k_incremental_ms
45.61 — both losing to one CPU core (69.81 factorize / 3.24 backsolve).
This experiment splits one woodbury-preconditioned solve into its stages
and times each as the MARGINAL cost inside a chained jitted program
(k reps via lax.scan, distinct inputs per rep; (t[K2]-t[K1])/(K2-K1)
— same methodology as bench.py's window64 leg), so per-dispatch tunnel
overhead (~0.5-0.7 ms per argument array) is excluded.

Stages:
  linearize      _linearize of the full graph (analytic Jacobians)
  gradient       J^T W r
  tri_build      _build_tridiag + _tridiag_factor (chain factorization)
  wood_V         the [N,6,K=384] multi-RHS chain solve T0^-1 U
  wood_C         capacitance assembly + cho_factor
  apply_M        one preconditioner application (2x tridiag_apply + cho_solve)
  matvec         one hessian matvec
  solve_cold     full sv.solve, bench cold config (gn=2, pcg<=16)
  solve_inc      full sv.solve, bench incremental config (gn=1, pcg<=12)

Run: python experiments/solver_incremental_profile.py  (TPU)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import laser_slam_tpu  # noqa: F401
from laser_slam_tpu.config import SolverConfig
from laser_slam_tpu.graph import factors as fg
from laser_slam_tpu.graph import solver as sv


def build_graph(n_poses=10_000, lc_every=500, cap=1 << 14):
    rng = np.random.default_rng(0)
    g = fg.HostGraph(rel_capacity=cap, prior_capacity=16)
    poses = np.zeros((cap, 7), np.float32)
    poses[:, 0] = 1.0
    poses[:n_poses, 4] = np.arange(n_poses, dtype=np.float32)
    g.add_prior(0, poses[0], np.full(6, 1e-7, np.float32))
    sig = np.full(6, 0.01, np.float32)
    step = np.array([1, 0, 0, 0, 1, 0, 0], np.float32)
    for i in range(n_poses - 1):
        g.add_relative(i, i + 1, step, sig)
    for i in range(0, n_poses - 100, lc_every):
        lc = np.array([1, 0, 0, 0, 100, 0, 0], np.float32)
        g.add_relative(i, i + 100, lc, sig)
    mask = np.zeros((cap,), bool)
    mask[:n_poses] = True
    poses[:n_poses, 4:] += rng.normal(size=(n_poses, 3)).astype(np.float32) * 0.05
    return g, poses, mask


def marginal_ms(fn, arg, k1=2, k2=6):
    """Marginal per-rep device ms of fn chained k times inside one jit."""
    def chain(x, K):
        def body(c, i):
            out = fn(jnp.asarray(x) + 1e-6 * i.astype(jnp.float32)
                     if False else x, i)
            return c, None
        # fn must consume (x, i) and return something reduced; we instead
        # fold fn's output back into a carry to prevent DCE.
        def body2(c, i):
            y = fn(x, i, c)
            return y, None
        c0 = jnp.float32(0.0)
        c, _ = jax.lax.scan(body2, c0, jnp.arange(K))
        return c

    f1 = jax.jit(lambda x: chain(x, k1))
    f2 = jax.jit(lambda x: chain(x, k2))
    jax.block_until_ready(f1(arg)); jax.block_until_ready(f2(arg))
    ts = {}
    for name, f, K in (('k1', f1, k1), ('k2', f2, k2)):
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(arg))
            reps.append(time.perf_counter() - t0)
        ts[name] = np.median(reps)
    return (ts['k2'] - ts['k1']) / (k2 - k1) * 1e3


def main():
    g, poses_np, mask_np = build_graph()
    data = g.to_device()
    poses = jnp.asarray(poses_np)
    mask = jnp.asarray(mask_np)
    cfg = SolverConfig(gn_iterations=2, pcg_iterations=16,
                       pcg_tolerance=1e-4, preconditioner='woodbury')
    damping = jnp.float32(cfg.damping)

    # Pre-build shared inputs on device.
    lin = jax.jit(lambda p: sv._linearize(data, p, mask, cfg.cauchy_k))(poses)
    jax.block_until_ready(lin)
    tri = jax.jit(lambda p: sv._tridiag_factor(
        *sv._build_tridiag(sv._linearize(data, p, mask, cfg.cauchy_k),
                           damping)))(poses)
    jax.block_until_ready(tri)

    r_probe = jnp.ones((poses.shape[0], 6), jnp.float32)

    results = {}
    import os
    stages = os.environ.get('STAGES', '')
    wanted = set(s for s in stages.split(',') if s)

    def want(name):
        return not wanted or name in wanted

    def record(name, val):
        results[name] = val
        print(f'{name:16s} {val:8.2f} ms', flush=True)

    # linearize
    def f_lin(x, i, c):
        l = sv._linearize(data, x + 1e-6 * c, mask, cfg.cauchy_k)
        return c + jnp.sum(l.r_rel[0])
    if want('linearize'):
        record('linearize', marginal_ms(f_lin, poses))

    # gradient (given fixed lin)
    def f_grad(x, i, c):
        gvec = sv._gradient(lin._replace(r_rel=lin.r_rel + 1e-9 * c))
        return c + gvec[0, 0]
    if want('gradient'):
        record('gradient', marginal_ms(f_grad, poses))

    # tridiag build+factor
    def f_tri(x, i, c):
        l2 = lin._replace(r_rel=lin.r_rel + 1e-9 * c)
        fac = sv._tridiag_factor(*sv._build_tridiag(l2, damping))
        return c + fac[1].ravel()[0]
    if want('tri_build'):
        record('tri_build', marginal_ms(f_tri, poses))

    # woodbury V build ([N,6,K] chain solve)
    sel, valid = sv._select_offchain(lin, cfg.offchain_capacity)
    Ua, Ub, ka, kb = sv._offchain_blocks(lin, sel, valid)
    L = Ua.shape[0]
    n = lin.free.shape[0]
    K = 6 * L
    lidx = jnp.arange(L)
    U = jnp.zeros((n, 6, L, 6), Ua.dtype)
    U = U.at[ka, :, lidx, :].add(Ua).at[kb, :, lidx, :].add(Ub)
    U = U.reshape(n, 6, K)

    def f_V(x, i, c):
        V = sv._tridiag_apply(tri, U + 1e-9 * c)
        return c + V[0, 0, 0]
    if want('wood_V'):
        record('wood_V', marginal_ms(f_V, poses))

    V = jax.jit(lambda u: sv._tridiag_apply(tri, u))(U)
    jax.block_until_ready(V)

    def f_C(x, i, c):
        Vl = (V + 1e-9 * c).reshape(n, 6, L, 6)
        C = (jnp.einsum('lsc,lsmd->lcmd', Ua, Vl[ka]) +
             jnp.einsum('lsc,lsmd->lcmd', Ub, Vl[kb])).reshape(K, K)
        C = C + jnp.eye(K)
        chol = jax.scipy.linalg.cho_factor(C)
        return c + chol[0][0, 0]
    if want('wood_C'):
        record('wood_C', marginal_ms(f_C, poses))

    # full preconditioner application
    apply_M = sv._make_preconditioner(lin, damping, cfg)

    def f_apply(x, i, c):
        y = apply_M(r_probe + 1e-9 * c)
        return c + y[0, 0]
    if want('apply_M'):
        record('apply_M', marginal_ms(f_apply, poses))

    # one tridiag apply alone
    def f_tapply(x, i, c):
        y = sv._tridiag_apply(tri, r_probe + 1e-9 * c)
        return c + y[0, 0]
    if want('tridiag_apply'):
        record('tridiag_apply', marginal_ms(f_tapply, poses))

    def f_mv(x, i, c):
        y = sv._hessian_matvec(lin, r_probe + 1e-9 * c, damping)
        return c + y[0, 0]
    if want('matvec'):
        record('matvec', marginal_ms(f_mv, poses))

    # chain-form exact matvec (one application, prebuilt blocks)
    mv_chain = sv._make_matvec(lin, damping, cfg)

    def f_mvc(x, i, c):
        y = mv_chain(r_probe + 1e-9 * c)
        return c + y[0, 0]
    if want('matvec_chain'):
        record('matvec_chain', marginal_ms(f_mvc, poses))

    # full solves (chained, marginal)
    def f_cold(x, i, c):
        out = sv.solve(data, x + 1e-6 * c, mask, cfg)
        return c + out.error_final * 1e-9
    if want('solve_cold'):
        record('solve_cold', marginal_ms(f_cold, poses, k1=1, k2=3))

    cfg_inc = SolverConfig(gn_iterations=1, gn_tolerance=1e-4,
                           pcg_iterations=12, pcg_tolerance=1e-4,
                           preconditioner='woodbury')

    def f_inc(x, i, c):
        out = sv.solve(data, x + 1e-6 * c, mask, cfg_inc)
        return c + out.error_final * 1e-9
    if want('solve_inc'):
        record('solve_inc', marginal_ms(f_inc, poses, k1=1, k2=3))

    # NEW incremental path: cached preconditioner (build once, extend by
    # one factor, solve with the cache).
    cache = sv.build_cache(data, poses, mask, cfg)
    jax.block_until_ready(cache.chol_inv)

    def f_ext(x, i, c):
        e = sv.extend_cache(data, x + 1e-6 * c, mask, cache,
                            jnp.int32(10_050), cfg)
        return c + e.chol_inv[0, 0] * 1e-9
    if want('extend_cache'):
        record('extend_cache', marginal_ms(f_ext, poses))

    def f_sc(x, i, c):
        out = sv.solve_cached(data, x + 1e-6 * c, mask, cache, cfg_inc)
        return c + out.error_final * 1e-9
    if want('solve_cached'):
        record('solve_cached', marginal_ms(f_sc, poses, k1=1, k2=3))

    def f_bc(x, i, c):
        e = sv.build_cache(data, x + 1e-6 * c, mask, cfg)
        return c + e.chol_inv[0, 0] * 1e-9
    if want('build_cache'):
        record('build_cache', marginal_ms(f_bc, poses, k1=1, k2=3))

    pass


if __name__ == '__main__':
    main()
