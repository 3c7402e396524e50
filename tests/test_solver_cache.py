"""WoodburyCache: cached/extended preconditioner correctness.

The cache is the iSAM2-reuse analogue (incremental_estimator.cpp:151-163:
iSAM2 keeps its Bayes tree factorized across updates); these tests pin
that (a) solving with a prebuilt cache reaches the same optimum as the
self-building solve, (b) extending the cache by one new loop-closure
factor reproduces the freshly rebuilt preconditioner, and (c) capacity
overflow degrades gracefully instead of corrupting slots.
"""

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.config import SolverConfig
from laser_slam_tpu.graph import factors as fg
from laser_slam_tpu.graph import solver as sv
from laser_slam_tpu.ops import se3

SIG = np.full(6, 0.01, np.float32)
PRIOR_SIG = np.full(6, 1e-7, np.float32)
N = 64
CAP = 64


def build_loopy_chain(rng, n=N, n_lc=3):
    """Chain + evenly spaced loop closures, measurements from ground truth."""
    xis = rng.normal(size=(n - 1, 6)).astype(np.float32) * 0.1
    poses = [np.asarray(se3.identity())]
    for i in range(n - 1):
        poses.append(np.asarray(
            se3.compose(jnp.asarray(poses[-1]), se3.exp(jnp.asarray(xis[i])))))
    gt = np.stack(poses)

    g = fg.HostGraph()
    g.add_prior(0, gt[0], PRIOR_SIG)
    for i in range(n - 1):
        meas = se3.compose(se3.inverse(jnp.asarray(gt[i])),
                           jnp.asarray(gt[i + 1]))
        g.add_relative(i, i + 1, np.asarray(meas), SIG)
    for k in range(n_lc):
        a = k * (n // (n_lc + 1))
        b = a + n // 2
        if b >= n:
            continue
        meas = se3.compose(se3.inverse(jnp.asarray(gt[a])),
                           jnp.asarray(gt[b]))
        g.add_relative(a, b, np.asarray(meas), SIG * 0.5)
    return g, gt


def pad_poses(poses_np, capacity=CAP, jitter=None, rng=None):
    n = poses_np.shape[0]
    out = np.zeros((capacity, 7), np.float32)
    out[:, 0] = 1.0
    out[:n] = poses_np
    if jitter:
        out[1:n, 4:] += rng.normal(size=(n - 1, 3)).astype(np.float32) * jitter
    mask = np.zeros(capacity, bool)
    mask[:n] = True
    return jnp.asarray(out), jnp.asarray(mask)


CFG = SolverConfig(gn_iterations=3, pcg_iterations=32, pcg_tolerance=1e-7,
                   preconditioner='woodbury', offchain_capacity=8)


def test_solve_cached_matches_solve(rng):
    g, gt = build_loopy_chain(rng)
    poses, mask = pad_poses(gt, jitter=0.05, rng=rng)
    data = g.to_device()
    res_plain = sv.solve(data, poses, mask, CFG)
    cache = sv.build_cache(data, poses, mask, CFG)
    res_cached = sv.solve_cached(data, poses, mask, cache, CFG)
    np.testing.assert_allclose(np.asarray(res_cached.poses)[:N],
                               np.asarray(res_plain.poses)[:N], atol=1e-5)
    assert float(res_cached.error_final) <= float(res_plain.error_final) + 1e-4


def test_extend_matches_fresh_rebuild(rng):
    g, gt = build_loopy_chain(rng)
    poses, mask = pad_poses(gt, jitter=0.02, rng=rng)
    cache = sv.build_cache(g.to_device(), poses, mask, CFG)
    n0 = int(cache.n_used)

    # Append one new loop-closure factor (off-chain) and extend.
    a, b = 5, 50
    meas = se3.compose(se3.inverse(jnp.asarray(gt[a])), jnp.asarray(gt[b]))
    idx = g.add_relative(a, b, np.asarray(meas), SIG * 0.5)
    data2 = g.to_device()
    ext = sv.extend_cache(data2, poses, mask, cache, jnp.int32(idx), CFG)
    fresh = sv.build_cache(data2, poses, mask, CFG)

    assert int(ext.n_used) == n0 + 1
    assert int(fresh.n_used) == n0 + 1
    # Identical OCCUPIED slot layout (selection is index-ordered, extension
    # appends); padding slots carry arbitrary keys with zero U blocks.
    m = n0 + 1
    np.testing.assert_array_equal(np.asarray(ext.ka)[:m],
                                  np.asarray(fresh.ka)[:m])
    np.testing.assert_array_equal(np.asarray(ext.kb)[:m],
                                  np.asarray(fresh.kb)[:m])
    np.testing.assert_allclose(np.asarray(ext.Ua)[:m],
                               np.asarray(fresh.Ua)[:m],
                               rtol=1e-4, atol=1e-6)

    # The preconditioner APPLICATIONS must agree (the factorizations may
    # differ by round-off ordering).
    r = jnp.asarray(rng.normal(size=(CAP, 6)).astype(np.float32))
    y_ext = jax.jit(lambda rr: sv._apply_from_cache(ext)(rr))(r)
    y_fresh = jax.jit(lambda rr: sv._apply_from_cache(fresh)(rr))(r)
    np.testing.assert_allclose(np.asarray(y_ext), np.asarray(y_fresh),
                               rtol=2e-3, atol=1e-5)


def test_solve_cached_after_extension_converges(rng):
    g, gt = build_loopy_chain(rng)
    poses, mask = pad_poses(gt, jitter=0.05, rng=rng)
    data1 = g.to_device()
    res1 = sv.solve(data1, poses, mask, CFG)
    cache = sv.build_cache(data1, poses, mask, CFG)

    # New loop closure arrives; warm-start from the previous optimum.
    a, b = 8, 55
    meas = se3.compose(se3.inverse(jnp.asarray(gt[a])), jnp.asarray(gt[b]))
    idx = g.add_relative(a, b, np.asarray(meas), SIG * 0.2)
    data2 = g.to_device()
    ext = sv.extend_cache(data2, res1.poses, mask, cache, jnp.int32(idx), CFG)

    res_inc = sv.solve_cached(data2, res1.poses, mask, ext, CFG)
    res_full = sv.solve(data2, res1.poses, mask, CFG)
    np.testing.assert_allclose(np.asarray(res_inc.poses)[:N, 4:],
                               np.asarray(res_full.poses)[:N, 4:], atol=1e-4)
    assert float(res_inc.error_final) <= float(res_full.error_final) * 1.5 + 1e-5


def test_extend_overflow_is_noop(rng):
    g, gt = build_loopy_chain(rng, n_lc=3)
    poses, mask = pad_poses(gt, jitter=0.02, rng=rng)
    cfg = SolverConfig(gn_iterations=2, pcg_iterations=32,
                       pcg_tolerance=1e-7, preconditioner='woodbury',
                       offchain_capacity=3)  # exactly full after build
    cache = sv.build_cache(g.to_device(), poses, mask, cfg)
    assert int(cache.n_used) == 3

    a, b = 10, 40
    meas = se3.compose(se3.inverse(jnp.asarray(gt[a])), jnp.asarray(gt[b]))
    idx = g.add_relative(a, b, np.asarray(meas), SIG)
    data2 = g.to_device()
    ext = sv.extend_cache(data2, poses, mask, cache, jnp.int32(idx), cfg)
    assert int(ext.n_used) == 3
    np.testing.assert_array_equal(np.asarray(ext.chol_inv),
                                  np.asarray(cache.chol_inv))
    np.testing.assert_array_equal(np.asarray(ext.Ua), np.asarray(cache.Ua))

    # Solve still converges (the unpreconditioned factor costs PCG iters).
    res = sv.solve_cached(data2, poses, mask, ext, cfg)
    res_full = sv.solve(data2, poses, mask, cfg)
    np.testing.assert_allclose(np.asarray(res.poses)[:N, 4:],
                               np.asarray(res_full.poses)[:N, 4:], atol=5e-4)


def test_runner_lc_uses_cache_and_matches_plain(rng):
    """OnlineRunner with the woodbury preconditioner persists a solver
    cache across loop closures (built once, extended per closure) and
    reaches the same trajectory as the tridiagonal plain-solve path."""
    from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                       InputFilterConfig, LaserTrackConfig)
    from laser_slam_tpu.pipeline import online, replay

    def run(precond):
        est_cfg = EstimatorConfig(
            laser_track=LaserTrackConfig(
                nscan_in_sub_map=3,
                odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
                icp_noise_model=(0.01,) * 6,
                input_filters=InputFilterConfig(scan_capacity=1024),
                icp=IcpConfig(matcher='brute', reading_capacity=512,
                              reading_sampling_ratio=1.0)),
            solver=SolverConfig(gn_iterations=3, pcg_iterations=48,
                                pcg_tolerance=1e-7,
                                preconditioner=precond,
                                offchain_capacity=8))
        r = online.OnlineRunner(est_cfg, pose_capacity=32,
                                factor_capacity=128)
        frames = list(replay.SyntheticStream(
            n_scans=16, points_per_scan=1024, trajectory='circle',
            radius_m=10.0, laps=1, noise_m=0.005, odom_noise=0.01,
            seed=11))
        for f in frames:
            r.process_scan(f.time_ns, f.points, f.odom_pose7)
        # Two manual closures with ground-truth-consistent measurements.
        # Convention (incremental_estimator.cpp:83-87): the factor is
        # meas = T_w_a^-1 . w_T_a_b . T_w_b with CURRENT estimates, so a
        # closure encoding the true relative pose gt_a^-1 gt_b needs
        # w_T_a_b = est_a . gt_a^-1 . gt_b . est_b^-1.
        import laser_slam_tpu.ops.se3 as se3_ops
        gt = {f.time_ns: f.gt_pose7 for f in frames}
        times = [f.time_ns for f in frames]
        used = []
        for a, b in ((2, 9), (4, 12)):
            traj = r.trajectory()
            est_a = jnp.asarray(traj[times[a]])
            est_b = jnp.asarray(traj[times[b]])
            true_rel = se3_ops.compose(
                se3_ops.inverse(jnp.asarray(gt[times[a]])),
                jnp.asarray(gt[times[b]]))
            w_T_a_b = np.asarray(se3_ops.compose(
                est_a, se3_ops.compose(true_rel, se3_ops.inverse(est_b))))
            r.add_loop_closure(a, b, w_T_a_b)
            if r._solver_cache is not None:
                used.append(int(r._solver_cache.n_used))
        return r, used

    r_cached, used = run('woodbury')
    assert r_cached._solver_cache is not None
    # Each closure extends the persisted cache by exactly one slot (the
    # base fill level includes factors touching the gauge-frozen first
    # pose — off-chain by definition).
    assert used[1] == used[0] + 1

    r_plain, _ = run('tridiagonal')
    # This tiny config (1024-pt scans, 512-pt readings) lands ~13 cm max
    # error vs GT (down from ~30 cm without the closures); the point
    # here is cache mechanics, so pin (a) a loose GT bound on both paths
    # and (b) tight cached-vs-plain agreement.
    frames = list(replay.SyntheticStream(
        n_scans=16, points_per_scan=1024, trajectory='circle',
        radius_m=10.0, laps=1, noise_m=0.005, odom_noise=0.01, seed=11))
    gt = {f.time_ns: f.gt_pose7 for f in frames}
    for r in (r_cached, r_plain):
        traj = r.trajectory()
        errs = np.stack([traj[t][4:] - gt[t][4:] for t in traj])
        assert np.abs(errs).max() < 0.2, errs
    # Pairwise: at a fixed iteration budget different preconditioners
    # stop at different PCG iterates, which feeds back through ICP
    # correspondences scan-over-scan — several cm of drift between the
    # two paths is expected (both are inside the GT bound above); gross
    # divergence is not.
    t_c = r_cached.trajectory()
    t_p = r_plain.trajectory()
    for k in t_c:
        np.testing.assert_allclose(t_c[k][4:], t_p[k][4:], atol=1e-1)


def test_marginal_covariance_cached_matches_oneshot(rng):
    """The cached-preconditioner covariance probes must agree with the
    self-building path: the preconditioner only shapes PCG convergence,
    never the fixed point (solver.py:_marginal_probes), so with a
    generous iteration budget both return the same H^-1 blocks."""
    g, gt = build_loopy_chain(rng)
    poses, mask = pad_poses(gt, jitter=0.02, rng=rng)
    data = g.to_device()
    cfg = SolverConfig(gn_iterations=1, pcg_iterations=128,
                       pcg_tolerance=1e-9, preconditioner='woodbury',
                       offchain_capacity=8)
    keys = jnp.asarray([1, N // 2, N - 1], jnp.int32)
    ref = sv.marginal_covariance(data, poses, mask, keys, cfg)
    cache = sv.build_cache(data, poses, mask, cfg)
    got = sv.marginal_covariance_cached(data, poses, mask, keys, cache,
                                        cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-5)
    # Cached covariances are those of the graph AS ABSORBED INTO THE
    # CACHE (round-5 semantics: both PCG operators come from the cache,
    # so a closure the cache never saw is invisible — the runner extends
    # the cache per closure and rebuilds on the cache_rebuild_after
    # cadence, which bounds the drift).  A stale cache therefore
    # reproduces the PRE-closure covariances ...
    idx = g.add_relative(2, N - 3, np.asarray(se3.compose(
        se3.inverse(jnp.asarray(gt[2])), jnp.asarray(gt[N - 3]))), SIG)
    data2 = g.to_device()
    ref2 = sv.marginal_covariance(data2, poses, mask, keys, cfg)
    got2 = sv.marginal_covariance_cached(data2, poses, mask, keys, cache,
                                         cfg)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=1e-3, atol=1e-5)
    # ... while the EXTENDED cache reflects the new closure and matches
    # the fresh one-shot on the grown graph.
    ext = sv.extend_cache(data2, poses, mask, cache, jnp.int32(idx), cfg)
    got3 = sv.marginal_covariance_cached(data2, poses, mask, keys, ext,
                                         cfg)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(ref2),
                               rtol=1e-3, atol=1e-5)
    # The new closure genuinely changes the covariances (the stale-case
    # assertion above is not vacuous).
    assert not np.allclose(np.asarray(ref2), np.asarray(ref), rtol=1e-3,
                           atol=1e-5)


def test_precond_init_matches_zero_init(rng):
    """pcg_init='precond' (the direct-Woodbury fast path: x0 = M(b),
    PCG exits once the start satisfies the tolerance) must reach the
    same optimum as the classic zero start — the init only changes the
    convergence path, never the fixed point."""
    import dataclasses
    g, gt = build_loopy_chain(rng)
    poses, mask = pad_poses(gt, jitter=0.05, rng=rng)
    data = g.to_device()
    cfg_pre = dataclasses.replace(CFG, pcg_init='precond')
    res_zero = sv.solve(data, poses, mask, CFG)
    res_pre = sv.solve(data, poses, mask, cfg_pre)
    np.testing.assert_allclose(np.asarray(res_pre.poses)[:N],
                               np.asarray(res_zero.poses)[:N], atol=1e-5)
    # With a near-exact preconditioner the precond start needs FEWER
    # iterations for the same tolerance.
    assert int(res_pre.pcg_iterations) <= int(res_zero.pcg_iterations)
    # Cached path too (incl. an extended cache with one new closure).
    cache = sv.build_cache(data, poses, mask, cfg_pre)
    idx = g.add_relative(3, N - 5, np.asarray(se3.compose(
        se3.inverse(jnp.asarray(gt[3])), jnp.asarray(gt[N - 5]))), SIG)
    data2 = g.to_device()
    ext = sv.extend_cache(data2, poses, mask, cache, jnp.int32(idx),
                          cfg_pre)
    ref2 = sv.solve(data2, poses, mask, CFG)
    got2 = sv.solve_cached(data2, poses, mask, ext, cfg_pre)
    np.testing.assert_allclose(np.asarray(got2.poses)[:N],
                               np.asarray(ref2.poses)[:N], atol=1e-5)


def test_precond_init_marginals_match(rng):
    """Covariance probes with the precond start match the zero start."""
    import dataclasses
    g, gt = build_loopy_chain(rng)
    poses, mask = pad_poses(gt, jitter=0.02, rng=rng)
    data = g.to_device()
    cfg = SolverConfig(gn_iterations=1, pcg_iterations=128,
                       pcg_tolerance=1e-9, preconditioner='woodbury',
                       offchain_capacity=8)
    cfg_pre = dataclasses.replace(cfg, pcg_init='precond')
    keys = jnp.asarray([1, N // 2, N - 1], jnp.int32)
    ref = sv.marginal_covariance(data, poses, mask, keys, cfg)
    got = sv.marginal_covariance(data, poses, mask, keys, cfg_pre)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-5)


def test_compute_errors_flag(rng):
    """compute_errors=False skips the two graph_error passes (returns
    -1.0 sentinels) without changing the solved poses."""
    import dataclasses
    g, gt = build_loopy_chain(rng)
    poses, mask = pad_poses(gt, jitter=0.05, rng=rng)
    data = g.to_device()
    cfg_ne = dataclasses.replace(CFG, compute_errors=False)
    res = sv.solve(data, poses, mask, CFG)
    res_ne = sv.solve(data, poses, mask, cfg_ne)
    np.testing.assert_allclose(np.asarray(res_ne.poses)[:N],
                               np.asarray(res.poses)[:N], atol=1e-6)
    assert float(res_ne.error_initial) == -1.0
    assert float(res_ne.error_final) == -1.0
    cache = sv.build_cache(data, poses, mask, cfg_ne)
    res_c = sv.solve_cached(data, poses, mask, cache, cfg_ne)
    np.testing.assert_allclose(np.asarray(res_c.poses)[:N],
                               np.asarray(res.poses)[:N], atol=1e-5)
    assert float(res_c.error_final) == -1.0


def test_solve_closure_cached_matches_full(rng):
    """The relinearize-skip delta solve (one new closure at a warm
    optimum: g supported on two keys, delta = -H^-1 g via the extended
    cache + Richardson refinement) must land within millimetres of the
    full high-budget solve — the iSAM2 relinearizeThreshold analogue
    (incremental_estimator.cpp:17-20)."""
    import dataclasses
    g, gt = build_loopy_chain(rng)
    poses, mask = pad_poses(gt, jitter=0.05, rng=rng)
    data = g.to_device()
    # Converge to the current optimum first (warm state).
    warm = sv.solve(data, poses, mask, CFG).poses
    cache = sv.build_cache(data, warm, mask, CFG)
    # New closure with a measurement ~5 cm off the current estimate.
    meas = se3.compose(se3.inverse(jnp.asarray(gt[5])),
                       jnp.asarray(gt[N - 8]))
    meas = np.asarray(meas).copy()
    meas[4] += 0.05
    idx = g.add_relative(5, N - 8, meas, SIG * 0.5)
    data2 = g.to_device()

    cfg_ref = dataclasses.replace(CFG, gn_iterations=4,
                                  pcg_iterations=128, pcg_tolerance=1e-9)
    ref = sv.solve(data2, warm, mask, cfg_ref)

    cfg_d = dataclasses.replace(CFG, delta_refine=3)
    cache2, out = sv.solve_closure_cached(data2, warm, mask, cache,
                                          jnp.int32(idx), cfg_d)
    dpos = np.linalg.norm(np.asarray(out.poses)[:N, 4:]
                          - np.asarray(ref.poses)[:N, 4:], axis=1)
    assert dpos.max() < 5e-3, dpos.max()
    # The returned cache absorbed the factor (next solves reuse it).
    assert int(cache2.n_used) == int(cache.n_used) + 1
    # And the energy actually dropped vs not solving at all.
    e_before = float(sv.graph_error(data2, warm))
    assert float(out.error_final) < e_before


def test_runner_delta_closure_matches_full(rng):
    """closure_solve='delta' (relinearize-skip injection) reaches the
    same trajectory as the full cached GN injection through the online
    runner, within the same centimetre envelope the full-vs-plain test
    above allows."""
    from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                       InputFilterConfig, LaserTrackConfig)
    from laser_slam_tpu.pipeline import online, replay
    import laser_slam_tpu.ops.se3 as se3_ops

    def run(closure_solve):
        est_cfg = EstimatorConfig(
            laser_track=LaserTrackConfig(
                nscan_in_sub_map=3,
                odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
                icp_noise_model=(0.01,) * 6,
                input_filters=InputFilterConfig(scan_capacity=1024),
                icp=IcpConfig(matcher='brute', reading_capacity=512,
                              reading_sampling_ratio=1.0)),
            solver=SolverConfig(gn_iterations=3, pcg_iterations=48,
                                pcg_tolerance=1e-7,
                                preconditioner='woodbury',
                                closure_solve=closure_solve,
                                offchain_capacity=8))
        r = online.OnlineRunner(est_cfg, pose_capacity=32,
                                factor_capacity=128)
        frames = list(replay.SyntheticStream(
            n_scans=16, points_per_scan=1024, trajectory='circle',
            radius_m=10.0, laps=1, noise_m=0.005, odom_noise=0.01,
            seed=11))
        for f in frames:
            r.process_scan(f.time_ns, f.points, f.odom_pose7)
        gt = {f.time_ns: f.gt_pose7 for f in frames}
        times = [f.time_ns for f in frames]
        for a, b in ((2, 9), (4, 12)):
            traj = r.trajectory()
            est_a = jnp.asarray(traj[times[a]])
            est_b = jnp.asarray(traj[times[b]])
            true_rel = se3_ops.compose(
                se3_ops.inverse(jnp.asarray(gt[times[a]])),
                jnp.asarray(gt[times[b]]))
            w_T_a_b = np.asarray(se3_ops.compose(
                est_a, se3_ops.compose(true_rel, se3_ops.inverse(est_b))))
            r.add_loop_closure(a, b, w_T_a_b)
        return r, gt

    r_delta, gt = run('delta')
    assert r_delta._solver_cache is not None
    traj_d = r_delta.trajectory()
    errs = np.stack([traj_d[t][4:] - gt[t][4:] for t in traj_d])
    # The delta step keeps the Hessian model at the cache build point,
    # so decimetre-scale corrections (this tiny noisy config drifts
    # ~10-30 cm before the closures) converge more slowly than full
    # re-linearized GN: bounded and NaN-free here, with the documented
    # contract that large corrections use closure_solve='full' or a
    # follow-up refine() — which must then recover the full-path
    # trajectory.
    assert np.isfinite(errs).all()
    assert np.abs(errs).max() < 0.35, errs
    r_delta.refine(1)
    traj_d = r_delta.trajectory()
    errs = np.stack([traj_d[t][4:] - gt[t][4:] for t in traj_d])
    assert np.abs(errs).max() < 0.2, errs
    r_full, _ = run('full')
    traj_f = r_full.trajectory()
    for k in traj_d:
        np.testing.assert_allclose(traj_d[k][4:], traj_f[k][4:],
                                   atol=1e-1)


def test_marginal_covariance_exact_matches_probes(rng):
    """The host sparse-f64 exact path (solver.marginal_covariance_exact,
    the gtsam-Marginals tool class) must agree with the device PCG
    probes on a small well-observed graph, where the f32 probes are
    within their accuracy envelope."""
    g, gt = build_loopy_chain(rng)
    poses, mask = pad_poses(gt, jitter=0.02, rng=rng)
    data = g.to_device()
    cfg = SolverConfig(gn_iterations=1, pcg_iterations=128,
                       pcg_tolerance=1e-9, preconditioner='woodbury',
                       offchain_capacity=8)
    keys = jnp.asarray([1, N // 2, N - 1], jnp.int32)
    probes = np.asarray(sv.marginal_covariance(data, poses, mask, keys,
                                               cfg))
    exact = sv.marginal_covariance_exact(data, poses, mask,
                                         np.asarray([1, N // 2, N - 1]),
                                         cfg)
    np.testing.assert_allclose(exact, probes, rtol=2e-3, atol=1e-5)


def test_marginal_covariance_exact_recovers_weak_modes(rng):
    """The round-5 disclosure, pinned: on a long single-anchor chain the
    true far-key lateral variance is enormous (rot drift x lever arm,
    squared) and the f32 device probes SATURATE far below it — only the
    f64 exact path recovers it.  Guards against ever quietly trusting
    the f32 probes outside their envelope again."""
    n, cap = 1024, 1024
    g = fg.HostGraph(rel_capacity=2048, prior_capacity=4)
    poses = np.zeros((cap, 7), np.float32)
    poses[:, 0] = 1.0
    poses[:n, 4] = np.arange(n, dtype=np.float32)
    g.add_prior(0, poses[0], PRIOR_SIG)
    step = np.array([1, 0, 0, 0, 1, 0, 0], np.float32)
    for i in range(n - 1):
        g.add_relative(i, i + 1, step, SIG)
    mask = np.zeros(cap, bool)
    mask[:n] = True
    cfg = SolverConfig(gn_iterations=1, pcg_iterations=32,
                       pcg_tolerance=1e-9, preconditioner='woodbury')
    data = g.to_device()
    keys = np.asarray([n - 1])
    exact = sv.marginal_covariance_exact(data, jnp.asarray(poses),
                                         jnp.asarray(mask), keys, cfg)
    probes = np.asarray(sv.marginal_covariance(
        data, jnp.asarray(poses), jnp.asarray(mask),
        jnp.asarray(keys, jnp.int32), cfg))
    y_true = exact[0, 4, 4]
    y_probe = probes[0, 4, 4]
    # Analytic order of magnitude: sum_i sigma_rot^2 * (n - i)^2
    # ~= 1e-4 * n^3 / 3 ~= 3.6e4 m^2 at n=1024.
    assert y_true > 1e3, y_true
    assert y_probe < 0.1 * y_true, (y_probe, y_true)
