"""Fleet (vmap) and multi-chip sharding tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.config import IcpConfig, SolverConfig
from laser_slam_tpu.ops import cloud as pc
from laser_slam_tpu.ops import se3
from laser_slam_tpu.parallel import fleet, sharding
from laser_slam_tpu.pipeline import replay


def fleet_inputs(rng, B=2, T=4, N=2048):
    """Build batched scan sequences from independent synthetic streams."""
    points = np.zeros((B, T, N, 3), np.float32)
    masks = np.zeros((B, T, N), bool)
    normals = np.zeros((B, T, N, 3), np.float32)
    init_pose = np.zeros((B, 7), np.float32)
    odom_rel = np.zeros((B, T, 7), np.float32)
    odom_rel[:, :, 0] = 1.0
    gt = np.zeros((B, T, 7), np.float32)
    for b in range(B):
        stream = replay.SyntheticStream(
            n_scans=T, points_per_scan=N, trajectory='line',
            step_m=0.5, noise_m=0.005, seed=100 + b)
        frames = list(stream)
        init_pose[b] = frames[0].gt_pose7
        prev = None
        for t, f in enumerate(frames):
            n = min(len(f.points), N)
            c = pc.make_cloud(f.points[:n], capacity=N)
            points[b, t] = np.asarray(c.points)
            masks[b, t] = np.asarray(c.mask)
            normals[b, t] = np.asarray(pc.estimate_normals(c, knn=8))
            gt[b, t] = f.gt_pose7
            if prev is not None:
                odom_rel[b, t] = np.asarray(se3.compose(
                    se3.inverse(jnp.asarray(prev)), jnp.asarray(f.gt_pose7)))
            prev = f.gt_pose7
    return (jnp.asarray(points), jnp.asarray(masks), jnp.asarray(normals),
            jnp.asarray(init_pose), jnp.asarray(odom_rel), gt)


def test_fleet_icp_odometry(rng):
    points, masks, normals, init_pose, odom_rel, gt = fleet_inputs(rng)
    cfg = IcpConfig(matcher='brute', reading_capacity=2048,
                    reading_sampling_ratio=1.0)
    res = fleet.fleet_icp_odometry(points, masks, normals, init_pose,
                                   odom_rel, cfg)
    assert res.poses.shape == gt.shape
    assert np.all(np.asarray(res.valid))
    err = np.linalg.norm(np.asarray(res.poses)[..., 4:] - gt[..., 4:],
                         axis=-1)
    # Scan-to-scan (no submap) on synthetic resampled clouds: the ICP
    # equilibrium is bounded by the scene sampling density.
    assert err.max() < 0.1, err


def test_fleet_chain_solve(rng):
    points, masks, normals, init_pose, odom_rel, gt = fleet_inputs(rng)
    cfg = IcpConfig(matcher='brute', reading_capacity=2048,
                    reading_sampling_ratio=1.0)
    odo = fleet.fleet_icp_odometry(points, masks, normals, init_pose,
                                   odom_rel, cfg)
    sigmas = jnp.full((6,), 0.01, jnp.float32)
    graphs, pose_mask = fleet.build_fleet_chain_graphs(
        odo.rel_icp, odo.valid, init_pose, sigmas)
    result = fleet.fleet_solve(graphs, odo.poses, pose_mask,
                               SolverConfig(gn_iterations=2,
                                            pcg_iterations=30))
    assert result.poses.shape == gt.shape
    err = np.linalg.norm(np.asarray(result.poses)[..., 4:] - gt[..., 4:],
                         axis=-1)
    assert err.max() < 0.1, err


def test_sharded_fleet_step(rng):
    """Full multi-chip path on the virtual 8-device CPU mesh."""
    assert len(jax.devices()) == 8, jax.devices()
    mesh = sharding.make_mesh(8)
    assert mesh.shape == {'dp': 4, 'sp': 2}

    points, masks, normals, init_pose, odom_rel, gt = fleet_inputs(
        rng, B=4, T=3, N=1024)
    icp_cfg = IcpConfig(matcher='brute', reading_capacity=1024,
                        reading_sampling_ratio=1.0)
    step = sharding.fleet_slam_step(
        mesh, icp_cfg, SolverConfig(gn_iterations=2, pcg_iterations=20))
    args = sharding.shard_fleet_inputs(mesh, points, masks, normals,
                                       init_pose, odom_rel)
    poses, result = step(*args, jnp.full((6,), 0.01, jnp.float32))
    poses = jax.block_until_ready(poses)
    err = np.linalg.norm(np.asarray(poses)[..., 4:] - gt[..., 4:], axis=-1)
    # Mechanism test (collectives + shardings), accuracy bounded by the
    # deliberately sparse scans: just require coarse agreement.
    assert err.max() < 0.3, err
    # Output really is dp-sharded.
    assert len(poses.sharding.device_set) >= 4


def test_sharded_step_matches_unsharded(rng):
    """Multi-chip correctness, not just liveness (VERDICT r1 item 9): the
    (dp x sp)-sharded step must reproduce the single-device result — the
    sp point-shard psum reductions and dp lane sharding may not change
    the math beyond float reassociation noise."""
    assert len(jax.devices()) == 8
    mesh = sharding.make_mesh(8)
    points, masks, normals, init_pose, odom_rel, gt = fleet_inputs(
        rng, B=4, T=3, N=1024)
    icp_cfg = IcpConfig(matcher='brute', reading_capacity=1024,
                        reading_sampling_ratio=1.0)
    scfg = SolverConfig(gn_iterations=2, pcg_iterations=20)

    step = sharding.fleet_slam_step(mesh, icp_cfg, scfg)
    args = sharding.shard_fleet_inputs(mesh, points, masks, normals,
                                       init_pose, odom_rel)
    sigmas = jnp.full((6,), 0.01, jnp.float32)
    poses_sharded, _ = step(*args, sigmas)

    # Unsharded reference: the same pipeline on one device.
    dev0 = jax.devices()[0]
    put = lambda x: jax.device_put(x, dev0)
    odo = fleet.fleet_icp_odometry(put(points), put(masks), put(normals),
                                   put(init_pose), put(odom_rel), icp_cfg)
    graphs, pose_mask = fleet.build_fleet_chain_graphs(
        odo.rel_icp, odo.valid, put(init_pose), put(sigmas))
    result = fleet.fleet_solve(graphs, odo.poses, pose_mask, scfg)

    np.testing.assert_allclose(np.asarray(poses_sharded),
                               np.asarray(result.poses), atol=1e-5)


def test_dp_scales_to_full_mesh_lanes(rng):
    """dp-only mesh: 8 lanes across 8 devices, each lane's result equal to
    the same lane solved alone on one device."""
    assert len(jax.devices()) == 8
    mesh = sharding.make_mesh(8, dp=8, sp=1)
    points, masks, normals, init_pose, odom_rel, gt = fleet_inputs(
        rng, B=8, T=3, N=512)
    icp_cfg = IcpConfig(matcher='brute', reading_capacity=512,
                        reading_sampling_ratio=1.0)
    scfg = SolverConfig(gn_iterations=2, pcg_iterations=20)
    step = sharding.fleet_slam_step(mesh, icp_cfg, scfg)
    args = sharding.shard_fleet_inputs(mesh, points, masks, normals,
                                       init_pose, odom_rel)
    sigmas = jnp.full((6,), 0.01, jnp.float32)
    poses8, _ = step(*args, sigmas)
    assert len(poses8.sharding.device_set) == 8  # really spread over dp

    # Lane 3 alone on one device.
    dev0 = jax.devices()[0]
    put = lambda x: jax.device_put(x[3:4], dev0)
    odo = fleet.fleet_icp_odometry(put(points), put(masks), put(normals),
                                   put(init_pose), put(odom_rel), icp_cfg)
    graphs, pose_mask = fleet.build_fleet_chain_graphs(
        odo.rel_icp, odo.valid, put(init_pose),
        jax.device_put(sigmas, dev0))
    result = fleet.fleet_solve(graphs, odo.poses, pose_mask, scfg)
    np.testing.assert_allclose(np.asarray(poses8)[3],
                               np.asarray(result.poses)[0], atol=1e-5)


def test_fleet_maps_accumulate_and_query(rng):
    """Per-lane local maps (BASELINE config 5 'local-map NN queries'):
    accumulated world-frame points answer exact per-lane 1-NN."""
    B, N, M = 4, 256, 1024
    maps = fleet.init_fleet_maps(B, M)
    g = np.random.default_rng(0)
    scans = g.uniform(-5, 5, (B, N, 3)).astype(np.float32)
    masks = np.ones((B, N), bool)
    masks[:, 200:] = False  # tail invalid
    poses = np.zeros((B, 7), np.float32)
    poses[:, 0] = 1.0
    poses[:, 4] = np.arange(B) * 10.0  # lanes shifted apart in x
    maps = fleet.fleet_accumulate(maps, jnp.asarray(scans),
                                  jnp.asarray(masks), jnp.asarray(poses))
    assert np.all(np.asarray(maps.cursor) == N)
    # Query each lane at (a perturbation of) its own world points.
    world = scans + poses[:, None, 4:]
    q = world[:, :64] + 0.01
    idx, d2 = fleet.fleet_map_query(maps, jnp.asarray(q))
    d2 = np.asarray(d2)
    assert d2.shape == (B, 64)
    assert d2.max() < 0.05 ** 2  # found own point, not a neighbor lane's
    # Invalid (SENTINEL-parked) rows never win.
    assert np.all(np.asarray(idx) < N)


def test_fleet_maps_overflow_compacts(rng):
    """Overflowing a lane's buffer triggers voxel compaction instead of
    unbounded growth or silent corruption."""
    B, N, M = 2, 512, 1024
    maps = fleet.init_fleet_maps(B, M)
    g = np.random.default_rng(1)
    poses = np.zeros((B, 7), np.float32)
    poses[:, 0] = 1.0
    for _ in range(4):  # 4*512 = 2048 > 1024 capacity
        scans = g.uniform(-2, 2, (B, N, 3)).astype(np.float32)
        masks = np.ones((B, N), bool)
        maps = fleet.fleet_accumulate(maps, jnp.asarray(scans),
                                      jnp.asarray(masks), jnp.asarray(poses),
                                      voxel_size_m=0.5)
    cur = np.asarray(maps.cursor)
    assert np.all(cur <= M)
    # The map still answers queries with in-range matches.
    q = jnp.asarray(g.uniform(-2, 2, (B, 32, 3)).astype(np.float32))
    _, d2 = fleet.fleet_map_query(maps, q)
    assert np.asarray(d2).max() < 1.0  # voxel 0.5 -> neighbor within ~0.9


def test_batched_icp_b64_guard(rng):
    """batched_icp: the B=64 split path returns exactly what a plain vmap
    over all 64 lanes returns (the guard changes scheduling, not math)."""
    g = np.random.default_rng(2)
    ref_np = g.uniform(-3, 3, (512, 3)).astype(np.float32)
    ref = pc.make_cloud(ref_np, capacity=512)
    normals = pc.estimate_normals(ref, knn=8)
    cfg = IcpConfig(matcher='brute', reading_capacity=256,
                    reading_sampling_ratio=1.0, max_iterations=4)
    B = 64
    reads = np.stack([ref_np[g.permutation(512)[:256]] for _ in range(B)])
    masks = np.ones((B, 256), bool)
    guesses = np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), (B, 1))
    out = fleet.batched_icp(jnp.asarray(reads), jnp.asarray(masks),
                            ref, normals, jnp.asarray(guesses), cfg)
    import laser_slam_tpu.ops.icp as icp_mod
    want = jax.vmap(lambda p, m, gg: icp_mod.icp_point_to_plane(
        pc.Cloud(p, m), ref, normals, gg, cfg))(
            jnp.asarray(reads), jnp.asarray(masks), jnp.asarray(guesses))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-6),
        out, want)


def test_sharded_graph_solve_matches_single_device(rng):
    """ICI-sharded pose-graph solve (factor axis over 'gp', psum in PCG,
    SURVEY §2 table 3): same answer as the single-device solve up to
    psum reassociation noise."""
    from laser_slam_tpu.graph import factors as fg
    from laser_slam_tpu.graph import solver as sv

    assert len(jax.devices()) == 8
    NP_ = 512
    g = fg.HostGraph(rel_capacity=1024, prior_capacity=16)
    poses_np = np.zeros((NP_, 7), np.float32)
    poses_np[:, 0] = 1.0
    poses_np[:, 4] = np.arange(NP_)
    g.add_prior(0, poses_np[0], np.full(6, 1e-7, np.float32))
    sig = np.full(6, 0.01, np.float32)
    step7 = np.array([1, 0, 0, 0, 1, 0, 0], np.float32)
    for i in range(NP_ - 1):
        g.add_relative(i, i + 1, step7, sig)
    for i in range(0, NP_ - 64, 96):
        g.add_relative(i, i + 64,
                       np.array([1, 0, 0, 0, 64, 0, 0], np.float32), sig)
    grng = np.random.default_rng(1)
    poses_np[:, 4:] += grng.normal(size=(NP_, 3)).astype(np.float32) * 0.05
    mask_np = np.ones((NP_,), bool)
    data = g.to_device()
    scfg = SolverConfig(gn_iterations=2, pcg_iterations=12,
                        pcg_tolerance=0.0, preconditioner='tridiagonal')
    gmesh = sharding.make_graph_mesh(8)
    solve_sharded = sharding.sharded_solve(gmesh, scfg)
    args_g = sharding.shard_graph_inputs(
        gmesh, data, jnp.asarray(poses_np), jnp.asarray(mask_np))
    out_sh = solve_sharded(*args_g)
    dev0 = jax.devices()[0]
    out_ref = sv.solve(jax.device_put(data, dev0),
                       jax.device_put(jnp.asarray(poses_np), dev0),
                       jax.device_put(jnp.asarray(mask_np), dev0), scfg)
    np.testing.assert_allclose(np.asarray(out_sh.poses),
                               np.asarray(out_ref.poses), atol=1e-5)
    assert float(out_sh.error_final) < float(out_sh.error_initial)
