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
