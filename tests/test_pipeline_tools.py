"""Tests for the revolution assembler and occupancy-grid tools."""

import os

import pytest

import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.config import AssemblerConfig
from laser_slam_tpu.ops import se3
from laser_slam_tpu.pipeline import assembler as asm
from laser_slam_tpu.pipeline import occupancy as occ


def ring_scan(rng, n=720, radius=10.0):
    """A full-revolution scan: points on a cylinder wall."""
    az = np.linspace(np.pi / 2 - 1e-3, np.pi / 2 - 2 * np.pi + 1e-3, n)
    z = rng.uniform(0, 2, n)
    return np.stack([radius * np.cos(az), radius * np.sin(az), z],
                    axis=1).astype(np.float32)


def test_split_and_assemble_static(rng):
    """Static sensor: assembling the split packets reproduces the scan."""
    scan = ring_scan(rng)
    packets_np = asm.split_scan_into_packets(scan, 0, n_packets=12)
    assert sum(len(p) for p in packets_np) == len(scan)

    # Two revolutions of packets; identity odometry.
    packets = []
    t = 0
    for rev in range(2):
        for p in packets_np:
            packets.append(asm.Packet(time_ns=t, points=p,
                                      odom_base_pose7=np.asarray(
                                          se3.identity())))
            t += int(1e6)
    out = list(asm.assemble_stream(packets))
    assert len(out) == 1  # second revolution still accumulating
    stamp, cloud = out[0]
    assert len(cloud) == len(scan)
    # Static: de-skew is identity, points identical (unordered).
    np.testing.assert_allclose(sorted(cloud[:, 2]), sorted(scan[:, 2]),
                               atol=1e-5)


def test_assemble_with_motion_deskews(rng):
    """Moving sensor: de-skewed assembly must out-perform naive stacking."""
    scan = ring_scan(rng, n=720)
    packets_np = asm.split_scan_into_packets(scan, 0, n_packets=12)
    # Sensor moves +x at 0.1 m per packet; each packet sees the world from
    # a different pose: point coords in current sensor frame are
    # p_sensor = p_world - x_offset.
    def make_packets(two_revs=True):
        packets = []
        t = 0
        step = 0
        for rev in range(2 if two_revs else 1):
            for p in packets_np:
                offset = np.array([0.1 * step, 0, 0], np.float32)
                pose = np.concatenate([[1, 0, 0, 0], offset]).astype(
                    np.float32)
                packets.append(asm.Packet(
                    time_ns=t, points=p - offset, odom_base_pose7=pose))
                t += int(1e6)
                step += 1
        return packets

    out_deskew = list(asm.assemble_stream(
        make_packets(), AssemblerConfig(naive_assembling=False)))
    out_naive = list(asm.assemble_stream(
        make_packets(), AssemblerConfig(naive_assembling=True)))
    assert len(out_deskew) == 1 and len(out_naive) == 1

    # Compare both against the ground-truth cloud in the end-of-revolution
    # sensor frame (chamfer distance: the moving sensor shifts azimuths so
    # revolutions may gain/lose a packet at the boundary).
    from scipy.spatial import cKDTree
    end_offset = np.array([0.1 * (len(packets_np)), 0, 0], np.float32)
    gt_end = scan - end_offset
    tree = cKDTree(gt_end)

    def chamfer(cloud):
        d, _ = tree.query(cloud)
        return d.mean()

    err_deskew = chamfer(out_deskew[0][1])
    err_naive = chamfer(out_naive[0][1])
    assert err_deskew < 0.1, (err_deskew, err_naive)
    assert err_naive > err_deskew * 2, (err_deskew, err_naive)


def test_occupancy_grid_hits_and_misses(rng):
    grid = occ.OccupancyGrid(resolution=0.25, max_range=30.0,
                             n_cells=1 << 16, ray_steps=64)
    # Sensor at origin, wall of points at x=10.
    ys = np.linspace(-2, 2, 64)
    pts = np.stack([np.full(64, 10.0), ys, np.zeros(64)], 1).astype(
        np.float32)
    pose = np.asarray(se3.identity())
    for _ in range(3):
        grid.insert_scan(pts, pose)
    occ_pts = grid.occupied_points()
    assert len(occ_pts) > 10
    # Occupied cells are near x=10.
    assert np.all(np.abs(occ_pts[:, 0] - 10.0) < 0.5), occ_pts[:5]
    # Free space along the ray (x=5) is not occupied.
    assert not np.any(np.abs(occ_pts[:, 0] - 5.0) < 0.5)


def test_occupancy_save_formats(tmp_path, rng):
    grid = occ.OccupancyGrid(resolution=0.5, n_cells=1 << 12, ray_steps=16)
    pts = rng.uniform(-5, 5, size=(128, 3)).astype(np.float32)
    grid.insert_scan(pts, np.asarray(se3.identity()))
    for ext in ('npz', 'xyz', 'pcd', 'ply'):
        path = os.path.join(tmp_path, f'map.{ext}')
        grid.save(path)
        assert os.path.getsize(path) > 0
    # npz roundtrip
    loaded = occ.OccupancyGrid.load(os.path.join(tmp_path, 'map.npz'))
    np.testing.assert_allclose(loaded.occupied_points(),
                               grid.occupied_points())


def test_build_occupancy_from_track_data(rng):
    data = []
    for i in range(3):
        pose = np.concatenate([[1, 0, 0, 0], [i * 1.0, 0, 0]]).astype(
            np.float32)
        pts = np.stack([np.full(32, 8.0), np.linspace(-1, 1, 32),
                        np.zeros(32)], 1).astype(np.float32)
        data.append((int(i * 1e9), pts, pose))
    grid = occ.build_occupancy_from_track_data(data, resolution=0.25,
                                               max_range=20.0)
    assert len(grid.occupied_points()) > 0


def test_assembler_feeds_slam_pipeline(rng):
    """Packets -> revolutions -> online SLAM: full sensor-to-trajectory
    integration (the reference's assembler -> worker topic chain)."""
    import jax.numpy as jnp
    from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                       InputFilterConfig, LaserTrackConfig,
                                       SolverConfig)
    from laser_slam_tpu.pipeline import online
    from laser_slam_tpu.pipeline import replay

    # Build revolutions from a synthetic stream, split them into packets,
    # reassemble, and run SLAM on the assembled output.
    frames = list(replay.SyntheticStream(
        n_scans=3, points_per_scan=1024, trajectory='line', step_m=0.5,
        noise_m=0.0, seed=30))
    asm_obj = asm.RevolutionAssembler(AssemblerConfig(naive_assembling=True))
    assembled = []
    t = 0
    for f in frames:
        for pkt in asm.split_scan_into_packets(f.points, f.time_ns, 8):
            out = asm_obj.push(asm.Packet(time_ns=t, points=pkt))
            if out is not None:
                assembled.append(out)
            t += int(1e6)
    assert len(assembled) >= 2

    cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=3, use_icp_factors=True,
            odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
            input_filters=InputFilterConfig(scan_capacity=1024),
            icp=IcpConfig(matcher='brute', reading_capacity=1024,
                          reading_sampling_ratio=1.0)),
        solver=SolverConfig(gn_iterations=2, pcg_iterations=20))
    runner = online.OnlineRunner(cfg, pose_capacity=16, factor_capacity=64)
    for i, (stamp, cloud) in enumerate(assembled):
        ok = runner.process_scan(stamp, cloud, frames[i].odom_pose7)
        assert ok
    traj = runner.trajectory()
    assert len(traj) == len(assembled)


def test_plot_trajectory_tool(tmp_path):
    """tools/plot_trajectory.py renders trajectory + map to a PNG
    (the rviz-equivalent offline view; run in-process, see the
    laser_to_map test for why no subprocess)."""
    import importlib.util as _ilu
    mpl = pytest.importorskip('matplotlib')
    mpl.use('Agg')
    traj = os.path.join(tmp_path, 'traj.csv')
    np.savetxt(traj, np.column_stack([
        np.arange(5), np.linspace(0, 4, 5),
        np.zeros(5), np.zeros(5)]), delimiter=',')
    mp = os.path.join(tmp_path, 'map.xyz')
    np.savetxt(mp, np.random.default_rng(0).uniform(-2, 2, (100, 3)))
    out = os.path.join(tmp_path, 'view.png')
    spec = _ilu.spec_from_file_location(
        'plot_traj_tool', '/root/repo/tools/plot_trajectory.py')
    mod = _ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import sys as _sys
    argv_save = _sys.argv
    try:
        _sys.argv = ['plot_trajectory.py', out, '--traj', traj,
                     '--map', mp]
        rc = mod.main()
        assert rc in (0, None)
    finally:
        _sys.argv = argv_save
    assert os.path.getsize(out) > 0
