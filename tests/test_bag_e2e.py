"""Full-stack bag-to-trajectory pipeline (VERDICT r3 ask #6).

Synthesizes a complete .bag — RAW velodyne_msgs/VelodyneScan packets from
the beam simulator's raycaster on a MOVING sensor, plus /tf odometry —
then runs the whole stack exactly as a user would:

    BagWriter -> VelodyneBagStream (native packet decode + de-skewed
    revolution assembly) -> OnlineRunner -> ATE/RPE -> occupancy export

This is the reference's de-facto validation flow (a recorded bag played
into the assembler + worker, velodyne_assembler/launch/test/
test.launch:4-21) as one automated test; the reference has no automated
equivalent (its gtest is a placeholder, laser_slam/test/test_empty.cpp).
"""

import os
import sys

import numpy as np

from laser_slam_tpu import native
from laser_slam_tpu.pipeline import velodyne_sim as vs
from laser_slam_tpu.pipeline.bag_writer import (BagWriter,
                                                encode_velodyne_packet)
from laser_slam_tpu.pipeline.rosbag import RosbagReader

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'examples'))
import bag_replay  # noqa: E402  (the example IS the system under test)


def test_bag_writer_reader_roundtrip(tmp_path, rng):
    """Everything BagWriter encodes, RosbagReader must decode back."""
    path = str(tmp_path / 'rt.bag')
    xyz = rng.normal(size=(40, 3)).astype(np.float32)
    pose = np.array([1, 0, 0, 0, 2.0, -1.0, 0.5], np.float32)
    pkt = encode_velodyne_packet(
        np.arange(12) * 30.0, np.full((12, 32), 7.5))
    with BagWriter(path, chunk_bytes=1 << 10) as w:   # force several chunks
        w.write_odometry('/odom', 5_000_000_000, pose)
        w.write_tf(5_100_000_000, 'odom', 'base_link', pose)
        w.write_pointcloud2('/points', 5_200_000_000, xyz)
        w.write_velodyne_scan('/velodyne_packets', 5_300_000_000, [pkt, pkt])

    got = {m.topic: m for m in RosbagReader(path)}
    assert set(got) == {'/odom', '/tf', '/points', '/velodyne_packets'}
    _, _, p7 = got['/odom'].data
    np.testing.assert_allclose(p7, pose, atol=1e-6)
    entries = got['/tf'].data
    assert entries[0][2] == 'base_link'
    np.testing.assert_allclose(entries[0][3], pose, atol=1e-6)
    stamp_ns, pts = got['/points'].data
    assert stamp_ns == 5_200_000_000
    np.testing.assert_allclose(pts, xyz, atol=1e-6)
    _, pkts = got['/velodyne_packets'].data
    assert len(pkts) == 2 and bytes(pkts[0]) == pkt


def test_bag_writer_bz2_roundtrip(tmp_path, rng):
    path = str(tmp_path / 'rt2.bag')
    xyz = rng.normal(size=(16, 3)).astype(np.float32)
    with BagWriter(path, compression='bz2') as w:
        w.write_pointcloud2('/points', 1_000_000_000, xyz)
    msgs = list(RosbagReader(path))
    assert len(msgs) == 1
    np.testing.assert_allclose(msgs[0].data[1], xyz, atol=1e-6)


def test_synth_packets_decode_to_raycast(rng):
    """velodyne_packets_for_pose is the decoder's exact inverse: decode
    returns the cast rays (range AND direction) up to the 2 mm wire
    quantization."""
    scene = vs.make_beam_scene(seed=1, world_size_m=40.0)
    pose = np.array([1, 0, 0, 0, 3.0, -2.0, 1.5], np.float64)
    # 24 blocks spanning a third of a revolution (gap 5 deg — under the
    # decoder's 10 deg interpolation threshold, io.cpp:132).
    pkts = vs.velodyne_packets_for_pose(scene, pose, n_blocks=24,
                                        blocks_per_rev=72)
    pts = native.decode_velodyne_packets(b''.join(pkts))
    assert len(pts) > 24 * 16            # most rays hit in a closed room

    # Independent check: re-cast each decoded direction and compare range.
    r = np.linalg.norm(pts, axis=1)
    dirs_w = (pts / r[:, None]) @ vs._quat_to_matrix(pose[:4]).T
    t = vs._raycast(scene, pose[4:], dirs_w)
    np.testing.assert_allclose(r, t, atol=5e-3)


def test_bag_to_trajectory_e2e(tmp_path):
    """One command from a synthesized bag to an ATE report + saved map,
    through the real packet decoder, de-skew assembler, and SLAM stack."""
    bag = str(tmp_path / 'demo.bag')
    gt_path = bag_replay.make_demo_bag(bag, n_scans=10, packets_per_rev=12,
                                       radius_m=10.0, odom_noise=0.01,
                                       range_noise_m=0.005, seed=7)
    assert os.path.exists(gt_path)
    map_path = str(tmp_path / 'map.npz')
    traj = bag_replay.replay(bag, gt_path=gt_path, map_path=map_path,
                             cpu=True)

    # Every revolution (minus the final partial one) became a key.
    assert len(traj) >= 9
    from laser_slam_tpu.core import evaluation as ev
    gt = ev.load_trajectory_tum(gt_path)
    a = ev.ate(traj, gt, align='origin')
    # VLP-16 at 144 blocks/rev is sparse; the bound is loose but pins
    # sanity (odometry-only drift at this noise level is several x worse).
    assert a.translation.rmse < 0.5, a.translation
    assert np.all(np.isfinite(a.errors_m))

    from laser_slam_tpu.pipeline.occupancy import OccupancyGrid
    grid = OccupancyGrid.load(map_path)
    assert len(grid.occupied_points()) > 100, 'near-empty occupancy export'
