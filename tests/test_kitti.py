"""KITTI odometry format: fixture-driven end-to-end coverage.

Generates a small on-disk KITTI-format sequence (velodyne .bin scans of a
synthetic world + times.txt + calib.txt Tr + camera-frame poses) and
drives the full ingestion chain through it: KittiStream (frame
conversion via Tr, velodyne_assembler_ros.cpp-equivalent geometry), the
native C++ prefetch loader, and examples/kitti_replay.py end-to-end.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from laser_slam_tpu.ops import se3
from laser_slam_tpu.pipeline import replay

N_SCANS = 6
N_POINTS = 4096

# A KITTI-like Tr (cam-from-velo): camera axes are (right, down, forward)
# = velo (-y, -z, +x), plus a small lever arm.
TR = np.array([
    [0.0, -1.0, 0.0, -0.01],
    [0.0, 0.0, -1.0, -0.07],
    [1.0, 0.0, 0.0, -0.27],
    [0.0, 0.0, 0.0, 1.0],
])


def make_kitti_fixture(root, n_scans=N_SCANS, seq='00', trajectory='line',
                       laps=1, center_m=(0.0, 0.0), radius_m=10.0):
    """Write a KITTI-format sequence; returns the ground-truth velodyne
    poses (in the Tr-conjugated frame KittiStream reports)."""
    stream = replay.SyntheticStream(
        n_scans=n_scans, points_per_scan=N_POINTS, trajectory=trajectory,
        step_m=1.2, noise_m=0.01, seed=17, laps=laps, center_m=center_m,
        radius_m=radius_m)
    frames = list(stream)

    seq_dir = os.path.join(root, 'sequences', seq)
    velo_dir = os.path.join(seq_dir, 'velodyne')
    poses_dir = os.path.join(root, 'poses')
    os.makedirs(velo_dir)
    os.makedirs(poses_dir, exist_ok=True)

    times = []
    cam_rows = []
    gt_velo = []
    for i, f in enumerate(frames):
        pts4 = np.concatenate(
            [f.points, np.full((len(f.points), 1), 0.5, np.float32)], axis=1)
        pts4.astype(np.float32).tofile(
            os.path.join(velo_dir, f'{i:06d}.bin'))
        times.append(i * 0.1)
        # KittiStream recovers T = Tr^-1 @ T_cam @ Tr; write
        # T_cam = Tr @ T_velo @ Tr^-1 so it round-trips to T_velo.
        T_velo = np.eye(4)
        q, t = np.asarray(f.gt_pose7[:4], float), f.gt_pose7[4:]
        w, x, y, z = q
        T_velo[:3, :3] = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
             2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
             2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x),
             1 - 2 * (x * x + y * y)]])
        T_velo[:3, 3] = t
        T_cam = TR @ T_velo @ np.linalg.inv(TR)
        cam_rows.append(T_cam[:3].reshape(-1))
        gt_velo.append(f.gt_pose7.copy())

    np.savetxt(os.path.join(seq_dir, 'times.txt'), np.asarray(times),
               fmt='%.6f')
    np.savetxt(os.path.join(poses_dir, seq + '.txt'),
               np.asarray(cam_rows), fmt='%.9f')
    with open(os.path.join(seq_dir, 'calib.txt'), 'w') as f:
        f.write('P0: ' + ' '.join(['0'] * 12) + '\n')
        f.write('Tr: ' + ' '.join(f'{v:.9f}' for v in TR[:3].reshape(-1))
                + '\n')
    return frames, gt_velo


def test_kitti_stream_roundtrip(tmp_path):
    frames, gt_velo = make_kitti_fixture(str(tmp_path))
    stream = replay.KittiStream(str(tmp_path), '00')
    out = list(stream)
    assert len(out) == N_SCANS
    for i, f in enumerate(out):
        assert f.time_ns == int(i * 0.1 * 1e9)
        np.testing.assert_allclose(f.points, frames[i].points, atol=1e-6)
        # Poses round-trip through the camera frame + Tr conversion.
        np.testing.assert_allclose(f.odom_pose7[4:], gt_velo[i][4:],
                                   atol=1e-5)
        dq = abs(float(np.dot(f.odom_pose7[:4], gt_velo[i][:4])))
        assert dq > 1 - 1e-9
    # max_scans honored
    assert len(list(replay.KittiStream(str(tmp_path), '00', max_scans=3))) \
        == 3


def test_native_prefetch_loader_on_fixture(tmp_path):
    from laser_slam_tpu import native
    frames, _ = make_kitti_fixture(str(tmp_path))
    velo = os.path.join(str(tmp_path), 'sequences', '00', 'velodyne')
    paths = [os.path.join(velo, f) for f in sorted(os.listdir(velo))]

    # Native decode matches numpy decode.
    pts = native.decode_kitti_bin(paths[0])
    np.testing.assert_allclose(pts, frames[0].points, atol=1e-6)

    got = list(native.PrefetchLoader(paths))
    assert [i for i, _ in got] == list(range(N_SCANS))
    for (_, pts), f in zip(got, frames):
        np.testing.assert_allclose(pts, f.points, atol=1e-6)

    # Voxel pre-filter path thins the cloud but keeps it in-bounds.
    got_v = list(native.PrefetchLoader(paths, voxel_cell=1.0))
    for (_, pv), (_, pf) in zip(got_v, got):
        assert 0 < len(pv) < len(pf)
        assert pv.min() >= pf.min() - 1e-5 and pv.max() <= pf.max() + 1e-5


@pytest.mark.slow
def test_kitti_replay_example_with_place_recognition(tmp_path):
    """--place-recognition on a loop-closing KITTI-format fixture: the
    example detects + injects the revisit closures itself (no external
    segmatch, no ground-truth alignment)."""
    make_kitti_fixture(str(tmp_path), n_scans=24, trajectory='circle',
                       laps=2, center_m=(8.0, 5.0))
    env = dict(os.environ,
               PYTHONPATH='/root/repo:' + os.environ.get('PYTHONPATH', ''),
               JAX_PLATFORMS='cpu')
    res = subprocess.run(
        [sys.executable, '/root/repo/examples/kitti_replay.py',
         '--root', str(tmp_path), '--sequence', '00',
         '--matcher', 'brute', '--window', '0', '--cpu',
         '--scan-capacity', '4096', '--reading-capacity', '2048',
         '--min-distance', '0.5', '--place-recognition',
         '--pr-every', '1', '--pr-exclude', '8'],
        capture_output=True, text=True, env=env, timeout=1200)
    assert res.returncode == 0, res.stderr[-2000:]
    assert 'loop closures:' in res.stdout, res.stdout
    n_acc = int(res.stdout.split('loop closures: ')[1].split(' accepted')[0])
    assert n_acc >= 1, res.stdout
    mean_ate = float(res.stdout.split('ATE vs KITTI poses: mean ')[1]
                     .split(' m')[0])
    assert mean_ate < 0.3, res.stdout


def test_kitti_replay_example_end_to_end(tmp_path):
    """examples/kitti_replay.py runs the production pipeline over the
    fixture: trajectory export + occupancy map export + sane ATE."""
    make_kitti_fixture(str(tmp_path))
    traj_out = os.path.join(str(tmp_path), 'traj.csv')
    map_out = os.path.join(str(tmp_path), 'map.xyz')
    env = dict(os.environ,
               PYTHONPATH='/root/repo:' + os.environ.get('PYTHONPATH', ''),
               JAX_PLATFORMS='cpu')
    res = subprocess.run(
        [sys.executable, '/root/repo/examples/kitti_replay.py',
         '--root', str(tmp_path), '--sequence', '00',
         '--matcher', 'brute', '--window', '0', '--cpu',
         '--scan-capacity', '4096', '--reading-capacity', '2048',
         '--traj-out', traj_out, '--map-out', map_out],
        capture_output=True, text=True, env=env, timeout=1200)
    assert res.returncode == 0, res.stderr[-2000:]
    assert 'ATE vs KITTI poses' in res.stdout
    mean_ate = float(res.stdout.split('ATE vs KITTI poses: mean ')[1]
                     .split(' m')[0])
    assert mean_ate < 0.3, res.stdout
    rows = np.loadtxt(traj_out, delimiter=',')
    assert rows.shape[0] >= 2 and rows.shape[1] == 4
    assert os.path.getsize(map_out) > 0
