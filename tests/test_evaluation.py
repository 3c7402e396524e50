"""Trajectory evaluation (core/evaluation.py): ATE / RPE / Umeyama.

Pure numpy — no device work.  Ground truths are constructed so every
metric has a closed-form expected value.
"""
import subprocess
import sys

import numpy as np
import pytest

from laser_slam_tpu.core import evaluation as ev
from laser_slam_tpu.core import csvio


def _traj_circle(n=50, radius=10.0, noise=0.0, seed=0):
    """(times, poses7) along a circle, heading tangent."""
    rng = np.random.default_rng(seed)
    ang = np.linspace(0, 1.5 * np.pi, n)
    poses = np.zeros((n, 7))
    yaw = ang + np.pi / 2
    poses[:, 0] = np.cos(yaw / 2)
    poses[:, 3] = np.sin(yaw / 2)
    poses[:, 4] = radius * np.cos(ang)
    poses[:, 5] = radius * np.sin(ang)
    if noise:
        poses[:, 4:] += rng.normal(size=(n, 3)) * noise
    times = (np.arange(n) * 100_000_000).astype(np.int64)
    return times, poses


def _apply_rigid(poses, R, t, s=1.0):
    out = poses.copy()
    out[:, 4:] = s * poses[:, 4:] @ np.asarray(R).T + t
    qR = ev._quat_from_matrix(np.asarray(R))
    out[:, :4] = ev._quat_mul(np.broadcast_to(qR, poses[:, :4].shape),
                              poses[:, :4])
    return out


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def test_umeyama_recovers_rigid_transform(rng):
    src = rng.normal(size=(40, 3)) * 5.0
    R_true = _rot_z(0.7) @ np.array(
        [[1, 0, 0], [0, np.cos(0.2), -np.sin(0.2)],
         [0, np.sin(0.2), np.cos(0.2)]])
    t_true = np.array([3.0, -1.0, 0.5])
    dst = src @ R_true.T + t_true
    R, t, s = ev.umeyama_alignment(src, dst)
    np.testing.assert_allclose(R, R_true, atol=1e-10)
    np.testing.assert_allclose(t, t_true, atol=1e-10)
    assert s == 1.0


def test_umeyama_with_scale(rng):
    src = rng.normal(size=(25, 3))
    dst = 2.5 * src @ _rot_z(1.1).T + np.array([1, 2, 3.0])
    R, t, s = ev.umeyama_alignment(src, dst, with_scale=True)
    np.testing.assert_allclose(s, 2.5, atol=1e-9)
    np.testing.assert_allclose(dst, s * src @ R.T + t, atol=1e-9)


def test_ate_zero_for_rigidly_displaced_copy():
    times, poses = _traj_circle()
    moved = _apply_rigid(poses, _rot_z(0.9), np.array([5.0, -2.0, 1.0]))
    res = ev.ate((times, moved), (times, poses), align='se3')
    assert res.translation.rmse < 1e-9
    assert res.rotation_deg.max < 1e-6


def test_ate_none_vs_se3_alignment():
    times, poses = _traj_circle()
    moved = poses.copy()
    moved[:, 4] += 2.0                       # constant 2 m offset
    res_none = ev.ate((times, moved), (times, poses), align='none')
    np.testing.assert_allclose(res_none.translation.mean, 2.0, atol=1e-12)
    res_se3 = ev.ate((times, moved), (times, poses), align='se3')
    assert res_se3.translation.rmse < 1e-9


def test_ate_origin_alignment_rebases_first_pose():
    times, poses = _traj_circle()
    moved = _apply_rigid(poses, _rot_z(0.3), np.array([1.0, 0, 0]))
    res = ev.ate((times, moved), (times, poses), align='origin')
    assert res.errors_m[0] < 1e-9            # first pose matches exactly
    assert res.translation.max < 1e-6        # rigid motion fully undone


def test_ate_accepts_dict_trajectories():
    times, poses = _traj_circle(n=20)
    d_est = {int(t): p for t, p in zip(times, poses)}
    res = ev.ate(d_est, (times, poses), align='none')
    assert res.translation.rmse < 1e-12
    assert res.translation.n == 20


def test_associate_tolerates_jitter_and_dropout():
    ta = (np.arange(30) * 100_000_000).astype(np.int64)
    tb = ta[::2] + 3_000_000                 # half rate, 3 ms offset
    ia, ib = ev.associate(ta, tb, max_dt_ns=20_000_000)
    assert len(ia) == len(tb)
    np.testing.assert_array_equal(ia, np.arange(0, 30, 2))


def test_rpe_frames_measures_drift_not_offset():
    times, poses = _traj_circle()
    # A constant offset is invisible to RPE...
    moved = poses.copy()
    moved[:, 4:] += np.array([10.0, 0, 0])
    res = ev.rpe((times, moved), (times, poses), delta=1)
    assert res.translation.rmse < 1e-9
    # ...but per-step noise is exactly what it measures.
    rng = np.random.default_rng(1)
    noisy = poses.copy()
    noisy[:, 4:] += rng.normal(size=(len(poses), 3)) * 0.05
    res_n = ev.rpe((times, noisy), (times, poses), delta=1)
    assert 0.02 < res_n.translation.mean < 0.3


def test_rpe_distance_unit_normalizes_per_metre():
    times, poses = _traj_circle(n=80)
    # 1% scale error => ~0.01 m drift per metre travelled.
    scaled = poses.copy()
    scaled[:, 4:] *= 1.01
    res = ev.rpe((times, scaled), (times, poses), delta=5.0, delta_unit='m')
    assert res.delta_unit == 'm'
    np.testing.assert_allclose(res.translation.mean, 0.01, rtol=0.35)


def test_rpe_rejects_too_short():
    times, poses = _traj_circle(n=5)
    with pytest.raises(ValueError):
        ev.rpe((times, poses), (times, poses), delta=10)


def test_tum_roundtrip(tmp_path):
    times, poses = _traj_circle(n=15)
    path = str(tmp_path / 'traj.txt')
    csvio.write_trajectory_tum(zip(times, poses), path)
    t2, p2 = ev.load_trajectory_tum(path)
    np.testing.assert_allclose(t2 * 1e-9, times * 1e-9, atol=1e-6)
    np.testing.assert_allclose(p2, poses, atol=1e-6)


def test_kitti_roundtrip(tmp_path):
    times, poses = _traj_circle(n=12)
    path = str(tmp_path / 'poses.txt')
    csvio.write_trajectory_kitti(zip(times, poses), path)
    _, p2 = ev.load_trajectory_kitti(path)
    np.testing.assert_allclose(p2[:, 4:], poses[:, 4:], atol=1e-6)
    # Quaternion sign is gauge: compare rotations by angle.
    ang = ev._rotation_angle(p2[:, :4], poses[:, :4])
    assert np.degrees(ang).max() < 1e-3


def test_cli_tool(tmp_path):
    times, poses = _traj_circle(n=30)
    rng = np.random.default_rng(2)
    est = poses.copy()
    est[:, 4:] += rng.normal(size=(30, 3)) * 0.01
    pe, pr = str(tmp_path / 'est.txt'), str(tmp_path / 'ref.txt')
    csvio.write_trajectory_tum(zip(times, est), pe)
    csvio.write_trajectory_tum(zip(times, poses), pr)
    res = subprocess.run(
        [sys.executable, 'tools/evaluate_trajectory.py', pe, pr],
        capture_output=True, text=True, cwd=__file__.rsplit('/', 2)[0])
    assert res.returncode == 0, res.stderr
    assert 'ATE translation' in res.stdout
    assert 'RPE translation' in res.stdout
