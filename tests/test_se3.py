"""Unit tests for the SE(3) geometry core against closed forms and scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from laser_slam_tpu.ops import se3


def random_pose(rng, scale_t=5.0):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    t = rng.normal(size=3) * scale_t
    return jnp.asarray(np.concatenate([q, t]), dtype=jnp.float32)


def test_identity_compose(rng):
    p = random_pose(rng)
    eye = se3.identity()
    np.testing.assert_allclose(se3.compose(eye, p), p, atol=1e-6)
    np.testing.assert_allclose(se3.compose(p, eye), p, atol=1e-6)


def test_inverse(rng):
    p = random_pose(rng)
    pinv = se3.inverse(p)
    np.testing.assert_allclose(se3.compose(p, pinv), se3.identity(),
                               atol=1e-5)
    np.testing.assert_allclose(se3.compose(pinv, p), se3.identity(),
                               atol=1e-5)


def test_compose_matches_matrix_product(rng):
    a, b = random_pose(rng), random_pose(rng)
    got = se3.to_matrix(se3.compose(a, b))
    want = se3.to_matrix(a) @ se3.to_matrix(b)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_apply_matches_matrix(rng):
    p = random_pose(rng)
    pts = jnp.asarray(rng.normal(size=(32, 3)), dtype=jnp.float32)
    got = se3.apply(p, pts)
    T = np.asarray(se3.to_matrix(p))
    want = pts @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_rotate_matches_scipy(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    v = rng.normal(size=(10, 3))
    got = se3.quat_rotate(jnp.asarray(q, jnp.float32),
                          jnp.asarray(v, jnp.float32))
    # scipy uses xyzw order
    want = ScipyRot.from_quat(np.roll(q, -1)).apply(v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_matrix_roundtrip(rng):
    for _ in range(20):
        p = random_pose(rng)
        p2 = se3.from_matrix(se3.to_matrix(p))
        np.testing.assert_allclose(p2, p, atol=1e-5)


def test_quat_from_matrix_all_pivots():
    # Rotations near each quaternion pivot branch (180 deg about each axis).
    for axis in np.eye(3):
        for angle in [0.0, np.pi - 1e-3, np.pi / 2, 3.0]:
            R = ScipyRot.from_rotvec(axis * angle).as_matrix()
            q = se3.quat_from_matrix(jnp.asarray(R, jnp.float32))
            R2 = se3.quat_to_matrix(q)
            np.testing.assert_allclose(R2, R, atol=1e-5)


def test_exp_log_roundtrip(rng):
    # log returns the principal branch, so keep |omega| < pi.
    xi_np = rng.normal(size=(50, 6))
    rot_norm = np.linalg.norm(xi_np[:, :3], axis=1, keepdims=True)
    xi_np[:, :3] *= np.minimum(1.0, 3.0 / rot_norm)
    xi = jnp.asarray(xi_np, dtype=jnp.float32)
    xi2 = se3.log(se3.exp(xi))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_exp_log_small_angles():
    xi = jnp.asarray([[1e-9, 0, 0, 0.5, -0.2, 0.1],
                      [0, 0, 0, 1, 2, 3],
                      [1e-5, -1e-5, 1e-5, 0.1, 0.1, 0.1]], jnp.float32)
    p = se3.exp(xi)
    assert np.all(np.isfinite(np.asarray(p)))
    np.testing.assert_allclose(se3.log(p), xi, atol=1e-6)
    # Pure translation: exp([0, v]) must translate by exactly v.
    np.testing.assert_allclose(se3.translation(p[1]), [1, 2, 3], atol=1e-6)


def test_exp_rotation_matches_scipy(rng):
    omega = rng.normal(size=3)
    xi = jnp.asarray(np.concatenate([omega, np.zeros(3)]), jnp.float32)
    R_got = se3.quat_to_matrix(se3.rotation(se3.exp(xi)))
    R_want = ScipyRot.from_rotvec(omega).as_matrix()
    np.testing.assert_allclose(R_got, R_want, atol=1e-5)


def test_se3_exp_matches_matrix_exponential(rng):
    from scipy.linalg import expm
    xi_np = rng.normal(size=6)
    xi = jnp.asarray(xi_np, jnp.float32)
    T_got = se3.to_matrix(se3.exp(xi))
    hat = np.zeros((4, 4))
    hat[:3, :3] = np.array([[0, -xi_np[2], xi_np[1]],
                            [xi_np[2], 0, -xi_np[0]],
                            [-xi_np[1], xi_np[0], 0]])
    hat[:3, 3] = xi_np[3:]
    np.testing.assert_allclose(T_got, expm(hat), atol=1e-4)


def test_local_retract_inverse(rng):
    a, b = random_pose(rng), random_pose(rng)
    xi = se3.local(a, b)
    b2 = se3.retract(a, xi)
    np.testing.assert_allclose(b2[4:], b[4:], atol=1e-4)
    np.testing.assert_allclose(
        se3.quat_to_matrix(se3.rotation(b2)),
        se3.quat_to_matrix(se3.rotation(b)), atol=1e-4)


def test_orthonormalize(rng):
    R = ScipyRot.random(rng=42).as_matrix() + rng.normal(size=(3, 3)) * 0.05
    R_fixed = np.asarray(se3.orthonormalize(jnp.asarray(R, jnp.float32)))
    np.testing.assert_allclose(R_fixed @ R_fixed.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R_fixed) > 0.99


def test_translation_distance(rng):
    a, b = random_pose(rng), random_pose(rng)
    want = np.linalg.norm(np.asarray(a[4:]) - np.asarray(b[4:]))
    np.testing.assert_allclose(se3.translation_distance(a, b), want,
                               rtol=1e-5)


def test_batched_and_jit(rng):
    poses = jnp.stack([random_pose(rng) for _ in range(16)])
    comp = jax.jit(se3.compose)(poses, poses)
    assert comp.shape == (16, 7)
    inv = jax.vmap(se3.inverse)(poses)
    np.testing.assert_allclose(se3.compose(poses, inv),
                               jnp.broadcast_to(se3.identity(), (16, 7)),
                               atol=1e-5)
    # log/exp batched
    xi = se3.log(poses)
    assert xi.shape == (16, 6)
