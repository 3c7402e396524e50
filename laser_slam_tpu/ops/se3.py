"""SE(3) / SO(3) geometry core, batched and jit-friendly.

TPU-native replacement for the reference's minkindr
``kindr::minimal::QuatTransformationTemplate<double>`` type and the
libpointmatcher ``RigidTransformation`` helpers
(reference: laser_slam/include/laser_slam/common.hpp:17-18,136-149,263-279).

Representation
--------------
A pose is a plain ``[..., 7]`` array ``[qw, qx, qy, qz, tx, ty, tz]``
(Hamilton quaternion, scalar first — same convention as minkindr).  Using a
flat array instead of a class keeps everything a pytree leaf: poses vmap,
scan, shard and stack like any other tensor.

Tangent vectors are ``[..., 6]`` arrays ``[omega(3), v(3)]`` (rotation
first), matching the noise-sigma ordering of the reference configs
(laser_slam/configurations/config_example.yaml noise models).

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small-angle guard. Below this squared angle we switch to Taylor expansions.
_EPS2 = 1e-12


def identity(dtype=jnp.float32) -> jax.Array:
    """Identity pose7."""
    return jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], dtype=dtype)


def make(quat_wxyz, translation) -> jax.Array:
    """Assemble a pose7 from quaternion [...,4] and translation [...,3]."""
    return jnp.concatenate([quat_wxyz, translation], axis=-1)


def rotation(pose7) -> jax.Array:
    """Quaternion part [...,4] (wxyz)."""
    return pose7[..., :4]


def translation(pose7) -> jax.Array:
    """Translation part [...,3]."""
    return pose7[..., 4:]


# ---------------------------------------------------------------------------
# Quaternion algebra (Hamilton, wxyz)
# ---------------------------------------------------------------------------

def quat_multiply(q1, q2) -> jax.Array:
    """Hamilton product q1 * q2, both [...,4] wxyz."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q) -> jax.Array:
    """Unit-normalize, canonicalized to qw >= 0 (double cover)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_rotate(q, v) -> jax.Array:
    """Rotate vectors v [...,3] by quaternion q [...,4].

    Uses the expanded form (2 cross products) — cheaper than building the
    rotation matrix for a single vector and fully fusable.
    """
    qw = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_matrix(q) -> jax.Array:
    """Quaternion [...,4] -> rotation matrix [...,3,3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_from_matrix(m) -> jax.Array:
    """Rotation matrix [...,3,3] -> quaternion [...,4] (wxyz, qw>=0).

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select the numerically best (largest pivot), so it is safe under jit/vmap.
    Replaces minkindr ``SO3::constructAndRenormalize`` +
    ``fromApproximateRotationMatrix`` (common.hpp:263-269,
    laser_slam_worker.cpp:151-152); callers should ``orthonormalize`` first
    if the matrix may be non-orthogonal.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the largest.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-24))

    qw0 = safe_sqrt(1.0 + tr)  # pivot w
    cand0 = jnp.stack([qw0, (m21 - m12) / qw0, (m02 - m20) / qw0,
                       (m10 - m01) / qw0], axis=-1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22)  # pivot x
    cand1 = jnp.stack([(m21 - m12) / qx1, qx1, (m01 + m10) / qx1,
                       (m02 + m20) / qx1], axis=-1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22)  # pivot y
    cand2 = jnp.stack([(m02 - m20) / qy2, (m01 + m10) / qy2, qy2,
                       (m12 + m21) / qy2], axis=-1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22)  # pivot z
    cand3 = jnp.stack([(m10 - m01) / qz3, (m02 + m20) / qz3,
                       (m12 + m21) / qz3, qz3], axis=-1)

    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22,
                        -m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([cand0, cand1, cand2, cand3], axis=-2)  # [...,4,4]
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    return quat_normalize(0.5 * q)


# ---------------------------------------------------------------------------
# SO(3) exp / log
# ---------------------------------------------------------------------------

def so3_exp_quat(omega) -> jax.Array:
    """Rotation vector [...,3] -> quaternion [...,4].

    NaN-safe under differentiation at omega == 0 (double-where pattern:
    the singular branch never sees the singular input).
    """
    theta2 = jnp.sum(omega * omega, axis=-1, keepdims=True)
    small = theta2 < _EPS2
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    half = 0.5 * theta
    # sin(t/2)/t -> 1/2 - t^2/48 for small t
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * omega], axis=-1)


def so3_log(q) -> jax.Array:
    """Quaternion [...,4] -> rotation vector [...,3].

    NaN-safe under differentiation at the identity quaternion.
    """
    q = jnp.where(q[..., :1] < 0, -q, q)  # canonical hemisphere
    qv = q[..., 1:]
    sin2 = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = sin2 < _EPS2
    sin_half = jnp.sqrt(jnp.where(small, 1.0, sin2))
    cos_half = q[..., :1]
    half = jnp.arctan2(jnp.where(small, 0.0, sin_half), cos_half)
    # scale = theta / sin(theta/2); with u = theta/2 and sin2 = sin^2(u),
    # 2u/sin(u) = 2/(1 - u^2/6 + ...) ~ 2 + u^2/3 ~ 2 + sin2/3.
    scale = jnp.where(small, 2.0 + sin2 / 3.0,
                      2.0 * half / sin_half)
    return scale * qv


def _hat(omega) -> jax.Array:
    """[...,3] -> skew matrix [...,3,3]."""
    o = jnp.zeros(omega.shape[:-1], omega.dtype)
    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    m = jnp.stack([o, -wz, wy, wz, o, -wx, -wy, wx, o], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def _left_jacobian(omega) -> jax.Array:
    """SO(3) left Jacobian V(omega) [...,3,3]: t = V @ rho in SE(3) exp.

    NaN-safe under differentiation at omega == 0.
    """
    theta2 = jnp.sum(omega * omega, axis=-1)[..., None, None]
    small = theta2 < _EPS2
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    K = _hat(omega)
    K2 = K @ K
    a = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / theta2_safe)
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2_safe * theta))
    eye = jnp.eye(3, dtype=omega.dtype)
    return eye + a * K + b * K2


def _left_jacobian_inv(omega) -> jax.Array:
    """Inverse of the SO(3) left Jacobian, [...,3,3].

    NaN-safe under differentiation at omega == 0.
    """
    theta2 = jnp.sum(omega * omega, axis=-1)[..., None, None]
    small = theta2 < _EPS2
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    K = _hat(omega)
    K2 = K @ K
    half = 0.5 * theta
    sin_half = jnp.sin(half)
    sin_half_safe = jnp.where(small, 1.0, sin_half)
    # (1/theta^2) * (1 - theta/2 * cot(theta/2)) -> 1/12 + theta^2/720
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / sin_half_safe) / theta2_safe,
    )
    eye = jnp.eye(3, dtype=omega.dtype)
    return eye - 0.5 * K + cot_term * K2


# ---------------------------------------------------------------------------
# SE(3) group operations
# ---------------------------------------------------------------------------

def compose(a, b) -> jax.Array:
    """a * b for pose7 arrays (first apply b, then a)."""
    q = quat_multiply(rotation(a), rotation(b))
    t = translation(a) + quat_rotate(rotation(a), translation(b))
    return make(q, t)


def inverse(p) -> jax.Array:
    """Group inverse of pose7."""
    qi = quat_conjugate(rotation(p))
    return make(qi, -quat_rotate(qi, translation(p)))


def apply(p, pts) -> jax.Array:
    """Transform points by pose7 (R @ x + t).

    Leading dims broadcast: ``apply(pose7[7], pts[N,3])`` works directly;
    for batched poses against per-pose point sets write
    ``apply(poses[:, None, :], pts[B, N, 3])``.
    """
    return quat_rotate(rotation(p), pts) + translation(p)


def exp(xi) -> jax.Array:
    """SE(3) exponential: tangent [...,6] ([omega, v]) -> pose7."""
    omega = xi[..., :3]
    v = xi[..., 3:]
    q = so3_exp_quat(omega)
    t = jnp.einsum('...ij,...j->...i', _left_jacobian(omega), v)
    return make(q, t)


def log(p) -> jax.Array:
    """SE(3) logarithm: pose7 -> tangent [...,6] ([omega, v])."""
    omega = so3_log(rotation(p))
    v = jnp.einsum('...ij,...j->...i', _left_jacobian_inv(omega),
                   translation(p))
    return jnp.concatenate([omega, v], axis=-1)


def retract(p, xi) -> jax.Array:
    """Right-multiplicative retraction p * exp(xi) used by the solvers."""
    return compose(p, exp(xi))


def local(a, b) -> jax.Array:
    """Tangent of b in the frame of a: log(a^-1 * b)."""
    return log(compose(inverse(a), b))


def to_matrix(p) -> jax.Array:
    """pose7 -> homogeneous [...,4,4]."""
    R = quat_to_matrix(rotation(p))
    t = translation(p)[..., :, None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=p.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(m) -> jax.Array:
    """Homogeneous [...,4,4] (or [...,3,4]) -> pose7.

    Re-orthonormalizes the rotation block first, replacing the reference's
    ``correctTransformationMatrix`` (common.hpp:136-149) +
    ``convertTransformationMatrixToSE3`` (common.hpp:263-269).
    """
    R = orthonormalize(m[..., :3, :3])
    return make(quat_from_matrix(R), m[..., :3, 3])


def orthonormalize(R) -> jax.Array:
    """Project [...,3,3] onto SO(3) via SVD polar projection."""
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    # Flip the last singular direction if improper (det = -1).
    fix = jnp.concatenate(
        [jnp.ones(R.shape[:-2] + (2,), R.dtype), det[..., None]], axis=-1)
    return (u * fix[..., None, :]) @ vt


def normalize(p) -> jax.Array:
    """Renormalize the quaternion of a pose7 (drift control)."""
    return make(quat_normalize(rotation(p)), translation(p))


def translation_distance(a, b) -> jax.Array:
    """Euclidean distance between the translations of two poses.

    Mirrors ``distanceBetweenTwoSE3`` (common.hpp:271-279) which the worker
    uses for its minimum-distance scan gate (laser_slam_worker.cpp:115).
    """
    return jnp.linalg.norm(translation(a) - translation(b), axis=-1)


def rotation_angle(a, b) -> jax.Array:
    """Absolute rotation angle (rad) between two poses' orientations."""
    return jnp.linalg.norm(so3_log(quat_multiply(
        quat_conjugate(rotation(a)), rotation(b))), axis=-1)
