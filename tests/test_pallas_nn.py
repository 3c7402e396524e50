"""Pallas NN kernel tests (interpret mode on CPU) vs the brute matcher."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_slam_tpu.config import IcpConfig
from laser_slam_tpu.ops import cloud as pc
from laser_slam_tpu.ops import icp as icp_mod
from laser_slam_tpu.ops import neighbors as nb
from laser_slam_tpu.ops import pallas_nn
from laser_slam_tpu.ops import se3


def test_nn_payload_matches_brute(rng):
    R, Q = 2048, 256
    ref = rng.normal(size=(R, 3)).astype(np.float32) * 10
    q = rng.normal(size=(Q, 3)).astype(np.float32) * 10
    normals = rng.normal(size=(R, 3)).astype(np.float32)
    payload = np.concatenate([ref, normals], axis=1)

    d2, pay = pallas_nn.nn_payload(jnp.asarray(q), jnp.asarray(ref),
                                   jnp.asarray(payload), interpret=True)
    idx, d2_brute = nb.nn_brute(jnp.asarray(q), jnp.asarray(ref))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2_brute),
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(pay[:, :3]), ref[np.asarray(idx)],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(pay[:, 3:]),
                               normals[np.asarray(idx)], atol=1e-4)


def test_nn_payload_ignores_parked_ref(rng):
    ref_valid = rng.normal(size=(100, 3)).astype(np.float32)
    ref = pc.make_cloud(ref_valid, capacity=128)
    payload = jnp.concatenate(
        [ref.points, jnp.zeros((128, 3), jnp.float32)], axis=1)
    q = jnp.asarray(ref_valid[:64] + 0.01)
    d2, pay = pallas_nn.nn_payload(q, ref.points, payload, interpret=True)
    # Every selected payload point must be a real (non-sentinel) point.
    assert np.all(np.abs(np.asarray(pay[:, :3])) < 100.0)
    assert np.all(np.asarray(d2) < 1.0)


def test_icp_pallas_matcher_matches_brute(rng):
    n = 512
    n4 = n // 4
    pts = np.concatenate([
        np.stack([rng.uniform(-10, 10, n4), rng.uniform(-10, 10, n4),
                  np.zeros(n4)], 1),
        np.stack([rng.uniform(-10, 10, n4), np.full(n4, 10.0),
                  rng.uniform(0, 5, n4)], 1),
        np.stack([np.full(n4, -10.0), rng.uniform(-10, 10, n4),
                  rng.uniform(0, 5, n4)], 1),
        np.stack([rng.uniform(2, 4, n - 3 * n4), rng.uniform(2, 4, n - 3 * n4),
                  np.full(n - 3 * n4, 2.0)], 1),
    ]).astype(np.float32)
    pts[:, 2] -= 1.0
    ref = pc.make_cloud(pts, capacity=512)
    normals = pc.estimate_normals(ref, knn=10)
    T_true = se3.exp(jnp.asarray([0.02, -0.01, 0.04, 0.2, -0.1, 0.05],
                                 jnp.float32))
    reading = pc.transform(se3.inverse(T_true), ref)

    res_b = icp_mod.icp(reading, ref, normals, se3.identity(),
                        IcpConfig(matcher='brute'))
    res_p = icp_mod.icp(reading, ref, normals, se3.identity(),
                        IcpConfig(matcher='pallas'))
    assert bool(res_p.valid)
    # Same algorithm, same correspondences: results must agree closely.
    np.testing.assert_allclose(np.asarray(res_p.T), np.asarray(res_b.T),
                               atol=1e-3)
    err_t = np.linalg.norm(np.asarray(
        se3.translation(res_p.T) - se3.translation(T_true)))
    assert err_t < 0.01, err_t


def test_nn_indices_matches_brute(rng):
    from laser_slam_tpu.ops import neighbors as nb
    import jax.numpy as jnp
    ref = rng.normal(size=(4096, 3)).astype(np.float32) * 5
    q = rng.normal(size=(512, 3)).astype(np.float32) * 5
    d2, idx = pallas_nn.nn_indices(jnp.asarray(q), jnp.asarray(ref),
                                   interpret=True)
    bi, bd2 = nb.nn_brute(jnp.asarray(q), jnp.asarray(ref))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(bi))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(bd2), atol=1e-3)
