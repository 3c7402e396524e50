"""Pallas NN kernel tests (interpret mode on CPU) vs the brute matcher."""

import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.config import IcpConfig
from laser_slam_tpu.ops import cloud as pc
from laser_slam_tpu.ops import icp as icp_mod
from laser_slam_tpu.ops import neighbors as nb
from laser_slam_tpu.ops import pallas_nn
from laser_slam_tpu.ops import se3


def test_nn_indices_matches_brute(rng):
    ref = rng.normal(size=(4096, 3)).astype(np.float32) * 5
    q = rng.normal(size=(512, 3)).astype(np.float32) * 5
    d2, idx = pallas_nn.nn_indices(jnp.asarray(q), jnp.asarray(ref),
                                   interpret=True)
    bi, bd2 = nb.nn_brute(jnp.asarray(q), jnp.asarray(ref))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(bi))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(bd2), atol=1e-3)


def test_nn_indices_awkward_shapes(rng):
    """Shapes that don't divide the preferred 256x2048 tiles still work
    (the tile picker falls back to divisors)."""
    ref = rng.normal(size=(1536, 3)).astype(np.float32) * 5
    q = rng.normal(size=(192, 3)).astype(np.float32) * 5
    d2, idx = pallas_nn.nn_indices(jnp.asarray(q), jnp.asarray(ref),
                                   interpret=True)
    bi, bd2 = nb.nn_brute(jnp.asarray(q), jnp.asarray(ref))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(bi))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(bd2), atol=1e-3)


def test_nn_indices_ignores_parked_ref(rng):
    """SENTINEL-parked reference rows can never win for a real query."""
    ref_valid = rng.normal(size=(100, 3)).astype(np.float32)
    ref = pc.make_cloud(ref_valid, capacity=128)
    q = jnp.asarray(ref_valid[:64] + 0.01)
    d2, idx = pallas_nn.nn_indices(q, ref.points, interpret=True)
    assert np.all(np.asarray(idx) < 100)
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
