"""Tests for brute-force NN search vs scipy cKDTree."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from laser_slam_tpu.ops import cloud as pc
from laser_slam_tpu.ops import neighbors as nb


def test_nn_brute_matches_kdtree(rng):
    ref = rng.normal(size=(1000, 3)).astype(np.float32) * 10
    q = rng.normal(size=(256, 3)).astype(np.float32) * 10
    idx, d2 = nb.nn_brute(jnp.asarray(q), jnp.asarray(ref),
                          q_tile=64, r_tile=250)
    tree = cKDTree(ref)
    want_d, want_i = tree.query(q)
    np.testing.assert_array_equal(idx, want_i)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), want_d, atol=1e-2)


def test_nn_brute_ignores_masked_ref(rng):
    ref_valid = rng.normal(size=(50, 3)).astype(np.float32)
    ref = pc.make_cloud(ref_valid, capacity=64)  # 14 sentinel slots
    q = ref_valid + 0.01
    idx, d2 = nb.nn_brute(jnp.asarray(q), ref.points, q_tile=50, r_tile=64)
    assert np.all(np.asarray(idx) < 50)


def test_knn_brute(rng):
    ref = rng.normal(size=(500, 3)).astype(np.float32) * 5
    q = rng.normal(size=(128, 3)).astype(np.float32) * 5
    idx, d2 = nb.knn_brute(jnp.asarray(q), jnp.asarray(ref), k=5, q_tile=128)
    tree = cKDTree(ref)
    want_d, want_i = tree.query(q, k=5)
    np.testing.assert_array_equal(np.sort(idx, axis=1), np.sort(want_i, axis=1))


