"""Tests for brute-force and grid-hash NN search vs scipy cKDTree."""

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


def test_grid_hash_nn(rng):
    ref_pts = rng.uniform(-20, 20, size=(2000, 3)).astype(np.float32)
    ref = pc.make_cloud(ref_pts, capacity=2048)
    grid = nb.build_grid(ref, cell_size_m=2.0, n_cells=4096,
                         cell_capacity=32)
    # Queries near reference points: the true NN is within one cell.
    q = ref_pts[:500] + rng.normal(size=(500, 3)).astype(np.float32) * 0.1
    idx, d2 = nb.nn_grid(jnp.asarray(q), ref, grid)
    tree = cKDTree(ref_pts)
    want_d, want_i = tree.query(q)
    # Grid NN is exact when the neighbor is within a cell: expect near-total
    # agreement (collision-dropped points can cause rare mismatches).
    agree = np.mean(np.asarray(idx) == want_i)
    assert agree > 0.97, agree
    match = np.asarray(idx) == want_i
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)[match]),
                               want_d[match], atol=1e-3)


def test_grid_nn_far_query_returns_sentinel(rng):
    ref_pts = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    ref = pc.make_cloud(ref_pts, capacity=128)
    grid = nb.build_grid(ref, cell_size_m=1.0, n_cells=512, cell_capacity=8)
    q = jnp.asarray([[1000.0, 1000.0, 1000.0]], jnp.float32)
    idx, d2 = nb.nn_grid(q, ref, grid)
    # No candidate nearby: distance is huge (sentinel), callers mask on it.
    assert float(d2[0]) > 1e6
