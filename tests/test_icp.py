"""ICP tests: recovery of known rigid transforms on synthetic scenes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_slam_tpu.config import IcpConfig
from laser_slam_tpu.ops import cloud as pc
from laser_slam_tpu.ops import icp as icp_mod
from laser_slam_tpu.ops import neighbors as nb
from laser_slam_tpu.ops import se3


def synthetic_scene(rng, n=1024):
    """A structured scene: floor + two walls + a box (plane-rich for
    point-to-plane)."""
    n4 = n // 4
    floor = np.stack([rng.uniform(-10, 10, n4), rng.uniform(-10, 10, n4),
                      np.zeros(n4)], axis=1)
    wall1 = np.stack([rng.uniform(-10, 10, n4), np.full(n4, 10.0),
                      rng.uniform(0, 5, n4)], axis=1)
    wall2 = np.stack([np.full(n4, -10.0), rng.uniform(-10, 10, n4),
                      rng.uniform(0, 5, n4)], axis=1)
    box = np.stack([rng.uniform(2, 4, n - 3 * n4),
                    rng.uniform(2, 4, n - 3 * n4),
                    np.full(n - 3 * n4, 2.0)], axis=1)
    pts = np.concatenate([floor, wall1, wall2, box]).astype(np.float32)
    # Lift the sensor off the floor for normal orientation determinism.
    pts[:, 2] -= 1.0
    return pts


@pytest.mark.parametrize('matcher', ['brute', 'pallas'])
def test_icp_recovers_transform(rng, matcher):
    pts = synthetic_scene(rng)
    ref = pc.make_cloud(pts, capacity=1024)
    normals = pc.estimate_normals(ref, knn=10)

    # Ground-truth motion: small rotation + translation.
    xi_true = jnp.asarray([0.02, -0.03, 0.05, 0.3, -0.2, 0.1], jnp.float32)
    T_true = se3.exp(xi_true)
    # reading = T_true^-1 applied to ref, so aligning reading->ref recovers T_true
    reading = pc.transform(se3.inverse(T_true), ref)

    config = IcpConfig(matcher=matcher,
                       max_correspondence_dist_m=3.0)
    result = icp_mod.icp(reading, ref, normals, se3.identity(), config)

    assert bool(result.valid)
    err_t = np.linalg.norm(np.asarray(
        se3.translation(result.T) - se3.translation(T_true)))
    err_r = float(se3.rotation_angle(result.T, T_true))
    assert err_t < 0.01, (err_t, np.asarray(result.T))
    assert err_r < 0.005, err_r
    assert int(result.iterations) < 40  # differential checker fired


def test_icp_with_noise_and_partial_overlap(rng):
    pts = synthetic_scene(rng, n=2048)
    ref = pc.make_cloud(pts, capacity=2048)
    normals = pc.estimate_normals(ref, knn=10)

    xi_true = jnp.asarray([0.0, 0.0, 0.03, 0.5, 0.2, 0.0], jnp.float32)
    T_true = se3.exp(xi_true)
    noisy = pts + rng.normal(size=pts.shape).astype(np.float32) * 0.02
    # Drop 25% of the points to simulate partial overlap.
    keep = rng.uniform(size=2048) > 0.25
    reading_cloud = pc.make_cloud(noisy[keep], capacity=2048)
    reading = pc.transform(se3.inverse(T_true), reading_cloud)

    config = IcpConfig(matcher='brute')
    result = icp_mod.icp(reading, ref, normals, se3.identity(), config)
    assert bool(result.valid)
    err_t = np.linalg.norm(np.asarray(
        se3.translation(result.T) - se3.translation(T_true)))
    assert err_t < 0.05, err_t


def test_icp_failure_returns_initial_guess(rng):
    # Reference far away from reading: no correspondences in range.
    ref = pc.make_cloud(rng.normal(size=(256, 3)).astype(np.float32) + 500.0,
                        capacity=256)
    normals = pc.estimate_normals(ref, knn=5)
    reading = pc.make_cloud(rng.normal(size=(256, 3)).astype(np.float32),
                            capacity=256)
    guess = se3.exp(jnp.asarray([0, 0, 0, 1.0, 2.0, 3.0], jnp.float32))
    config = IcpConfig(matcher='brute', max_correspondence_dist_m=1.0)
    result = icp_mod.icp(reading, ref, normals, guess, config)
    assert not bool(result.valid)
    np.testing.assert_allclose(result.T, guess, atol=1e-6)


def test_icp_vmap_batch(rng):
    """Fleet mode: a batch of independent ICP problems solved via vmap."""
    pts = synthetic_scene(rng)
    ref = pc.make_cloud(pts, capacity=1024)
    normals = pc.estimate_normals(ref, knn=10)

    xis = jnp.asarray(rng.normal(size=(4, 6)) * 0.05, jnp.float32)
    T_true = se3.exp(xis)
    readings = jax.vmap(lambda T: pc.transform(se3.inverse(T), ref))(T_true)

    config = IcpConfig(matcher='brute')
    solve = jax.vmap(lambda r: icp_mod.icp_point_to_plane(
        r, ref, normals, se3.identity(), config))
    results = solve(readings)
    assert np.all(np.asarray(results.valid))
    err = np.linalg.norm(np.asarray(
        se3.translation(results.T) - se3.translation(T_true)), axis=-1)
    assert np.all(err < 0.02), err


def test_trim_histogram_approximates_sort(rng):
    import jax.numpy as jnp
    from laser_slam_tpu.ops.icp import _trim_mask
    d2 = jnp.asarray(rng.uniform(0, 4.0, 4096).astype(np.float32) ** 2)
    valid = jnp.asarray(rng.uniform(size=4096) > 0.1)
    exact = _trim_mask(d2, valid, 0.75, method='sort')
    approx = _trim_mask(d2, valid, 0.75, method='histogram', d2_max=16.0)
    n_exact = int(jnp.sum(exact))
    n_approx = int(jnp.sum(approx))
    # Conservative: keeps at least the exact set size, within a bin's worth.
    assert n_approx >= n_exact
    assert n_approx <= n_exact * 1.05 + 32
    # Everything the exact trim keeps is kept by the approximation.
    assert bool(jnp.all(~exact | approx))


def test_icp_fast_config_matches_exact(rng):
    """histogram trim + cross window must preserve registration quality."""
    pts = synthetic_scene(rng, n=2048)
    ref = pc.make_cloud(pts, capacity=2048)
    normals = pc.estimate_normals(ref, knn=10)
    T_true = se3.exp(jnp.asarray([0.01, -0.02, 0.03, 0.25, -0.15, 0.05],
                                 jnp.float32))
    reading = pc.transform(se3.inverse(T_true), ref)
    fast = IcpConfig(matcher='projective', trim_method='histogram',
                     range_image_window='cross', range_image_rows=32,
                     range_image_cols=512, range_image_elev_min=-0.4,
                     range_image_elev_max=0.4)
    res = icp_mod.icp(reading, ref, normals, se3.identity(), fast)
    assert bool(res.valid)
    err_t = np.linalg.norm(np.asarray(
        se3.translation(res.T) - se3.translation(T_true)))
    assert err_t < 0.02, err_t
