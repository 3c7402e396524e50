"""Range-image projective correspondence tests."""

import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.config import IcpConfig
from laser_slam_tpu.ops import cloud as pc
from laser_slam_tpu.ops import icp as icp_mod
from laser_slam_tpu.ops import range_image as ri
from laser_slam_tpu.ops import se3


def lidar_scene(rng, n=2048):
    """Cylindrical-wall scene seen from the origin (LiDAR-like geometry)."""
    az = rng.uniform(-np.pi, np.pi, n)
    r = rng.uniform(8, 25, n)
    z = rng.uniform(-1.0, 2.0, n)
    return np.stack([r * np.cos(az), r * np.sin(az), z], 1).astype(
        np.float32)


def test_render_and_query_self(rng):
    pts = lidar_scene(rng)
    ref = pc.make_cloud(pts, capacity=2048)
    normals = pc.estimate_normals(ref, knn=8)
    img = ri.build_range_image(ref, normals, rows=32, cols=512)
    # Query with the reference itself: the correspondence should be the
    # point itself (d2 ~ 0) for pixel-winning points.
    q, n, d2 = ri.nn_projective(ref.points, img)
    frac_exact = np.mean(np.asarray(d2) < 1e-6)
    assert frac_exact > 0.5, frac_exact
    # Non-winners still find a close neighbor through the 3x3 window.
    assert np.median(np.asarray(d2)) < 1.0


def test_projective_matches_displaced_points(rng):
    pts = lidar_scene(rng)
    ref = pc.make_cloud(pts, capacity=2048)
    normals = pc.estimate_normals(ref, knn=8)
    img = ri.build_range_image(ref, normals, rows=32, cols=512)
    queries = jnp.asarray(pts + rng.normal(size=pts.shape).astype(
        np.float32) * 0.05)
    q, n, d2 = ri.nn_projective(queries, img)
    # Most queries find a correspondence within tens of cm (the image is
    # sparse for this synthetic scene: 2k points over 16k pixels).
    assert np.mean(np.sqrt(np.asarray(d2)) < 0.5) > 0.8


def test_icp_projective_recovers_transform(rng):
    pts = lidar_scene(rng, n=4096)
    ref = pc.make_cloud(pts, capacity=4096)
    normals = pc.estimate_normals(ref, knn=10)
    T_true = se3.exp(jnp.asarray([0.01, -0.01, 0.03, 0.3, -0.2, 0.05],
                                 jnp.float32))
    reading = pc.transform(se3.inverse(T_true), ref)
    cfg = IcpConfig(matcher='projective', range_image_rows=32,
                    range_image_cols=512,
                    range_image_elev_min=-0.3, range_image_elev_max=0.3)
    res = icp_mod.icp(reading, ref, normals, se3.identity(), cfg)
    assert bool(res.valid)
    err_t = np.linalg.norm(np.asarray(
        se3.translation(res.T) - se3.translation(T_true)))
    err_r = float(se3.rotation_angle(res.T, T_true))
    assert err_t < 0.02, err_t
    assert err_r < 0.01, err_r


def test_projective_parity_with_brute(rng):
    """The fast path must agree with the exact matcher's ICP result."""
    pts = lidar_scene(rng, n=4096)
    ref = pc.make_cloud(pts, capacity=4096)
    normals = pc.estimate_normals(ref, knn=10)
    T_true = se3.exp(jnp.asarray([0, 0, 0.02, 0.2, 0.1, 0.0], jnp.float32))
    reading = pc.transform(se3.inverse(T_true), ref)
    cfg_p = IcpConfig(matcher='projective', range_image_rows=32,
                      range_image_cols=512,
                      range_image_elev_min=-0.3, range_image_elev_max=0.3)
    cfg_b = IcpConfig(matcher='brute')
    res_p = icp_mod.icp(reading, ref, normals, se3.identity(), cfg_p)
    res_b = icp_mod.icp(reading, ref, normals, se3.identity(), cfg_b)
    # Both near ground truth and within mm/mrad of each other.
    d = np.linalg.norm(np.asarray(se3.translation(res_p.T) -
                                  se3.translation(res_b.T)))
    assert d < 5e-3, d


def test_image_pca_normals_plane(rng):
    """PCA-over-window normals recover plane normals like kNN PCA."""
    xy = rng.uniform(-5, 5, size=(1024, 2))
    pts = np.concatenate([xy, np.zeros((1024, 1))], axis=1).astype(
        np.float32)
    pts[:, 2] -= 1.0  # sensor above the plane
    c = pc.make_cloud(pts, capacity=1024)
    normals = ri.range_image_pca_normals(c, rows=16, cols=128,
                                         elev_min=-1.2, elev_max=0.2)
    nz = np.abs(np.asarray(normals)[:, 2])
    assert np.mean(nz > 0.98) > 0.85, np.mean(nz > 0.98)


def test_image_pca_vs_knn_accuracy(rng):
    """Quantify the accuracy delta behind the 'auto' normal default.

    On a dense (16k-point) scan of true surfaces (ground plane + cylinder
    wall — unlike lidar_scene's volumetric shell, where normals are
    ill-defined for ANY estimator) the range-image PCA normals must agree
    with the kNN PCA reference closely enough that the ICP solutions they
    produce differ by millimeters.
    """
    n = 16384
    half = n // 2
    az_g = rng.uniform(-np.pi, np.pi, half)
    r_g = rng.uniform(3, 18, half)
    ground = np.stack([r_g * np.cos(az_g), r_g * np.sin(az_g),
                       np.full(half, -1.5)], 1)
    az_w = rng.uniform(-np.pi, np.pi, n - half)
    z_w = rng.uniform(-1.5, 3.0, n - half)
    wall = np.stack([20.0 * np.cos(az_w), 20.0 * np.sin(az_w), z_w], 1)
    pts = np.concatenate([ground, wall]).astype(np.float32)
    ref = pc.make_cloud(pts, capacity=16384)
    n_knn = pc.estimate_normals(ref, knn=10)
    n_img = ri.range_image_pca_normals(ref, rows=32, cols=512,
                                       elev_min=-0.3, elev_max=0.3)
    # Per-point angular agreement (sign-invariant).
    cosang = np.abs(np.sum(np.asarray(n_knn) * np.asarray(n_img), axis=-1))
    median_deg = float(np.degrees(np.arccos(np.clip(
        np.median(cosang), -1, 1))))
    assert median_deg < 10.0, median_deg

    # ICP end metric: both normal sets must yield the same registration.
    T_true = se3.exp(jnp.asarray([0.005, -0.01, 0.02, 0.2, -0.1, 0.05],
                                 jnp.float32))
    reading = pc.transform(se3.inverse(T_true), ref)
    cfg = IcpConfig(matcher='brute', reading_capacity=4096,
                    reading_sampling_ratio=0.25)
    res_knn = icp_mod.icp(reading, ref, n_knn, se3.identity(), cfg)
    res_img = icp_mod.icp(reading, ref, n_img, se3.identity(), cfg)
    d = np.linalg.norm(np.asarray(se3.translation(res_knn.T) -
                                  se3.translation(res_img.T)))
    assert d < 5e-3, d
    ang = float(se3.rotation_angle(res_knn.T, res_img.T))
    assert ang < 2e-3, ang


def test_compute_normals_auto_dispatch(rng):
    """'auto' picks image_pca for dense scans, knn for small ones."""
    cfg = IcpConfig(normal_method='auto', normal_image_rows=32,
                    normal_image_cols=512,
                    range_image_elev_min=-0.3, range_image_elev_max=0.3)
    small = pc.make_cloud(lidar_scene(rng, n=1024), capacity=1024)
    got = ri.compute_normals(small, cfg)
    want = pc.estimate_normals(small, knn=cfg.normal_knn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    dense = pc.make_cloud(lidar_scene(rng, n=8192), capacity=8192)
    got_d = ri.compute_normals(dense, cfg)
    want_d = ri.range_image_pca_normals(
        dense, rows=32, cols=512, elev_min=-0.3, elev_max=0.3)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               atol=1e-6)


def test_icp_with_image_pca_normals(rng):
    pts = lidar_scene(rng, n=4096)
    ref = pc.make_cloud(pts, capacity=4096)
    normals = ri.range_image_pca_normals(ref, rows=32, cols=512,
                                         elev_min=-0.3, elev_max=0.3)
    T_true = se3.exp(jnp.asarray([0.01, -0.01, 0.02, 0.2, -0.1, 0.05],
                                 jnp.float32))
    reading = pc.transform(se3.inverse(T_true), ref)
    cfg = IcpConfig(matcher='brute')
    res = icp_mod.icp(reading, ref, normals, se3.identity(), cfg)
    assert bool(res.valid)
    err_t = np.linalg.norm(np.asarray(
        se3.translation(res.T) - se3.translation(T_true)))
    assert err_t < 0.03, err_t
