"""Tests for the padded point-cloud substrate and filters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_slam_tpu.ops import cloud as pc
from laser_slam_tpu.ops import se3


def make(rng, n=100, cap=128, scale=10.0):
    pts = rng.normal(size=(n, 3)) * scale
    return pc.make_cloud(pts, capacity=cap), pts


def test_make_cloud_pads_and_parks(rng):
    c, pts = make(rng)
    assert c.capacity == 128
    assert int(c.count()) == 100
    np.testing.assert_allclose(c.points[:100], pts, rtol=1e-6)
    assert np.all(np.asarray(c.points[100:]) == pc.SENTINEL)


def test_transform_preserves_mask(rng):
    c, pts = make(rng)
    p = se3.exp(jnp.asarray([0.1, -0.2, 0.3, 1.0, 2.0, 3.0], jnp.float32))
    ct = pc.transform(p, c)
    np.testing.assert_allclose(ct.points[:100], se3.apply(p, c.points[:100]),
                               rtol=1e-5)
    assert np.all(np.asarray(ct.points[100:]) == pc.SENTINEL)


def test_range_filter(rng):
    pts = np.array([[0.1, 0, 0], [5, 0, 0], [100, 0, 0]])
    c = pc.make_cloud(pts)
    out = pc.range_filter(c, min_dist=1.0, max_dist=50.0)
    np.testing.assert_array_equal(out.mask, [False, True, False])


def test_random_sampling_filter(rng):
    c, _ = make(rng, n=1000, cap=1024)
    out = pc.random_sampling_filter(c, 0.5, jax.random.key(0))
    frac = int(out.count()) / 1000
    assert 0.4 < frac < 0.6


def test_cylindrical_filter():
    pts = np.array([[1, 0, 0], [10, 0, 0], [1, 0, 30]], float)
    c = pc.make_cloud(pts)
    inside = pc.cylindrical_filter(c, jnp.zeros(3), 5.0, 40.0, False)
    np.testing.assert_array_equal(inside.mask, [True, False, False])
    outside = pc.cylindrical_filter(c, jnp.zeros(3), 5.0, 40.0, True)
    np.testing.assert_array_equal(outside.mask, [False, True, True])


def test_voxel_filter_dedups(rng):
    # Two clusters of near-identical points plus one isolated point.
    # Cluster centers inside voxel cells (not on boundaries).
    base = np.array([[0.25, 0.25, 0.25], [5.25, 5.25, 5.25]])
    pts = np.concatenate([
        base[0] + rng.normal(size=(20, 3)) * 0.005,
        base[1] + rng.normal(size=(20, 3)) * 0.005,
        [[20.0, 20.0, 20.0]],
    ])
    c = pc.make_cloud(pts, capacity=64)
    out = pc.voxel_filter(c, voxel_size_m=0.5)
    assert int(out.count()) == 3
    out2 = pc.voxel_filter(c, voxel_size_m=0.5, min_points_per_voxel=5)
    assert int(out2.count()) == 2  # isolated point dropped


def test_concatenate_and_compact(rng):
    c1, _ = make(rng, n=10, cap=16)
    c2, _ = make(rng, n=20, cap=32)
    cat = pc.concatenate([c1, c2], capacity=64)
    assert cat.capacity == 64
    assert int(cat.count()) == 30
    # Valid points are packed to the front.
    assert np.all(np.asarray(cat.mask[:30]))
    small = pc.compact(cat, 16)
    assert int(small.count()) == 16


def test_ground_filter():
    pts = np.array([[0, 0, -1.0], [0, 0, 1.0]])
    c = pc.make_cloud(pts)
    out = pc.ground_filter(c, robot_height_m=0.0, ground_clearance_m=0.5)
    np.testing.assert_array_equal(out.mask, [False, True])


def test_estimate_normals_plane(rng):
    # Points on the z=0 plane -> normals along +/- z.
    xy = rng.uniform(-5, 5, size=(256, 2))
    pts = np.concatenate([xy, np.zeros((256, 1))], axis=1)
    # Sensor above the plane so orientation is deterministic.
    pts[:, 2] -= 1.0
    c = pc.make_cloud(pts, capacity=256)
    normals = pc.estimate_normals(c, knn=8)
    nz = np.abs(np.asarray(normals)[:, 2])
    assert np.mean(nz > 0.99) > 0.95


def test_estimate_normals_masked(rng):
    c, _ = make(rng, n=50, cap=64)
    normals = pc.estimate_normals(c, knn=6)
    assert normals.shape == (64, 3)
    assert np.all(np.isfinite(np.asarray(normals)))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(normals)[:50],
                                              axis=1), 1.0, atol=1e-4)


class TestFilterChain:
    """Configurable ordered input-filter chain (laser_track.cpp:24-30
    contract: arbitrary ordered filters from YAML, fail-loudly)."""

    def test_chain_canonicalization_and_yaml_roundtrip(self, tmp_path, rng):
        import os
        import laser_slam_tpu.config as cfg_mod
        cfg = cfg_mod.Config(estimator=cfg_mod.EstimatorConfig(
            laser_track=cfg_mod.LaserTrackConfig(
                input_filters=cfg_mod.InputFilterConfig(
                    scan_capacity=256,
                    chain=[{'type': 'range', 'min_distance_m': 1.0,
                            'max_distance_m': 50.0},
                           {'type': 'random_sampling', 'prob': 0.5},
                           {'type': 'voxel', 'voxel_size_m': 0.2}]))))
        chain = cfg.estimator.laser_track.input_filters.chain
        assert chain[0][0] == 'range' and chain[2][0] == 'voxel'
        path = os.path.join(tmp_path, 'c.yaml')
        cfg_mod.save_config(cfg, path)
        cfg2 = cfg_mod.load_config(path)
        assert cfg2.estimator.laser_track.input_filters.chain == chain

    def test_chain_order_sensitivity(self, rng):
        import jax
        from laser_slam_tpu.config import _canonical_chain
        from laser_slam_tpu.ops import cloud as pc
        pts = rng.normal(size=(512, 3)).astype(np.float32) * 5.0
        c = pc.make_cloud(pts)
        key = jax.random.key(0)
        a = [{'type': 'random_sampling', 'prob': 0.3},
             {'type': 'voxel', 'voxel_size_m': 1.0,
              'min_points_per_voxel': 2}]
        b = list(reversed(a))
        ca = pc.apply_filter_chain(c, _canonical_chain(a), key)
        cb = pc.apply_filter_chain(c, _canonical_chain(b), key)
        # voxel(min=2) after sampling sees thinned voxels; before, it
        # keeps one point per dense voxel and sampling thins those ->
        # different survivors.
        assert int(ca.count()) != int(cb.count())

    def test_unknown_filter_rejected(self):
        from laser_slam_tpu.config import InputFilterConfig
        with pytest.raises(ValueError, match='unknown input filter'):
            InputFilterConfig(chain=[{'type': 'bogus'}])
        with pytest.raises(ValueError, match='unknown parameter'):
            InputFilterConfig(chain=[{'type': 'range', 'nope': 1}])

    def test_missing_chain_file_fatal(self, tmp_path):
        import os
        from laser_slam_tpu.config import InputFilterConfig
        with pytest.raises(FileNotFoundError):
            InputFilterConfig(chain_file=os.path.join(tmp_path, 'none.yaml'))

    def test_chain_file_loads(self, tmp_path):
        import os
        from laser_slam_tpu.config import InputFilterConfig
        path = os.path.join(tmp_path, 'filters.yaml')
        with open(path, 'w') as f:
            f.write('- {type: range, min_distance_m: 2.0}\n'
                    '- {type: ground, robot_height_m: 1.5}\n')
        cfg = InputFilterConfig(chain_file=path)
        assert [e[0] for e in cfg.chain] == ['range', 'ground']

    def test_chain_drives_ingest(self, rng):
        """A box filter in the chain must shape what LaserTrack stores."""
        from laser_slam_tpu.config import (IcpConfig, InputFilterConfig,
                                           LaserTrackConfig)
        from laser_slam_tpu.core.laser_track import _ingest_scan
        import jax
        import jax.numpy as jnp
        from laser_slam_tpu.ops import cloud as pc
        pts = rng.uniform(-10, 10, size=(256, 3)).astype(np.float32)
        cfg = LaserTrackConfig(
            input_filters=InputFilterConfig(
                scan_capacity=256,
                chain=[{'type': 'box', 'center': [0.0, 0.0, 0.0],
                        'half_extent': [5.0, 5.0, 5.0]}]),
            icp=IcpConfig(normal_knn=4))
        c, _ = _ingest_scan(jnp.asarray(pts), 256, jax.random.key(0), cfg)
        kept = np.asarray(c.points)[np.asarray(c.mask)]
        assert kept.shape[0] == int((np.abs(pts) <= 5.0).all(axis=1).sum())
        assert np.all(np.abs(kept) <= 5.0)


def test_compact_decimate_even_coverage():
    """compact_decimate spreads an over-capacity structured scan evenly
    (a ring-major beam scan prefix-compacted would keep only the top
    rings — the measured 1.5 m KITTI-density drift bug)."""
    import jax.numpy as jnp
    n, cap = 4096, 512
    # 'ring-major' scan: point i's z encodes its ring (i // 64).
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = 10.0
    pts[:, 2] = np.repeat(np.arange(64), 64).astype(np.float32)
    mask = np.ones((n,), bool)
    mask[::7] = False  # some dropouts
    c = pc.Cloud(jnp.asarray(pts), jnp.asarray(mask))
    d = pc.compact_decimate(c, cap)
    assert d.capacity == cap
    zs = np.asarray(d.points)[np.asarray(d.mask), 2]
    assert len(zs) == cap
    # Every ring bucket survives (plain compact would keep rings 0-9).
    assert len(np.unique(zs)) > 56
    # Under-capacity case: identity compaction.
    mask2 = np.zeros((n,), bool)
    mask2[: cap // 2] = True
    c2 = pc.Cloud(jnp.asarray(pts), jnp.asarray(mask2))
    d2 = pc.compact_decimate(c2, cap)
    assert int(np.asarray(d2.mask).sum()) == cap // 2
    np.testing.assert_array_equal(np.asarray(d2.points)[: cap // 2],
                                  pts[: cap // 2])
