"""Packed (sensor-native uint16 range-image) ingest path.

The xyz ingest uploads 12 B/point; the packed path uploads the sensor's
own 2 B/point range words and decodes spherical->Cartesian on device
(ops/spherical.py, online.online_step_ranges).  These tests pin (a) the
decode against the beam simulator's xyz expansion, (b) end-to-end
trajectory equivalence of the two ingest paths, and (c) chunked-vs-
per-scan equivalence of the packed path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                   InputFilterConfig, LaserTrackConfig,
                                   SolverConfig)
from laser_slam_tpu.ops import spherical
from laser_slam_tpu.pipeline import online
from laser_slam_tpu.pipeline import velodyne_sim as vs

B, A = 16, 128          # 2048 rays — small enough for CPU test runs


def beam_cfg():
    elev_min = float(np.deg2rad(vs.VLP16_ELEV_DEG_SORTED.min()) - 0.01)
    elev_max = float(np.deg2rad(vs.VLP16_ELEV_DEG_SORTED.max()) + 0.01)
    return EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=3,
            odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
            icp_noise_model=(0.01,) * 6,
            input_filters=InputFilterConfig(scan_capacity=B * A),
            icp=IcpConfig(matcher='projective', reading_capacity=1024,
                          reading_sampling_ratio=0.5,
                          normal_method='image_pca',
                          normal_image_rows=8, normal_image_cols=64,
                          range_image_rows=16, range_image_cols=128,
                          range_image_elev_min=elev_min,
                          range_image_elev_max=elev_max)),
        solver=SolverConfig(gn_iterations=2, pcg_iterations=30))


def packed_stream(n_scans=8, seed=3):
    return vs.BeamStream(n_scans=n_scans, n_beams=B, n_azimuth=A,
                         trajectory='circle', radius_m=12.0,
                         world_size_m=50.0, range_noise_m=0.01,
                         odom_noise=0.003, seed=seed, packed=True)


def test_decode_matches_beam_scan_xyz():
    scene = vs.make_beam_scene(seed=1, world_size_m=50.0)
    pose = np.array([1, 0, 0, 0, 3.0, -2.0, 1.5], np.float32)
    pts, ranges = vs.beam_scan_packed(scene, pose, vs.VLP16_ELEV_DEG_SORTED,
                                      n_azimuth=A, range_noise_m=0.01,
                                      rng=np.random.default_rng(7))
    table = spherical.beam_table(vs.VLP16_ELEV_DEG_SORTED, A)
    dec_pts, n_valid = spherical.decode_and_pack(jnp.asarray(ranges), table)
    n = int(n_valid)
    assert n == len(pts)                      # identical validity set
    # Same ring-major order; error bounded by half the 2 mm range LSB.
    err = np.linalg.norm(np.asarray(dec_pts[:n]) - pts, axis=1)
    assert err.max() < 1.5e-3, err.max()


def test_encode_decode_range_word_conventions():
    # 0 = no echo; valid ranges clip to >= 1 word; ranges beyond the
    # encodable ceiling (65535 * 2 mm = 131.07 m) become no-echo rather
    # than aliasing to the ceiling (a fake 131 m point would poison ICP).
    ranges_m = np.array([[0.0, 0.0005, 1.0, 131.07, 200.0]])
    valid = np.array([[False, True, True, True, True]])
    words = spherical.encode_ranges(ranges_m, valid)
    assert words.dtype == np.uint16
    assert words[0, 0] == 0 and words[0, 1] == 1
    assert words[0, 2] == 500
    assert words[0, 3] == 65535          # exactly at the ceiling: kept
    assert words[0, 4] == 0              # beyond the ceiling: no echo


def test_encode_quantization_error_bounded_near_ceiling():
    """Round-trip error stays within half an LSB (1 mm) right up to the
    encodable maximum — the packed path's accuracy is range-independent."""
    rng = np.random.default_rng(7)
    ranges_m = rng.uniform(120.0, 131.07, size=(4, 256))
    valid = np.ones_like(ranges_m, bool)
    words = spherical.encode_ranges(ranges_m, valid)
    kept = words > 0
    assert kept.mean() > 0.99            # ceiling-adjacent, still encodable
    decoded = words[kept].astype(np.float64) * spherical.RANGE_UNIT_M
    err = np.abs(decoded - ranges_m[kept])
    assert err.max() <= 0.5 * spherical.RANGE_UNIT_M + 1e-9


def test_packed_ingest_matches_xyz_ingest():
    frames = list(packed_stream())
    r_xyz = online.OnlineRunner(beam_cfg(), pose_capacity=32,
                                factor_capacity=128)
    r_pk = online.OnlineRunner(beam_cfg(), pose_capacity=32,
                               factor_capacity=128)
    r_pk.enable_packed_ingest(vs.VLP16_ELEV_DEG_SORTED, A)
    for f in frames:
        assert r_xyz.process_scan(f.time_ns, f.points, f.odom_pose7)
        assert r_pk.process_scan(f.time_ns, f.range_words, f.odom_pose7)
    t_xyz = r_xyz.trajectory()
    t_pk = r_pk.trajectory()
    # Identical layouts and rng paths; the only difference is the 2 mm
    # range quantization.  At this deliberately tiny ray count
    # (2048/scan) that perturbs each ICP correspondence set enough to
    # random-walk the chained trajectory by ~mm per scan (measured max
    # ~2 cm over 8 scans; geometric decode exactness is pinned at
    # 1.5 mm by test_decode_matches_beam_scan_xyz, and bit-level path
    # equivalence by test_packed_chunked_matches_per_scan).
    for t in t_xyz:
        d = np.linalg.norm(t_xyz[t][4:] - t_pk[t][4:])
        assert d < 3e-2, (t, d)


def test_packed_chunked_matches_per_scan():
    frames = list(packed_stream(n_scans=9, seed=5))
    r_seq = online.OnlineRunner(beam_cfg(), pose_capacity=32,
                                factor_capacity=128)
    r_chk = online.OnlineRunner(beam_cfg(), pose_capacity=32,
                                factor_capacity=128)
    for r in (r_seq, r_chk):
        r.enable_packed_ingest(vs.VLP16_ELEV_DEG_SORTED, A)
    for f in frames:
        r_seq.process_scan(f.time_ns, f.range_words, f.odom_pose7)
    # 2 chunks of 4 + 1 remainder through the per-scan step.
    n = r_chk.process_scans([(f.time_ns, f.range_words, f.odom_pose7)
                             for f in frames], chunk_size=4)
    assert n == len(frames)
    np.testing.assert_allclose(
        np.asarray(r_seq.state.traj_poses), np.asarray(r_chk.state.traj_poses),
        atol=1e-6)


def test_packed_scan_requires_configuration():
    r = online.OnlineRunner(beam_cfg(), pose_capacity=8, factor_capacity=32)
    f = next(iter(packed_stream(n_scans=1)))
    with pytest.raises(ValueError, match='packed'):
        r.process_scan(f.time_ns, f.range_words, f.odom_pose7)
