"""Scan-context place recognition: descriptor, matching, auto loop closure.

The reference delegates loop-closure detection to the external segmatch
node (incremental_estimator.cpp:63 consumes ready-made alignments); the
in-tree detector replaces it, so these tests cover what the reference
never could: rotation-invariant matching, yaw recovery, temporal
exclusion, and fully automatic loop closing on a revisit.
"""

import numpy as np
import jax.numpy as jnp

from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                   InputFilterConfig, LaserTrackConfig,
                                   PlaceRecognitionConfig, SolverConfig)
from laser_slam_tpu.ops import scan_context as sc
from laser_slam_tpu.pipeline import online, replay
from laser_slam_tpu.pipeline.place_recognition import ScanContextDetector


def _structured_scan(seed=3, n=2048):
    """One sensor-frame scan of the structured synthetic room."""
    frames = list(replay.SyntheticStream(
        n_scans=1, points_per_scan=n, trajectory='line', seed=seed))
    return frames[0].points.astype(np.float32)


def _rotz(points, yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    return points @ R.T


def test_descriptor_shape_and_occupancy():
    pts = _structured_scan()
    d = sc.descriptor(jnp.asarray(pts), jnp.ones((len(pts),), bool),
                      n_rings=20, n_sectors=60)
    assert d.shape == (20, 60)
    assert float(jnp.max(d)) > 0
    # The room surrounds the sensor: most sectors see something.
    occupied_sectors = float(jnp.mean(jnp.any(d > 0, axis=0)))
    assert occupied_sectors > 0.9


def test_rotation_invariance_and_yaw_recovery():
    """A yaw-rotated view of the same place matches with ~0 distance and
    the recovered yaw (a_T_b convention) equals the true rotation."""
    S = 60
    pts_a = _structured_scan(seed=5)
    yaw_true = 7 * (2 * np.pi / S)            # exactly 7 sectors
    # Frame b is frame a rotated by yaw_true about +z (a_T_b = Rz(yaw)):
    # the same world point p_a in a's frame appears in b's frame as
    # p_b = Rz(yaw)^-1 p_a.
    pts_b = _rotz(pts_a, -yaw_true)
    mask = jnp.ones((len(pts_a),), bool)
    d_a = sc.descriptor(jnp.asarray(pts_a), mask)
    d_b = sc.descriptor(jnp.asarray(pts_b), mask)
    dist, shift = sc.distance_batch(d_a[None], jnp.ones((1,), bool), d_b)
    assert float(dist[0]) < 0.05
    yaw = float(sc.yaw_from_shift(shift[0], S))
    err = abs((yaw - yaw_true + np.pi) % (2 * np.pi) - np.pi)
    assert err < 2 * np.pi / S + 1e-6, (yaw, yaw_true)


def test_distinct_places_have_high_distance():
    """Views from well-separated positions in the SAME world (the
    operational discrimination question) must not match: the same scan
    from the same spot scores ~0, a 20 m-displaced viewpoint scores far
    above any sane acceptance threshold."""
    stream = replay.SyntheticStream(
        n_scans=2, points_per_scan=2048, trajectory='line',
        step_m=20.0, seed=5)
    frames = list(stream)
    pts_a, pts_c = frames[0].points, frames[1].points
    mask = jnp.ones((len(pts_a),), bool)
    d_a = sc.descriptor(jnp.asarray(pts_a), mask)
    d_c = sc.descriptor(jnp.asarray(pts_c), mask)
    dist_ac, _ = sc.distance_batch(d_a[None], jnp.ones((1,), bool), d_c)
    dist_aa, _ = sc.distance_batch(d_a[None], jnp.ones((1,), bool), d_a)
    assert float(dist_aa[0]) < 1e-5
    assert float(dist_ac[0]) > 0.3, float(dist_ac[0])


def test_detector_query_respects_temporal_exclusion():
    cfg = PlaceRecognitionConfig(exclude_recent_keys=10,
                                 distance_threshold=0.3, db_capacity=8)
    det = ScanContextDetector(cfg)
    pts = _structured_scan(seed=5)
    mask = np.ones((len(pts),), bool)
    det.add(pts, mask, key=0)
    # key 5: entry 0 is within the exclusion window (5 - 10 < 0) -> None.
    assert det.query(pts, mask, key=5) is None
    # key 30: entry 0 is old enough -> a (near-)exact match.
    hit = det.query(pts, mask, key=30)
    assert hit is not None and hit.key == 0
    assert hit.distance < 0.05
    assert abs(hit.yaw_rad) < 2 * np.pi / cfg.n_sectors + 1e-6


def test_detector_capacity_growth():
    cfg = PlaceRecognitionConfig(db_capacity=2)
    det = ScanContextDetector(cfg)
    pts = _structured_scan(seed=5)
    mask = np.ones((len(pts),), bool)
    for k in range(5):
        det.add(_rotz(pts, 0.1 * k), mask, key=k)
    assert det.n == 5 and det.db.shape[0] >= 5
    assert int(np.asarray(det.db_keys[4])) == 4


def test_detection_on_beam_structured_scans(rng):
    """The detector must work on the ring-discretized, occlusion-correct
    scans real sensors produce (not just uniform synthetic sampling):
    revisits on a 16-beam ray-cast loop are recognized with the right
    pairing and near-zero yaw."""
    from laser_slam_tpu.pipeline import velodyne_sim as vs
    est_cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=3,
            odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
            icp_noise_model=(0.01,) * 6,
            input_filters=InputFilterConfig(scan_capacity=4096),
            icp=IcpConfig(matcher='brute', reading_capacity=1024,
                          reading_sampling_ratio=1.0)),
        solver=SolverConfig(gn_iterations=2, pcg_iterations=30))
    pr_cfg = PlaceRecognitionConfig(detect_every=1, exclude_recent_keys=8,
                                    distance_threshold=0.25,
                                    db_capacity=64)
    runner = online.OnlineRunner(est_cfg, pose_capacity=64,
                                 factor_capacity=256, archive_points=512,
                                 place_recognition=pr_cfg)
    n, laps = 24, 2
    frames = list(vs.BeamStream(
        n_scans=n, n_beams=16, n_azimuth=256, trajectory='circle',
        radius_m=10.0, center_m=(8.0, 5.0), laps=laps,
        range_noise_m=0.01, odom_noise=0.01, seed=13))
    for f in frames:
        runner.process_scan(f.time_ns, f.points, f.odom_pose7)
    assert runner.detections, (runner.detections,
                               runner.rejected_detections)
    lap = n // laps
    for key_a, key_b, dist, yaw in runner.detections:
        assert abs((key_b - key_a) - lap) <= 2, (runner.detections,
                                                 runner.rejected_detections)
        assert abs(yaw) < 0.5, runner.detections


def test_cross_track_detection_links_robots(rng):
    """Two robots share one descriptor database: when robot 1 drives
    through robot 0's territory, the detector fires a CROSS-TRACK
    detection, which runs the linking-closure path (absorbed prior
    removed, groups merged, frames aligned) — the reference needs the
    external segmatch node for this rendezvous case."""
    base_cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=3,
            force_priors=True,
            use_icp_factors=False,
            odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
            input_filters=InputFilterConfig(scan_capacity=2048),
            icp=IcpConfig(matcher='brute', reading_capacity=1024,
                          reading_sampling_ratio=1.0)),
        solver=SolverConfig(gn_iterations=2, pcg_iterations=30))
    pr_cfg = PlaceRecognitionConfig(detect_every=1, exclude_recent_keys=6,
                                    min_keys_between_detections=4,
                                    distance_threshold=0.1, db_capacity=64)
    runner = online.OnlineRunner(base_cfg, pose_capacity=64,
                                 factor_capacity=256, n_tracks=2,
                                 archive_points=512,
                                 place_recognition=pr_cfg)
    # Same world, same route (robot 1 re-drives robot 0's line later).
    n = 8
    route = list(replay.SyntheticStream(
        n_scans=n, points_per_scan=2048, trajectory='line', step_m=1.0,
        noise_m=0.005, odom_noise=0.005, seed=47))
    for f in route:
        runner.process_scan(f.time_ns, f.points, f.odom_pose7, track_id=0)
    assert not runner.detections     # nothing to revisit yet
    for f in route:
        runner.process_scan(f.time_ns + 1, f.points, f.odom_pose7,
                            track_id=1)

    cross = [(a, b) for a, b, _, _ in runner.detections
             if runner.key_info[a][0] != runner.key_info[b][0]]
    assert cross, (runner.detections, runner.rejected_detections)
    for a, b in cross:
        # Robot 1's key b = n + i revisits robot 0's key i.
        assert abs((b - a) - n) <= 1, cross
    # The linking machinery ran: single group, absorbed prior removed.
    assert len(runner._linked_groups) == 1
    assert runner._prior_slot_of_track == {}
    # And the matched poses actually coincide in the shared frame.
    poses = online.extract_trajectory(runner.state)
    a, b = cross[0]
    assert np.linalg.norm(poses[a][4:] - poses[b][4:]) < 1.0


def test_batched_fetch_mode_still_detects(rng):
    """fetch_every > 1 amortizes the per-query D2H fetch by stacking
    results device-side; detections arrive a few scans late but pair the
    same revisits and the trajectory still converges."""
    est_cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=3,
            odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
            icp_noise_model=(0.01,) * 6,
            input_filters=InputFilterConfig(scan_capacity=2048),
            icp=IcpConfig(matcher='brute', reading_capacity=1024,
                          reading_sampling_ratio=1.0)),
        solver=SolverConfig(gn_iterations=2, pcg_iterations=30))
    pr_cfg = PlaceRecognitionConfig(detect_every=1, fetch_every=4,
                                    exclude_recent_keys=8,
                                    distance_threshold=0.25,
                                    db_capacity=64)
    runner = online.OnlineRunner(est_cfg, pose_capacity=64,
                                 factor_capacity=256, archive_points=512,
                                 place_recognition=pr_cfg)
    n, laps = 32, 2
    frames = list(replay.SyntheticStream(
        n_scans=n, points_per_scan=2048, trajectory='circle',
        radius_m=10.0, center_m=(8.0, 5.0), laps=laps, noise_m=0.005,
        odom_noise=0.01, seed=31))
    for f in frames:
        runner.process_scan(f.time_ns, f.points, f.odom_pose7)
    runner.flush_detections()
    assert runner.detections, (runner.detections,
                               runner.rejected_detections)
    lap = n // laps
    for key_a, key_b, dist, yaw in runner.detections:
        assert abs((key_b - key_a) - lap) <= 2, (runner.detections,
                                                 runner.rejected_detections)
    traj = runner.trajectory()
    errs = [np.linalg.norm(traj[f.time_ns][4:] - f.gt_pose7[4:])
            for f in frames if f.time_ns in traj]
    assert max(errs) < 0.5, max(errs)


def test_runner_detector_grows_mid_run(rng):
    """The descriptor database doubles mid-run without disturbing
    detection (same bucketing policy as the state tables)."""
    est_cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=3,
            input_filters=InputFilterConfig(scan_capacity=1024),
            icp=IcpConfig(matcher='brute', reading_capacity=512,
                          reading_sampling_ratio=1.0)),
        solver=SolverConfig(gn_iterations=1, pcg_iterations=10))
    pr_cfg = PlaceRecognitionConfig(detect_every=1, db_capacity=4,
                                    exclude_recent_keys=4,
                                    distance_threshold=0.1)
    runner = online.OnlineRunner(est_cfg, pose_capacity=32,
                                 factor_capacity=128,
                                 place_recognition=pr_cfg)
    frames = list(replay.SyntheticStream(
        n_scans=10, points_per_scan=1024, trajectory='line', step_m=2.0,
        noise_m=0.005, odom_noise=0.005, seed=61))
    for f in frames:
        runner.process_scan(f.time_ns, f.points, f.odom_pose7)
    assert runner.detector.n == 10
    assert runner.detector.db.shape[0] >= 10
    keys = np.asarray(runner.detector.db_keys[:10])
    np.testing.assert_array_equal(keys, np.arange(10))
    # Line trajectory, 2 m steps: distant viewpoints must not match.
    assert not runner.detections, runner.detections


def test_host_path_recipe_with_standalone_detector(rng):
    """The detector is usable with the host (reference-shaped) API too:
    feed the worker's scans to a standalone ScanContextDetector and
    route hits through IncrementalEstimator.process_loop_closure — the
    exact seam where the reference plugs segmatch in
    (incremental_estimator.cpp:63)."""
    from laser_slam_tpu.core.estimator import IncrementalEstimator
    from laser_slam_tpu.core.types import RelativePose
    from laser_slam_tpu.config import WorkerConfig
    from laser_slam_tpu.ops import se3
    from laser_slam_tpu.pipeline.worker import LaserSlamWorker
    import jax.numpy as jnp

    est_cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=3,
            odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
            icp_noise_model=(0.01,) * 6,
            input_filters=InputFilterConfig(scan_capacity=2048),
            icp=IcpConfig(matcher='brute', reading_capacity=1024,
                          reading_sampling_ratio=1.0)),
        loop_closure_noise_model=(0.01,) * 6,
        solver=SolverConfig(gn_iterations=2, pcg_iterations=30))
    estimator = IncrementalEstimator(est_cfg, 1)
    worker = LaserSlamWorker(WorkerConfig(minimum_distance_to_add_pose=0.0),
                             estimator, 0)
    det = ScanContextDetector(PlaceRecognitionConfig(
        exclude_recent_keys=8, distance_threshold=0.1, db_capacity=64))

    n, laps = 24, 2
    frames = list(replay.SyntheticStream(
        n_scans=n, points_per_scan=2048, trajectory='circle',
        radius_m=10.0, center_m=(8.0, 5.0), laps=laps, noise_m=0.005,
        odom_noise=0.01, seed=53))
    hits = []
    times = []
    for i, f in enumerate(frames):
        worker.process_scan(f.time_ns, f.points, f.odom_pose7)
        times.append(f.time_ns)
        mask = np.ones((len(f.points),), bool)
        hit = det.query(f.points, mask, key=i, add=True)
        if hit is not None and not hits:        # close the first revisit
            T_w_a = jnp.asarray(worker.laser_track.evaluate(times[hit.key]))
            T_w_b = jnp.asarray(worker.laser_track.evaluate(f.time_ns))
            half = 0.5 * hit.yaw_rad
            rz = jnp.asarray(np.array(
                [np.cos(half), 0, 0, np.sin(half), 0, 0, 0], np.float32))
            w_T_a_b = se3.compose(T_w_a, se3.compose(
                rz, se3.inverse(T_w_b)))
            estimator.process_loop_closure(RelativePose(
                T_a_b=np.asarray(w_T_a_b), time_a_ns=times[hit.key],
                time_b_ns=f.time_ns, track_id_a=0, track_id_b=0))
            hits.append((hit.key, i))
    assert hits, 'no revisit detected on the host path'
    key_a, key_b = hits[0]
    assert abs((key_b - key_a) - n // laps) <= 2, hits
    traj = worker.get_trajectory()
    errs = [np.linalg.norm(traj[f.time_ns][4:] - f.gt_pose7[4:])
            for f in frames if f.time_ns in traj]
    assert max(errs) < 0.5, max(errs)


def test_detector_checkpoint_roundtrip(tmp_path):
    """The scan-context database rides the online checkpoint; resuming
    without its config fails loudly instead of silently going blind."""
    import pytest
    from laser_slam_tpu.core import checkpoint as ckpt
    est_cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=3,
            input_filters=InputFilterConfig(scan_capacity=1024),
            icp=IcpConfig(matcher='brute', reading_capacity=512,
                          reading_sampling_ratio=1.0)),
        solver=SolverConfig(gn_iterations=1, pcg_iterations=10))
    pr_cfg = PlaceRecognitionConfig(db_capacity=16)
    runner = online.OnlineRunner(est_cfg, pose_capacity=32,
                                 factor_capacity=64,
                                 place_recognition=pr_cfg)
    frames = list(replay.SyntheticStream(
        n_scans=4, points_per_scan=1024, trajectory='line', seed=41))
    for f in frames:
        runner.process_scan(f.time_ns, f.points, f.odom_pose7)
    assert runner.detector.n == 4
    path = str(tmp_path / 'pr.npz')
    ckpt.save_online_checkpoint(path, runner)

    with pytest.raises(ValueError, match='place.recognition'):
        ckpt.load_online_checkpoint(path, est_cfg)
    r2 = ckpt.load_online_checkpoint(path, est_cfg,
                                     place_recognition=pr_cfg)
    assert r2.detector.n == 4
    np.testing.assert_array_equal(np.asarray(r2.detector.db),
                                  np.asarray(runner.detector.db))
    np.testing.assert_array_equal(np.asarray(r2.detector.db_keys),
                                  np.asarray(runner.detector.db_keys))
    # The resumed detector answers queries identically.
    pts = frames[0].points
    mask = np.ones((len(pts),), bool)
    a = runner.detector.query(pts, mask, key=100)
    b = r2.detector.query(pts, mask, key=100)
    assert a == b and a is not None and a.key == 0


def test_runner_closes_loop_automatically(rng):
    """Two laps around the room: the detector must find the revisit and
    inject a loop closure through the standard estimator path."""
    est_cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=3,
            odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
            icp_noise_model=(0.01,) * 6,
            input_filters=InputFilterConfig(scan_capacity=2048),
            icp=IcpConfig(matcher='brute', reading_capacity=1024,
                          reading_sampling_ratio=1.0)),
        solver=SolverConfig(gn_iterations=2, pcg_iterations=30))
    # The square room is rotationally aliased: diametrically opposite
    # viewpoints score ~0.05-0.08 after the 180-deg heading flip (true
    # revisits: 0.015-0.024), UNDER the lax 0.25 threshold used here on
    # purpose — the ICP verification gate, not the descriptor threshold,
    # must keep those 20 m-wrong candidates out of the graph.
    pr_cfg = PlaceRecognitionConfig(detect_every=1, exclude_recent_keys=8,
                                    distance_threshold=0.25,
                                    db_capacity=64)
    runner = online.OnlineRunner(est_cfg, pose_capacity=64,
                                 factor_capacity=256,
                                 archive_points=512,
                                 place_recognition=pr_cfg)
    # Off-center loop: breaks the square room's EXACT 180-deg symmetry
    # (a centered circle's opposite viewpoints are indistinguishable up
    # to the box obstacles — no descriptor or geometric check can tell
    # an exact symmetry apart; see the config docstring).
    n, laps = 32, 2
    frames = list(replay.SyntheticStream(
        n_scans=n, points_per_scan=2048, trajectory='circle',
        radius_m=10.0, center_m=(8.0, 5.0), laps=laps, noise_m=0.005,
        odom_noise=0.01, seed=31))
    for f in frames:
        runner.process_scan(f.time_ns, f.points, f.odom_pose7)

    assert runner.detections, 'no loop closure detected on a revisit'
    lap = n // laps
    for key_a, key_b, dist, yaw in runner.detections:
        # Accepted detections must pair a scan with its previous-lap
        # neighbor; aliased candidates belong in rejected_detections.
        assert abs((key_b - key_a) - lap) <= 2, (runner.detections,
                                                 runner.rejected_detections)
        assert abs(yaw) < 0.5, runner.detections
    # The loop-closure factor actually entered the graph.
    assert runner._n_rel_host > 2 * (n - 1)
    # And the trajectory stays consistent after the injected closures.
    traj = runner.trajectory()
    errs = [np.linalg.norm(traj[f.time_ns][4:] - f.gt_pose7[4:])
            for f in frames if f.time_ns in traj]
    assert max(errs) < 0.5, max(errs)


def test_chunked_dispatch_with_detector_matches_per_scan(rng):
    """Attaching the detector must NOT disable chunked dispatch (round-3
    verdict: online.py forced n_chunks=0, making the chunked-transport
    win and automatic loop closing mutually exclusive).  The detection
    cadence now runs on device inside online_chunk; this pins that the
    chunked path (a) actually chunks, (b) finds the same revisits as the
    per-scan path, and (c) keeps the trajectory consistent."""
    def make_runner():
        est_cfg = EstimatorConfig(
            laser_track=LaserTrackConfig(
                nscan_in_sub_map=3,
                odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
                icp_noise_model=(0.01,) * 6,
                input_filters=InputFilterConfig(scan_capacity=2048),
                icp=IcpConfig(matcher='brute', reading_capacity=1024,
                              reading_sampling_ratio=1.0)),
            solver=SolverConfig(gn_iterations=2, pcg_iterations=30))
        pr_cfg = PlaceRecognitionConfig(detect_every=1,
                                        exclude_recent_keys=8,
                                        distance_threshold=0.25,
                                        db_capacity=64)
        return online.OnlineRunner(est_cfg, pose_capacity=64,
                                   factor_capacity=256,
                                   archive_points=512,
                                   place_recognition=pr_cfg)

    n, laps = 32, 2
    frames = list(replay.SyntheticStream(
        n_scans=n, points_per_scan=2048, trajectory='circle',
        radius_m=10.0, center_m=(8.0, 5.0), laps=laps, noise_m=0.005,
        odom_noise=0.01, seed=31))

    r_seq = make_runner()
    for f in frames:
        r_seq.process_scan(f.time_ns, f.points, f.odom_pose7)
    traj_seq = r_seq.trajectory()

    r_chunk = make_runner()
    r_chunk.process_scans(frames, chunk_size=8)
    traj_chunk = r_chunk.trajectory()

    # The chunk path really ran (device-side adds, one per scan).
    assert r_chunk.detector.n == n
    assert r_chunk.detections, 'chunked path found no loop closure'
    lap = n // laps
    for key_a, key_b, dist, yaw in r_chunk.detections:
        assert abs((key_b - key_a) - lap) <= 2, (r_chunk.detections,
                                                 r_chunk.rejected_detections)
        assert abs(yaw) < 0.5
    # Same revisit structure as the per-scan path (injection timing may
    # shift pairs by a key or two — chunk-boundary flushes vs immediate).
    assert r_seq.detections
    assert abs(len(r_chunk.detections) - len(r_seq.detections)) <= 2
    # Trajectory quality matches the per-scan path.
    for traj in (traj_seq, traj_chunk):
        errs = [np.linalg.norm(traj[f.time_ns][4:] - f.gt_pose7[4:])
                for f in frames if f.time_ns in traj]
        assert max(errs) < 0.5, max(errs)


def test_warmup_closure_path_is_pure(rng):
    """warmup_closure_path pre-compiles the verification + injection
    programs (the first live detection would otherwise stall the stream
    for the compiles) WITHOUT touching the runner: the trajectory is
    bit-identical to a run that never called it, and closures found
    afterwards pair the same revisits."""

    def make_runner(precond):
        est_cfg = EstimatorConfig(
            laser_track=LaserTrackConfig(
                nscan_in_sub_map=3,
                odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
                icp_noise_model=(0.01,) * 6,
                input_filters=InputFilterConfig(scan_capacity=2048),
                icp=IcpConfig(matcher='brute', reading_capacity=1024,
                              reading_sampling_ratio=1.0)),
            solver=SolverConfig(gn_iterations=2, pcg_iterations=30,
                                preconditioner=precond))
        pr_cfg = PlaceRecognitionConfig(detect_every=1,
                                        exclude_recent_keys=8,
                                        distance_threshold=0.25,
                                        db_capacity=64)
        return online.OnlineRunner(est_cfg, pose_capacity=64,
                                   factor_capacity=256,
                                   archive_points=512,
                                   place_recognition=pr_cfg)

    n, laps = 24, 2
    frames = list(replay.SyntheticStream(
        n_scans=n, points_per_scan=2048, trajectory='circle',
        radius_m=10.0, center_m=(8.0, 5.0), laps=laps, noise_m=0.005,
        odom_noise=0.01, seed=33))

    # Both injection flavours: cached (woodbury) and plain (tridiagonal).
    for precond in ('woodbury', 'tridiagonal'):
        r_ref = make_runner(precond)
        r_warm = make_runner(precond)
        for f in frames[:6]:
            r_ref.process_scan(f.time_ns, f.points, f.odom_pose7)
            r_warm.process_scan(f.time_ns, f.points, f.odom_pose7)
        r_warm.warmup_closure_path()
        np.testing.assert_array_equal(np.asarray(r_warm.state.traj_poses),
                                      np.asarray(r_ref.state.traj_poses))
        np.testing.assert_array_equal(np.asarray(r_warm.state.rel_weight),
                                      np.asarray(r_ref.state.rel_weight))
        assert r_warm._n_rel_host == r_ref._n_rel_host
        for f in frames[6:]:
            r_ref.process_scan(f.time_ns, f.points, f.odom_pose7)
            r_warm.process_scan(f.time_ns, f.points, f.odom_pose7)
        assert r_warm.detections, (precond, r_warm.rejected_detections)
        assert [d[:2] for d in r_warm.detections] == \
            [d[:2] for d in r_ref.detections], precond
        traj = r_warm.trajectory()
        errs = [np.linalg.norm(traj[f.time_ns][4:] - f.gt_pose7[4:])
                for f in frames if f.time_ns in traj]
        assert max(errs) < 0.5, (precond, max(errs))
