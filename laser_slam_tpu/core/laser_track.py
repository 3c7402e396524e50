"""LaserTrack: per-robot scan-matching front-end and trajectory owner.

TPU-native re-design of the reference ``LaserTrack``
(laser_slam/include/laser_slam/laser_track.hpp:17-236,
src/laser_track.cpp) with the same responsibilities:

* own one robot's pose measurements, odometry deltas, ICP results, loop
  closures, laser scans and the SE(3) trajectory;
* the per-scan hot path ``process_pose_and_laser_scan``
  (laser_track.cpp:122-231): filter the scan, extend the trajectory by the
  odometry delta, run scan-to-submap ICP, and emit the prior/odometry/ICP
  factors + initial values for the estimator;
* submap construction around a time for loop-closure ICP
  (``build_submap_around_time``, laser_track.cpp:602-651).

Design shift vs the reference: instead of concatenating variable-size
DataPoints on every scan, the track keeps a fixed-shape device ring of the
last ``nscan_in_sub_map`` scans (points/masks/normals).  One jitted
function transforms the ring into the submap frame and runs the whole ICP
— one XLA program per scan, no recompiles (shapes are static).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.config import LaserTrackConfig
from laser_slam_tpu.core.trajectory import SE3Trajectory
from laser_slam_tpu.core.types import LaserScan, Pose, RelativePose, Time
from laser_slam_tpu.core import benchmarker as bench
from laser_slam_tpu.ops import cloud as pc
from laser_slam_tpu.ops import icp as icp_mod
from laser_slam_tpu.ops import se3


# ---------------------------------------------------------------------------
# Jitted device pipelines (module-level so the cache is shared across tracks)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('config',))
def _ingest_scan(points, n_valid, key, config: LaserTrackConfig):
    """Input-filter a raw scan and estimate its normals.

    Replaces ``input_filters_.apply(scan.scan)`` (laser_track.cpp:146) +
    the reference-side SamplingSurfaceNormal normal estimation.
    points: [capacity,3] padded raw points; n_valid: count of real points.
    """
    f = config.input_filters
    mask = jnp.arange(points.shape[0]) < n_valid
    c = pc.Cloud(jnp.where(mask[:, None], points, pc.SENTINEL), mask)
    if f.chain:
        # Configurable ordered chain (laser_track.cpp:24-30 parity).
        c = pc.apply_filter_chain(c, f.chain, key)
    else:
        c = pc.range_filter(c, f.min_distance_m, f.max_distance_m)
        if f.random_sampling_ratio < 1.0:
            c = pc.random_sampling_filter(c, f.random_sampling_ratio, key)
    store_cap = f.store_capacity or f.scan_capacity
    if store_cap < c.points.shape[0]:
        # Even stride, not prefix truncation (cloud.compact_decimate).
        c = pc.compact_decimate(c, store_cap)
    from laser_slam_tpu.ops import range_image as ri
    normals = ri.compute_normals(c, config.icp)
    return c, normals


@functools.partial(jax.jit, static_argnames=('config',))
def _scan_to_submap_icp(ring_points, ring_mask, ring_normals, ring_rel,
                        reading_points, reading_mask, sample_key,
                        initial_guess, config: LaserTrackConfig):
    """Scan-to-submap ICP against the ring of previous scans.

    Mirrors ``localScanToSubMap`` (laser_track.cpp:466-519): the ring
    holds the last K scans; ``ring_rel[k]`` transforms scan k into the
    submap frame (the frame of the newest ring entry = second-last scan
    overall).  The reading is random-sampled (RandomSampling prob from
    icp config) then registered point-to-plane.
    """
    K, N, _ = ring_points.shape
    # Transform ring scans + normals into the submap frame.
    pts = se3.apply(ring_rel[:, None, :], ring_points)
    nrm = se3.quat_rotate(ring_rel[:, None, :4], ring_normals)
    submap = pc.Cloud(
        jnp.where(ring_mask[..., None], pts, pc.SENTINEL).reshape(K * N, 3),
        ring_mask.reshape(K * N))
    submap_normals = nrm.reshape(K * N, 3)

    # Reading: random-sample to the reading budget.
    reading = pc.Cloud(reading_points, reading_mask)
    if config.icp.reading_sampling_ratio < 1.0:
        reading = pc.random_sampling_filter(
            reading, config.icp.reading_sampling_ratio, sample_key)
    reading = pc.compact_decimate(reading, config.icp.reading_capacity)

    return icp_mod.icp_point_to_plane(reading, submap, submap_normals,
                                      initial_guess, config.icp)


@functools.partial(jax.jit, static_argnames=('n_scans',))
def _assemble_submap(points, masks, normals, rels, n_scans: int):
    """Transform ``n_scans`` stacked scans by ``rels`` and concatenate.

    Device core of ``buildSubMapAroundTime`` (laser_track.cpp:602-651).
    """
    pts = se3.apply(rels[:, None, :], points)
    nrm = se3.quat_rotate(rels[:, None, :4], normals)
    K, N, _ = points.shape
    return (jnp.where(masks[..., None], pts, pc.SENTINEL).reshape(K * N, 3),
            masks.reshape(K * N), nrm.reshape(K * N, 3))


class LaserTrack:
    """One robot's front-end track (reference laser_track.hpp:17-236)."""

    def __init__(self, config: LaserTrackConfig, track_id: int,
                 key_allocator: Callable[[], int]):
        self.config = config
        self.track_id = track_id
        self._alloc_key = key_allocator
        self.trajectory = SE3Trajectory()
        # Pose measurements (odometry input), time -> pose7.
        self.pose_measurement_times: List[Time] = []
        self.pose_measurements: List[np.ndarray] = []
        self._pose_meas_index: Dict[Time, int] = {}
        self.odometry_measurements: List[RelativePose] = []
        self.icp_transformations: List[RelativePose] = []
        self.loop_closures: List[RelativePose] = []
        self.scans: List[LaserScan] = []
        self.scan_matching_times: Dict[Time, float] = {}
        self.covariances: List[np.ndarray] = []
        self._rng = np.random.default_rng(1234 + track_id)

        # The reference's submap is the second-last scan PLUS up to
        # nscan_in_sub_map-1 scans before it (laser_track.cpp:476-486) —
        # nscan_in_sub_map scans total, so the ring holds that many.
        K = config.nscan_in_sub_map
        N = config.input_filters.scan_capacity
        # Ring of the last K scans feeding the submap (device arrays).
        self._ring_points = jnp.full((max(K, 1), N, 3), pc.SENTINEL,
                                     jnp.float32)
        self._ring_mask = jnp.zeros((max(K, 1), N), bool)
        self._ring_normals = jnp.zeros((max(K, 1), N, 3), jnp.float32)
        self._ring_times = np.zeros((max(K, 1),), np.int64) - 1

    # ------------------------------------------------------------------
    # Measurement accessors (reference laser_track.cpp:88-104,521-571)
    # ------------------------------------------------------------------

    def _pose_measurement_at(self, time_ns: Time) -> np.ndarray:
        """Pose measurement at an exact time (findPose,
        laser_track.cpp:539-555).

        O(1) amortized: the time->index map is rebuilt lazily whenever the
        measurement list has grown (it is only ever appended to, or bulk-
        replaced on checkpoint load), never scanned linearly per query.
        """
        if len(self._pose_meas_index) != len(self.pose_measurement_times):
            self._pose_meas_index = {
                t: i for i, t in enumerate(self.pose_measurement_times)}
        idx = self._pose_meas_index.get(time_ns)
        if idx is None:
            raise KeyError(f'no pose measurement at time {time_ns}')
        return self.pose_measurements[idx]

    def get_num_scans(self) -> int:
        return len(self.scans)

    def get_min_time(self) -> Time:
        return self.trajectory.min_time()

    def get_max_time(self) -> Time:
        return self.trajectory.max_time()

    def get_laser_scans_times(self) -> List[Time]:
        return [s.time_ns for s in self.scans]

    def evaluate(self, time_ns: Time) -> np.ndarray:
        return self.trajectory.evaluate(time_ns)

    def get_trajectory(self):
        return self.trajectory.as_dict()

    def get_odometry_trajectory(self):
        """(getOdometryTrajectory, laser_track.cpp:313-319)."""
        return {t: p.copy() for t, p in zip(self.pose_measurement_times,
                                            self.pose_measurements)}

    def get_current_pose(self) -> Pose:
        if self.trajectory.is_empty():
            return Pose()
        t = self.trajectory.max_time()
        return Pose(T_w=self.trajectory.evaluate(t), time_ns=t,
                    key=self.trajectory.key_at(t))

    def get_previous_pose(self) -> Pose:
        times = self.trajectory.times()
        if len(times) < 2:
            return Pose()
        t = int(times[-2])
        return Pose(T_w=self.trajectory.evaluate(t), time_ns=t,
                    key=self.trajectory.key_at(t))

    # ------------------------------------------------------------------
    # Hot path (reference laser_track.cpp:122-231)
    # ------------------------------------------------------------------

    def process_pose_and_laser_scan(self, pose: Pose, raw_points: np.ndarray,
                                    time_ns: Optional[Time] = None):
        """Process one (pose measurement, scan) pair.

        Returns (new_factors, new_values, is_prior) where new_factors is a
        list of factor spec dicts for the estimator and new_values maps
        key -> initial pose7 (the raw odometry pose, mirroring
        laser_track.cpp:228-230).
        """
        with bench.scoped_timer('laser_track.process_scan'):
            return self._process(pose, raw_points, time_ns)

    def _process(self, pose, raw_points, time_ns):
        import time as _time
        t_start = _time.perf_counter()
        time_ns = pose.time_ns if time_ns is None else time_ns

        scan_cloud, normals = self._ingest(raw_points)
        scan = LaserScan(cloud=scan_cloud, time_ns=time_ns, normals=normals)

        self.pose_measurement_times.append(pose.time_ns)
        self.pose_measurements.append(np.asarray(pose.T_w, np.float32))

        new_factors = []
        new_values = {}

        if self.trajectory.is_empty():
            key = self._alloc_key()
            self.trajectory.extend(time_ns, pose.T_w, key)
            scan.key = key
            self.scans.append(scan)
            self._push_ring(scan)

            prior_T = np.asarray(pose.T_w, np.float32)
            if self.config.force_priors:
                # Offset tracks along y (laser_track.cpp:166-170).
                prior_T = np.array(
                    [1, 0, 0, 0, 0,
                     self.config.distance_between_prior_poses_m *
                     self.track_id, 0], np.float32)
            new_factors.append(dict(
                type='prior', key=key, T=prior_T,
                track_id=self.track_id))
            new_values[key] = np.asarray(pose.T_w, np.float32)
            return new_factors, new_values, True

        # Relative odometry measurement (laser_track.cpp:178-201).
        t_last = self.trajectory.max_time()
        last_meas = jnp.asarray(self._pose_measurement_at(t_last))
        new_meas = jnp.asarray(np.asarray(pose.T_w, np.float32))
        rel = RelativePose(
            T_a_b=np.asarray(se3.compose(se3.inverse(last_meas), new_meas)),
            time_a_ns=t_last, time_b_ns=time_ns,
            key_a=self.trajectory.key_at(t_last),
            track_id_a=self.track_id, track_id_b=self.track_id)

        # Extend with odometry-propagated pose.
        propagated = se3.compose(jnp.asarray(self.trajectory.evaluate(t_last)),
                                 jnp.asarray(rel.T_a_b))
        key = self._alloc_key()
        self.trajectory.extend(time_ns, np.asarray(propagated), key)
        scan.key = key
        rel.key_b = key
        self.scans.append(scan)
        self.odometry_measurements.append(rel)

        # Scan-to-submap ICP (laser_track.cpp:204-205,460-519).
        icp_rel = None
        if self.config.use_icp_factors and len(self.scans) > 1:
            icp_rel = self._compute_icp_transformation()

        self._push_ring(scan)
        self.scan_matching_times[time_ns] = (
            (_time.perf_counter() - t_start) * 1e3)
        bench.record_value('laser_track.scan_matching_ms',
                           self.scan_matching_times[time_ns])

        if self.config.use_odom_factors:
            new_factors.append(dict(
                type='relative', key_a=rel.key_a, key_b=rel.key_b,
                T_a_b=rel.T_a_b,
                sigmas=np.asarray(self.config.odometry_noise_model,
                                  np.float32),
                robust=self.config.add_m_estimator_on_odom))
        if icp_rel is not None:
            new_factors.append(dict(
                type='relative', key_a=icp_rel.key_a, key_b=icp_rel.key_b,
                T_a_b=icp_rel.T_a_b,
                sigmas=np.asarray(self.config.icp_noise_model, np.float32),
                robust=self.config.add_m_estimator_on_icp))
        new_values[key] = np.asarray(pose.T_w, np.float32)
        return new_factors, new_values, False

    def _ingest(self, raw_points: np.ndarray):
        cap = self.config.input_filters.scan_capacity
        pts = np.asarray(raw_points, np.float32)
        n = min(len(pts), cap)
        padded = np.full((cap, 3), pc.SENTINEL, np.float32)
        padded[:n] = pts[:n]
        key = jax.random.key(int(self._rng.integers(2 ** 31)))
        c, normals = _ingest_scan(jnp.asarray(padded), n, key, self.config)
        return c, normals

    def _push_ring(self, scan: LaserScan):
        self._ring_points = jnp.roll(self._ring_points, -1, axis=0
                                     ).at[-1].set(scan.cloud.points)
        self._ring_mask = jnp.roll(self._ring_mask, -1, axis=0
                                   ).at[-1].set(scan.cloud.mask)
        self._ring_normals = jnp.roll(self._ring_normals, -1, axis=0
                                      ).at[-1].set(scan.normals)
        self._ring_times = np.roll(self._ring_times, -1)
        self._ring_times[-1] = scan.time_ns

    def _compute_icp_transformation(self) -> Optional[RelativePose]:
        """Scan-to-submap ICP for the newest scan (localScanToSubMap).

        The submap frame is the second-last scan's frame; the ring holds
        exactly the scans the reference would concatenate
        (laser_track.cpp:474-486)."""
        last = self.scans[-1]
        second_last_t = self.scans[-2].time_ns
        T_w_a = jnp.asarray(self.trajectory.evaluate(second_last_t))
        T_a_w = se3.inverse(T_w_a)

        # Relative transform of each ring scan into frame a.
        rels = []
        for t in self._ring_times:
            if t < 0:
                rels.append(np.asarray(se3.identity()))
            else:
                rels.append(np.asarray(se3.compose(
                    T_a_w, jnp.asarray(self.trajectory.evaluate(int(t))))))
        ring_rel = jnp.asarray(np.stack(rels))

        # Initial guess from the trajectory (laser_track.cpp:488-491).
        guess = se3.compose(T_a_w,
                            jnp.asarray(self.trajectory.evaluate(last.time_ns)))

        sample_key = jax.random.key(int(self._rng.integers(2 ** 31)))
        result = _scan_to_submap_icp(
            self._ring_points, self._ring_mask, self._ring_normals, ring_rel,
            last.cloud.points, last.cloud.mask, sample_key,
            guess, self.config)

        icp_rel = RelativePose(
            T_a_b=np.asarray(result.T),
            time_a_ns=second_last_t, time_b_ns=last.time_ns,
            key_a=self.trajectory.key_at(second_last_t),
            key_b=self.trajectory.key_at(last.time_ns),
            track_id_a=self.track_id, track_id_b=self.track_id)
        self.icp_transformations.append(icp_rel)

        if self.config.save_icp_results:
            self._save_icp_debug(last, guess, result.T)
        return icp_rel

    def _save_icp_debug(self, last_scan, guess, solution):
        """Debug dumps of the ICP inputs/outputs as .xyz clouds
        (save_icp_results, laser_track.cpp:504-513 — the reference writes
        VTK; here plain xyz, loadable by any cloud viewer)."""
        import os
        out = '/tmp/laser_slam_tpu_icp'
        os.makedirs(out, exist_ok=True)

        def dump(name, cloud):
            pts = np.asarray(cloud.points)[np.asarray(cloud.mask)]
            np.savetxt(os.path.join(out, name), pts, fmt='%.4f')

        dump('last_scan.xyz', last_scan.cloud)
        dump('last_scan_aligned_by_initial_guess.xyz',
             pc.transform(guess, last_scan.cloud))
        dump('last_scan_aligned_by_solution.xyz',
             pc.transform(solution, last_scan.cloud))

    # ------------------------------------------------------------------
    # Submaps for loop closures (laser_track.cpp:602-651)
    # ------------------------------------------------------------------

    def build_submap_around_time(self, time_ns: Time, radius: int):
        """Concatenate scans within +-radius of the scan at ``time_ns``,
        in the frame of that scan.  Returns (Cloud, normals)."""
        times = self.get_laser_scans_times()
        try:
            center = times.index(time_ns)
        except ValueError:
            raise KeyError(f'no scan at time {time_ns}')
        lo = max(0, center - radius)
        hi = min(len(times), center + radius + 1)
        sel = self.scans[lo:hi]
        T_a_w = se3.inverse(jnp.asarray(self.trajectory.evaluate(time_ns)))
        rels = jnp.asarray(np.stack([
            np.asarray(se3.compose(
                T_a_w, jnp.asarray(self.trajectory.evaluate(s.time_ns))))
            for s in sel]))
        points = jnp.stack([s.cloud.points for s in sel])
        masks = jnp.stack([s.cloud.mask for s in sel])
        normals = jnp.stack([s.normals for s in sel])
        pts, mask, nrm = _assemble_submap(points, masks, normals, rels,
                                          len(sel))
        return pc.Cloud(pts, mask), nrm

    # ------------------------------------------------------------------
    # Solver sync (laser_track.cpp:411-429)
    # ------------------------------------------------------------------

    def update_from_values(self, values: np.ndarray) -> None:
        self.trajectory.update_from_values(values)

    def append_covariances(self, covs: np.ndarray) -> None:
        for c in covs:
            self.covariances.append(np.asarray(c))

    def get_covariances(self):
        return list(self.covariances)

    def get_point_cloud_of_time_interval(self, start_ns: Time,
                                         end_ns: Time) -> pc.Cloud:
        """All scans with start <= t <= end, concatenated in the world
        frame.  (The reference declares this but leaves it a TODO —
        laser_track.cpp:239-245; implemented properly here.)"""
        sel = [s for s in self.scans if start_ns <= s.time_ns <= end_ns]
        if not sel:
            return pc.empty_cloud(1)
        clouds = [pc.transform(
            jnp.asarray(self.trajectory.evaluate(s.time_ns)), s.cloud)
            for s in sel]
        return pc.concatenate(clouds)

    def get_local_cloud_in_world_frame(self, time_ns: Time) -> pc.Cloud:
        """The scan at ``time_ns`` transformed by its optimized pose
        (getLocalCloudInWorldFrame, laser_track.cpp:247-266)."""
        for s in reversed(self.scans):
            if s.time_ns == time_ns:
                T = jnp.asarray(self.trajectory.evaluate(time_ns))
                return pc.transform(T, s.cloud)
        raise KeyError(f'no scan at time {time_ns}')
