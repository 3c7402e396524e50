"""IncrementalEstimator: the global pose-graph back-end.

TPU-native re-design of the reference ``IncrementalEstimator``
(laser_slam/include/laser_slam/incremental_estimator.hpp:17-81,
src/incremental_estimator.cpp) with the same responsibilities:

* own N LaserTracks and the global factor graph / key space
  (incremental_estimator.cpp:22-26);
* per-scan incremental estimation (``estimate``,
  incremental_estimator.cpp:151-163) — here a warm-started 3-iteration
  Gauss-Newton/PCG solve (graph.solver) instead of 3x iSAM2 update;
* loop-closure handling with optional submap-ICP refinement
  (``process_loop_closure``, incremental_estimator.cpp:63-149);
* multi-robot prior bookkeeping: linked-worker groups and removal of the
  absorbed group's prior factor when two groups become linked
  (``estimate_and_remove``, incremental_estimator.cpp:165-266).
"""

from __future__ import annotations

import time as _time
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.config import EstimatorConfig
from laser_slam_tpu.core import benchmarker as bench
from laser_slam_tpu.core.laser_track import LaserTrack
from laser_slam_tpu.core.types import OptimizationResult, RelativePose, Time
from laser_slam_tpu.graph import factors as fg
from laser_slam_tpu.graph import solver as sv
from laser_slam_tpu.ops import cloud as pc
from laser_slam_tpu.ops import icp as icp_mod
from laser_slam_tpu.ops import se3


class IncrementalEstimator:
    def __init__(self, config: EstimatorConfig, n_laser_slam_workers: int = 1):
        self.config = config
        self.n_workers = n_laser_slam_workers
        self.graph = fg.HostGraph(
            rel_capacity=config.solver.factor_capacity,
            prior_capacity=max(16, 2 * n_laser_slam_workers))

        # Global key space (GTSAM Values equivalent): poses indexed by key.
        self._pose_capacity = config.solver.pose_capacity
        self._poses = np.zeros((self._pose_capacity, 7), np.float32)
        self._poses[:, 0] = 1.0
        self._n_keys = 0

        self.laser_tracks: List[LaserTrack] = [
            LaserTrack(config.laser_track, i, self._allocate_key)
            for i in range(n_laser_slam_workers)]

        # Multi-robot prior bookkeeping (incremental_estimator.cpp:176-257).
        self._linked_workers: List[List[int]] = []
        self._prior_factor_of_worker: Dict[int, int] = {}

        self.last_result = OptimizationResult()

    # ------------------------------------------------------------------
    # Key space
    # ------------------------------------------------------------------

    def _allocate_key(self) -> int:
        if self._n_keys == self._pose_capacity:
            self._pose_capacity *= 2
            new = np.zeros((self._pose_capacity, 7), np.float32)
            new[:, 0] = 1.0
            new[:self._n_keys] = self._poses
            self._poses = new
        key = self._n_keys
        self._n_keys += 1
        return key

    @property
    def num_keys(self) -> int:
        return self._n_keys

    def pose_values(self) -> np.ndarray:
        """Current estimate table indexed by key (GTSAM Values analog)."""
        return self._poses[:self._n_keys].copy()

    def get_laser_track(self, track_id: int) -> LaserTrack:
        return self.laser_tracks[track_id]

    def get_all_laser_tracks(self) -> List[LaserTrack]:
        return list(self.laser_tracks)

    # ------------------------------------------------------------------
    # Factor ingestion
    # ------------------------------------------------------------------

    def _apply_new_values(self, new_values: Dict[int, np.ndarray]):
        for key, T in new_values.items():
            self._poses[key] = np.asarray(T, np.float32)

    def _add_factors(self, new_factors: Sequence[dict]) -> List[int]:
        indices = []
        for f in new_factors:
            if f['type'] == 'prior':
                sig = np.full(6, self.config.prior_noise_sigma, np.float32)
                idx = self.graph.add_prior(f['key'], f['T'], sig)
                indices.append(('prior', idx, f.get('track_id', 0)))
            elif f['type'] == 'relative':
                idx = self.graph.add_relative(
                    f['key_a'], f['key_b'], f['T_a_b'], f['sigmas'],
                    robust=bool(f.get('robust', False)),
                    fixed_a=bool(f.get('fixed_a', False)))
                indices.append(('relative', idx, None))
            else:
                raise ValueError(f"unknown factor type {f['type']}")
        return indices

    # ------------------------------------------------------------------
    # Solving
    # ------------------------------------------------------------------

    def _bucket(self, n: int, minimum: int = 64) -> int:
        cap = minimum
        while cap < n:
            cap *= 2
        return cap

    def _solve(self) -> np.ndarray:
        """One warm-started incremental solve over the whole padded graph."""
        t0 = _time.perf_counter()
        n = max(self._n_keys, 1)
        cap = self._bucket(n)
        poses = np.zeros((cap, 7), np.float32)
        poses[:, 0] = 1.0
        poses[:n] = self._poses[:n]
        mask = np.zeros((cap,), bool)
        mask[:n] = True

        data = self.graph.to_device()
        result = sv.solve(data, jnp.asarray(poses), jnp.asarray(mask),
                          self.config.solver)
        out = np.asarray(jax.block_until_ready(result.poses))[:n]
        self._poses[:n] = out

        dt = (_time.perf_counter() - t0) * 1e3
        self.last_result = OptimizationResult(
            num_iterations=self.config.solver.gn_iterations,
            num_intermediate_steps=int(result.pcg_iterations),
            num_variables=n,
            initial_error=float(result.error_initial),
            final_error=float(result.error_final),
            duration_ms=dt)
        bench.record_value('estimator.solve_ms', dt)
        return self.pose_values()

    def estimate(self, new_factors: Sequence[dict],
                 new_values: Dict[int, np.ndarray],
                 timestamp_ns: Time = 0) -> np.ndarray:
        """Per-scan incremental estimate (incremental_estimator.cpp:151-163).

        Returns the full key->pose7 value table; callers push it back into
        their tracks via ``update_from_values``.
        """
        with bench.scoped_timer('estimator.estimate'):
            self._add_factors(new_factors)
            self._apply_new_values(new_values)
            return self._solve()

    def register_prior(self, new_factors: Sequence[dict],
                       new_values: Dict[int, np.ndarray],
                       worker_id: int) -> np.ndarray:
        """First-scan prior registration (incremental_estimator.cpp:268-291).

        Records the prior factor index of workers > 0 so it can be removed
        when the worker's graph becomes linked to worker 0's.
        """
        indices = self._add_factors(new_factors)
        self._apply_new_values(new_values)
        prior_indices = [i for kind, i, _ in indices if kind == 'prior']
        assert len(prior_indices) == 1, 'registerPrior expects one prior'
        if worker_id > 0:
            self._prior_factor_of_worker[worker_id] = prior_indices[0]
        self._linked_workers.append([worker_id])
        return self._solve()

    def estimate_and_remove(self, new_factors: Sequence[dict],
                            new_association_factors: Sequence[dict],
                            new_values: Dict[int, np.ndarray],
                            affected_worker_ids: Sequence[int],
                            timestamp_ns: Time = 0) -> np.ndarray:
        """Loop-closure estimate with linked-group prior removal
        (incremental_estimator.cpp:165-266).

        When the closure links two previously unlinked worker groups, the
        prior of the group NOT containing worker 0 is removed and the
        tighter 'first-association' factor is used instead.
        """
        assert len(affected_worker_ids) == 2
        a, b = affected_worker_ids
        removed_prior = None

        if a != b:
            group_a = self._find_group(a)
            group_b = self._find_group(b)
            if group_a is not group_b:
                keep, drop = (group_a, group_b) if 0 in group_a else \
                    (group_b, group_a)
                for wid in drop:
                    if wid in self._prior_factor_of_worker:
                        removed_prior = self._prior_factor_of_worker.pop(wid)
                keep.extend(drop)
                self._linked_workers.remove(drop)

        if removed_prior is not None:
            self.graph.remove_prior(removed_prior)
            chosen = new_association_factors
        else:
            chosen = new_factors
        self._add_factors(chosen)
        self._apply_new_values(new_values)
        return self._solve()

    def _find_group(self, worker_id: int) -> List[int]:
        for group in self._linked_workers:
            if worker_id in group:
                return group
        # Worker never registered a prior (estimator used standalone):
        # treat it as its own group.
        group = [worker_id]
        self._linked_workers.append(group)
        return group

    # ------------------------------------------------------------------
    # Loop closures (incremental_estimator.cpp:63-149)
    # ------------------------------------------------------------------

    def process_loop_closure(self, loop_closure: RelativePose) -> None:
        lc = loop_closure
        track_a = self.laser_tracks[lc.track_id_a]
        track_b = self.laser_tracks[lc.track_id_b]
        if lc.track_id_a == lc.track_id_b:
            assert lc.time_a_ns < lc.time_b_ns, 'loop closure has invalid time'
        assert track_a.get_min_time() <= lc.time_a_ns <= track_a.get_max_time()
        assert track_b.get_min_time() <= lc.time_b_ns <= track_b.get_max_time()

        # Frame conversion: the caller supplies a world-frame alignment
        # w_T_a_b; convert to the relative frame of node a
        # (incremental_estimator.cpp:83-87).
        w_T_a_b = jnp.asarray(np.asarray(lc.T_a_b, np.float32))
        T_w_a = jnp.asarray(track_a.evaluate(lc.time_a_ns))
        T_w_b = jnp.asarray(track_b.evaluate(lc.time_b_ns))
        a_T_a_b = se3.compose(se3.inverse(T_w_a),
                              se3.compose(w_T_a_b, T_w_b))

        if self.config.do_icp_step_on_loop_closures:
            with bench.scoped_timer('estimator.loop_closure_icp'):
                a_T_a_b = self._refine_loop_closure(lc, a_T_a_b)

        key_a = track_a.trajectory.key_at(lc.time_a_ns)
        key_b = track_b.trajectory.key_at(lc.time_b_ns)
        T_ab_np = np.asarray(a_T_a_b)

        lc_factor = dict(
            type='relative', key_a=key_a, key_b=key_b, T_a_b=T_ab_np,
            sigmas=np.asarray(self.config.loop_closure_noise_model,
                              np.float32),
            robust=self.config.add_m_estimator_on_loop_closures)
        assoc_factor = dict(
            type='relative', key_a=key_a, key_b=key_b, T_a_b=T_ab_np,
            sigmas=np.asarray(self.config.first_association_noise_model,
                              np.float32),
            robust=False)

        stored = RelativePose(
            T_a_b=T_ab_np, time_a_ns=lc.time_a_ns, time_b_ns=lc.time_b_ns,
            key_a=key_a, key_b=key_b,
            track_id_a=lc.track_id_a, track_id_b=lc.track_id_b)
        track_b.loop_closures.append(stored)

        values = self.estimate_and_remove(
            [lc_factor], [assoc_factor], {},
            [lc.track_id_a, lc.track_id_b], lc.time_b_ns)

        for track in self.laser_tracks:
            track.update_from_values(values)

    def _refine_loop_closure(self, lc: RelativePose, a_T_a_b):
        """Submap-to-submap ICP refinement
        (incremental_estimator.cpp:90-115): registers the submap around
        time_b (of track b) against the submap around time_a (of track a),
        using the frame-converted estimate as the initial guess."""
        radius = self.config.loop_closures_sub_maps_radius
        sub_a, normals_a = self.laser_tracks[lc.track_id_a] \
            .build_submap_around_time(lc.time_a_ns, radius)
        sub_b, _ = self.laser_tracks[lc.track_id_b] \
            .build_submap_around_time(lc.time_b_ns, radius)
        icp_cfg = self.config.laser_track.icp
        result = icp_mod.icp(sub_b, sub_a, normals_a, a_T_a_b, icp_cfg)
        return jnp.where(result.valid, result.T, a_T_a_b)

    # ------------------------------------------------------------------
    # Covariances (laser_track.cpp:421-429 path)
    # ------------------------------------------------------------------

    def marginal_covariances(self, keys: Sequence[int]) -> np.ndarray:
        n = max(self._n_keys, 1)
        cap = self._bucket(n)
        poses = np.zeros((cap, 7), np.float32)
        poses[:, 0] = 1.0
        poses[:n] = self._poses[:n]
        mask = np.zeros((cap,), bool)
        mask[:n] = True
        covs = sv.marginal_covariance(
            self.graph.to_device(), jnp.asarray(poses), jnp.asarray(mask),
            jnp.asarray(np.asarray(keys, np.int32)), self.config.solver)
        return np.asarray(covs)
