"""Time-indexed SE(3) trajectory container.

TPU-native replacement for mincurves ``curves::DiscreteSE3Curve``
(laser_slam/include/laser_slam/laser_track.hpp:147,208): a growable
(times, poses, keys) table where keys are allocated by the caller (the
estimator owns the global key space, like GTSAM's Values).  Evaluation at
a knot returns it exactly; between knots it interpolates (slerp + lerp),
matching DiscreteSE3Curve's piecewise behavior used by
``findNearestPose``/odometry-free mode (laser_slam_worker.cpp:148).

The authoritative copy is host-side numpy (appends are O(1) amortized);
``poses_device()`` materializes the padded device view used to warm-start
the solver.
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.ops import se3
from laser_slam_tpu.core.types import Time


class SE3Trajectory:
    def __init__(self, capacity: int = 256):
        self._times = np.zeros((capacity,), np.int64)
        self._poses = np.zeros((capacity, 7), np.float32)
        self._poses[:, 0] = 1.0
        self._keys = np.zeros((capacity,), np.int64)
        self.size = 0

    # -- capacity -----------------------------------------------------------
    def _grow(self):
        cap = self._times.shape[0] * 2
        for name in ('_times', '_poses', '_keys'):
            old = getattr(self, name)
            new = np.zeros((cap,) + old.shape[1:], old.dtype)
            new[:old.shape[0]] = old
            setattr(self, name, new)
        self._poses[self.size:, 0] = 1.0

    # -- mutation -----------------------------------------------------------
    def extend(self, time_ns: Time, pose7, key: int) -> None:
        """Append a knot (replaces DiscreteSE3Curve::extend,
        laser_track.cpp:573-582).  Times must be strictly increasing."""
        if self.size and time_ns <= self._times[self.size - 1]:
            raise ValueError(
                f'non-increasing trajectory time {time_ns} after '
                f'{self._times[self.size - 1]}')
        if self.size == self._times.shape[0]:
            self._grow()
        self._times[self.size] = time_ns
        self._poses[self.size] = np.asarray(pose7, np.float32)
        self._keys[self.size] = key
        self.size += 1

    def update_from_values(self, values: np.ndarray) -> None:
        """Overwrite knot poses from a solver result table indexed by key
        (replaces DiscreteSE3Curve::updateFromGTSAMValues,
        laser_track.cpp:416-419)."""
        keys = self._keys[:self.size]
        self._poses[:self.size] = values[keys]

    # -- queries ------------------------------------------------------------
    def is_empty(self) -> bool:
        return self.size == 0

    def min_time(self) -> Time:
        return int(self._times[0]) if self.size else 0

    def max_time(self) -> Time:
        return int(self._times[self.size - 1]) if self.size else 0

    def times(self) -> np.ndarray:
        return self._times[:self.size].copy()

    def keys(self) -> np.ndarray:
        return self._keys[:self.size].copy()

    def poses(self) -> np.ndarray:
        return self._poses[:self.size].copy()

    def key_at(self, time_ns: Time) -> int:
        i = int(np.searchsorted(self._times[:self.size], time_ns))
        if i >= self.size or self._times[i] != time_ns:
            raise KeyError(f'no trajectory node at time {time_ns}')
        return int(self._keys[i])

    def evaluate(self, time_ns: Time) -> np.ndarray:
        """Pose at a time: exact at knots, interpolated between them
        (DiscreteSE3Curve::evaluate semantics)."""
        if not self.size:
            raise ValueError('empty trajectory')
        t = self._times[:self.size]
        if time_ns <= t[0]:
            return self._poses[0].copy()
        if time_ns >= t[self.size - 1]:
            return self._poses[self.size - 1].copy()
        i = int(np.searchsorted(t, time_ns))
        if t[i] == time_ns:
            return self._poses[i].copy()
        # Interpolate on the connecting geodesic.
        t0, t1 = t[i - 1], t[i]
        alpha = float(time_ns - t0) / float(t1 - t0)
        a = jnp.asarray(self._poses[i - 1])
        b = jnp.asarray(self._poses[i])
        xi = se3.local(a, b)
        return np.asarray(se3.retract(a, alpha * xi))

    def as_dict(self):
        """Trajectory as {time_ns: pose7} (reference getTrajectory,
        laser_track.cpp:268-278)."""
        return {int(self._times[i]): self._poses[i].copy()
                for i in range(self.size)}

    def save_csv(self, path: str) -> None:
        """time_ns,x,y,z rows (exportTrajectories format,
        laser_slam_worker.cpp:551-565)."""
        m = np.zeros((self.size, 4))
        m[:, 0] = self._times[:self.size]
        m[:, 1:] = self._poses[:self.size, 4:]
        np.savetxt(path, m, delimiter=',', fmt='%.9g')
