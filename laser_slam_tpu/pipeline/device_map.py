"""Device-resident local/distant map for the online fast path.

The host worker (pipeline.worker) keeps its accumulated map in numpy and
round-trips through the device for filtering — fine for offline replay,
but the production online path (pipeline.online) must not move per-scan
point clouds over the host link at all.  This module keeps the map ON
DEVICE: scans are appended straight from the online state's scan ring,
voxel/cylindrical filtering and the near/far (local/distant) separation
run as one jitted step, and post-loop-closure re-rigidification is a
single batched transform.

Functional mirror of the reference's map pipeline:
* accumulation        — scanCallback, laser_slam_worker.cpp:235-246
* filtering/separation — getFilteredMap, laser_slam_worker.cpp:415-488
* re-rigidify          — updateLocalMap, laser_slam_worker.cpp:522-540
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.config import WorkerConfig
from laser_slam_tpu.ops import cloud as pc
from laser_slam_tpu.ops import se3


class MapState(NamedTuple):
    """Fixed-capacity world-frame point buffer (SENTINEL-parked)."""
    points: jax.Array  # [M,3]
    mask: jax.Array    # [M]
    cursor: jax.Array  # int32 next write row (rows < cursor may be invalid)


def init_map(capacity: int) -> MapState:
    return MapState(
        points=jnp.full((capacity, 3), pc.SENTINEL, jnp.float32),
        mask=jnp.zeros((capacity,), bool),
        cursor=jnp.int32(0))


def _as_cloud(m: MapState) -> pc.Cloud:
    return pc.Cloud(m.points, m.mask)


def _compact_map(m: MapState, voxel_size_m: float) -> MapState:
    """Voxel-compact in place when the buffer runs out of rows
    (worker._compact_map semantics)."""
    c = pc.voxel_filter(_as_cloud(m), voxel_size_m, 1)
    c = pc.compact(c, m.points.shape[0])
    return MapState(points=c.points, mask=c.mask,
                    cursor=jnp.sum(c.mask).astype(jnp.int32))


def _accumulate(m: MapState, scan_points: jax.Array, scan_mask: jax.Array,
                T_w: jax.Array, config: WorkerConfig) -> MapState:
    """Append one sensor-frame scan, transformed to world, to the map.

    Fixed-shape: the scan's N rows are scattered at ``cursor`` (invalid
    rows keep mask False and stay parked).  When fewer than N rows remain
    the buffer is first voxel-compacted (laser_slam_worker.cpp:235-246 +
    the capacity policy the reference delegates to unbounded PCL vectors).
    """
    N = scan_points.shape[0]
    M = m.points.shape[0]
    world = se3.apply(T_w, scan_points)
    mask = scan_mask
    if config.remove_ground_from_local_map:
        z = T_w[6]
        keep = world[:, 2] > (z - config.ground_distance_to_robot_center_m)
        mask = mask & keep
    world = jnp.where(mask[:, None], world, pc.SENTINEL)

    m = jax.lax.cond(m.cursor + N > M,
                     lambda s: _compact_map(s, config.voxel_size_m),
                     lambda s: s, m)
    rows = m.cursor + jnp.arange(N)
    return MapState(
        points=m.points.at[rows].set(world, mode='drop'),
        mask=m.mask.at[rows].set(mask, mode='drop'),
        cursor=jnp.minimum(m.cursor + N, M))


accumulate_scan = functools.partial(jax.jit, static_argnames=('config',),
                                    donate_argnums=(0,))(_accumulate)


@functools.partial(jax.jit, static_argnames=('config',), donate_argnums=(0,))
def accumulate_scans(m: MapState, scan_points: jax.Array,
                     scan_mask: jax.Array, T_ws: jax.Array,
                     config: WorkerConfig) -> MapState:
    """Chunked accumulate: scan C scans ([C,N,3]/[C,N]/[C,7]) into the
    map in one dispatch — the mapper-side companion of
    ``online.online_chunk(return_scans=True)``, bit-identical to C
    sequential :func:`accumulate_scan` calls."""
    def body(m, x):
        pts, msk, T = x
        return _accumulate(m, pts, msk, T, config), None
    m, _ = jax.lax.scan(body, m, (scan_points, scan_mask, T_ws))
    return m


@functools.partial(jax.jit, static_argnames=('config',),
                   donate_argnums=(0, 1))
def filter_and_separate(local: MapState, distant: MapState,
                        center: jax.Array, config: WorkerConfig
                        ) -> Tuple[MapState, MapState]:
    """Voxel-filter the local map and migrate far points to the distant
    map (getFilteredMap, laser_slam_worker.cpp:415-488).

    Near points (inside the cylinder around ``center``) stay in the live
    local map, voxel-filtered and compacted; far points are voxel-filtered
    once and appended to the distant buffer (static thereafter, except for
    loop-closure re-rigidification).
    """
    c = _as_cloud(local)
    near = pc.cylindrical_filter(c, center,
                                 config.distance_to_consider_fixed,
                                 config.cylinder_height_m, False)
    near = pc.voxel_filter(near, config.voxel_size_m,
                           config.minimum_point_number_per_voxel)
    near = pc.compact(near, local.points.shape[0])
    new_local = MapState(points=near.points, mask=near.mask,
                         cursor=jnp.sum(near.mask).astype(jnp.int32))

    if not config.separate_distant_map:
        return new_local, distant

    far = pc.cylindrical_filter(c, center,
                                config.distance_to_consider_fixed,
                                config.cylinder_height_m, True)
    far = pc.voxel_filter(far, config.voxel_size_m,
                          config.minimum_point_number_per_voxel)
    far = pc.compact(far, local.points.shape[0])
    D = distant.points.shape[0]
    rows = distant.cursor + jnp.arange(far.points.shape[0])
    # Out-of-capacity distant points are dropped (bounded-memory policy;
    # the far map is fixed scenery, so dropping the newest duplicates is
    # benign — voxel dedup below would have removed most anyway).
    new_distant = MapState(
        points=distant.points.at[rows].set(
            jnp.where(far.mask[:, None], far.points, pc.SENTINEL),
            mode='drop'),
        mask=distant.mask.at[rows].set(far.mask, mode='drop'),
        cursor=jnp.minimum(
            distant.cursor + jnp.sum(far.mask).astype(jnp.int32),
            D))
    return new_local, new_distant


@jax.jit
def rigidify(m: MapState, T: jax.Array) -> MapState:
    """Transform the whole map by ``T`` after a loop closure
    (updateLocalMap, laser_slam_worker.cpp:522-540)."""
    pts = se3.apply(T, m.points)
    return m._replace(points=jnp.where(m.mask[:, None], pts, pc.SENTINEL))


class DeviceMapper:
    """Host driver for the device-resident map, companion to
    ``pipeline.online.OnlineRunner``.

    Keeps ONE (local, distant) map pair PER TRACK, mirroring the
    reference's per-worker maps (laser_slam_worker.hpp:157-159): a
    loop-closure correction re-rigidifies only the affected track's map,
    never points accumulated by other robots (updateLocalMap,
    laser_slam_worker.cpp:522-540, runs in each worker separately).

    Call :meth:`accumulate` after each processed scan (reads the newest
    ring entry + solved pose straight from the online state — no host
    transfer), :meth:`refresh` to run filtering/separation, and
    :meth:`rigidify` after loop closures.
    """

    def __init__(self, config: WorkerConfig, distant_capacity: int = 0,
                 n_tracks: int = 1):
        self.config = config
        self.n_tracks = n_tracks
        cap = config.local_map_capacity
        self.local_maps = [init_map(cap) for _ in range(n_tracks)]
        self.distant_maps = [init_map(distant_capacity or cap)
                             for _ in range(n_tracks)]

    # Single-track convenience views (bulk of deployments run one robot).
    @property
    def local(self) -> MapState:
        return self.local_maps[0]

    @local.setter
    def local(self, m: MapState) -> None:
        self.local_maps[0] = m

    @property
    def distant(self) -> MapState:
        return self.distant_maps[0]

    @distant.setter
    def distant(self, m: MapState) -> None:
        self.distant_maps[0] = m

    def accumulate(self, online_state, track_id: int = 0) -> None:
        """Append the newest scan of ``track_id`` from the online state's
        ring, transformed by its solved pose, to that track's map."""
        pts = online_state.ring_points[track_id, -1]
        msk = online_state.ring_mask[track_id, -1]
        key = online_state.track_last_key[track_id]
        T_w = online_state.traj_poses[jnp.maximum(key, 0)]
        self.local_maps[track_id] = accumulate_scan(
            self.local_maps[track_id], pts, msk, T_w, self.config)

    def accumulate_chunk(self, scan_points, scan_mask, pose7s,
                         track_id: int = 0) -> None:
        """Append a chunk's scans (the ``return_scans`` outputs of
        ``online.online_chunk``) to ``track_id``'s map in one dispatch."""
        self.local_maps[track_id] = accumulate_scans(
            self.local_maps[track_id], scan_points, scan_mask, pose7s,
            self.config)

    def refresh(self, center, track_id: int = 0) -> None:
        """Filter + near/far separation around ``center`` (world [3])."""
        self.local_maps[track_id], self.distant_maps[track_id] = \
            filter_and_separate(
                self.local_maps[track_id], self.distant_maps[track_id],
                jnp.asarray(center, jnp.float32), self.config)

    def rigidify(self, T_pose7, track_id: int = 0) -> None:
        """Apply a loop-closure correction to ONE track's maps."""
        T = jnp.asarray(T_pose7, jnp.float32)
        self.local_maps[track_id] = rigidify(self.local_maps[track_id], T)
        self.distant_maps[track_id] = rigidify(self.distant_maps[track_id],
                                               T)

    def local_points(self, track_id: int = 0) -> np.ndarray:
        """Host copy of a track's live local map valid points [n,3]."""
        m = self.local_maps[track_id]
        pts = np.asarray(m.points)
        return pts[np.asarray(m.mask)]

    def full_map(self, track_id: int = 0) -> np.ndarray:
        """Host copy of a track's local + distant valid points [n,3]."""
        m = self.distant_maps[track_id]
        d = np.asarray(m.points)[np.asarray(m.mask)]
        return np.concatenate([self.local_points(track_id), d])
