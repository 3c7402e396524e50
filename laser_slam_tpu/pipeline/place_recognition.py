"""Device-resident place-recognition database (scan-context detector).

Owns a fixed-capacity table of polar scan descriptors
(ops/scan_context.py) and answers "have I been here before?" queries
against ALL stored entries at once — one einsum on the MXU scores every
(entry, rotation) pair, so there is no candidate pre-selection stage.

The reference framework sources loop closures from the external
segmatch place-recognition node (SURVEY.md L2;
/root/reference/laser_slam/src/incremental_estimator.cpp:63 receives
ready-made ``RelativePose`` alignments).  This detector replaces that
external dependency: it emits the same (key_a, key_b, world-frame
alignment guess) triple the estimator APIs consume, with the yaw from
the descriptor match seeding the submap-ICP refinement
(incremental_estimator.cpp:90-115 / online_loop_closure_refined).

Standalone use (host or device arrays both work):

    det = ScanContextDetector(PlaceRecognitionConfig())
    det.add(points, mask, key=k)                  # stays on device
    hit = det.query(points, mask, key=k)          # Detection | None

or attach to an OnlineRunner via ``place_recognition=...`` for fully
automatic loop closing.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from laser_slam_tpu.config import PlaceRecognitionConfig
from laser_slam_tpu.ops import scan_context as sc


class Detection(NamedTuple):
    """A place match: database entry ``key`` seen again by the query."""
    key: int             # global pose key of the matched (older) scan
    distance: float      # scan-context distance (0 identical)
    yaw_rad: float       # a_T_b yaw guess: match frame rotated vs query


@functools.partial(jax.jit, static_argnames=('n_sectors',))
def _best(dist: jax.Array, shift: jax.Array, db_keys: jax.Array,
          n_sectors: int) -> jax.Array:
    """[3] f32: (matched key, distance, yaw) of the arg-min entry — one
    small array so the host pays a single transfer per query."""
    i = jnp.argmin(dist)
    yaw = sc.yaw_from_shift(shift[i], n_sectors)
    return jnp.stack([db_keys[i].astype(jnp.float32), dist[i], yaw])


class ScanContextDetector:
    """Fixed-shape descriptor database with add/query in device dispatches.

    Capacity doubles when full (power-of-two bucketing, same recompile
    policy as the online state tables).
    """

    def __init__(self, config: Optional[PlaceRecognitionConfig] = None):
        self.config = config or PlaceRecognitionConfig()
        c = self.config
        self.db = jnp.zeros((c.db_capacity, c.n_rings, c.n_sectors),
                            jnp.float32)
        self.db_keys = jnp.full((c.db_capacity,), -1, jnp.int32)
        self.n = 0

    def _ensure_capacity(self) -> None:
        self.ensure_room(1)

    def ensure_room(self, extra: int = 1) -> None:
        """Grow the table so ``extra`` more adds fit (the chunked online
        path adds a whole chunk of descriptors in one dispatch)."""
        cap = self.db.shape[0]
        need = self.n + extra
        new_cap = cap
        while new_cap < need:
            new_cap *= 2
        if new_cap == cap:
            return
        pad = new_cap - cap
        self.db = jnp.concatenate(
            [self.db, jnp.zeros((pad,) + self.db.shape[1:], jnp.float32)])
        self.db_keys = jnp.concatenate(
            [self.db_keys, jnp.full((pad,), -1, jnp.int32)])

    def _descriptor(self, points, mask) -> jax.Array:
        c = self.config
        return sc.descriptor(jnp.asarray(points), jnp.asarray(mask),
                             n_rings=c.n_rings, n_sectors=c.n_sectors,
                             max_radius_m=c.max_radius_m,
                             z_offset_m=c.z_offset_m)

    def _store(self, desc: jax.Array, key: int) -> None:
        self._ensure_capacity()
        self.db = self.db.at[self.n].set(desc)
        self.db_keys = self.db_keys.at[self.n].set(jnp.int32(key))
        self.n += 1

    def add(self, points, mask, key: int) -> None:
        """Insert one scan (sensor-frame padded points + mask) under its
        global pose key.  No host transfer."""
        self._store(self._descriptor(points, mask), key)

    def query_async(self, points, mask, key: int,
                    add: bool = False) -> Optional[jax.Array]:
        """Dispatch a query; return its [3] f32 (matched key, distance,
        yaw) result WITHOUT fetching it to the host.  The caller decides
        when to pay the D2H latency — stack several results and read
        them in one transfer (PlaceRecognitionConfig.fetch_every), or
        wrap in :meth:`to_detection` immediately.  None if the database
        is empty (nothing to match)."""
        c = self.config
        desc, dist, shift = sc.descriptor_and_query(
            self.db, self.db_keys, jnp.asarray(points), jnp.asarray(mask),
            jnp.int32(key - c.exclude_recent_keys),
            n_rings=c.n_rings, n_sectors=c.n_sectors,
            max_radius_m=c.max_radius_m, z_offset_m=c.z_offset_m)
        out = None
        if self.n > 0:
            out = _best(dist, shift, self.db_keys, c.n_sectors)
        if add:
            self._store(desc, key)
        return out

    def to_detection(self, row) -> Optional[Detection]:
        """Interpret one fetched (host) [3] result row against the
        acceptance threshold."""
        k, d, yaw = float(row[0]), float(row[1]), float(row[2])
        if d <= self.config.distance_threshold and k >= 0:
            return Detection(key=int(k), distance=d, yaw_rad=yaw)
        return None

    def query(self, points, mask, key: int,
              add: bool = False) -> Optional[Detection]:
        """Match a scan against every stored entry older than
        ``key - exclude_recent_keys``; optionally also insert it
        (``add=True`` fuses the descriptor build).  Returns the best
        match if it clears ``distance_threshold``, else None.

        The return value requires a small device->host fetch that blocks
        on the dispatched stream — see
        PlaceRecognitionConfig.detect_every / fetch_every for cadence
        guidance (query_async defers the fetch)."""
        import numpy as np
        res = self.query_async(points, mask, key, add=add)
        if res is None:
            return None
        return self.to_detection(np.asarray(res))
