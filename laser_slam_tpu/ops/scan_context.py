"""TPU-native place recognition: polar scan descriptors, MXU-batched.

The reference framework has no loop-closure *detection* of its own — it
receives ready-made alignments from the external segmatch node
(``IncrementalEstimator::processLoopClosure`` is called from outside,
/root/reference/laser_slam/src/incremental_estimator.cpp:63; the worker
logs under the "[SegMapper]" tag, laser_slam_worker.cpp:249).  A user
switching frameworks needs the capability in-tree, so this module
provides it as a first-class component.

Method (idea-level, Scan Context: Kim & Kim, IROS 2018): each scan is
summarized by a polar grid over (radial ring, azimuth sector) whose cell
value is the maximum point height — a compact, viewpoint-robust
signature of the surrounding structure.  Two scans of the same place
from different headings differ only by a circular shift of the sector
axis, so matching scores all rotations and the best shift doubles as a
yaw initial guess for the loop-closure ICP refinement.

TPU-first design: the original needs a ring-key kd-tree prefilter
because a CPU cannot afford exhaustive matching; on the MXU the ENTIRE
database is matched against ALL rotations of the query in one einsum
(a [K, R*S] x [R*S, S] matmul — ~300 MFLOP at K=4096, microseconds),
so the two-stage search is deliberately absent.  Descriptors are built
by scatter-max on the padded cloud (fixed shapes, mask-driven), and the
database is a fixed-capacity device-resident table: add/query never
move point clouds to the host.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from laser_slam_tpu.ops import cloud as pc


@functools.partial(jax.jit, static_argnames=('n_rings', 'n_sectors'))
def descriptor(points: jax.Array, mask: jax.Array, n_rings: int = 20,
               n_sectors: int = 60, max_radius_m: float = 80.0,
               z_offset_m: float = 2.0) -> jax.Array:
    """Polar max-height descriptor of one (padded) scan.

    points [N,3] in the sensor frame, mask [N].  Returns [R,S] float32:
    cell (r, s) holds ``max(z + z_offset_m, 0)`` over the points whose
    planar radius falls in ring r and azimuth in sector s; empty cells
    are 0.  ``z_offset_m`` keeps typical ground returns (below the
    sensor) positive so "occupied at ground level" and "empty" differ.
    """
    xy = points[:, :2]
    radius = jnp.linalg.norm(xy, axis=1)
    azimuth = jnp.arctan2(points[:, 1], points[:, 0])  # [-pi, pi)
    ring = jnp.floor(radius / max_radius_m * n_rings).astype(jnp.int32)
    sector = jnp.floor((azimuth + jnp.pi) / (2 * jnp.pi) * n_sectors
                       ).astype(jnp.int32)
    sector = jnp.clip(sector, 0, n_sectors - 1)  # azimuth == +pi edge
    valid = mask & (ring >= 0) & (ring < n_rings)
    flat = jnp.where(valid, ring * n_sectors + sector, n_rings * n_sectors)
    value = jnp.maximum(points[:, 2] + z_offset_m, 0.0)
    cells = jnp.zeros((n_rings * n_sectors,), jnp.float32)
    cells = cells.at[flat].max(jnp.where(valid, value, 0.0), mode='drop')
    return cells.reshape(n_rings, n_sectors)


def ring_key(desc: jax.Array) -> jax.Array:
    """Rotation-invariant [R] signature: per-ring occupancy ratio.

    Kept for API parity with the original method (useful as a cheap
    pre-filter off-TPU); the device query path does not need it.
    """
    return jnp.mean((desc > 0).astype(jnp.float32), axis=-1)


def _normalize_columns(desc: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Unit-normalize each sector column of [..., R, S]; zero columns stay
    zero.  Returns (normalized, column-valid mask [..., S])."""
    norm = jnp.linalg.norm(desc, axis=-2, keepdims=True)
    valid = norm[..., 0, :] > 0
    return desc / jnp.where(norm > 0, norm, 1.0), valid


@jax.jit
def distance_batch(db: jax.Array, db_valid: jax.Array, query: jax.Array
                   ) -> Tuple[jax.Array, jax.Array]:
    """Scan-context distance of ``query`` [R,S] to every database entry.

    db [K,R,S], db_valid [K] bool.  For each entry the distance is
    ``1 - max_shift mean_columns cos(column_db, column_query_shifted)``
    (mean over sector columns where both sides are non-empty), minimized
    over all S circular shifts of the query — rotation invariance with
    the arg-max shift returned as the yaw estimate.

    Returns (dist [K] float32 — invalid entries get 2.0, above any real
    distance; shift [K] int32).
    """
    S = query.shape[-1]
    db_n, db_cv = _normalize_columns(db)          # [K,R,S], [K,S]
    q_n, q_cv = _normalize_columns(query)         # [R,S],   [S]
    # All S rotations of the query: shifted[r, s, j] = q_n[r, (j+s) % S].
    idx = (jnp.arange(S)[None, :] + jnp.arange(S)[:, None]) % S  # [S,S]
    q_shift = q_n[:, idx]                         # [R, S(shift), S(col)]
    qv_shift = q_cv[idx]                          # [S(shift), S(col)]
    # One MXU contraction scores every (entry, shift) pair.
    corr = jnp.einsum('krj,rsj->ks', db_n, q_shift)              # [K,S]
    npairs = jnp.einsum('kj,sj->ks', db_cv.astype(jnp.float32),
                        qv_shift.astype(jnp.float32))            # [K,S]
    sim = corr / jnp.maximum(npairs, 1.0)
    best = jnp.argmax(sim, axis=1)
    dist = 1.0 - jnp.take_along_axis(sim, best[:, None], axis=1)[:, 0]
    dist = jnp.where(db_valid & (npairs.max(axis=1) > 0), dist, 2.0)
    return dist, best.astype(jnp.int32)


def yaw_from_shift(shift: jax.Array, n_sectors: int) -> jax.Array:
    """Relative yaw (rad) implied by the matching shift.

    If entry ``a`` matches the query ``b`` at ``shift`` s, then scan b's
    frame is rotated by ``yaw`` about +z relative to a's: with
    ``a_T_b = Rz(yaw)``, a point at azimuth t in b appears at t + yaw in
    a, moving its sector by yaw/delta — which the match compensates by
    rolling the query, so yaw = -s * delta (wrapped to [-pi, pi))."""
    delta = 2 * jnp.pi / n_sectors
    yaw = -shift.astype(jnp.float32) * delta
    return jnp.mod(yaw + jnp.pi, 2 * jnp.pi) - jnp.pi


@functools.partial(jax.jit, static_argnames=('n_rings', 'n_sectors'))
def descriptor_and_query(db: jax.Array, db_keys: jax.Array,
                         points: jax.Array, mask: jax.Array,
                         newest_allowed_key: jax.Array,
                         n_rings: int = 20, n_sectors: int = 60,
                         max_radius_m: float = 80.0,
                         z_offset_m: float = 2.0):
    """Fused add+query step for a database table (one dispatch).

    db [K,R,S]; db_keys [K] int32 (global pose key per slot, -1 = empty).
    Entries with key > ``newest_allowed_key`` are excluded (temporal
    neighborhood of the query — trivial matches).  Returns
    (desc [R,S], dist [K], shift [K]).
    """
    desc = descriptor(points, mask, n_rings=n_rings, n_sectors=n_sectors,
                      max_radius_m=max_radius_m, z_offset_m=z_offset_m)
    valid = (db_keys >= 0) & (db_keys <= newest_allowed_key)
    dist, shift = distance_batch(db, valid, desc)
    return desc, dist, shift
