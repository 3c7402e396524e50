"""Padded point-cloud substrate and tensorized filter chain.

TPU-native replacement for libpointmatcher ``DataPoints`` +
``DataPointsFilters`` (applied at laser_track.cpp:146) and the PCL
VoxelGrid / cylindrical filters used by the worker's map layer
(laser_slam_worker.cpp:437-440, laser_slam_ros/common.hpp:194-223).

A cloud is a pytree ``Cloud(points[N,3], mask[N])`` with a *static* capacity
N; invalid slots are masked out and parked at a far sentinel position so
they never win a nearest-neighbor query.  All filters are shape-preserving
(they only flip mask bits and compact), which keeps every consumer jittable.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from laser_slam_tpu.ops import se3

# Far-away parking spot for invalid points; large enough to lose any NN
# query, small enough to stay well inside f32 range when squared.
SENTINEL = 1.0e6


class Cloud(NamedTuple):
    """Fixed-capacity point cloud. points: [N,3] f32, mask: [N] bool."""
    points: jax.Array
    mask: jax.Array

    @property
    def capacity(self) -> int:
        return self.points.shape[-2]

    def count(self) -> jax.Array:
        """Number of valid points (traced scalar)."""
        return jnp.sum(self.mask, axis=-1)


def make_cloud(points, mask=None, capacity: Optional[int] = None) -> Cloud:
    """Build a Cloud from raw points [M,3], padding/truncating to capacity."""
    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    if capacity is None:
        capacity = n
    if n > capacity:
        points, mask = points[:capacity], mask[:capacity]
        n = capacity
    pad = capacity - n
    if pad:
        points = jnp.concatenate(
            [points, jnp.full((pad, 3), SENTINEL, points.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
    return Cloud(jnp.where(mask[:, None], points, SENTINEL), mask)


def empty_cloud(capacity: int) -> Cloud:
    return Cloud(jnp.full((capacity, 3), SENTINEL, jnp.float32),
                 jnp.zeros((capacity,), bool))


def park_invalid(cloud: Cloud) -> Cloud:
    """Move masked-out points to the sentinel position."""
    return Cloud(jnp.where(cloud.mask[..., None], cloud.points, SENTINEL),
                 cloud.mask)


def transform(pose7, cloud: Cloud) -> Cloud:
    """Rigid-transform a cloud; invalid points stay parked.

    Replaces ``rigid_transformation_->compute(cloud, T)``
    (laser_track.cpp:485,630).
    """
    pts = se3.apply(pose7, cloud.points)
    return Cloud(jnp.where(cloud.mask[..., None], pts, SENTINEL), cloud.mask)


def concatenate(clouds, capacity: Optional[int] = None) -> Cloud:
    """Concatenate clouds along the point axis (static shapes).

    Replaces ``DataPoints::concatenate`` in submap assembly
    (laser_track.cpp:485, buildSubMapAroundTime).
    """
    points = jnp.concatenate([c.points for c in clouds], axis=-2)
    mask = jnp.concatenate([c.mask for c in clouds], axis=-1)
    out = Cloud(points, mask)
    if capacity is not None and capacity != out.capacity:
        out = compact(out, capacity)
    return out


def _pack_scatter(cloud: Cloud, capacity: int) -> Cloud:
    """Order-preserving pack of valid points to the front of a
    ``capacity``-sized cloud via cumsum + scatter-drop.

    O(N) prefix-sum instead of an argsort: a 131k-key TPU sort is a
    multi-pass bitonic network (~several ms), while the cumsum+scatter
    pair is one log-depth scan plus one row scatter (measured swap in
    compact/compact_decimate: the dominant cost of the KITTI-density
    ingest stage).  Valid points whose packed position exceeds
    ``capacity`` are dropped (same tail-drop semantics as sorting then
    truncating).
    """
    mask = cloud.mask
    dest = jnp.cumsum(mask, axis=-1) - 1           # packed position
    dest = jnp.where(mask, dest, capacity)         # invalid -> dropped
    shape = mask.shape[:-1]
    out_pts = jnp.full(shape + (capacity, 3), SENTINEL, cloud.points.dtype)
    out_msk = jnp.zeros(shape + (capacity,), bool)
    out_pts = jnp.put_along_axis(
        out_pts, jnp.broadcast_to(dest[..., None], cloud.points.shape),
        cloud.points, axis=-2, inplace=False, mode='drop')
    out_msk = jnp.put_along_axis(out_msk, dest, mask, axis=-1,
                                 inplace=False, mode='drop')
    return Cloud(out_pts, out_msk)


def compact(cloud: Cloud, capacity: int) -> Cloud:
    """Pack valid points to the front and resize to ``capacity``.

    If more than ``capacity`` points are valid the tail is dropped
    (callers that care should downsample first).
    """
    return _pack_scatter(cloud, capacity)


def compact_decimate(cloud: Cloud, capacity: int) -> Cloud:
    """Pack valid points first, then EVENLY stride-decimate down to
    ``capacity``.

    ``compact`` keeps the FIRST ``capacity`` valid points in scan order —
    fine for unordered clouds, but a real spinning-LiDAR scan is
    ring-major (all azimuths of beam 0, then beam 1, ...), so prefix
    truncation keeps only the top few rings: a horizontal stripe with no
    ground, leaving ICP unconstrained in z/pitch (measured: 1.5 m
    systematic drift on 131k-point beam scans truncated to 8k).  The even
    stride samples the whole packed range, preserving ring and azimuth
    coverage for any overflow factor.
    """
    n = cloud.capacity
    if capacity >= n:
        return compact(cloud, capacity)
    packed = _pack_scatter(cloud, n)                # sort-free pack
    pts, msk = packed.points, packed.mask
    nv = jnp.sum(cloud.mask, axis=-1)[..., None]    # [...,1]
    i = jnp.arange(capacity)
    # f32 stride avoids i*nv int32 overflow at 131k capacities; rounding
    # may duplicate the odd row, which is harmless (still a valid point).
    stride_rows = (i.astype(jnp.float32)
                   * (nv.astype(jnp.float32) / capacity)).astype(jnp.int32)
    rows = jnp.where(nv > capacity,
                     jnp.clip(stride_rows, 0, n - 1),
                     jnp.broadcast_to(i, stride_rows.shape))
    new_pts = jnp.take_along_axis(pts, rows[..., None], axis=-2)
    new_msk = jnp.take_along_axis(msk, rows, axis=-1)
    return park_invalid(Cloud(new_pts, new_msk))


# ---------------------------------------------------------------------------
# Filters (mask-only, shape preserving)
# ---------------------------------------------------------------------------

def range_filter(cloud: Cloud, min_dist: float = 0.0,
                 max_dist: float = jnp.inf) -> Cloud:
    """Keep points with min_dist <= ||p|| <= max_dist (sensor frame).

    Replaces the typical Min/MaxDistDataPointsFilter entries of the
    reference's input-filter YAML (laser_track.cpp:24-30).
    """
    d2 = jnp.sum(cloud.points * cloud.points, axis=-1)
    keep = (d2 >= min_dist * min_dist) & (d2 <= max_dist * max_dist)
    return park_invalid(Cloud(cloud.points, cloud.mask & keep))


def random_sampling_filter(cloud: Cloud, prob: float, key) -> Cloud:
    """Keep each valid point with probability ``prob``.

    Replaces RandomSamplingDataPointsFilter (icp_default.yaml:2-3).
    """
    if prob >= 1.0:
        return cloud
    keep = jax.random.uniform(key, cloud.mask.shape) < prob
    return park_invalid(Cloud(cloud.points, cloud.mask & keep))


def box_filter(cloud: Cloud, center, half_extent) -> Cloud:
    """Keep points inside an axis-aligned box."""
    inside = jnp.all(jnp.abs(cloud.points - center) <= half_extent, axis=-1)
    return park_invalid(Cloud(cloud.points, cloud.mask & inside))


def cylindrical_filter(cloud: Cloud, center, radius_m: float,
                       height_m: float, remove_inside: bool) -> Cloud:
    """Keep (or remove) points inside a vertical cylinder around ``center``.

    Mirrors ``applyCylindricalFilter`` (laser_slam_ros/common.hpp:194-223)
    used for local/distant map separation (laser_slam_worker.cpp:423-463).
    """
    center = jnp.asarray(center, cloud.points.dtype)
    d2 = jnp.sum((cloud.points[..., :2] - center[:2]) ** 2, axis=-1)
    dz = jnp.abs(cloud.points[..., 2] - center[2])
    inside = (d2 <= radius_m * radius_m) & (dz <= height_m / 2.0)
    keep = jnp.where(remove_inside, ~inside, inside)
    return park_invalid(Cloud(cloud.points, cloud.mask & keep))


def ground_filter(cloud: Cloud, robot_height_m, ground_clearance_m) -> Cloud:
    """Remove points below robot_height - clearance (world frame).

    Mirrors the ground-removal loop in scanCallback
    (laser_slam_worker.cpp:221-233).
    """
    keep = cloud.points[..., 2] > (robot_height_m - ground_clearance_m)
    return park_invalid(Cloud(cloud.points, cloud.mask & keep))


def voxel_filter(cloud: Cloud, voxel_size_m: float,
                 min_points_per_voxel: int = 1,
                 hash_capacity: Optional[int] = None) -> Cloud:
    """Voxel-grid downsample: keep one representative per occupied voxel.

    Scatter-based replacement for PCL VoxelGrid with
    ``setMinimumPointsNumberPerVoxel`` (laser_slam_worker.cpp:70-72,439-440).
    Representative = the first valid point hashed into the voxel (PCL uses
    the centroid; first-point is standard for LiDAR maps and keeps the op a
    pure scatter).  Voxels with fewer than ``min_points_per_voxel`` points
    are dropped.
    """
    n = cloud.capacity
    if hash_capacity is None:
        hash_capacity = max(2 * n, 1024)
    cell = jnp.floor(cloud.points / voxel_size_m).astype(jnp.int32)
    # 3-way hash of the voxel coordinate -> [0, hash_capacity)
    h = _hash_cells(cell, hash_capacity)
    h = jnp.where(cloud.mask, h, hash_capacity)  # invalid -> overflow bucket

    counts = jnp.zeros((hash_capacity + 1,), jnp.int32).at[h].add(1)
    # First valid point index per bucket.
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.full((hash_capacity + 1,), n, jnp.int32).at[h].min(idx)
    keep = (first[h] == idx) & (counts[h] >= min_points_per_voxel) & cloud.mask
    return park_invalid(Cloud(cloud.points, keep))


def _hash_cells(cell_ijk, capacity: int) -> jax.Array:
    """Spatial hash of integer cells [...,3] -> [0, capacity).

    Unsigned modulo — abs() would fold sign-symmetric cells onto the same
    bucket (systematic collisions for scenes straddling the origin).
    """
    p1, p2, p3 = jnp.int32(73856093), jnp.int32(19349663), jnp.int32(83492791)
    h = (cell_ijk[..., 0] * p1) ^ (cell_ijk[..., 1] * p2) ^ (cell_ijk[..., 2] * p3)
    return (h.astype(jnp.uint32) % jnp.uint32(capacity)).astype(jnp.int32)


def apply_filter_chain(cloud: Cloud, chain, key=None) -> Cloud:
    """Apply an ordered, configurable filter chain (jit-friendly).

    ``chain`` is the canonical tuple built by config._canonical_chain —
    the TPU-native equivalent of libpointmatcher's ordered
    DataPointsFilters file applied at ingest (laser_track.cpp:24-30,146).
    All parameters are static (baked into the compiled step); only
    'random_sampling' consumes randomness from ``key``.
    """
    import jax.random as jrandom
    for name, raw in chain:
        p = dict(raw)
        if name == 'range':
            cloud = range_filter(cloud, p.get('min_distance_m', 0.0),
                                 p.get('max_distance_m', jnp.inf))
        elif name == 'random_sampling':
            if key is None:
                raise ValueError("filter chain contains 'random_sampling' "
                                 'but no PRNG key was provided')
            key, sub = jrandom.split(key)
            cloud = random_sampling_filter(cloud, float(p['prob']), sub)
        elif name == 'box':
            cloud = box_filter(cloud,
                               jnp.asarray(p['center'], jnp.float32),
                               jnp.asarray(p['half_extent'], jnp.float32))
        elif name == 'cylindrical':
            cloud = cylindrical_filter(
                cloud, jnp.asarray(p.get('center', (0.0, 0.0, 0.0)),
                                   jnp.float32),
                float(p['radius_m']), float(p.get('height_m', 1e6)),
                bool(p.get('remove_inside', False)))
        elif name == 'ground':
            cloud = ground_filter(cloud, float(p['robot_height_m']),
                                  float(p.get('ground_clearance_m', 0.0)))
        elif name == 'voxel':
            cloud = voxel_filter(cloud, float(p['voxel_size_m']),
                                 int(p.get('min_points_per_voxel', 1)))
        else:
            raise ValueError(f'unknown input filter type {name!r}')
    return cloud


# ---------------------------------------------------------------------------
# Surface normals
# ---------------------------------------------------------------------------

def _smallest_eigvec_3x3(A) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue of symmetric [...,3,3].

    Closed form: eigenvalues via the trigonometric (Cardano) formula, then
    the eigenvector as the strongest cross product of rows of (A - l I).
    Fully elementwise — batched-friendly on the VPU.
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    tr = a00 + a11 + a22
    q = tr / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22 +
          2.0 * (a01 * a01 + a02 * a02 + a12 * a12))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    # det(B)/2 with B = (A - qI)/p
    detB = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02))
    r = jnp.clip(detB / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # Smallest eigenvalue: q + 2 p cos(phi + 2*pi/3)
    lam = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # Rows of (A - lam I); eigenvector is orthogonal to all of them.
    r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
    r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
    r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
    n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
    n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
    best = jnp.where(n01 >= jnp.maximum(n02, n12), c01,
                     jnp.where(n02 >= n12, c02, c12))
    norm = jnp.sqrt(jnp.maximum(
        jnp.sum(best * best, axis=-1, keepdims=True), 1e-30))
    v = best / norm
    # Degenerate (isotropic) neighborhoods: fall back to +z.
    degenerate = jnp.maximum(jnp.maximum(n01, n02), n12)[..., 0] < 1e-24
    return jnp.where(degenerate[..., None],
                     jnp.array([0.0, 0.0, 1.0], A.dtype), v)

def estimate_normals(cloud: Cloud, knn: int = 10,
                     tile: int = 2048) -> jax.Array:
    """Per-point surface normals from the k nearest neighbors.

    Replaces SamplingSurfaceNormalDataPointsFilter (icp_default.yaml:6-7,
    knn=10) on the ICP reference cloud.  Normals are computed once per scan
    in the sensor frame at ingest and rotated alongside the points when
    submaps are assembled — rigid transforms preserve normals.

    Returns unit normals [N,3] (arbitrary but deterministic for masked
    slots).  Exact kNN via tiled distance products on the MXU.
    """
    pts = cloud.points
    n = cloud.capacity
    k = knn

    norms2 = jnp.sum(pts * pts, axis=-1)

    def tile_knn(q):  # q: [T,3] query tile -> [T,k] neighbor indices
        d2 = (jnp.sum(q * q, axis=-1)[:, None] - 2.0 *
              q @ pts.T + norms2[None, :])
        _, idx = jax.lax.top_k(-d2, k)
        return idx

    n_tiles = max(n // tile, 1)
    q_tiles = pts.reshape(n_tiles, -1, 3)
    idx = jax.lax.map(tile_knn, q_tiles).reshape(n, k)

    neigh = pts[idx]                                    # [N,k,3]
    centered = neigh - jnp.mean(neigh, axis=-2, keepdims=True)
    cov = jnp.einsum('nki,nkj->nij', centered, centered) / k
    # Smallest-eigenvector = surface normal (closed form: jnp.linalg.eigh
    # on [N,3,3] lowers to LAPACK-style loops that are ~30x slower on TPU).
    normal = _smallest_eigvec_3x3(cov)
    # Deterministic orientation: point normals toward the sensor origin
    # (reference normals are unoriented; point-to-plane only needs a line).
    flip = jnp.sum(normal * pts, axis=-1, keepdims=True) > 0
    normal = jnp.where(flip, -normal, normal)
    return jnp.where(cloud.mask[:, None], normal,
                     jnp.array([0.0, 0.0, 1.0], pts.dtype))
