"""Projective correspondence via spherical range images.

The fast ICP matcher: instead of searching for nearest neighbors
(kd-tree / brute force), render the reference cloud once into a spherical
range image from the sensor origin, then find each reading point's
correspondence by *projecting* it to a pixel and testing the 3x3
neighborhood — O(1) per point per iteration, the classic LOAM /
KinectFusion / KISS-ICP projective data association.

This is the TPU-native speed path: the render is one scatter-min, each
ICP iteration costs one projection + 9 small gathers, and everything is
fixed-shape.  The scan-to-submap geometry fits perfectly: the reference
submap lives in the second-last scan's sensor frame (laser_track.cpp:
474-486), so the projection origin is the submap's own viewpoint.

Exact-NN matchers ('brute', 'pallas') remain available for kd-tree parity;
'projective' trades exactness-in-principle for a ~10x faster inner loop
with equivalent registration accuracy on LiDAR data (cf. KISS-ICP).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from laser_slam_tpu.ops.cloud import Cloud

# Default Velodyne-like vertical field of view (radians).
DEFAULT_ELEV_MIN = -0.45
DEFAULT_ELEV_MAX = 0.25


class RangeImage(NamedTuple):
    """Rendered reference: per-pixel nearest point + normal + depth.

    ``neighborhood`` packs each pixel's whole search window into one row
    ([rows*cols, W*7]: W slots of point(3) + normal(3) + occupied(1)),
    built with dense rolls.  TPU gathers pay per-row DMA, so one wide
    gather per query beats W narrow ones by ~W x.
    """
    payload: jax.Array       # [rows*cols, 6] (point xyz, normal xyz)
    depth: jax.Array         # [rows*cols] range (inf = empty)
    neighborhood: jax.Array  # [rows*cols, W*7]
    rows: int
    cols: int
    elev_min: float
    elev_max: float


def _window_offsets(window: str):
    if window == 'cross':
        return ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))
    if window == '5x5':
        return tuple((dr, dc) for dr in range(-2, 3) for dc in range(-2, 3))
    return tuple((dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1))


def _project(points, rows: int, cols: int, elev_min: float, elev_max: float):
    """Points -> (row, col, range)."""
    r = jnp.linalg.norm(points, axis=-1)
    r_safe = jnp.maximum(r, 1e-9)
    elev = jnp.arcsin(jnp.clip(points[..., 2] / r_safe, -1.0, 1.0))
    az = jnp.arctan2(points[..., 1], points[..., 0])
    row = (elev - elev_min) / (elev_max - elev_min) * rows
    col = (az + jnp.pi) / (2.0 * jnp.pi) * cols
    return (jnp.clip(row.astype(jnp.int32), 0, rows - 1),
            jnp.clip(col.astype(jnp.int32), 0, cols - 1),
            r)


@functools.partial(jax.jit, static_argnames=('rows', 'cols', 'elev_min',
                                             'elev_max', 'window'))
def build_range_image(reference: Cloud, ref_normals, rows: int = 64,
                      cols: int = 1024,
                      elev_min: float = DEFAULT_ELEV_MIN,
                      elev_max: float = DEFAULT_ELEV_MAX,
                      window: str = '3x3') -> RangeImage:
    """Render the reference cloud (in its own sensor frame) into a range
    image keeping the CLOSEST point per pixel (z-buffer scatter-min), and
    pack each pixel's search-window payloads into one row."""
    pts = reference.points
    row, col, r = _project(pts, rows, cols, elev_min, elev_max)
    flat = row * cols + col
    r = jnp.where(reference.mask, r, jnp.inf)
    n_pix = rows * cols

    depth = jnp.full((n_pix,), jnp.inf, jnp.float32).at[flat].min(r)
    # Winner-take-all payload write: only points matching their pixel's
    # min depth write (losers write out of bounds and are dropped; ties
    # resolve arbitrarily but consistently).
    is_winner = reference.mask & (r <= depth[flat])
    payload = jnp.concatenate([pts, ref_normals], axis=1)
    img_payload = jnp.zeros((n_pix, 6), jnp.float32)
    img_payload = img_payload.at[jnp.where(is_winner, flat, n_pix)].set(
        payload, mode='drop')

    # Stacked neighborhood rows via dense rolls (no gathers).
    occupied = jnp.isfinite(depth).astype(jnp.float32)
    slot = jnp.concatenate([img_payload, occupied[:, None]], axis=1)
    grid = slot.reshape(rows, cols, 7)
    slots = []
    for dr, dc in _window_offsets(window):
        shifted = jnp.roll(grid, (-dr, -dc), axis=(0, 1))
        if dr < 0:   # top rows have no upper neighbor
            shifted = shifted.at[:(-dr)].set(0.0)
        elif dr > 0:  # bottom rows have no lower neighbor
            shifted = shifted.at[-dr:].set(0.0)
        # column rolls wrap naturally (azimuth wraps)
        slots.append(shifted)
    neighborhood = jnp.concatenate(slots, axis=-1).reshape(
        n_pix, 7 * len(slots))
    return RangeImage(payload=img_payload, depth=depth,
                      neighborhood=neighborhood,
                      rows=rows, cols=cols,
                      elev_min=elev_min, elev_max=elev_max)


@functools.partial(jax.jit, static_argnames=('rows', 'cols', 'elev_min',
                                             'elev_max'))
def range_image_normals(cloud: Cloud, rows: int = 64, cols: int = 1024,
                        elev_min: float = DEFAULT_ELEV_MIN,
                        elev_max: float = DEFAULT_ELEV_MAX) -> jax.Array:
    """Per-point surface normals from range-image neighbors — O(N).

    The classic LiDAR alternative to kNN PCA normals (which cost a tiled
    O(N^2) sweep per scan): render the scan into its own range image, take
    the cross product of the horizontal and vertical pixel tangents, and
    read each point's normal from its pixel.  Orientation: toward the
    sensor.  Points whose pixel lacks valid neighbors fall back to +z.
    """
    pts = cloud.points
    row, col, _ = _project(pts, rows, cols, elev_min, elev_max)
    flat = row * cols + col
    n_pix = rows * cols

    # Z-buffer render (closest point per pixel).
    r = jnp.where(cloud.mask, jnp.linalg.norm(pts, axis=-1), jnp.inf)
    depth = jnp.full((n_pix,), jnp.inf, jnp.float32).at[flat].min(r)
    is_winner = cloud.mask & (r <= depth[flat])
    img_pts = jnp.zeros((n_pix, 3), jnp.float32)
    img_pts = img_pts.at[jnp.where(is_winner, flat, n_pix)].set(
        pts, mode='drop')
    occupied = jnp.isfinite(depth).reshape(rows, cols)
    img = img_pts.reshape(rows, cols, 3)

    # Tangents from horizontal (azimuth wraps) and vertical neighbors.
    right = jnp.roll(img, -1, axis=1)
    occ_right = jnp.roll(occupied, -1, axis=1)
    left = jnp.roll(img, 1, axis=1)
    occ_left = jnp.roll(occupied, 1, axis=1)
    du = jnp.where(occ_right[..., None], right - img, img - left)
    du_ok = occ_right | occ_left
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    occ_down = jnp.concatenate([occupied[1:], occupied[-1:]], axis=0)
    up = jnp.concatenate([img[:1], img[:-1]], axis=0)
    occ_up = jnp.concatenate([occupied[:1], occupied[:-1]], axis=0)
    dv = jnp.where(occ_down[..., None], down - img, img - up)
    dv_ok = occ_down | occ_up

    n = jnp.cross(du, dv)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True),
                                1e-30))
    n = n / norm
    good = (occupied & du_ok & dv_ok &
            (norm[..., 0] > 1e-12)).reshape(-1)
    n_flat = jnp.where(good[:, None], n.reshape(-1, 3),
                       jnp.array([0.0, 0.0, 1.0], jnp.float32))

    # Each point reads its pixel's normal, oriented toward the sensor.
    out = n_flat[flat]
    flip = jnp.sum(out * pts, axis=-1, keepdims=True) > 0
    out = jnp.where(flip, -out, out)
    return jnp.where(cloud.mask[:, None], out,
                     jnp.array([0.0, 0.0, 1.0], jnp.float32))


@functools.partial(jax.jit, static_argnames=('rows', 'cols', 'elev_min',
                                             'elev_max', 'window'))
def range_image_pca_normals(cloud: Cloud, rows: int = 64, cols: int = 1024,
                            elev_min: float = DEFAULT_ELEV_MIN,
                            elev_max: float = DEFAULT_ELEV_MAX,
                            window: str = '5x5') -> jax.Array:
    """Per-point normals from PCA over the point's range-image window —
    the fast middle ground between kNN PCA (O(N^2) tiled top_k, the
    dominant ingest cost at 16k+ points) and the 2-tangent cross product
    (noise-sensitive).

    Every point sharing a pixel sees the SAME window, so the PCA runs
    once per PIXEL, entirely with rolled images (no packed-neighborhood
    render, no wide per-point gathers — the earlier implementation
    gathered W*7-float rows per point, ~92 MB at KITTI density; this one
    does a single narrow per-point gather of the finished pixel normal,
    ~10 ms -> ~2 ms per 131k-point scan on v5e).  Neighbor coordinates
    are centered on the pixel's own z-buffer winner before accumulating
    second moments, so the covariance is formed from O(window-extent)
    values — no large-coordinate cancellation.
    """
    from laser_slam_tpu.ops.cloud import _smallest_eigvec_3x3
    pts = cloud.points
    row, col, r = _project(pts, rows, cols, elev_min, elev_max)
    flat = row * cols + col
    r = jnp.where(cloud.mask, r, jnp.inf)
    n_pix = rows * cols

    # Z-buffer render of the scan itself (closest point per pixel).
    depth = jnp.full((n_pix,), jnp.inf, jnp.float32).at[flat].min(r)
    is_winner = cloud.mask & (r <= depth[flat])
    img_pts = jnp.zeros((n_pix, 3), jnp.float32).at[
        jnp.where(is_winner, flat, n_pix)].set(pts, mode='drop')
    occ = jnp.isfinite(depth).astype(jnp.float32)

    grid_p = img_pts.reshape(rows, cols, 3)
    grid_o = occ.reshape(rows, cols, 1)
    n_s = jnp.zeros((rows, cols, 1), jnp.float32)
    s = jnp.zeros((rows, cols, 3), jnp.float32)
    outer = jnp.zeros((rows, cols, 3, 3), jnp.float32)
    for dr, dc in _window_offsets(window):
        sp = jnp.roll(grid_p, (-dr, -dc), axis=(0, 1))
        so = jnp.roll(grid_o, (-dr, -dc), axis=(0, 1))
        if dr < 0:    # top rows have no upper neighbor
            so = so.at[:(-dr)].set(0.0)
        elif dr > 0:  # bottom rows have no lower neighbor
            so = so.at[-dr:].set(0.0)
        # column rolls wrap naturally (azimuth wraps)
        d = (sp - grid_p) * so
        n_s = n_s + so
        s = s + d
        outer = outer + d[..., :, None] * d[..., None, :]
    n_c = jnp.maximum(n_s, 1.0)
    mean = s / n_c
    cov = outer / n_c[..., None] - mean[..., :, None] * mean[..., None, :]
    pix_normal = _smallest_eigvec_3x3(cov.reshape(n_pix, 3, 3))
    pix_ok = n_s.reshape(n_pix) >= 3.0

    normal = pix_normal[flat]                    # narrow [N,3] gather
    flip = jnp.sum(normal * pts, axis=-1, keepdims=True) > 0
    normal = jnp.where(flip, -normal, normal)
    # Degenerate neighborhoods (fewer than 3 samples): fall back to +z.
    ok = pix_ok[flat] & cloud.mask
    return jnp.where(ok[:, None], normal,
                     jnp.array([0.0, 0.0, 1.0], pts.dtype))


def compute_normals(cloud: Cloud, icp_config) -> jax.Array:
    """Per-scan normal estimation dispatched on ``IcpConfig.normal_method``.

    ``'auto'`` (the default) picks ``'image_pca'`` for dense scans
    (capacity >= 8192 points, where the kNN PCA's tiled O(N^2) sweep
    dominates ingest cost) and ``'knn'`` for small ones (where the range
    image is too sparse for reliable pixel neighborhoods).  Measured on a
    dense synthetic Velodyne-like scan, image_pca normals agree with kNN
    PCA within a few degrees median and the resulting ICP solutions within
    millimeters (tests/test_range_image.py::test_image_pca_vs_knn_accuracy)
    at ~3x the end-to-end ingest throughput.
    """
    method = icp_config.normal_method
    if method == 'auto':
        method = 'image_pca' if cloud.points.shape[0] >= 8192 else 'knn'
    if method == 'range_image':
        return range_image_normals(
            cloud, rows=icp_config.normal_image_rows,
            cols=icp_config.normal_image_cols,
            elev_min=icp_config.range_image_elev_min,
            elev_max=icp_config.range_image_elev_max)
    if method == 'image_pca':
        return range_image_pca_normals(
            cloud, rows=icp_config.normal_image_rows,
            cols=icp_config.normal_image_cols,
            elev_min=icp_config.range_image_elev_min,
            elev_max=icp_config.range_image_elev_max)
    if method != 'knn':
        raise ValueError(f'unknown normal_method {method!r}')
    from laser_slam_tpu.ops.cloud import estimate_normals
    return estimate_normals(cloud, knn=icp_config.normal_knn)


@functools.partial(jax.jit, static_argnames=())
def nn_projective(queries: jax.Array, image: RangeImage):
    """Projective 1-NN: project each query, test its pixel window,
    return (nearest point [Q,3], normal [Q,3], sq distance [Q]).

    The window's candidates come from ONE wide gather of the packed
    neighborhood row (TPU gathers pay per row, not per byte — W narrow
    gathers would cost W x more).  Window shape is baked into the image
    (build_range_image(window=...)).
    """
    rows, cols = image.rows, image.cols
    row, col, _ = _project(queries, rows, cols, image.elev_min,
                           image.elev_max)
    flat = row * cols + col

    W = image.neighborhood.shape[1] // 7
    cand = image.neighborhood[flat].reshape(queries.shape[0], W, 7)
    pts = cand[..., 0:3]
    occupied = cand[..., 6] > 0.5
    d2 = jnp.sum((pts - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(occupied, d2, jnp.inf)
    best = jnp.argmin(d2, axis=-1)
    sel = jnp.take_along_axis(cand, best[:, None, None], axis=1)[:, 0]
    best_d2 = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0]
    return sel[:, 0:3], sel[:, 3:6], best_d2
