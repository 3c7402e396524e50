"""Occupancy-grid mapping and export tools.

TPU-native replacement for the reference's offline tools:
* ``laser_to_octomap`` (laser_slam_tools/src/laser_to_octomap.cpp:7-115):
  replay all (scan, optimized pose) pairs into an occupancy map with
  hit/miss probability updates and save it;
* ``octomap_to_point_cloud`` (src/octomap_to_point_cloud.cpp:14-48):
  export occupied cells as a point cloud (PCD/PLY/XYZ).

Octrees are pointer-chasing structures; the TPU-native equivalent is a
dense-hash voxel grid with log-odds updates.  Ray-casting (free-space
carving) is a fixed-step DDA along each beam, fully vectorized — one
scatter-add per scan.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.ops import se3
from laser_slam_tpu.ops.cloud import _hash_cells


def _logit(p):
    return float(np.log(p / (1.0 - p)))


class OccupancyGrid:
    """Hash-addressed voxel occupancy grid with log-odds updates.

    Defaults mirror laser_to_octomap.cpp:18-22 (resolution 0.075 is the
    octomap default there; hit 0.9 / miss 0.4 / max range 20).
    """

    def __init__(self, resolution: float = 0.075, prob_hit: float = 0.9,
                 prob_miss: float = 0.4, max_range: float = 20.0,
                 n_cells: int = 1 << 22, ray_steps: int = 128):
        self.resolution = resolution
        self.l_hit = _logit(prob_hit)
        self.l_miss = _logit(prob_miss)
        self.max_range = max_range
        self.n_cells = n_cells
        self.ray_steps = ray_steps
        self.log_odds = jnp.zeros((n_cells,), jnp.float32)
        # Cell coordinates of last writer (for export; collisions keep the
        # latest writer, acceptable at 4M cells).
        self.cell_coords = jnp.zeros((n_cells, 3), jnp.int32)
        self.touched = jnp.zeros((n_cells,), bool)

    def insert_scan(self, points: np.ndarray, pose7: np.ndarray) -> None:
        """Integrate one scan taken from ``pose7`` (world frame), mirroring
        OctomapManager::insertPointcloudWithTf (laser_to_octomap.cpp:100-103).

        Scans are padded to power-of-two buckets (NaN padding is masked
        out) so varying scan sizes reuse a handful of compiled programs.
        """
        n = len(points)
        cap = 256
        while cap < n:
            cap *= 2
        if cap != n:
            pad = np.full((cap - n, 3), np.nan, np.float32)
            points = np.concatenate([np.asarray(points, np.float32), pad])
        self.log_odds, self.cell_coords, self.touched = _insert(
            self.log_odds, self.cell_coords, self.touched,
            jnp.asarray(points, jnp.float32), jnp.asarray(pose7, jnp.float32),
            self.resolution, self.l_hit, self.l_miss, self.max_range,
            self.n_cells, self.ray_steps)

    def occupied_points(self, threshold: float = 0.5) -> np.ndarray:
        """Occupied-cell centers as an [M,3] array
        (octomap_to_point_cloud.cpp:14-48 equivalent)."""
        l_thresh = _logit(threshold)
        occ = np.asarray(self.touched & (self.log_odds > l_thresh))
        coords = np.asarray(self.cell_coords)[occ]
        return (coords.astype(np.float32) + 0.5) * self.resolution

    def save(self, path: str, threshold: float = 0.5) -> None:
        """Save occupied cells; .npz (grid state) or .xyz/.pcd/.ply cloud
        (laser_to_octomap saveOctomapCallback + octomap_to_point_cloud)."""
        if path.endswith('.npz'):
            np.savez_compressed(
                path, log_odds=np.asarray(self.log_odds),
                cell_coords=np.asarray(self.cell_coords),
                touched=np.asarray(self.touched),
                resolution=self.resolution)
            return
        pts = self.occupied_points(threshold)
        if path.endswith('.xyz'):
            np.savetxt(path, pts, fmt='%.6f')
        elif path.endswith('.pcd'):
            with open(path, 'w') as f:
                f.write('# .PCD v0.7 - Point Cloud Data file format\n'
                        'VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\n'
                        'TYPE F F F\nCOUNT 1 1 1\n'
                        f'WIDTH {len(pts)}\nHEIGHT 1\n'
                        'VIEWPOINT 0 0 0 1 0 0 0\n'
                        f'POINTS {len(pts)}\nDATA ascii\n')
                np.savetxt(f, pts, fmt='%.6f')
        elif path.endswith('.ply'):
            with open(path, 'w') as f:
                f.write('ply\nformat ascii 1.0\n'
                        f'element vertex {len(pts)}\n'
                        'property float x\nproperty float y\n'
                        'property float z\nend_header\n')
                np.savetxt(f, pts, fmt='%.6f')
        else:
            raise ValueError(f'unknown map format: {path}')

    @classmethod
    def load(cls, path: str) -> 'OccupancyGrid':
        z = np.load(path)
        grid = cls(resolution=float(z['resolution']),
                   n_cells=len(z['log_odds']))
        grid.log_odds = jnp.asarray(z['log_odds'])
        grid.cell_coords = jnp.asarray(z['cell_coords'])
        grid.touched = jnp.asarray(z['touched'])
        return grid


@functools.partial(jax.jit, static_argnames=('resolution', 'l_hit', 'l_miss',
                                             'max_range', 'n_cells',
                                             'ray_steps'))
def _insert(log_odds, cell_coords, touched, points, pose7, resolution,
            l_hit, l_miss, max_range, n_cells, ray_steps):
    origin = pose7[4:]
    pts_w = se3.apply(pose7, points)
    ray = pts_w - origin
    dist = jnp.linalg.norm(ray, axis=-1, keepdims=True)
    valid = (dist[:, 0] > 1e-3) & (dist[:, 0] < max_range) & \
        jnp.all(jnp.isfinite(points), axis=-1)
    # Clamp endpoints to max range.
    end = origin + ray * jnp.minimum(1.0, max_range / jnp.maximum(dist, 1e-9))

    # Free-space carving: fixed-step samples along each ray (DDA on a
    # budget).  Steps are proportional positions (0,1): exclude endpoint.
    alphas = (jnp.arange(ray_steps, dtype=jnp.float32) + 0.5) / ray_steps
    sample = origin + (end - origin)[:, None, :] * alphas[None, :, None]
    # Only samples strictly before the hit cell count as misses.
    samp_cell = jnp.floor(sample / resolution).astype(jnp.int32)
    end_cell = jnp.floor(end / resolution).astype(jnp.int32)
    not_end = jnp.any(samp_cell != end_cell[:, None, :], axis=-1)
    samp_valid = valid[:, None] & not_end

    h_miss = _hash_cells(samp_cell, n_cells)
    h_hit = _hash_cells(end_cell, n_cells)

    # Deduplicate per-ray consecutive samples in the same cell to limit
    # over-counting: only count a sample whose cell differs from the
    # previous sample's cell.
    prev = jnp.concatenate([jnp.full((samp_cell.shape[0], 1, 3), -2 ** 30,
                                     jnp.int32), samp_cell[:, :-1]], axis=1)
    fresh = jnp.any(samp_cell != prev, axis=-1)
    samp_valid = samp_valid & fresh

    upd = jnp.zeros_like(log_odds)
    upd = upd.at[h_miss.reshape(-1)].add(
        jnp.where(samp_valid.reshape(-1), l_miss, 0.0))
    upd = upd.at[h_hit].add(jnp.where(valid, l_hit, 0.0))
    log_odds = jnp.clip(log_odds + upd, -10.0, 10.0)

    # Invalid rows write out of bounds (dropped) — writing the old value
    # back could clobber a valid point's write to the same bucket (scatter
    # order is unspecified).
    cell_coords = cell_coords.at[
        jnp.where(valid, h_hit, n_cells)].set(end_cell, mode='drop')
    touched = touched.at[h_hit].max(valid)
    return log_odds, cell_coords, touched


def build_occupancy_from_track_data(track_data,
                                    resolution: float = 0.075,
                                    prob_hit: float = 0.9,
                                    prob_miss: float = 0.4,
                                    max_range: float = 20.0) -> OccupancyGrid:
    """laser_to_octomap main loop equivalent: replay all (time, scan,
    optimized pose) tuples from ``LaserSlamWorker.get_laser_tracks_data``
    into an occupancy grid (laser_to_octomap.cpp:86-104)."""
    grid = OccupancyGrid(resolution=resolution, prob_hit=prob_hit,
                         prob_miss=prob_miss, max_range=max_range)
    for time_ns, points, pose7 in track_data:
        grid.insert_scan(points, pose7)
    return grid
