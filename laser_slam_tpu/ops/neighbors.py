"""Nearest-neighbor correspondence search on TPU.

Replaces libnabo's kd-tree (KDTreeMatcher knn=1, icp_default.yaml:10-12).
Trees are pointer-chasing structures that do not map to TPU hardware; two
engines replace them:

* ``nn_brute``   — exact 1-NN via tiled squared-distance products that ride
                   the MXU with an online running-min (flash-attention
                   style).  Exact parity with a kd-tree.
* ``GridHash``   — voxel-hash bucketed search: the reference cloud is
                   hashed once into fixed-capacity cells; each query
                   gathers candidates from its 3x3x3 cell neighborhood.
                   Approximate (exact up to the cell radius), much cheaper
                   for large submaps.

Both return ``(indices[Q], sq_dists[Q])`` of the nearest reference point
per query.  Invalid reference points are parked at ``cloud.SENTINEL`` so
they never win.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from laser_slam_tpu.ops.cloud import Cloud, SENTINEL, _hash_cells


def _pick_tile(n: int, preferred: int) -> int:
    t = min(preferred, n)
    while n % t:
        t -= 1
    return t


def nn_brute(queries: jax.Array, ref_points: jax.Array,
             q_tile: int = 1024, r_tile: int = 4096,
             precision=jax.lax.Precision.HIGHEST):
    """Exact 1-NN: for each query [Q,3] find nearest of ref [R,3].

    Computes ||q-r||^2 = ||q||^2 - 2 q.r + ||r||^2 tile-by-tile, keeping a
    running (min, argmin) so the full QxR distance matrix never
    materializes in HBM.  The q.r term is an MXU matmul.

    Returns (idx [Q] int32, sq_dist [Q] f32).
    """
    q_n, r_n = queries.shape[0], ref_points.shape[0]
    q_tile = _pick_tile(q_n, q_tile)
    r_tile = _pick_tile(r_n, r_tile)

    r_norm2 = jnp.sum(ref_points * ref_points, axis=-1)
    r_tiles = ref_points.reshape(r_n // r_tile, r_tile, 3)
    r_norm_tiles = r_norm2.reshape(r_n // r_tile, r_tile)

    def one_q_tile(q):  # q: [q_tile, 3]
        def body(carry, rt):
            best_d, best_i = carry
            r_pts, r_n2, base = rt
            d2 = r_n2[None, :] - 2.0 * jax.lax.dot_general(
                q, r_pts, (((1,), (1,)), ((), ())), precision=precision)
            local_min = jnp.min(d2, axis=-1)
            local_arg = jnp.argmin(d2, axis=-1).astype(jnp.int32) + base
            take = local_min < best_d
            return (jnp.where(take, local_min, best_d),
                    jnp.where(take, local_arg, best_i)), None

        init = (jnp.full((q_tile,), jnp.inf, jnp.float32),
                jnp.zeros((q_tile,), jnp.int32))
        bases = jnp.arange(r_n // r_tile, dtype=jnp.int32) * r_tile
        (best_d, best_i), _ = jax.lax.scan(
            body, init, (r_tiles, r_norm_tiles, bases))
        return best_d + jnp.sum(q * q, axis=-1), best_i

    q_tiles = queries.reshape(q_n // q_tile, q_tile, 3)
    best_d, best_i = jax.lax.map(one_q_tile, q_tiles)
    return best_i.reshape(q_n), jnp.maximum(best_d.reshape(q_n), 0.0)


def knn_brute(queries: jax.Array, ref_points: jax.Array, k: int,
              q_tile: int = 1024,
              precision=jax.lax.Precision.HIGHEST):
    """Exact k-NN indices [Q,k] and sq-dists [Q,k] (small/medium refs)."""
    q_n, r_n = queries.shape[0], ref_points.shape[0]
    q_tile = _pick_tile(q_n, q_tile)
    r_norm2 = jnp.sum(ref_points * ref_points, axis=-1)

    def one_tile(q):
        d2 = (jnp.sum(q * q, axis=-1)[:, None] - 2.0 * jax.lax.dot_general(
            q, ref_points, (((1,), (1,)), ((), ())), precision=precision)
            + r_norm2[None, :])
        neg_d, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), jnp.maximum(-neg_d, 0.0)

    q_tiles = queries.reshape(q_n // q_tile, q_tile, 3)
    idx, d2 = jax.lax.map(one_tile, q_tiles)
    return idx.reshape(q_n, k), d2.reshape(q_n, k)


class GridHash(NamedTuple):
    """Voxel-hash index over a fixed-capacity reference cloud.

    cell_of_slot: [C, cap] int32 — point indices bucketed per hash cell
    (padded with ``ref_capacity`` = index of a sentinel point).
    """
    slots: jax.Array          # [n_cells, cell_capacity] int32 point indices
    cell_size: jax.Array      # scalar f32
    n_cells: int
    ref_capacity: int


def build_grid(ref: Cloud, cell_size_m: float, n_cells: int = 1 << 14,
               cell_capacity: int = 16) -> GridHash:
    """Hash reference points into voxel cells (built once per reference).

    Collisions beyond ``cell_capacity`` are dropped (acceptable for NN under
    trimmed-outlier ICP).  Cost: one sort over the reference — O(N log N)
    on-device, amortized over all ICP iterations.
    """
    n = ref.capacity
    cell = jnp.floor(ref.points / cell_size_m).astype(jnp.int32)
    h = _hash_cells(cell, n_cells)
    h = jnp.where(ref.mask, h, n_cells)  # invalid points -> overflow cell

    # Stable sort by cell id; rank within cell = position - cell start.
    order = jnp.argsort(h, stable=True)
    h_sorted = h[order]
    # For each sorted position, its rank within its run of equal cells.
    first_of_cell = jnp.searchsorted(h_sorted, jnp.arange(n_cells + 1))
    rank = jnp.arange(n) - first_of_cell[jnp.clip(h_sorted, 0, n_cells)]
    keep = (rank < cell_capacity) & (h_sorted < n_cells)
    # Non-kept entries write out of bounds and are dropped by the scatter.
    flat = jnp.where(keep, h_sorted * cell_capacity + rank,
                     n_cells * cell_capacity)
    slots = jnp.full((n_cells * cell_capacity,), n, jnp.int32)
    slots = slots.at[flat].set(order.astype(jnp.int32), mode='drop')
    return GridHash(slots.reshape(n_cells, cell_capacity),
                    jnp.float32(cell_size_m), n_cells, n)


_NEIGHBOR_OFFSETS = jnp.stack(jnp.meshgrid(
    jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2),
    indexing='ij'), axis=-1).reshape(27, 3)


def nn_grid(queries: jax.Array, ref: Cloud, grid: GridHash):
    """Approximate 1-NN via the 27-cell neighborhood of each query.

    Exact whenever the true neighbor lies within one cell size of the
    query.  Queries with no candidate in range return the sentinel index
    ``ref.capacity`` with +inf distance (callers mask on distance).
    """
    # Reference points with a sentinel row appended so gathers of empty
    # slots are well-defined and lose every distance comparison.
    ref_ext = jnp.concatenate(
        [ref.points, jnp.full((1, 3), SENTINEL, ref.points.dtype)], axis=0)

    cell = jnp.floor(queries / grid.cell_size).astype(jnp.int32)
    # [Q, 27] neighbor cell hashes
    neigh_cells = cell[:, None, :] + _NEIGHBOR_OFFSETS[None, :, :]
    h = _hash_cells(neigh_cells, grid.n_cells)          # [Q, 27]
    cand = grid.slots[h].reshape(queries.shape[0], -1)  # [Q, 27*cap]
    cand_pts = ref_ext[cand]                            # [Q, 27*cap, 3]
    d2 = jnp.sum((cand_pts - queries[:, None, :]) ** 2, axis=-1)
    best = jnp.argmin(d2, axis=-1)
    idx = jnp.take_along_axis(cand, best[:, None], axis=-1)[:, 0]
    dist = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
    return idx, dist
