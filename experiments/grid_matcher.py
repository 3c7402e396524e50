"""RECORDED NEGATIVE RESULT — voxel-hash approximate NN matcher tier.

This was the `matcher='grid'` tier through round 2.  Two measurements
killed it (TPU v5e-1, 65536-ref / 8192-reading ICP, experiments/
matcher_icp_bench.py):

  * As shipped (narrow per-candidate gathers, this file): ~8 ms/ICP-iter
    — slower than exact XLA brute (~6.9 ms) and 4x slower than the exact
    VPU Pallas kernel (~2 ms, ops/pallas_nn.py), despite being
    *approximate* (misses neighbors beyond one cell radius).
  * Re-packed so each cell is one wide 128-lane row (xyz + bitcast index
    per slot, one gather per query-cell instead of 27*cap narrow ones):
    ~14.6 ms/iter — WORSE.  Narrow many-row gathers vectorize on this
    part (~440 M rows/s observed); wide 512 B rows pay ~67 ns each.
    The "TPU gathers pay per row" rule (docs/design.md §2) holds for
    *wide* rows but narrow-row gathers are the fast case XLA already
    optimizes.

Its theoretical niche — O(1)-in-R matching against multi-million-point
references — does not occur in the framework (maps are voxel-filtered
and capacity-bounded), so the tier was deleted rather than kept as a
slower-and-approximate option.  Code preserved verbatim below for the
record; `python experiments/grid_matcher.py` self-checks correctness.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from laser_slam_tpu.ops.cloud import Cloud, SENTINEL, _hash_cells


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


def _selfcheck():
    import numpy as np
    from laser_slam_tpu.ops import cloud as pc
    from laser_slam_tpu.ops import neighbors as nb
    rng = np.random.default_rng(0)
    pts = rng.uniform(-8, 8, (500, 3)).astype(np.float32)
    ref = pc.make_cloud(pts, capacity=512)
    q = jnp.asarray(pts[:100] + rng.normal(0, 0.05, (100, 3)).astype(
        np.float32))
    grid = build_grid(ref, cell_size_m=2.0, n_cells=4096)
    gi, gd = nn_grid(q, ref, grid)
    bi, bd = nb.nn_brute(q, ref.points)
    agree = np.mean(np.asarray(gi) == np.asarray(bi))
    print(f'grid/brute agreement: {agree:.3f} (expect ~1.0 at this density)')
    assert agree > 0.95


if __name__ == '__main__':
    _selfcheck()
