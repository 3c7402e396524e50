"""Pallas TPU kernel: fused exact 1-NN (VPU-broadcast scores).

The ICP hot loop (replacing libnabo's kd-tree, icp_default.yaml:10-12)
needs, for each transformed reading point, the index of its nearest
reference point.  This kernel streams reference tiles through VMEM and
keeps a running (best d2, best index) per query — the full QxR distance
matrix never exists, in HBM *or* in the kernel.

Design (why VPU, not MXU): the classic matmul formulation
``|q-r|^2 = |q|^2 - 2 q.r + |r|^2`` puts an 8-deep contraction on a
128x128 systolic array — 6% utilization, made 6x worse again because f32
``dot_general`` lowers to 6 bf16 passes under the repo's ``highest``
matmul precision (1 bf16 pass is rank-unsafe here: ~20 m^2 score error
at 50 m scene scale).  Computing ``(qx-rx)^2+(qy-ry)^2+(qz-rz)^2``
directly as VPU broadcasts is exact f32 and avoids the MXU entirely:
~6 ops/element over Q*R elements, measured ~2x faster than both the
matmul kernel and XLA brute.

Measured (TPU v5e-1, 8192 queries x 65536 refs, f32, median of 8):

    XLA brute (neighbors.nn_brute)        6.94 ms
    MXU matmul kernel, highest precision  6.59 ms   (1.05x)
    MXU matmul kernel, 1-pass bf16        3.16 ms   (rank errors: 20 m^2)
    VPU broadcast kernel (this file)      3.01 ms   (2.3x, exact; 256x4096 tiles)

Fetching the 6-f32 payload row per winner with one XLA gather costs a
further ~0.15 ms — which is why this returns *indices*: the earlier
"payload" kernels that selected [point|normal] rows in-kernel via a
one-hot MXU matmul (no gathers) spent 16x the scoring FLOPs to save
that 0.15 ms (10.9 ms total; a Morton+AABB-pruned variant: 14.1 ms —
pruning couldn't skip the DMA).  Both live on as recorded negative
results in experiments/pallas_payload_variants.py; the shootout is
reproducible via experiments/pallas_nn_bench.py and
experiments/pallas_nn_variants.py.

Falls back to interpret mode off TPU (tests) — same numerics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# QB x RB f32 score tile lives in vregs/VMEM.  Sweep on v5e
# (experiments/pallas_tile_sweep.py, 8k x 64k): 256x4096 3.01 ms,
# 128x8192 3.08, 256x2048 3.41, 256x1024 4.62; single-tile overflows
# VMEM.  Wider lane tiles amortize the per-tile argmin reduction.
_QB = 256
_RB = 4096


def _tile(n: int, preferred: int) -> int:
    t = min(preferred, n)
    while n % t:
        t -= 1
    return t


def on_tpu() -> bool:
    return jax.default_backend() in ('tpu', 'axon')


def _nn_idx_kernel(q_ref, rt_ref, d2_ref, idx_ref, best_score, best_idx):
    """Exact scores by VPU broadcast + running argmin.

    q_ref:  [QB, 8] query tile, xyz in columns 0..2.
    rt_ref: [8, RB] reference tile TRANSPOSED, xyz in rows 0..2 — the
        lane axis carries reference points so each (coordinate row)
        broadcasts across sublanes against the query column.
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_score[:] = jnp.full_like(best_score, jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)

    qt = q_ref[:]
    rt = rt_ref[:]
    dx = qt[:, 0:1] - rt[0:1, :]
    dy = qt[:, 1:2] - rt[1:2, :]
    dz = qt[:, 2:3] - rt[2:3, :]
    s = dx * dx + dy * dy + dz * dz              # [QB, RB] exact f32
    tile_min = jnp.min(s, axis=1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    rb = s.shape[1]
    # First column index attaining the tile minimum (ties -> lowest).
    tile_arg = jnp.min(jnp.where(s <= tile_min, col, rb), axis=1,
                       keepdims=True)
    take = tile_min < best_score[:]
    best_score[:] = jnp.where(take, tile_min, best_score[:])
    best_idx[:] = jnp.where(take, tile_arg + j * rb, best_idx[:])

    @pl.when(j == nj - 1)
    def _():
        d2_ref[:] = best_score[:]
        idx_ref[:] = best_idx[:]


@functools.partial(jax.jit, static_argnames=('interpret',))
def nn_indices(queries: jax.Array, ref_points: jax.Array,
               interpret: bool = False):
    """For each query, (squared distance, index) of its nearest reference
    point.  Exact — distances are computed coordinate-wise in f32.

    queries: [Q,3] f32; ref_points: [R,3] f32.  Park invalid points at
    cloud.SENTINEL (1e6) — parked rows carry huge distances and can never
    win (and parked queries harmlessly match a parked ref).  Returns
    (d2 [Q] f32, idx [Q] i32).
    """
    Q, _ = queries.shape
    R, _ = ref_points.shape
    qb = _tile(Q, _QB)
    rb = _tile(R, _RB)

    q_ext = jnp.concatenate(
        [queries, jnp.zeros((Q, 5), jnp.float32)], axis=1)
    r_t = jnp.concatenate(
        [ref_points.T, jnp.zeros((5, R), jnp.float32)], axis=0)

    d2, idx = pl.pallas_call(
        _nn_idx_kernel,
        grid=(Q // qb, R // rb),
        in_specs=[
            pl.BlockSpec((qb, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((qb, 1), jnp.float32),
            pltpu.VMEM((qb, 1), jnp.int32),
        ],
        interpret=interpret,
    )(q_ext, r_t)

    return d2[:, 0], idx[:, 0]


# --------------------------------------------------------------------------
# Morton-pruned radius-bounded variant.
#
# ICP only uses matches within max_correspondence_dist_m (3 m default on
# a 50-80 m scene), so the exact-NN kernel above wastes most of its VPU
# work scoring reference tiles that cannot possibly contain a usable
# match.  This variant recovers the kd-tree's pruning on TPU terms:
#
#   - the reference is sorted ONCE by 30-bit Morton code (spatially
#     coherent [RB]-point tiles with tight AABBs);
#   - each NN call sorts the queries the same way, computes per-tile
#     AABB-to-AABB lower-bound distances [nQ, nR] in plain XLA, and
#     visits reference tiles per query tile in ascending-bound order via
#     a scalar-prefetch index map;
#   - tiles whose bound exceeds the cutoff are ALIASED to the last
#     useful tile index (Pallas skips the DMA when the block index
#     repeats) and their score loop is skipped with pl.when, so pruned
#     tiles cost neither bandwidth nor flops;
#   - tiles whose bound exceeds the running per-tile best are compute-
#     skipped the same way (the ascending visit order makes the first
#     tile the most promising, so the bound tightens immediately).
#
# Exact within the radius: any reference point within ``cutoff`` of a
# query lies in a tile whose AABB bound passes the tests above.  Queries
# with no reference point inside the radius return d2=inf (the kd-tree
# maxDist semantics ICP already applies as ``d2 <= max_corr2``).
# Replaces libnabo's kd-tree traversal (icp_default.yaml:11-14) without
# pointer chasing: the tree is two levels (tile AABBs, then brute force
# inside the tile), which is the right depth for a machine whose "leaf
# visit" is a 256x4096 vector op.
#
# Measured (TPU v5e-1, 8192x65536, cutoff 3 m on 100 m scenes, median of
# 8 — experiments/pallas_pruned_bench.py): 1.23x vs the flat kernel on a
# uniform-volume scene (2.53 vs 3.12 ms), 1.21x on a wall-shell scene
# (2.85 vs 3.46 ms), best at rb=4096; rb=1024/2048 lose to per-step
# overhead.  The bound, not the skip machinery, is the ceiling:
# count-based Morton tiles carry fat AABBs, so only 36%/22% of tile
# pairs prune at rb=4096 (uniform/shell) — ~1.5x is the structural max
# for this two-level scheme at these densities.  The remaining exact-NN
# headroom is on the query side (coarse-to-fine schedule in ops/icp.py),
# not in the kernel.
# --------------------------------------------------------------------------


class PrunedRef(NamedTuple):
    """Morton-sorted reference with per-tile AABBs (build once per
    reference cloud; reuse across ICP iterations and readings)."""
    points: jax.Array    # [R,3] sorted copy of the reference points
    perm: jax.Array      # [R] i32: sorted row -> original row
    tile_lo: jax.Array   # [nR,3] per-tile AABB lower corners
    tile_hi: jax.Array   # [nR,3] per-tile AABB upper corners


def _morton3d(points: jax.Array, lo: jax.Array, inv_extent: jax.Array):
    """30-bit Morton code of each point over the [lo, lo+extent] box.
    Out-of-box points (e.g. SENTINEL-parked rows) clip to the boundary
    cells, which sorts them to the box corner — their tiles then carry
    far-away AABBs and are pruned by the bound tests."""
    u = jnp.clip((points - lo) * inv_extent, 0.0, 1.0)
    g = (u * 1023.0).astype(jnp.int32)                       # [N,3] 10 bits

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return (spread(g[:, 0]) | (spread(g[:, 1]) << 1)
            | (spread(g[:, 2]) << 2))


def _finite_bounds(points: jax.Array):
    """AABB over non-parked rows (|coord| < 1e5)."""
    finite = jnp.all(jnp.abs(points) < 1.0e5, axis=1, keepdims=True)
    big = jnp.float32(3.0e5)
    lo = jnp.min(jnp.where(finite, points, big), axis=0)
    hi = jnp.max(jnp.where(finite, points, -big), axis=0)
    # Degenerate (all parked): fall back to a unit box.
    bad = lo[0] > hi[0]
    lo = jnp.where(bad, 0.0, lo)
    hi = jnp.where(bad, 1.0, hi)
    return lo, hi


def _tile_aabbs(points_sorted: jax.Array, tile: int):
    n = points_sorted.shape[0] // tile
    p = points_sorted.reshape(n, tile, 3)
    return jnp.min(p, axis=1), jnp.max(p, axis=1)


def build_pruned_ref(ref_points: jax.Array, rb: int | None = None
                     ) -> PrunedRef:
    """Sort the reference by Morton code and record per-tile AABBs."""
    R = ref_points.shape[0]
    rb = _tile(R, rb or _RB)
    lo, hi = _finite_bounds(ref_points)
    inv = 1.0 / jnp.maximum(hi - lo, 1e-6)
    code = _morton3d(ref_points, lo, inv)
    perm = jnp.argsort(code)
    pts = ref_points[perm]
    tlo, thi = _tile_aabbs(pts, rb)
    return PrunedRef(points=pts, perm=perm.astype(jnp.int32),
                     tile_lo=tlo, tile_hi=thi)


def _nn_pruned_kernel(order_ref, lb_ref, q_ref, rt_ref, d2_ref, idx_ref,
                      best_score, best_idx, *, cutoff2: float):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_score[:] = jnp.full_like(best_score, jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)

    lb = lb_ref[i, j]
    visit = (lb < cutoff2) & (lb < jnp.max(best_score[:]))

    @pl.when(visit)
    def _():
        qt = q_ref[:]
        rt = rt_ref[:]
        dx = qt[:, 0:1] - rt[0:1, :]
        dy = qt[:, 1:2] - rt[1:2, :]
        dz = qt[:, 2:3] - rt[2:3, :]
        s = dx * dx + dy * dy + dz * dz          # [QB, RB] exact f32
        tile_min = jnp.min(s, axis=1, keepdims=True)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        rb = s.shape[1]
        tile_arg = jnp.min(jnp.where(s <= tile_min, col, rb), axis=1,
                           keepdims=True)
        take = tile_min < best_score[:]
        best_score[:] = jnp.where(take, tile_min, best_score[:])
        best_idx[:] = jnp.where(take, tile_arg + order_ref[i, j] * rb,
                                best_idx[:])

    @pl.when(j == nj - 1)
    def _():
        d2_ref[:] = best_score[:]
        idx_ref[:] = best_idx[:]


@functools.partial(jax.jit,
                   static_argnames=('cutoff', 'interpret'))
def nn_indices_pruned(queries: jax.Array, pref: PrunedRef,
                      cutoff: float = 3.0, interpret: bool = False):
    """Radius-bounded exact NN against a :class:`PrunedRef`.

    Returns (d2 [Q] f32, idx [Q] i32) in the ORIGINAL query order; idx
    indexes the SORTED reference (``pref.points``) — gather payloads from
    arrays permuted by ``pref.perm``.  Queries with no reference point
    within ``cutoff`` get d2=inf (idx arbitrary).
    """
    Q = queries.shape[0]
    R = pref.points.shape[0]
    qb = _tile(Q, _QB)
    rb = R // pref.tile_lo.shape[0]
    nQ, nR = Q // qb, R // rb
    cutoff2 = float(cutoff) ** 2

    lo, hi = _finite_bounds(pref.points)
    inv = 1.0 / jnp.maximum(hi - lo, 1e-6)
    qperm = jnp.argsort(_morton3d(queries, lo, inv))
    q_sorted = queries[qperm]

    # Per-query-tile AABBs -> tile-pair lower bounds [nQ, nR].
    q_lo, q_hi = _tile_aabbs(q_sorted, qb)
    gap = jnp.maximum(
        jnp.maximum(pref.tile_lo[None] - q_hi[:, None],
                    q_lo[:, None] - pref.tile_hi[None]), 0.0)
    lb2 = jnp.sum(gap * gap, axis=-1)

    # Ascending-bound visit order; alias the pruned suffix (bound beyond
    # the cutoff) to the last useful tile so its DMA dedupes away, and
    # mark it +inf so its compute is skipped.
    order = jnp.argsort(lb2, axis=1).astype(jnp.int32)
    lb_sorted = jnp.take_along_axis(lb2, order, axis=1)
    keep = lb_sorted <= cutoff2
    cnt = jnp.sum(keep, axis=1)
    jidx = jnp.minimum(jnp.arange(nR, dtype=jnp.int32)[None, :],
                       jnp.maximum(cnt - 1, 0)[:, None])
    order_aliased = jnp.take_along_axis(order, jidx, axis=1)
    lb_eff = jnp.where(keep, lb_sorted, jnp.inf).astype(jnp.float32)

    q_ext = jnp.concatenate(
        [q_sorted, jnp.zeros((Q, 5), jnp.float32)], axis=1)
    r_t = jnp.concatenate(
        [pref.points.T, jnp.zeros((5, R), jnp.float32)], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nQ, nR),
        in_specs=[
            pl.BlockSpec((qb, 8), lambda i, j, order, lb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rb), lambda i, j, order, lb: (0, order[i, j]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qb, 1), lambda i, j, order, lb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 1), lambda i, j, order, lb: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((qb, 1), jnp.float32),
            pltpu.VMEM((qb, 1), jnp.int32),
        ],
    )
    d2, idx = pl.pallas_call(
        functools.partial(_nn_pruned_kernel, cutoff2=cutoff2),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
        ],
        interpret=interpret,
    )(order_aliased, lb_eff, q_ext, r_t)

    inv_perm = jnp.argsort(qperm)
    return d2[inv_perm, 0], idx[inv_perm, 0]
