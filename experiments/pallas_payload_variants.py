"""RECORDED NEGATIVE RESULT — MXU payload-selection NN kernels.

These were round 1's flagship Pallas kernels; round 2's shootout
(experiments/pallas_nn_bench.py, TPU v5e-1, 8192 x 65536) demoted them:

    nn_payload          10.9 ms   vs XLA brute 7.9 ms
    nn_payload_pruned   14.1 ms   (Morton+AABB pruning can't skip DMA)
    production winner    3.3 ms   ops/pallas_nn.nn_indices (VPU scores)

Two lessons, kept here with the code: (1) the one-hot payload matmul
spends 16x the scoring FLOPs (P_pad=128-deep MXU contraction per tile)
to avoid an XLA gather that costs only ~0.15 ms; (2) an 8-deep score
contraction uses 6% of the MXU and is further multiplied 6x by the
``highest`` f32 matmul precision (6 bf16 passes) — computing (q-r)^2
on the VPU is exact AND faster.  This module is NOT part of the
production package; it keeps the original docstring below and stays
importable for the shootout scripts.

----------------------------------------------------------------------

Original design notes: fused 1-NN correspondence with payload selection.

The ICP hot loop (replacing libnabo's kd-tree, icp_default.yaml:10-12)
reduces to: for each transformed reading point, find the nearest reference
point and fetch its position + normal.  This kernel does all of it in one
pass, flash-attention style:

* squared-distance *scores* ride the MXU: with ``q_ext = [x,y,z,1]`` and
  ``r_ext = [-2x,-2y,-2z,|r|^2]``, the matmul ``q_ext @ r_ext^T`` equals
  ``|q-r|^2 - |q|^2`` — a per-query constant off the true distance, so
  argmin is preserved and the |q|^2 term is added back at the end;
* the per-tile argmin row is extracted WITHOUT gathers: a one-hot of the
  row minimum (normalized for ties) is matmul'd against the payload tile
  ``[ref | normal]`` — a second MXU op;
* a running (best score, best payload) accumulator in VMEM carries across
  reference tiles (grid iterates reference-major sequentially).

Returning payloads instead of indices kills the [Q]-indexed HBM gathers
that dominate a naive implementation.  Falls back to interpret mode off
TPU (tests) — same numerics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Preferred tile sizes: QB x RB score tile (f32) must fit VMEM comfortably.
_QB = 256
_RB = 2048


def _tile(n: int, preferred: int) -> int:
    t = min(preferred, n)
    while n % t:
        t -= 1
    return t


def _nn_kernel(q_ref, r_ref, pay_ref, d2_ref, pay_out_ref,
               best_score, best_pay):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_score[:] = jnp.full_like(best_score, jnp.inf)
        best_pay[:] = jnp.zeros_like(best_pay)

    q = q_ref[:]                     # [QB, 8]  (x,y,z,1,0,0,0,0)
    r = r_ref[:]                     # [RB, 8]  (-2x,-2y,-2z,|r|^2,0,...)
    pay = pay_ref[:]                 # [RB, P]  payload (point, normal)

    # Scores = |q-r|^2 - |q|^2 for the whole tile, on the MXU.
    s = jax.lax.dot_general(q, r, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [QB, RB]
    tile_min = jnp.min(s, axis=1, keepdims=True)                  # [QB, 1]

    # One-hot of the per-row minimum (ties averaged), then payload select
    # via a second matmul — no gathers.
    onehot = (s <= tile_min).astype(jnp.float32)
    onehot = onehot / jnp.maximum(jnp.sum(onehot, axis=1, keepdims=True), 1.0)
    tile_pay = jax.lax.dot_general(onehot, pay, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    take = tile_min < best_score[:]
    best_score[:] = jnp.where(take, tile_min, best_score[:])
    best_pay[:] = jnp.where(take, tile_pay, best_pay[:])

    @pl.when(j == nj - 1)
    def _():
        d2_ref[:] = best_score[:]
        pay_out_ref[:] = best_pay[:]


@functools.partial(jax.jit, static_argnames=('interpret',))
def nn_payload(queries: jax.Array, ref_points: jax.Array,
               payload: jax.Array, interpret: bool = False):
    """For each query, the squared distance to — and payload of — its
    nearest reference point.

    queries:  [Q, 3] f32 (Q multiple of 256, pad with cloud.SENTINEL)
    ref_points: [R, 3] f32 (R multiple of 2048, pad with cloud.SENTINEL —
        parked points carry |r|^2 ~ 3e12 and can never win)
    payload:  [R, P] f32, P padded to a multiple of 128 by the caller or
        here (we pad internally and slice back)

    Returns (d2 [Q] f32 true squared distances, payload_out [Q, P]).
    """
    Q, _ = queries.shape
    R, _ = ref_points.shape
    P = payload.shape[1]
    qb = _tile(Q, _QB)
    rb = _tile(R, _RB)

    q_norm2 = jnp.sum(queries * queries, axis=1, keepdims=True)
    q_ext = jnp.concatenate(
        [queries, jnp.ones((Q, 1), jnp.float32),
         jnp.zeros((Q, 4), jnp.float32)], axis=1)
    r_ext = jnp.concatenate(
        [-2.0 * ref_points,
         jnp.sum(ref_points * ref_points, axis=1, keepdims=True),
         jnp.zeros((R, 4), jnp.float32)], axis=1)

    P_pad = max(128, ((P + 127) // 128) * 128)
    if P_pad != P:
        payload = jnp.concatenate(
            [payload, jnp.zeros((R, P_pad - P), jnp.float32)], axis=1)

    grid = (Q // qb, R // rb)
    d2, pay = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qb, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, P_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, P_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
            jax.ShapeDtypeStruct((Q, P_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((qb, 1), jnp.float32),
            pltpu.VMEM((qb, P_pad), jnp.float32),
        ],
        interpret=interpret,
    )(q_ext, r_ext, payload)

    d2_true = jnp.maximum(d2 + q_norm2, 0.0)[:, 0]
    return d2_true, pay[:, :P]


def _nn_idx_kernel(q_ref, r_ref, d2_ref, idx_ref, best_score, best_idx):
    """Fused score + running ARGMIN (index, not payload).

    The payload-matmul variant (:func:`nn_payload`) spends its time on the
    per-tile ``onehot @ payload`` MXU op (Q/QB x R/RB tiles x QB x RB x 128
    MACs ~ 137 GFLOP at the 8k/64k workload) plus the payload tile DMA
    (P_pad=128 f32 rows re-streamed for every query tile).  Tracking only
    the best index per query removes both: the tile argmin is two VPU
    reductions over scores that already exist, and the 6-float payload is
    fetched ONCE per query by an XLA gather outside the kernel.
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_score[:] = jnp.full_like(best_score, jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)

    q = q_ref[:]                     # [QB, 8]
    r = r_ref[:]                     # [RB, 8]
    s = jax.lax.dot_general(q, r, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [QB, RB]
    tile_min = jnp.min(s, axis=1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    rb = s.shape[1]
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
    """For each query, (true squared distance, index) of its nearest
    reference point.  Same score trick as :func:`nn_payload`; returns
    indices for one outside gather instead of matmul-selected payloads.

    queries: [Q,3] f32; ref_points: [R,3] f32 (park invalid points at
    cloud.SENTINEL — they can never win).  Returns (d2 [Q], idx [Q] i32).
    """
    Q, _ = queries.shape
    R, _ = ref_points.shape
    qb = _tile(Q, _QB)
    rb = _tile(R, _RB)

    q_norm2 = jnp.sum(queries * queries, axis=1, keepdims=True)
    q_ext = jnp.concatenate(
        [queries, jnp.ones((Q, 1), jnp.float32),
         jnp.zeros((Q, 4), jnp.float32)], axis=1)
    r_ext = jnp.concatenate(
        [-2.0 * ref_points,
         jnp.sum(ref_points * ref_points, axis=1, keepdims=True),
         jnp.zeros((R, 4), jnp.float32)], axis=1)

    d2, idx = pl.pallas_call(
        _nn_idx_kernel,
        grid=(Q // qb, R // rb),
        in_specs=[
            pl.BlockSpec((qb, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 8), lambda i, j: (j, 0),
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
    )(q_ext, r_ext)

    d2_true = jnp.maximum(d2 + q_norm2, 0.0)[:, 0]
    return d2_true, idx[:, 0]


def on_tpu() -> bool:
    return jax.default_backend() in ('tpu', 'axon')


# ---------------------------------------------------------------------------
# Morton-ordered, bbox-pruned NN — the TPU answer to kd-tree pruning
# ---------------------------------------------------------------------------
#
# Exact dense NN is VPU-bound at ~0.5G distance pairs per sweep.  A kd-tree
# prunes most of those pairs; the TPU-native equivalent:
#   1. sort both clouds in Morton (Z-curve) order so contiguous tiles are
#      spatially compact;
#   2. precompute per-tile AABBs;
#   3. in the kernel, a reference tile is SKIPPED (predicated off) when
#      the lower-bound distance between the query-tile box and the ref-tile
#      box exceeds the block's current worst best-distance;
#   4. each query tile starts its sweep at its Morton-diagonal reference
#      tile (static index remap), so the best tightens immediately and the
#      far tiles that follow are skipped.
# Exactness is preserved: a tile is only skipped when NO query in the block
# could improve inside it.

def _spread_bits10(x):
    """Spread 10 bits of x so there are 2 zero bits between each."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_codes(points: jax.Array, lo, inv_extent) -> jax.Array:
    """30-bit Morton codes for [N,3] points given scene bounds."""
    u = jnp.clip(((points - lo) * inv_extent * 1023.0), 0.0, 1023.0)
    u = u.astype(jnp.int32)
    return (_spread_bits10(u[:, 0]) |
            (_spread_bits10(u[:, 1]) << 1) |
            (_spread_bits10(u[:, 2]) << 2))


def morton_order(points: jax.Array, valid_mask=None) -> jax.Array:
    """Permutation sorting points Morton-first; invalid points sort last."""
    if valid_mask is None:
        valid_mask = jnp.all(jnp.abs(points) < 1e5, axis=-1)
    pts = jnp.where(valid_mask[:, None], points, 0.0)
    lo = jnp.min(jnp.where(valid_mask[:, None], points, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(valid_mask[:, None], points, -jnp.inf), axis=0)
    inv = 1.0 / jnp.maximum(hi - lo, 1e-6)
    codes = morton_codes(pts, lo, inv)
    codes = jnp.where(valid_mask, codes, jnp.int32(2 ** 30))
    return jnp.argsort(codes)


def _tile_boxes(points: jax.Array, tile: int) -> jax.Array:
    """Per-tile AABBs -> [n_tiles, 8] rows (min xyz, max xyz, 0, 0)."""
    n = points.shape[0] // tile
    p = points.reshape(n, tile, 3)
    return jnp.concatenate(
        [jnp.min(p, axis=1), jnp.max(p, axis=1),
         jnp.zeros((n, 2), points.dtype)], axis=1)


def _pruned_kernel(qbox_ref, rbox_ref, q_ref, r_ref, pay_ref,
                   d2_ref, pay_out_ref, best_score, best_pay, best_max):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_score[:] = jnp.full_like(best_score, jnp.inf)
        best_pay[:] = jnp.zeros_like(best_pay)
        best_max[0, 0] = jnp.inf

    # Lower-bound squared distance between the two tile AABBs.
    qmin = qbox_ref[0, 0, 0:3]
    qmax = qbox_ref[0, 0, 3:6]
    rmin = rbox_ref[0, 0, 0:3]
    rmax = rbox_ref[0, 0, 3:6]
    gap = jnp.maximum(jnp.maximum(qmin - rmax, rmin - qmax), 0.0)
    lb = jnp.sum(gap * gap)

    @pl.when(lb < best_max[0, 0])
    def _():
        q = q_ref[:]
        r = r_ref[:]
        pay = pay_ref[:]
        s = jax.lax.dot_general(q, r, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        tile_min = jnp.min(s, axis=1, keepdims=True)
        onehot = (s <= tile_min).astype(jnp.float32)
        onehot = onehot / jnp.maximum(
            jnp.sum(onehot, axis=1, keepdims=True), 1.0)
        tile_pay = jax.lax.dot_general(onehot, pay,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        take = tile_min < best_score[:]
        best_score[:] = jnp.where(take, tile_min, best_score[:])
        best_pay[:] = jnp.where(take, tile_pay, best_pay[:])
        # The scores are |q-r|^2 - |q|^2; the bound must compare in true
        # distance space: track max over (score + |q|^2) via column 4 of q
        # (holds |q|^2, see caller).
        qn2 = q_ref[:, 4:5]
        best_max[0, 0] = jnp.max(best_score[:] + qn2)

    @pl.when(j == nj - 1)
    def _():
        d2_ref[:] = best_score[:]
        pay_out_ref[:] = best_pay[:]


@functools.partial(jax.jit, static_argnames=('interpret',))
def nn_payload_pruned(queries: jax.Array, ref_points: jax.Array,
                      payload: jax.Array, interpret: bool = False):
    """Exact 1-NN with Morton + AABB tile pruning.

    Same contract as :func:`nn_payload`.  Queries/reference are sorted
    internally; results are returned in the caller's original order.
    """
    Q = queries.shape[0]
    R = ref_points.shape[0]
    P = payload.shape[1]
    qb = _tile(Q, _QB)
    rb = _tile(R, 1024)

    q_perm = morton_order(queries)
    r_perm = morton_order(ref_points)
    q_sorted = queries[q_perm]
    r_sorted = ref_points[r_perm]
    pay_sorted = payload[r_perm]

    q_norm2 = jnp.sum(q_sorted * q_sorted, axis=1, keepdims=True)
    # q_ext columns: x, y, z, 1, |q|^2, 0, 0, 0.  Column 4 rides along so
    # the kernel can convert scores to true distances for the bound.
    q_ext = jnp.concatenate(
        [q_sorted, jnp.ones((Q, 1), jnp.float32), q_norm2,
         jnp.zeros((Q, 3), jnp.float32)], axis=1)
    # r_ext columns: -2x, -2y, -2z, |r|^2, 0(paired with |q|^2), 0, 0, 0.
    r_ext = jnp.concatenate(
        [-2.0 * r_sorted,
         jnp.sum(r_sorted * r_sorted, axis=1, keepdims=True),
         jnp.zeros((R, 4), jnp.float32)], axis=1)

    qboxes = _tile_boxes(q_sorted, qb)[:, None, :]
    rboxes = _tile_boxes(r_sorted, rb)[:, None, :]

    P_pad = max(128, ((P + 127) // 128) * 128)
    if P_pad != P:
        pay_sorted = jnp.concatenate(
            [pay_sorted, jnp.zeros((R, P_pad - P), jnp.float32)], axis=1)

    ni, nj = Q // qb, R // rb

    def rmap(i, j):
        # Start each query tile at its Morton-diagonal reference tile.
        return ((j + i * nj // max(ni, 1)) % nj, 0)

    d2, pay = pl.pallas_call(
        _pruned_kernel,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), lambda i, j: rmap(i, j) + (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 8), rmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, P_pad), rmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, P_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
            jax.ShapeDtypeStruct((Q, P_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((qb, 1), jnp.float32),
            pltpu.VMEM((qb, P_pad), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qboxes, rboxes, q_ext, r_ext, pay_sorted)

    d2_true = jnp.maximum(d2 + q_norm2, 0.0)[:, 0]
    # Unsort back to caller order.
    inv = jnp.zeros((Q,), jnp.int32).at[q_perm].set(
        jnp.arange(Q, dtype=jnp.int32))
    return d2_true[inv], pay[inv, :P]
