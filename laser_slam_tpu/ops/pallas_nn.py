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
