"""Nearest-neighbor correspondence search on TPU.

Replaces libnabo's kd-tree (KDTreeMatcher knn=1, icp_default.yaml:10-12).
Trees are pointer-chasing structures that do not map to TPU hardware; two
engines replace them:

* ``nn_brute``   — exact 1-NN via tiled squared-distance products that ride
                   the MXU with an online running-min (flash-attention
                   style).  Exact parity with a kd-tree.
* ``knn_brute``  — exact k-NN for normal estimation.
* the Pallas VPU kernel in ``ops/pallas_nn.py`` — the faster exact tier
  for large references (a voxel-hash approximate tier was measured
  slower than exact brute and deleted; see experiments/grid_matcher.py).

All return indices + squared distances of nearest reference points per
query.  Invalid reference points are parked at ``cloud.SENTINEL`` so
they never win.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from laser_slam_tpu.ops.cloud import SENTINEL  # noqa: F401  (re-export)


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
