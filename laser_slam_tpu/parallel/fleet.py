"""Fleet mode: vmap-batched multi-trajectory SLAM on one chip.

New capability beyond the reference (BASELINE.json config 5): the
reference's multi-robot support is N workers sharing one mutex-guarded
estimator (incremental_estimator.cpp:22-26); here whole fleets of
*independent* trajectories run as one batched XLA program — every lane
executes the same fixed-shape ICP + pose-graph pipeline, so ``vmap`` turns
the single-robot ops into a fleet with zero code change and the MXU/VPU
see batch-major work.

Use cases: parameter sweeps, Monte-Carlo robustness studies, large-scale
log reprocessing, mapping farms.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from laser_slam_tpu.config import IcpConfig, SolverConfig
from laser_slam_tpu.graph.factors import FactorGraphData
from laser_slam_tpu.graph import solver as sv
from laser_slam_tpu.ops import cloud as pc
from laser_slam_tpu.ops import icp as icp_mod
from laser_slam_tpu.ops import se3


class FleetOdometryResult(NamedTuple):
    poses: jax.Array        # [B,T,7] estimated world poses
    rel_icp: jax.Array      # [B,T,7] per-step ICP relative transforms
    valid: jax.Array        # [B,T] ICP validity per step
    iterations: jax.Array   # [B,T]


@functools.partial(jax.jit, static_argnames=('config',))
def fleet_icp_odometry(points, masks, normals, init_pose, odom_rel,
                       config: IcpConfig) -> FleetOdometryResult:
    """Scan-to-scan ICP odometry for a whole fleet.

    points:  [B,T,N,3] per-lane scan sequences (padded)
    masks:   [B,T,N]
    normals: [B,T,N,3] per-scan normals (ops.cloud.estimate_normals)
    init_pose: [B,7] world pose of each lane's first scan
    odom_rel:  [B,T,7] odometry-predicted relative motion scan t-1 -> t
               (identity for t=0; used as the ICP initial guess)

    Registers scan t against scan t-1 per lane (``lax.scan`` over time,
    ``vmap`` over lanes) and integrates the relative transforms.
    """
    B, T, N, _ = points.shape

    def lane_step(carry, xs):
        prev_pts, prev_mask, prev_normals, pose = carry
        pts, mask, nrm, guess = xs
        reading = pc.Cloud(pts, mask)
        reference = pc.Cloud(prev_pts, prev_mask)
        res = icp_mod.icp_point_to_plane(
            reading, reference, prev_normals, guess, config)
        new_pose = se3.normalize(se3.compose(pose, res.T))
        return ((pts, mask, nrm, new_pose),
                (new_pose, res.T, res.valid, res.iterations))

    def one_lane(pts_seq, mask_seq, nrm_seq, pose0, rel_seq):
        carry0 = (pts_seq[0], mask_seq[0], nrm_seq[0], pose0)
        xs = (pts_seq[1:], mask_seq[1:], nrm_seq[1:], rel_seq[1:])
        _, (poses, rels, valids, iters) = jax.lax.scan(lane_step, carry0, xs)
        poses = jnp.concatenate([pose0[None], poses], axis=0)
        rels = jnp.concatenate([se3.identity()[None], rels], axis=0)
        valids = jnp.concatenate([jnp.ones((1,), bool), valids])
        iters = jnp.concatenate([jnp.zeros((1,), jnp.int32), iters])
        return poses, rels, valids, iters

    poses, rels, valids, iters = jax.vmap(one_lane)(
        points, masks, normals, init_pose, odom_rel)
    return FleetOdometryResult(poses, rels, valids, iters)


@functools.partial(jax.jit, static_argnames=('config',))
def fleet_solve(graphs: FactorGraphData, poses, pose_masks,
                config: SolverConfig):
    """Batched pose-graph solve: every leaf of ``graphs`` and ``poses``
    carries a leading fleet axis [B, ...]."""
    return jax.vmap(lambda g, p, m: sv.solve(g, p, m, config))(
        graphs, poses, pose_masks)


def build_fleet_chain_graphs(rel_meas, rel_valid, first_poses, odo_sigmas,
                             prior_sigma: float = 1e-7):
    """Assemble batched chain graphs from fleet odometry output.

    rel_meas: [B,T,7] ICP relative transforms (entry 0 ignored)
    rel_valid: [B,T] — invalid steps get weight 0 (odometry-only fallback,
        mirroring the reference's convergence-failure semantics)
    first_poses: [B,7] prior measurement per lane
    Returns (FactorGraphData with leading B axis, pose_mask [B,T]).
    """
    B, T, _ = rel_meas.shape
    F = T - 1
    keys = jnp.broadcast_to(
        jnp.stack([jnp.arange(F), jnp.arange(1, T)], axis=-1), (B, F, 2)
    ).astype(jnp.int32)
    sqrt_info = jnp.broadcast_to(
        1.0 / jnp.asarray(odo_sigmas, jnp.float32), (B, F, 6))
    graphs = FactorGraphData(
        rel_meas=rel_meas[:, 1:],
        rel_keys=keys,
        rel_sqrt_info=sqrt_info,
        rel_robust=jnp.zeros((B, F), bool),
        rel_fixed_a=jnp.zeros((B, F), bool),
        rel_weight=rel_valid[:, 1:].astype(jnp.float32),
        prior_meas=first_poses[:, None, :],
        prior_keys=jnp.zeros((B, 1), jnp.int32),
        prior_sqrt_info=jnp.full((B, 1, 6), 1.0 / prior_sigma, jnp.float32),
        prior_weight=jnp.ones((B, 1), jnp.float32),
    )
    pose_mask = jnp.ones((B, T), bool)
    return graphs, pose_mask
