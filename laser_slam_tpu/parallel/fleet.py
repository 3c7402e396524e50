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


def batched_icp(points, masks, reference, ref_normals, guesses,
                config: IcpConfig):
    """vmap point-to-plane ICP of a batch of readings against a SHARED
    reference (the serving path behind the headline benchmark).

    Guard for a measured XLA scheduling pathology: B=64 on TPU v5e runs
    ~3x slower than B=32 or B=128 at identical per-pair work (345 vs
    1100 pairs/s, reproducible — experiments/headline_and_soak.py).
    Batches of exactly 64 are split into two 32-lane halves inside the
    same program; all other sizes pass straight through.
    """
    def run(p, m, g):
        return jax.vmap(lambda pp, mm, gg: icp_mod.icp_point_to_plane(
            pc.Cloud(pp, mm), reference, ref_normals, gg, config))(p, m, g)

    if points.shape[0] == 64:
        h1 = run(points[:32], masks[:32], guesses[:32])
        h2 = run(points[32:], masks[32:], guesses[32:])
        return jax.tree.map(lambda a, b: jnp.concatenate([a, b]), h1, h2)
    return run(points, masks, guesses)


class FleetMaps(NamedTuple):
    """Per-lane world-frame local maps (BASELINE config 5's 'local-map NN
    queries'): fixed-capacity SENTINEL-parked buffers, one per lane."""
    points: jax.Array   # [B,M,3]
    mask: jax.Array     # [B,M]
    cursor: jax.Array   # [B] int32 next write row


def init_fleet_maps(n_lanes: int, capacity: int) -> FleetMaps:
    return FleetMaps(
        points=jnp.full((n_lanes, capacity, 3), pc.SENTINEL, jnp.float32),
        mask=jnp.zeros((n_lanes, capacity), bool),
        cursor=jnp.zeros((n_lanes,), jnp.int32))


@functools.partial(jax.jit, static_argnames=('voxel_size_m',),
                   donate_argnums=(0,))
def fleet_accumulate(maps: FleetMaps, scan_points: jax.Array,
                     scan_masks: jax.Array, poses: jax.Array,
                     voxel_size_m: float = 0.0) -> FleetMaps:
    """Append one scan per lane to its map, transformed by its pose.

    scan_points [B,N,3] (sensor frame), poses [B,7].  When a lane's
    buffer would overflow it is voxel-compacted first (``voxel_size_m``
    > 0) or the overflow rows are dropped (bounded-memory policy, the
    same trade as pipeline.device_map.accumulate_scan).
    """
    B, N, _ = scan_points.shape
    M = maps.points.shape[1]

    def one(m_pts, m_msk, cur, pts, msk, pose):
        world = se3.apply(pose, pts)
        world = jnp.where(msk[:, None], world, pc.SENTINEL)
        if voxel_size_m > 0.0:
            def compact(args):
                p, mm = args
                c = pc.voxel_filter(pc.Cloud(p, mm), voxel_size_m, 1)
                c = pc.compact(c, M)
                return c.points, c.mask, jnp.sum(c.mask).astype(jnp.int32)

            m_pts, m_msk, cur = jax.lax.cond(
                cur + N > M, compact,
                lambda args: (args[0], args[1], cur), (m_pts, m_msk))
        rows = cur + jnp.arange(N)
        return (m_pts.at[rows].set(world, mode='drop'),
                m_msk.at[rows].set(msk, mode='drop'),
                jnp.minimum(cur + N, M))

    pts, msk, cur = jax.vmap(one)(maps.points, maps.mask, maps.cursor,
                                  scan_points, scan_masks, poses)
    return FleetMaps(points=pts, mask=msk, cursor=cur)


@jax.jit
def fleet_map_query(maps: FleetMaps, queries: jax.Array):
    """Batched exact 1-NN of per-lane queries against per-lane maps.

    queries [B,Q,3] (world frame) -> (indices [B,Q], sq-distances [B,Q]).
    Each lane's MXU-tiled brute NN sweep (ops.neighbors.nn_brute) runs
    under vmap, so the whole fleet is one batched distance-product
    program — the capability BASELINE config 5 adds over the reference's
    single-map-per-worker design (laser_slam_worker.cpp:415-488 only
    voxel-filters; NN against the map has no reference equivalent).
    """
    from laser_slam_tpu.ops import neighbors

    def one(q, ref):
        return neighbors.nn_brute(q, ref)

    return jax.vmap(one)(queries, maps.points)


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
