"""Point-to-plane ICP engine: fixed-shape, jit/vmap-able.

TPU-native replacement for the libpointmatcher ICP pipeline configured in
laser_slam/configurations/icp_default.yaml and invoked via
``icp_.compute(reading, reference, initial_guess)``
(laser_track.cpp:496, incremental_estimator.cpp:108):

  reading filter    RandomSampling(prob=0.5)      -> caller samples to a
                                                     fixed reading budget
  reference filter  SamplingSurfaceNormal(knn=10) -> cloud.estimate_normals
  matcher           KDTreeMatcher(knn=1)          -> neighbors.nn_brute /
                                                     pallas_nn.nn_indices
  outlier filter    TrimmedDist(ratio=0.75)       -> masked quantile trim
  minimizer         PointToPlane                  -> 6x6 Gauss-Newton step
  checkers          Counter(40) + Differential    -> lax.while_loop with a
                    (0.001/0.01, smooth 4)           smoothed-delta window

Semantics preserved: on failure (too few correspondences) the initial
guess is returned, mirroring the reference's catch of
``PointMatcher::ConvergenceError`` (laser_track.cpp:495-502) — except here
failure is a value (``IcpResult.valid``), not an exception, so the
op stays pure and vmappable.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from laser_slam_tpu.config import IcpConfig
from laser_slam_tpu.ops import se3
from laser_slam_tpu.ops.cloud import Cloud
from laser_slam_tpu.ops import neighbors as nb


class IcpResult(NamedTuple):
    """Result of one ICP solve.

    T: pose7 aligning reading into the reference frame (T @ reading ~ ref).
    valid: correspondence count stayed above the minimum — when False, T
        equals the initial guess (reference fallback semantics).
    iterations: iterations actually executed.
    mean_error: mean |point-to-plane residual| over inliers at the last
        iteration.
    num_inliers: trimmed-inlier count at the last iteration.
    """
    T: jax.Array
    valid: jax.Array
    iterations: jax.Array
    mean_error: jax.Array
    num_inliers: jax.Array


# Minimum trimmed-inlier count below which the solve is declared failed.
MIN_INLIERS = 24


def _trim_mask(d2: jax.Array, valid: jax.Array, ratio: float,
               method: str = 'sort', d2_max: float = 9.0):
    """Keep the closest ``ratio`` fraction of valid correspondences.

    Implements TrimmedDistOutlierFilter (icp_default.yaml:15-16) with fixed
    shapes: threshold = distance quantile among valid matches.

    method='sort': exact quantile via sort (libpointmatcher parity).
    method='histogram': 256-bin approximate quantile — O(N) instead of a
    bitonic sort, ~5x cheaper per ICP iteration on TPU; the threshold is
    conservative (rounds the bin up) so at least ``ratio`` survives.
    """
    if method == 'histogram':
        bins = 256
        # Bin by sqrt(d2) for resolution near zero where matches live.
        d = jnp.sqrt(jnp.minimum(d2, d2_max))
        scale = bins / (d2_max ** 0.5)
        idx = jnp.clip((d * scale).astype(jnp.int32), 0, bins - 1)
        hist = jnp.zeros((bins,), jnp.int32).at[
            jnp.where(valid, idx, bins)].add(1, mode='drop')
        cum = jnp.cumsum(hist)
        n_valid = jnp.sum(valid)
        target = (n_valid.astype(jnp.float32) * ratio).astype(jnp.int32)
        bin_idx = jnp.searchsorted(cum, target)
        thresh_d = (bin_idx.astype(jnp.float32) + 1.0) / scale
        return valid & (d <= thresh_d)
    big = jnp.where(valid, d2, jnp.inf)
    order = jnp.sort(big)
    n_valid = jnp.sum(valid)
    k = jnp.maximum((n_valid.astype(jnp.float32) * ratio).astype(jnp.int32),
                    1) - 1
    thresh = order[jnp.clip(k, 0, d2.shape[0] - 1)]
    return valid & (d2 <= thresh)


def _gauss_newton_step(p_world, q, n, w, damping=1e-6):
    """One point-to-plane GN step.

    Minimizes sum_i w_i (n_i . (p_i - q_i))^2 over a left-multiplicative
    increment exp([omega, v]) applied to the points p.
    J_i = [p_i x n_i, n_i] in R^6.
    """
    r = jnp.sum(n * (p_world - q), axis=-1)              # [N]
    J = jnp.concatenate([jnp.cross(p_world, n), n], axis=-1)  # [N,6]
    Jw = J * w[:, None]
    A = Jw.T @ J                                         # [6,6]
    b = -Jw.T @ r                                        # [6]
    A = A + damping * jnp.eye(6, dtype=A.dtype) * (1.0 + jnp.trace(A) / 6.0)
    delta = jnp.linalg.solve(A, b)
    return delta, r


def icp_point_to_plane(
        reading: Cloud,
        reference: Cloud,
        ref_normals: jax.Array,
        initial_guess: jax.Array,
        config: IcpConfig,
        prebuilt_image=None,
) -> IcpResult:
    """Align ``reading`` to ``reference`` starting from ``initial_guess``.

    Mirrors ``icp_.compute(reading, reference, T0)`` (laser_track.cpp:496).
    ``ref_normals`` are per-reference-point unit normals in the reference
    frame (precompute with :func:`cloud.estimate_normals`).  The matcher
    comes from ``config.matcher``; ``prebuilt_image`` supplies a prebuilt
    :class:`range_image.RangeImage` for 'projective' (hoist it when many
    readings register against one shared reference).  (A voxel-hash
    'grid' tier existed through round 2; it measured slower than exact
    brute and was deleted — experiments/grid_matcher.py.)
    """
    if config.matcher not in ('brute', 'pallas', 'projective'):
        raise ValueError(f'unknown ICP matcher {config.matcher!r}; expected '
                         "'brute', 'pallas' or 'projective'")
    max_corr2 = config.max_correspondence_dist_m ** 2
    smooth = config.smooth_length

    # Reference points with a sentinel row so a miss index (== capacity)
    # gathers a well-defined dead row.
    ref_ext_pts = jnp.concatenate(
        [reference.points,
         jnp.full((1, 3), 0.0, reference.points.dtype)], axis=0)
    ref_ext_normals = jnp.concatenate(
        [ref_normals, jnp.zeros((1, 3), ref_normals.dtype)], axis=0)
    ref_ext_mask = jnp.concatenate(
        [reference.mask, jnp.zeros((1,), bool)], axis=0)

    if config.matcher == 'projective':
        from laser_slam_tpu.ops import range_image as ri
        if prebuilt_image is not None:
            image = prebuilt_image
        else:
            image = ri.build_range_image(
                reference, ref_normals,
                rows=config.range_image_rows, cols=config.range_image_cols,
                elev_min=config.range_image_elev_min,
                elev_max=config.range_image_elev_max,
                window=config.range_image_window)

        def match_payload(p_world, msk):
            q, n, d2 = ri.nn_projective(p_world, image)
            return q, n, d2, msk
    elif config.matcher == 'pallas':
        from laser_slam_tpu.ops import pallas_nn
        # VPU-broadcast exact-NN kernel (see ops/pallas_nn.py for the
        # design + measured 2.1x over nn_brute).  Parked reference
        # points carry huge distances and can never win, so no mask
        # gather is needed; the winner's payload is one XLA gather.
        interpret = not pallas_nn.on_tpu()
        if config.pallas_prune:
            # Morton-sorted AABB-pruned variant: exact within the
            # correspondence radius (all ICP uses), tiles beyond it or
            # beyond the running best skipped.  Sort once per call —
            # the reference is fixed across iterations.
            pref = pallas_nn.build_pruned_ref(reference.points)
            s_ext_pts = jnp.concatenate(
                [reference.points[pref.perm],
                 jnp.zeros((1, 3), reference.points.dtype)], axis=0)
            s_ext_normals = jnp.concatenate(
                [ref_normals[pref.perm],
                 jnp.zeros((1, 3), ref_normals.dtype)], axis=0)

            def match_payload(p_world, msk):
                d2, idx = pallas_nn.nn_indices_pruned(
                    p_world, pref,
                    cutoff=config.max_correspondence_dist_m,
                    interpret=interpret)
                idx = jnp.clip(idx, 0, reference.capacity)
                return s_ext_pts[idx], s_ext_normals[idx], d2, msk
        else:
            def match_payload(p_world, msk):
                d2, idx = pallas_nn.nn_indices(p_world, reference.points,
                                               interpret=interpret)
                return ref_ext_pts[idx], ref_ext_normals[idx], d2, msk
    else:
        def match_payload(p_world, msk):
            idx, d2 = nb.nn_brute(p_world, reference.points)
            idx = jnp.clip(idx, 0, reference.capacity)
            return (ref_ext_pts[idx], ref_ext_normals[idx], d2,
                    msk & ref_ext_mask[idx])

    S = max(int(config.gn_steps_per_match), 1)

    def run_loop(pts, msk, T0, max_iterations: int):
        """Match/GN while-loop over a (possibly subset) reading."""

        def cond(state):
            T, it, hist, done, *_ = state
            return (it < max_iterations) & ~done

        def body(state):
            T, it, hist, done, mean_err0, _ = state
            p_world = se3.apply(T, pts)
            q, n, d2, base_valid = match_payload(p_world, msk)
            valid = base_valid & (d2 <= max_corr2)
            inlier = _trim_mask(d2, valid, config.trimmed_dist_ratio,
                                method=config.trim_method, d2_max=max_corr2)
            w = inlier.astype(p_world.dtype)
            n_in = jnp.sum(inlier)
            enough = n_in >= MIN_INLIERS

            # S Gauss-Newton steps against the FIXED correspondences
            # (q, n): the association gather is the dominant cost, the
            # dense re-transform + 6x6 solve are cheap.  S=1 mirrors
            # libpointmatcher (one match per step).
            mean_err = mean_err0
            it_exec = it
            for _ in range(S):
                p_w = se3.apply(T, pts)
                delta, r = _gauss_newton_step(p_w, q, n, w)
                step_on = enough & ~done & (it_exec < max_iterations)
                delta = jnp.where(step_on, delta, 0.0)
                T = se3.normalize(se3.compose(se3.exp(delta), T))
                # Differential checker window (icp_default.yaml:24-27):
                # smoothed rot/trans increments over the last `smooth`
                # Gauss-Newton steps.
                d_rot = jnp.linalg.norm(delta[:3])
                d_trans = jnp.linalg.norm(delta[3:])
                hist = jnp.where(
                    step_on,
                    jnp.roll(hist, shift=-1, axis=0).at[-1].set(
                        jnp.stack([d_rot, d_trans])),
                    hist)
                means = jnp.mean(hist, axis=0)
                converged = ((it_exec + 1 >= smooth) &
                             (means[0] < config.min_diff_rot) &
                             (means[1] < config.min_diff_trans))
                mean_err = jnp.where(
                    step_on,
                    jnp.sum(jnp.abs(r) * w) / jnp.maximum(n_in, 1),
                    mean_err)
                it_exec = it_exec + step_on.astype(jnp.int32)
                done = done | converged | ~enough
            return (T, it_exec, hist, done, mean_err, n_in)

        hist0 = jnp.full((smooth, 2), jnp.inf, jnp.float32)
        state0 = (T0, jnp.int32(0), hist0, jnp.bool_(False),
                  jnp.float32(jnp.inf), jnp.int32(0))
        return jax.lax.while_loop(cond, body, state0)

    C = config.coarse_capacity
    T_start = initial_guess
    it_coarse = jnp.int32(0)
    if C and C < reading.capacity:
        # Coarse phase: converge on a strided subset (gather rows — the
        # hot cost — scale with the query count), then refine full-res.
        # Strided (not leading) so structured scans stay spatially spread.
        stride = reading.capacity // C
        pts_c = reading.points[::stride][:C]
        msk_c = reading.mask[::stride][:C]
        T_c, it_coarse, _, _, _, n_in_c = run_loop(
            pts_c, msk_c, initial_guess, config.coarse_max_iterations)
        # Fall back to the original guess if the coarse phase failed.
        T_start = jnp.where(n_in_c >= MIN_INLIERS, T_c, initial_guess)

    T, it, _, _, mean_err, n_in = run_loop(
        reading.points, reading.mask, T_start, config.max_iterations)

    ok = n_in >= MIN_INLIERS
    T_final = jnp.where(ok, T, initial_guess)
    return IcpResult(T=T_final, valid=ok, iterations=it + it_coarse,
                     mean_error=mean_err, num_inliers=n_in)


@partial(jax.jit, static_argnames=('config',))
def icp(reading: Cloud, reference: Cloud, ref_normals, initial_guess,
        config: IcpConfig) -> IcpResult:
    """Jitted entry point; picks the matcher from ``config.matcher``."""
    return icp_point_to_plane(reading, reference, ref_normals,
                              initial_guess, config)
