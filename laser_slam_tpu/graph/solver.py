"""Incremental Gauss-Newton / PCG pose-graph solver on SE(3).

TPU-native replacement for GTSAM iSAM2 (incremental_estimator.cpp:17-20,
151-163): instead of an incremental Bayes tree, every ``solve`` runs a
fixed number of Gauss-Newton iterations (3, mirroring the reference's three
``isam2_.update()`` calls per scan) over the whole padded graph, each GN
step solved by block-Jacobi-preconditioned conjugate gradients.  Because
the solve is warm-started from the previous estimate — which is already
near-optimal for all but the newest pose — the effective work per scan is
comparable to an incremental update, but the computation is one fused XLA
program of gathers, 6x6 block algebra and segment-sums: no trees, no host
control flow, vmap/pjit-able.

Numerical notes:
* Ultra-tight priors (the reference's sigma=1e-7 first-node prior,
  laser_track.cpp:56-64) would put ~1e14 on the normal-equation diagonal
  and destroy f32 conditioning.  Priors with sqrt-info above
  ``GAUGE_FIX_THRESHOLD`` are therefore treated as gauge constraints: the
  pose is frozen (delta forced to zero) rather than weighted.  This is
  dynamic — deactivating the prior (weight=0) unfreezes the pose, which
  reproduces the reference's prior-removal-on-link behavior
  (incremental_estimator.cpp:240-258).
* Jacobians are analytic (adjoint + inverse-right-Jacobian series, exact
  at the optimum); the ``jax.jacfwd`` linearization is retained as the
  test oracle (tests/test_solver.py::test_analytic_jacobians_match_ad).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from laser_slam_tpu.config import SolverConfig
from laser_slam_tpu.graph.factors import FactorGraphData
from laser_slam_tpu.ops import se3

# sqrt-info beyond this is treated as a hard gauge constraint.
GAUGE_FIX_THRESHOLD = 1.0e5


# ---------------------------------------------------------------------------
# Residuals and Jacobians
# ---------------------------------------------------------------------------

def _rel_residual(delta_a, delta_b, T_a, T_b, meas):
    """Whitened-to-be relative residual with right perturbations applied."""
    Ta = se3.compose(T_a, se3.exp(delta_a))
    Tb = se3.compose(T_b, se3.exp(delta_b))
    return se3.log(se3.compose(se3.inverse(meas),
                               se3.compose(se3.inverse(Ta), Tb)))


def _prior_residual(delta, T, meas):
    Tp = se3.compose(T, se3.exp(delta))
    return se3.log(se3.compose(se3.inverse(meas), Tp))


_zero6 = jnp.zeros(6, jnp.float32)


@jax.vmap
def _rel_linearize(T_a, T_b, meas):
    """Per-factor residual r[6] and Jacobians Ja, Jb [6,6]."""
    r = _rel_residual(_zero6, _zero6, T_a, T_b, meas)
    Ja = jax.jacfwd(_rel_residual, argnums=0)(_zero6, _zero6, T_a, T_b, meas)
    Jb = jax.jacfwd(_rel_residual, argnums=1)(_zero6, _zero6, T_a, T_b, meas)
    return r, Ja, Jb


@jax.vmap
def _prior_linearize(T, meas):
    r = _prior_residual(_zero6, T, meas)
    J = jax.jacfwd(_prior_residual, argnums=0)(_zero6, T, meas)
    return r, J


# ---------------------------------------------------------------------------
# Analytic linearization (fast path; jacfwd retained as the test oracle)
# ---------------------------------------------------------------------------

def _adjoint(pose7):
    """SE(3) adjoint [6,6] for the [omega, v] tangent convention:
    Ad(T) = [[R, 0], [[t]x R, R]]."""
    R = se3.quat_to_matrix(se3.rotation(pose7))
    t = se3.translation(pose7)
    tx = se3._hat(t)
    top = jnp.concatenate([R, jnp.zeros_like(R)], axis=-1)
    bot = jnp.concatenate([tx @ R, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _ad_se3(xi):
    """Little adjoint ad(xi) [6,6]: [[wx, 0], [vx, wx]]."""
    wx = se3._hat(xi[..., :3])
    vx = se3._hat(xi[..., 3:])
    top = jnp.concatenate([wx, jnp.zeros_like(wx)], axis=-1)
    bot = jnp.concatenate([vx, wx], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _jr_inv(r):
    """Inverse right Jacobian of the SE(3) log at r, to second order:
    Jr^{-1}(r) ~ I + ad(r)/2 + ad(r)^2/12.

    Exact at r = 0 (the optimum), O(|r|^2) accurate elsewhere — affects
    only the GN convergence path, not the fixed point.
    """
    a = _ad_se3(r)
    eye = jnp.eye(6, dtype=r.dtype)
    return eye + 0.5 * a + (1.0 / 12.0) * (a @ a)


@jax.vmap
def _rel_linearize_analytic(T_a, T_b, meas):
    """Analytic residual + Jacobians of log(meas^-1 Ta^-1 Tb) w.r.t. right
    perturbations of Ta and Tb.

    With E = meas^-1 Ta^-1 Tb and r = log(E):
      d/d(delta_b): E -> E exp(delta_b)            => Jb = Jr^{-1}(r)
      d/d(delta_a): E -> exp(-Ad(meas^-1) da) E    => Ja = -Jl^{-1}(r) Ad(meas^-1)
    where Jl^{-1}(r) = Jr^{-1}(-r).
    """
    E = se3.compose(se3.inverse(meas),
                    se3.compose(se3.inverse(T_a), T_b))
    r = se3.log(E)
    Jb = _jr_inv(r)
    Ja = -_jr_inv(-r) @ _adjoint(se3.inverse(meas))
    return r, Ja, Jb


@jax.vmap
def _prior_linearize_analytic(T, meas):
    E = se3.compose(se3.inverse(meas), T)
    r = se3.log(E)
    return r, _jr_inv(r)


def _cauchy_weight(r_whitened, robust, k):
    """GTSAM Robust(Cauchy(k)) scalar weight per factor on the whitened
    residual norm (laser_track.cpp:38-54)."""
    sq = jnp.sum(r_whitened * r_whitened, axis=-1)
    w = 1.0 / (1.0 + sq / (k * k))
    return jnp.where(robust, w, 1.0)


# ---------------------------------------------------------------------------
# PCG on the Gauss-Newton normal equations
# ---------------------------------------------------------------------------

class _LinearizedGraph(NamedTuple):
    """One GN linearization point, ready for PCG."""
    Ja: jax.Array        # [F,6,6]
    Jb: jax.Array        # [F,6,6]
    r_rel: jax.Array     # [F,6] whitened residual
    w_rel: jax.Array     # [F] combined weight (activation * cauchy)
    keys: jax.Array      # [F,2]
    Jp: jax.Array        # [P,6,6]
    r_prior: jax.Array   # [P,6]
    w_prior: jax.Array   # [P]
    prior_keys: jax.Array
    free: jax.Array      # [N] f32: 1 for optimizable poses, 0 frozen/invalid


def _linearize(graph: FactorGraphData, poses, pose_mask,
               cauchy_k) -> _LinearizedGraph:
    T_a = poses[graph.rel_keys[:, 0]]
    T_b = poses[graph.rel_keys[:, 1]]
    r, Ja, Jb = _rel_linearize_analytic(T_a, T_b, graph.rel_meas)
    # Whiten: multiply rows by sqrt-info diag.
    s = graph.rel_sqrt_info
    r_w = r * s
    Ja_w = Ja * s[:, :, None]
    Jb_w = Jb * s[:, :, None]
    w = graph.rel_weight * _cauchy_weight(r_w, graph.rel_robust, cauchy_k)
    # fix_first_node factors: key_a constant (laser_track.cpp:440-444).
    Ja_w = jnp.where(graph.rel_fixed_a[:, None, None], 0.0, Ja_w)

    Tp = poses[graph.prior_keys]
    rp, Jp = _prior_linearize_analytic(Tp, graph.prior_meas)
    # Gauge-fixing priors freeze their pose instead of weighting.
    gauge = jnp.any(graph.prior_sqrt_info > GAUGE_FIX_THRESHOLD, axis=-1)
    sp = jnp.minimum(graph.prior_sqrt_info, GAUGE_FIX_THRESHOLD)
    rp_w = rp * sp
    Jp_w = Jp * sp[:, :, None]
    wp = graph.prior_weight

    n = poses.shape[0]
    frozen = jnp.zeros((n,), bool).at[graph.prior_keys].max(
        gauge & (graph.prior_weight > 0))
    free = (pose_mask & ~frozen).astype(poses.dtype)
    return _LinearizedGraph(Ja_w, Jb_w, r_w, w, graph.rel_keys,
                            Jp_w, rp_w, wp, graph.prior_keys, free)


def _hessian_matvec(lin: _LinearizedGraph, x, damping):
    """y = (J^T W J + damping*I) x with frozen poses passed through."""
    xa = x[lin.keys[:, 0]] * lin.free[lin.keys[:, 0], None]
    xb = x[lin.keys[:, 1]] * lin.free[lin.keys[:, 1], None]
    Jx = (jnp.einsum('fij,fj->fi', lin.Ja, xa) +
          jnp.einsum('fij,fj->fi', lin.Jb, xb)) * lin.w_rel[:, None]
    ya = jnp.einsum('fji,fj->fi', lin.Ja, Jx)
    yb = jnp.einsum('fji,fj->fi', lin.Jb, Jx)
    y = jnp.zeros_like(x).at[lin.keys[:, 0]].add(ya)
    y = y.at[lin.keys[:, 1]].add(yb)

    xp = x[lin.prior_keys] * lin.free[lin.prior_keys, None]
    Jpx = jnp.einsum('pij,pj->pi', lin.Jp, xp) * lin.w_prior[:, None]
    y = y.at[lin.prior_keys].add(jnp.einsum('pji,pj->pi', lin.Jp, Jpx))

    y = y * lin.free[:, None] + damping * x
    # Frozen/invalid poses: identity row keeps the operator SPD.
    y = y + (1.0 - lin.free)[:, None] * x
    return y


def _make_matvec(lin: _LinearizedGraph, damping, config):
    """Build ``mv(x) = (H + damping I) x`` once per linearization.

    config.matvec 'scatter': the general :func:`_hessian_matvec` — two
    full-length [F,6] scatter-adds per call, whose TPU cost scales with
    the factor CAPACITY (~1.8 ms at a 16k buffer) regardless of graph
    structure.

    config.matvec 'chain' (default): pose graphs are a chain plus a few
    loop closures, so write H = T + U U^T exactly — T the block-
    tridiagonal chain part (chain factors + priors + ALL off-chain
    diagonal contributions moved out + damping + frozen-identity rows),
    built here with the same one-off scatters, then applied per call as
    three batched [N,6,6]x[N,6] contractions and two shifts (no
    scatter); U the compact off-chain blocks (capacity L slots, scatter
    over L<<F rows).  Exact when every active off-chain factor is
    selected; otherwise a lax.cond falls back to the scatter form at
    runtime.  This is what makes PCG iterations cheap enough for the
    cached incremental solve to beat a CPU sparse factorization
    (replaces the per-update elimination inside GTSAM's iSAM2,
    incremental_estimator.cpp:151-163).
    """
    if getattr(config, 'matvec', 'chain') != 'chain':
        return lambda x: _hessian_matvec(lin, x, damping)

    capacity = config.offchain_capacity
    off = _offchain_mask(lin)
    L = min(capacity, lin.keys.shape[0])
    sel, valid = _first_true_indices(off, L)
    covered = jnp.sum(off) <= L
    # T excludes the selected off-chain factors entirely; their diagonal
    # AND coupling ride in U U^T (exact, not a preconditioner: no boost).
    w_scale = jnp.ones_like(lin.w_rel).at[sel].set(
        jnp.where(valid, 0.0, 1.0), mode='drop')
    B, A = _build_tridiag(lin, damping, w_scale=w_scale, boost=False)
    Ua, Ub, ka, kb = _offchain_blocks(lin, sel, valid)
    zero = jnp.zeros((1, 6, 6), B.dtype)
    # A_up[i] = A[i+1]^T couples pose i to pose i+1.
    A_up = jnp.concatenate([jnp.swapaxes(A[1:], -1, -2), zero])

    def mv_chain(x):
        zrow = jnp.zeros((1, 6), x.dtype)
        x_prev = jnp.concatenate([zrow, x[:-1]])
        x_next = jnp.concatenate([x[1:], zrow])
        y = (jnp.einsum('nij,nj->ni', B, x)
             + jnp.einsum('nij,nj->ni', A, x_prev)
             + jnp.einsum('nij,nj->ni', A_up, x_next))
        t = (jnp.einsum('lsc,ls->lc', Ua, x[ka]) +
             jnp.einsum('lsc,ls->lc', Ub, x[kb]))
        y = y.at[ka].add(jnp.einsum('lsc,lc->ls', Ua, t))
        y = y.at[kb].add(jnp.einsum('lsc,lc->ls', Ub, t))
        return y

    def mv(x):
        return jax.lax.cond(covered, mv_chain,
                            lambda v: _hessian_matvec(lin, v, damping), x)

    return mv


def _gradient(lin: _LinearizedGraph):
    """g = J^T W r (negated later); zero for frozen poses."""
    wr = lin.r_rel * lin.w_rel[:, None]
    ga = jnp.einsum('fji,fj->fi', lin.Ja, wr)
    gb = jnp.einsum('fji,fj->fi', lin.Jb, wr)
    n6 = lin.free.shape[0]
    g = jnp.zeros((n6, 6), wr.dtype).at[lin.keys[:, 0]].add(ga)
    g = g.at[lin.keys[:, 1]].add(gb)
    wrp = lin.r_prior * lin.w_prior[:, None]
    g = g.at[lin.prior_keys].add(jnp.einsum('pji,pj->pi', lin.Jp, wrp))
    return g * lin.free[:, None]


def _cholesky6(A):
    """Batched 6x6 Cholesky, unrolled (lower-triangular L with A = L L^T).

    jnp.linalg.inv / cholesky on [N,6,6] lower to LAPACK-style loops that
    are ~30x slower on TPU than this unrolled elementwise form.
    """
    n = 6
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol_inverse6(A):
    """Batched SPD 6x6 inverse via unrolled Cholesky: A^-1 = L^-T L^-1."""
    n = 6
    L = _cholesky6(A)
    # Invert L (lower triangular), unrolled forward substitution.
    Linv = [[None] * n for _ in range(n)]
    for i in range(n):
        Linv[i][i] = 1.0 / L[i][i]
        for j in range(i):
            s = 0.0
            for k in range(j, i):
                s = s + L[i][k] * Linv[k][j]
            Linv[i][j] = -s / L[i][i]
    # A^-1[i,j] = sum_k Linv[k][i] * Linv[k][j]  (k >= max(i,j))
    rows = []
    for i in range(n):
        cols = []
        for j in range(n):
            s = 0.0
            for k in range(max(i, j), n):
                s = s + Linv[k][i] * Linv[k][j]
            cols.append(s)
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def _block_jacobi(lin: _LinearizedGraph, damping):
    """Inverse 6x6 diagonal blocks of the Hessian as preconditioner."""
    n = lin.free.shape[0]
    Ha = jnp.einsum('fji,fjk->fik', lin.Ja, lin.Ja * lin.w_rel[:, None, None])
    Hb = jnp.einsum('fji,fjk->fik', lin.Jb, lin.Jb * lin.w_rel[:, None, None])
    H = jnp.zeros((n, 6, 6), Ha.dtype).at[lin.keys[:, 0]].add(Ha)
    H = H.at[lin.keys[:, 1]].add(Hb)
    Hp = jnp.einsum('pji,pjk->pik', lin.Jp, lin.Jp * lin.w_prior[:, None, None])
    H = H.at[lin.prior_keys].add(Hp)
    eye = jnp.eye(6, dtype=H.dtype)
    H = H * lin.free[:, None, None] + eye * (
        damping + (1.0 - lin.free)[:, None, None])
    return _chol_inverse6(H)


# ---------------------------------------------------------------------------
# Block-tridiagonal preconditioner (cyclic reduction)
# ---------------------------------------------------------------------------
#
# Pose graphs are chains plus sparse loop closures.  Block-Jacobi PCG moves
# information ONE hop per iteration, so low-frequency corrections (exactly
# what loop closures induce) need O(N) iterations on an N-pose chain —
# iSAM2 has no such limitation.  The fix: precondition with the EXACT
# solve of H's block-tridiagonal part (the chain), computed by cyclic
# reduction — log2(N) levels of batched 6x6 algebra, each level halving
# the system.  PCG then only has to correct for the off-chain factors.

def _chain_mask(lin: _LinearizedGraph):
    """Factors whose coupling lands on the block-tridiagonal chain."""
    return ((lin.keys[:, 1] == lin.keys[:, 0] + 1) &
            (lin.free[lin.keys[:, 0]] > 0) & (lin.free[lin.keys[:, 1]] > 0))


def _build_tridiag(lin: _LinearizedGraph, damping, w_scale=None,
                   boost=True):
    """Diagonal blocks B [N,6,6] and sub-diagonal blocks A [N,6,6]
    (A[i] couples pose i to pose i-1) of the Hessian's chain part.

    ``w_scale`` [F] optionally rescales each factor's weight in the BUILD
    only (the Woodbury preconditioner zeroes its selected off-chain
    factors here and re-adds them exactly as a low-rank term).
    ``boost=False`` skips the stabilizing diagonal boost — required when
    the blocks feed an EXACT matvec (:func:`_make_matvec`) rather than a
    cyclic-reduction factorization."""
    n = lin.free.shape[0]
    w = lin.w_rel if w_scale is None else lin.w_rel * w_scale
    Ha = jnp.einsum('fji,fjk->fik', lin.Ja, lin.Ja * w[:, None, None])
    Hb = jnp.einsum('fji,fjk->fik', lin.Jb, lin.Jb * w[:, None, None])
    B = jnp.zeros((n, 6, 6), Ha.dtype).at[lin.keys[:, 0]].add(Ha)
    B = B.at[lin.keys[:, 1]].add(Hb)
    Hp = jnp.einsum('pji,pjk->pik', lin.Jp, lin.Jp * lin.w_prior[:, None, None])
    B = B.at[lin.prior_keys].add(Hp)
    eye = jnp.eye(6, dtype=B.dtype)
    B = B * lin.free[:, None, None] + eye * (
        damping + (1.0 - lin.free)[:, None, None])

    # Chain coupling: factors with key_b == key_a + 1 contribute the
    # off-diagonal block H[b,a] = Jb^T W Ja.  Couplings touching frozen
    # poses are dropped (their rows/cols are identity).
    chain = _chain_mask(lin)
    Hba = jnp.einsum('fji,fjk->fik', lin.Jb,
                     lin.Ja * w[:, None, None])
    A = jnp.zeros((n, 6, 6), Ha.dtype).at[
        jnp.where(chain, lin.keys[:, 1], n)].add(
        jnp.where(chain[:, None, None], Hba, 0.0), mode='drop')

    # Stabilize cyclic reduction in f32: deep Schur complements of long
    # chains can go (numerically) indefinite.  A relative diagonal boost
    # keeps every pivot SPD; the preconditioner only needs to be close,
    # PCG absorbs the inexactness.  Magnitude matters for the LOW modes:
    # the boost floors the preconditioned Hessian's smallest eigenvalues
    # at ~boost*diag_mag, and a 10k-pose chain's true smallest modes sit
    # around 1/cov ~ 0.3 where diag_mag ~ 2e4 — at the historical 1e-3
    # the floor (~20) buried them, capping M's long-wavelength accuracy
    # at ~1% and forcing the covariance probes through dozens of PCG
    # iterations (experiments/cov_iteration_sweep.py).  With the dense
    # root absorbing the last levels (_CR_STOP=512 -> only ~5 reduction
    # levels at 16k poses) a much smaller boost is stable; _CR_BOOST is
    # module-level so experiments can sweep it.
    if boost:
        diag_mag = jnp.einsum('nii->n', B) / 6.0
        B = B + (_CR_BOOST * diag_mag)[:, None, None] * jnp.eye(
            6, dtype=B.dtype)
    return B, A


# Cyclic reduction stops once the system is down to this many blocks and
# finishes with ONE precomputed dense [6*stop, 6*stop] root inverse:
# every level of the reduction is a chain of small batched 6x6 ops whose
# cost on TPU is LAUNCH LATENCY, not FLOPs (measured 3.4 ms to factor /
# ~1.2 ms per apply at 16k poses with full log2(N)=14-level reduction),
# while a [384,384] matmul is one MXU tile.  Trading the last log2(stop)
# levels for a dense root cut apply latency ~2x at equal accuracy.
# Round-5 re-sweep (experiments/cr_stop_sweep.py, 16k-padded chain):
# apply 1.30 ms @64 -> 0.42 @256 -> 0.27 @512 -> 0.17 @1024; 512 is the
# knee once root_inv HBM footprint is considered ([3072,3072] f32 =
# 37 MB, read twice per apply ~= 90 us of bandwidth; 1024 quadruples
# that for 0.1 ms).  The direct-Woodbury solve path (pcg_init=
# 'precond') makes the apply THE hot op, so the knee matters.
_CR_STOP = 512

# Relative diagonal boost applied to the chain blocks before cyclic
# reduction (see _build_tridiag).  Swept against an f64 sparse ground
# truth in round 5 (experiments/cov_iteration_sweep.py + the findings
# in its docstring): the boost floors the factorization's smallest
# representable modes at ~boost*diag_mag, but shrinking it does NOT
# recover weakly-observed modes — f32 rounding inside the reduction
# acts as an effective boost of its own (1e-7 still capped a true
# 4.2e3 m^2 end-of-chain y-variance at ~15; 0 went indefinite/NaN).
# 1e-3 is the validated stable setting; EXACT absolute marginals on
# weakly-anchored graphs are an f64 computation by nature — use
# marginal_covariance_exact (host, sparse f64), like the reference's
# gtsam Marginals.
_CR_BOOST = 1e-3


def _tridiag_factor(B, A, stop=None):
    """Cyclic-reduction factorization of an SPD block-tridiagonal system.

    B: [N,6,6] diagonal blocks; A: [N,6,6] sub-diagonal (A[0] ignored).
    N is padded to a power of two with decoupled identity blocks.
    Returns the per-level factors for :func:`_tridiag_apply` — the matrix
    part is independent of the right-hand side, so PCG factors once per
    linearization and pays only the cheap r-sweep per iteration.

    The returned ``(levels, root_inv)`` tuple is a pure array pytree (no
    static sizes), so it can be returned from / passed into jitted
    functions — :class:`WoodburyCache` persists it across solves.
    ``root_inv`` is the DENSE inverse of the final <=``stop``-block
    system (see _CR_STOP; ``stop=None`` reads the module constant at call
    time so experiments can sweep it).
    """
    if stop is None:
        stop = _CR_STOP
    n0 = B.shape[0]
    n = 1
    while n < n0:
        n *= 2
    eye = jnp.eye(6, dtype=B.dtype)
    if n != n0:
        pad = n - n0
        B = jnp.concatenate([B, jnp.broadcast_to(eye, (pad, 6, 6))])
        A = jnp.concatenate([A, jnp.zeros((pad, 6, 6), A.dtype)])
    # C[i] couples i to i+1: C_i = A_{i+1}^T.
    C = jnp.concatenate([jnp.swapaxes(A[1:], -1, -2),
                         jnp.zeros((1, 6, 6), A.dtype)])
    A = A.at[0].set(0.0)

    levels = []
    while B.shape[0] > stop:
        m = B.shape[0]
        half = m // 2
        Be, Ae, Ce = B[0::2], A[0::2], C[0::2]
        Bo, Ao, Co = B[1::2], A[1::2], C[1::2]
        Bo_inv = _chol_inverse6(Bo)
        zero = jnp.zeros((1, 6, 6), B.dtype)
        BoL_inv = jnp.concatenate([zero, Bo_inv[:half - 1]])
        AoL = jnp.concatenate([zero, Ao[:half - 1]])
        CoL = jnp.concatenate([zero, Co[:half - 1]])
        G_left = Ae @ BoL_inv
        G_right = Ce @ Bo_inv
        levels.append((Bo_inv, Ao, Co, G_left, G_right))
        B = Be - G_left @ CoL - G_right @ Ao
        A = -G_left @ AoL
        C = -G_right @ Co

    # Dense root: assemble the remaining m-block tridiagonal system as a
    # [6m,6m] SPD matrix and invert it once (m <= stop).
    m = B.shape[0]
    if m == 1:
        root_inv = _chol_inverse6(B)[0]
    else:
        idx = jnp.arange(m)
        H4 = jnp.zeros((m, m, 6, 6), B.dtype)
        H4 = H4.at[idx, idx].set(B)
        H4 = H4.at[idx[1:], idx[:-1]].set(A[1:])
        H4 = H4.at[idx[:-1], idx[1:]].set(jnp.swapaxes(A[1:], -1, -2))
        Hd = H4.transpose(0, 2, 1, 3).reshape(6 * m, 6 * m)
        chol = jax.scipy.linalg.cho_factor(Hd)
        root_inv = jax.scipy.linalg.cho_solve(
            chol, jnp.eye(6 * m, dtype=B.dtype))
    return (levels, root_inv)


def _tridiag_apply(factors, r):
    """Solve T x = r given a cyclic-reduction factorization.

    ``r`` may be [N,6] or [N,6,K] (K right-hand sides solved together —
    the Woodbury preconditioner batches its low-rank columns this way).
    N must equal the size the factorization was built at (the power-of-two
    padding is re-derived from ``r.shape[0]``)."""
    levels, root_inv = factors
    n0 = r.shape[0]
    n = 1
    while n < n0:
        n *= 2
    if n != n0:
        r = jnp.concatenate(
            [r, jnp.zeros((n - n0,) + r.shape[1:], r.dtype)])

    ros = []
    for Bo_inv, Ao, Co, G_left, G_right in levels:
        re, ro = r[0::2], r[1::2]
        ros.append(ro)
        roL = jnp.concatenate(
            [jnp.zeros((1,) + ro.shape[1:], r.dtype), ro[:-1]])
        r = (re - jnp.einsum('nij,nj...->ni...', G_left, roL)
             - jnp.einsum('nij,nj...->ni...', G_right, ro))

    # Dense root solve: [6m,6m] @ [6m,K...] — one MXU contraction.
    if root_inv.ndim == 3:                      # m == 1 legacy shape
        x = jnp.einsum('nij,nj...->ni...', root_inv, r)
    else:
        m6 = root_inv.shape[0]
        m = m6 // 6
        r_flat = r.reshape((m6,) + r.shape[2:])
        x = jnp.tensordot(root_inv, r_flat, axes=([1], [0]))
        x = x.reshape((m, 6) + r.shape[2:])

    for (Bo_inv, Ao, Co, _, _), ro in zip(reversed(levels), reversed(ros)):
        # x holds the even positions; recover the odds:
        # x_odd[k] = Bo_inv[k] (ro[k] - Ao[k] x_even[k] - Co[k] x_even[k+1])
        x_even_next = jnp.concatenate(
            [x[1:], jnp.zeros((1,) + x.shape[1:], x.dtype)])
        rhs = (ro - jnp.einsum('nij,nj...->ni...', Ao, x)
               - jnp.einsum('nij,nj...->ni...', Co, x_even_next))
        x_odd = jnp.einsum('nij,nj...->ni...', Bo_inv, rhs)
        m2 = x.shape[0] + x_odd.shape[0]
        out = jnp.zeros((m2,) + x.shape[1:], x.dtype)
        out = out.at[0::2].set(x).at[1::2].set(x_odd)
        x = out
    return x[:n0]


def _tridiag_solve(B, A, r):
    """Solve the SPD block-tridiagonal system T x = r by cyclic reduction
    (factor + apply in one call)."""
    return _tridiag_apply(_tridiag_factor(B, A), r)


# ---------------------------------------------------------------------------
# Woodbury preconditioner: exact chain + exact low-rank off-chain part
# ---------------------------------------------------------------------------
#
# The tridiagonal preconditioner is exact on the chain but knows nothing of
# loop closures, so PCG still needs O(#closures) iterations.  Writing
# H = T0 + U U^T — T0 the chain+prior+damping part, U the 6-column whitened
# Jacobian blocks of the (few) off-chain factors — the Woodbury identity
#   H^-1 = T0^-1 - T0^-1 U (I + U^T T0^-1 U)^-1 U^T T0^-1
# gives a NEAR-EXACT H^-1 from one cyclic-reduction factorization, one
# batched chain solve for the U columns, and one small dense Cholesky of
# the [6L,6L] capacitance.  PCG then only cleans up f32 round-off and the
# cyclic-reduction diagonal boost: a handful of iterations at any graph
# size (replaces iSAM2's incremental Bayes-tree update,
# incremental_estimator.cpp:151-163, with O(log N) depth batched algebra).

def _offchain_mask(lin: _LinearizedGraph):
    """Active factors that do NOT land on the block-tridiagonal chain."""
    touches_free = ((lin.free[lin.keys[:, 0]] > 0) |
                    (lin.free[lin.keys[:, 1]] > 0))
    return (lin.w_rel > 0) & ~_chain_mask(lin) & touches_free


def _first_true_indices(flags, L: int):
    """Indices [L] of the first L True entries of ``flags`` (in index
    order) plus a validity mask for slots beyond the True count.

    cumsum + scatter instead of ``argsort(~flags)[:L]``: a full sort on
    a 16k factor buffer is a multi-ms bitonic network on TPU, while this
    is one prefix sum and one scatter (the same trick as
    cloud._pack_scatter)."""
    F = flags.shape[0]
    pos = jnp.cumsum(flags) - 1                  # rank among True entries
    dest = jnp.where(flags & (pos < L), pos, L)
    sel = jnp.full((L,), F, jnp.int32)
    sel = sel.at[dest].set(jnp.arange(F, dtype=jnp.int32), mode='drop')
    # Invalid slots keep the OUT-OF-BOUNDS sentinel F: gathers through
    # them clamp (and are gated by ``valid``); scatters through them must
    # use mode='drop' — a clamped in-bounds padding index could collide
    # with a real selected factor and clobber its write.
    return sel, sel < F


def _select_offchain(lin: _LinearizedGraph, capacity: int):
    """Indices [L] of up to ``capacity`` active off-chain factors, plus a
    validity mask (False slots are padding)."""
    F = lin.keys.shape[0]
    L = min(capacity, F)
    return _first_true_indices(_offchain_mask(lin), L)


def _offchain_blocks(lin: _LinearizedGraph, sel, valid):
    """Per-selected-factor U blocks: Ua/Ub [L,6(state),6(col)] with weight
    and free-gating folded in, plus their pose keys."""
    sw = jnp.sqrt(lin.w_rel[sel] * valid)[:, None, None]
    ka = lin.keys[sel, 0]
    kb = lin.keys[sel, 1]
    Ua = jnp.swapaxes(lin.Ja[sel], -1, -2) * sw * lin.free[ka][:, None, None]
    Ub = jnp.swapaxes(lin.Jb[sel], -1, -2) * sw * lin.free[kb][:, None, None]
    return Ua, Ub, ka, kb


class WoodburyCache(NamedTuple):
    """Persisted Woodbury preconditioner state — the iSAM2-reuse analogue.

    GTSAM's iSAM2 keeps a factorized Bayes tree across ``update()`` calls
    and only re-eliminates the affected cliques
    (incremental_estimator.cpp:151-163).  The TPU equivalent: keep the
    cyclic-reduction chain factorization T0 and the dense Cholesky of the
    low-rank capacitance across solves; absorbing ONE new loop-closure
    factor is a rank-6 *extension* of the capacitance factor
    (:func:`extend_cache`) — no O(N) rebuild.

    All fields are fixed-shape arrays (identity padding rows in
    ``chol_inv`` for unused slots), so the cache round-trips through jit
    unchanged.

    ``chol_inv`` holds the INVERSE of the capacitance's lower Cholesky
    factor, not the factor itself: on TPU a triangular solve is a
    sequential-depth LAPACK-style loop (~ms at K=384) while applying the
    prebuilt inverse is one MXU matmul — both the per-solve capacitance
    apply (L^-T L^-1 c) and the rank-6 extension become pure matmuls,
    and the one [K,K] triangular solve left is paid at BUILD time only.
    """
    factors: tuple       # (levels, root_inv) cyclic-reduction factors of T0
    Ua: jax.Array        # [L,6,6] column-scaled off-chain blocks (key_a)
    Ub: jax.Array        # [L,6,6] (key_b)
    ka: jax.Array        # [L] int32 pose keys
    kb: jax.Array        # [L]
    chol_inv: jax.Array  # [K,K] INVERSE lower Cholesky of the capacitance
    n_used: jax.Array    # int32: occupied slots (append cursor)
    # Stale-but-exact Hessian at the build point, for the relinearize-
    # skip delta solve (solve_closure_cached): UNBOOSTED chain blocks
    # (T_B diagonal, T_A sub-diagonal — T0 excluding the selected
    # off-chain factors, including damping + frozen identity rows) and
    # the squared column norms cn2 [L,6] that unscale Utilde back to
    # U U^T (H = T + Utilde diag(cn2) Utilde^T exactly, at build poses).
    T_B: jax.Array       # [N,6,6]
    T_A: jax.Array       # [N,6,6]
    cn2: jax.Array       # [L,6]


def _build_woodbury_cache(lin: _LinearizedGraph, damping,
                          config) -> WoodburyCache:
    sel, valid = _select_offchain(lin, config.offchain_capacity)
    # T0 excludes the SELECTED off-chain factors entirely (their diagonal
    # contribution rides in U U^T); unselected off-chain overflow keeps
    # its diagonal in T0 — graceful degradation to 'tridiagonal'.
    w_scale = jnp.ones_like(lin.w_rel).at[sel].set(
        jnp.where(valid, 0.0, 1.0), mode='drop')
    # Unboosted chain blocks first (the stale-exact H for the delta
    # solve), then the boosted copy for the cyclic-reduction factors.
    T_B, T_A = _build_tridiag(lin, damping, w_scale=w_scale, boost=False)
    factors = _tridiag_factor(*_build_tridiag(lin, damping,
                                              w_scale=w_scale))
    Ua, Ub, ka, kb = _offchain_blocks(lin, sel, valid)
    L = Ua.shape[0]
    n = lin.free.shape[0]
    K = 6 * L
    # Column scaling keeps the capacitance in f32 range: loop-closure
    # Jacobians carry O(|t|) lever arms (adjoint [t]x terms, ~1e4 after
    # whitening on a 100 m closure) and the chain covariance T0^-1
    # amplifies them — the unscaled U^T T0^-1 U overflows f32 precision.
    # With Utilde = U diag(s), s = 1/||col||:
    #   H = T0 + Utilde diag(1/s^2) Utilde^T
    #   H^-1 = T0^-1 - T0^-1 Utilde Ctilde^-1 Utilde^T T0^-1,
    #   Ctilde = diag(s^2) + Utilde^T T0^-1 Utilde.
    cn = jnp.sqrt(jnp.sum(Ua * Ua, axis=1) + jnp.sum(Ub * Ub, axis=1))
    s = jnp.where(cn > 1e-20, 1.0 / jnp.maximum(cn, 1e-20), 0.0)  # [L,6]
    Ua = Ua * s[:, None, :]
    Ub = Ub * s[:, None, :]
    diag_c = jnp.where(cn > 1e-20, s * s, 1.0).reshape(K)
    lidx = jnp.arange(L)
    U = jnp.zeros((n, 6, L, 6), Ua.dtype)
    U = U.at[ka, :, lidx, :].add(Ua).at[kb, :, lidx, :].add(Ub)
    V = _tridiag_apply(factors, U.reshape(n, 6, K))      # T0^-1 Utilde
    Vl = V.reshape(n, 6, L, 6)
    # Capacitance, assembled from Utilde's sparse rows.
    C = (jnp.einsum('lsc,lsmd->lcmd', Ua, Vl[ka]) +
         jnp.einsum('lsc,lsmd->lcmd', Ub, Vl[kb])).reshape(K, K)
    C = C + jnp.diag(diag_c)
    # Multiplicative diagonal jitter: rows span many orders of magnitude
    # (diag_c = s^2 ~ 1/||col||^2 vs the T0^-1 quadratic form), so an
    # absolute shift would drown the small rows and gut the low-rank
    # correction; scaling each diagonal entry by (1 + 1e-5) only nudges
    # the factorization toward SPD.
    C = C + jnp.diag(1e-5 * jnp.abs(jnp.diagonal(C)))
    # Inverse lower factor as a PLAIN matrix so extend_cache can append
    # block rows in place (see WoodburyCache docstring for why the
    # inverse).  Padding slots (valid=False) have zero U blocks and
    # diag_c=1 → identity rows, so the factor is well-defined at any
    # fill level.  The [K,K] triangular solve here is the only one in
    # the whole cached path and is paid once per build.
    chol = jnp.linalg.cholesky(C)
    chol_inv = jax.scipy.linalg.solve_triangular(
        chol, jnp.eye(K, dtype=C.dtype), lower=True)
    n_used = jnp.sum(valid.astype(jnp.int32))
    cn2 = jnp.where(cn > 1e-20, cn * cn, 0.0)
    return WoodburyCache(factors=factors, Ua=Ua, Ub=Ub, ka=ka, kb=kb,
                         chol_inv=chol_inv, n_used=n_used,
                         T_B=T_B, T_A=T_A, cn2=cn2)


def _apply_from_cache(cache: WoodburyCache):
    """apply_M(r) ~= H^-1 r from a (possibly extended) WoodburyCache."""
    L = cache.Ua.shape[0]
    K = 6 * L
    Ua, Ub, ka, kb = cache.Ua, cache.Ub, cache.ka, cache.kb

    def apply_M(r):
        t1 = _tridiag_apply(cache.factors, r)
        c = (jnp.einsum('lsc,ls->lc', Ua, t1[ka]) +
             jnp.einsum('lsc,ls->lc', Ub, t1[kb])).reshape(K)
        # C^-1 c = L^-T (L^-1 c) — two matmuls with the prebuilt inverse
        # factor (no sequential triangular solve on the hot path).
        y = (cache.chol_inv.T @ (cache.chol_inv @ c)).reshape(L, 6)
        z = jnp.zeros_like(r)
        z = z.at[ka].add(jnp.einsum('lsc,lc->ls', Ua, y))
        z = z.at[kb].add(jnp.einsum('lsc,lc->ls', Ub, y))
        out = t1 - _tridiag_apply(cache.factors, z)
        # NaN guard (SURVEY §5 failure handling): a failed capacitance
        # factorization must degrade to the chain preconditioner, never
        # poison the trajectory.
        return jnp.where(jnp.isfinite(out), out, t1)

    return apply_M


def _make_preconditioner(lin: _LinearizedGraph, damping, config):
    """Build ``apply_M(r) ~= H^-1 r`` once; reused across every PCG
    iteration AND every GN step of a solve (near the optimum the
    linearization barely moves, and a preconditioner only shapes the
    convergence path, never the fixed point)."""
    kind = config.preconditioner
    if kind == 'jacobi':
        Minv = _block_jacobi(lin, damping)
        return lambda r: jnp.einsum('nij,nj->ni', Minv, r)

    if kind == 'tridiagonal':
        factors = _tridiag_factor(*_build_tridiag(lin, damping))
        return lambda r: _tridiag_apply(factors, r)

    if kind != 'woodbury':
        raise ValueError(f'unknown preconditioner {kind!r}')

    return _apply_from_cache(_build_woodbury_cache(lin, damping, config))


# ---------------------------------------------------------------------------
# Dense direct method (small pose tables / window subproblems)
# ---------------------------------------------------------------------------

def _dense_factor(lin: _LinearizedGraph, damping):
    """Dense [6N,6N] normal equations, Cholesky-factored.  Semantics
    identical to ``_hessian_matvec`` (free gating, identity rows for
    frozen poses, damping); latency-optimal for the compact window
    subproblem the online path solves per scan (one factorization
    instead of a PCG iteration chain)."""
    n = lin.free.shape[0]
    w = lin.w_rel[:, None, None]
    k0, k1 = lin.keys[:, 0], lin.keys[:, 1]
    Ha = jnp.einsum('fji,fjk->fik', lin.Ja, lin.Ja * w)
    Hb = jnp.einsum('fji,fjk->fik', lin.Jb, lin.Jb * w)
    Hab = jnp.einsum('fji,fjk->fik', lin.Ja, lin.Jb * w)
    H4 = jnp.zeros((n, n, 6, 6), Ha.dtype)
    H4 = H4.at[k0, k0].add(Ha).at[k1, k1].add(Hb)
    H4 = H4.at[k0, k1].add(Hab).at[k1, k0].add(jnp.swapaxes(Hab, -1, -2))
    Hp = jnp.einsum('pji,pjk->pik', lin.Jp,
                    lin.Jp * lin.w_prior[:, None, None])
    H4 = H4.at[lin.prior_keys, lin.prior_keys].add(Hp)
    f = lin.free
    H4 = H4 * f[:, None, None, None] * f[None, :, None, None]
    H = H4.transpose(0, 2, 1, 3).reshape(6 * n, 6 * n)
    H = H + jnp.diag(jnp.repeat(damping + (1.0 - f), 6))
    return jax.scipy.linalg.cho_factor(H)


def _dense_apply(chol, b):
    n6 = b.shape[0] * b.shape[1]
    return jax.scipy.linalg.cho_solve(chol, b.reshape(n6)).reshape(b.shape)


def _pcg(lin: _LinearizedGraph, b, damping, iterations, tol, apply_M,
         matvec=None, x0=None):
    """Preconditioned CG for H x = b over [N,6] states, with a prebuilt
    preconditioner closure (see :func:`_make_preconditioner`) and an
    optional prebuilt matvec (see :func:`_make_matvec`; defaults to the
    general scatter form).

    ``x0``: optional warm start.  The direct-Woodbury fast path passes
    ``x0 = apply_M(b)`` — with the near-exact Woodbury H^-1 that start
    already satisfies the tolerance and the loop exits after 0-1
    iterations (one matvec to confirm), turning PCG into a direct solve
    with built-in fallback: a degraded preconditioner (stale cache,
    off-chain overflow) just means the loop runs its usual iterations.
    """
    if matvec is None:
        matvec = lambda v: _hessian_matvec(lin, v, damping)  # noqa: E731

    def dot(u, v):
        return jnp.sum(u * v)

    if x0 is None:
        x0 = jnp.zeros_like(b)
        r0 = b  # since x0 = 0
    else:
        r0 = b - matvec(x0)
    z0 = apply_M(r0)
    p0 = z0
    rz0 = dot(r0, z0)
    b_norm = jnp.sqrt(dot(b, b)) + 1e-30

    def cond(state):
        _, r, _, _, it = state
        return (it < iterations) & (jnp.sqrt(dot(r, r)) > tol * b_norm)

    def body(state):
        x, r, p, rz, it = state
        Hp = matvec(p)
        alpha = rz / jnp.maximum(dot(p, Hp), 1e-30)
        x = x + alpha * p
        r = r - alpha * Hp
        z = apply_M(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return (x, r, p, rz_new, it + 1)

    x, _, _, _, it = jax.lax.while_loop(cond, body,
                                        (x0, r0, p0, rz0, jnp.int32(0)))
    return x, it


# ---------------------------------------------------------------------------
# Gauss-Newton driver
# ---------------------------------------------------------------------------

class SolveResult(NamedTuple):
    poses: jax.Array        # [N,7] optimized
    error_initial: jax.Array
    error_final: jax.Array
    pcg_iterations: jax.Array


def graph_error(graph: FactorGraphData, poses) -> jax.Array:
    """Total weighted squared error (0.5 * sum r^T W r), for diagnostics."""
    T_a = poses[graph.rel_keys[:, 0]]
    T_b = poses[graph.rel_keys[:, 1]]
    r, _, _ = _rel_linearize_analytic(T_a, T_b, graph.rel_meas)
    r_w = r * graph.rel_sqrt_info
    sq = jnp.sum(r_w * r_w, axis=-1)
    # Cauchy loss for robust factors.
    rob = jnp.log1p(sq)
    e_rel = jnp.sum(graph.rel_weight * jnp.where(graph.rel_robust, rob, sq))
    rp, _ = _prior_linearize_analytic(poses[graph.prior_keys],
                                      graph.prior_meas)
    rp_w = rp * jnp.minimum(graph.prior_sqrt_info, GAUGE_FIX_THRESHOLD)
    e_pri = jnp.sum(graph.prior_weight * jnp.sum(rp_w * rp_w, axis=-1))
    return 0.5 * (e_rel + e_pri)


@partial(jax.jit, static_argnames=('config',))
def solve(graph: FactorGraphData, poses, pose_mask,
          config: SolverConfig) -> SolveResult:
    """Run ``config.gn_iterations`` Gauss-Newton steps from ``poses``.

    Warm-started from the caller's current estimate: the incremental
    deployment calls this once per scan, mirroring
    ``IncrementalEstimator::estimate`` (incremental_estimator.cpp:151-163).
    """
    damping = jnp.float32(config.damping)

    # Gauge-fixing priors pin their pose AT the prior measurement (the
    # reference's sigma=1e-7 prior pulls the value there through the
    # optimizer; we snap directly).  Without this, force_priors placement
    # (laser_track.cpp:166-170) would never move a pose initialized
    # elsewhere.
    gauge = (jnp.any(graph.prior_sqrt_info > GAUGE_FIX_THRESHOLD, axis=-1)
             & (graph.prior_weight > 0))
    # Non-gauge slots write out of bounds (dropped): padding prior slots
    # share key 0 and a plain duplicate-index scatter could clobber the
    # snap with the stale pose (scatter order is unspecified).
    snap_idx = jnp.where(gauge, graph.prior_keys, poses.shape[0])
    poses = poses.at[snap_idx].set(graph.prior_meas, mode='drop')

    e0 = (graph_error(graph, poses) if config.compute_errors
          else jnp.float32(-1.0))
    gn_tol = config.gn_tolerance
    # gn_tolerance compares against the RMS step per ACTIVE pose, not the
    # global norm: a 10k-pose graph sums 10k tiny deltas into a large
    # norm, which would defeat the early-out exactly where it pays most.
    n_active = jnp.maximum(jnp.sum(pose_mask.astype(jnp.float32)), 1.0)

    def _step_rms(delta):
        return jnp.linalg.norm(delta) / jnp.sqrt(n_active)

    if config.method == 'dense':
        # Dense mode re-factors the [6N,6N] normal equations each GN
        # iteration (exact Newton direction — robust to cold starts with
        # large rotations); warm-started incremental solves skip all but
        # the first iteration via gn_tolerance, so the per-scan cost is
        # ONE linearize + factor + backsolve.
        def one_step(poses):
            lin = _linearize(graph, poses, pose_mask, config.cauchy_k)
            b = -_gradient(lin)
            chol = _dense_factor(lin, damping)
            delta = jnp.nan_to_num(_dense_apply(chol, b)) * lin.free[:, None]
            new_poses = se3.normalize(se3.compose(poses, se3.exp(delta)))
            new_poses = jnp.where(pose_mask[:, None], new_poses, poses)
            return new_poses, jnp.int32(1), _step_rms(delta)
    else:
        # The preconditioner is built ONCE from the initial linearization
        # and reused across all GN steps: warm-started solves barely move
        # the Jacobians, and preconditioner staleness only costs PCG
        # iterations (tolerance-gated), never accuracy.
        lin0 = _linearize(graph, poses, pose_mask, config.cauchy_k)
        apply_M = _make_preconditioner(lin0, damping, config)

        def one_step(poses):
            lin = _linearize(graph, poses, pose_mask, config.cauchy_k)
            b = -_gradient(lin)
            mv = _make_matvec(lin, damping, config)
            x0 = apply_M(b) if config.pcg_init == 'precond' else None
            delta, pcg_it = _pcg(lin, b, damping, config.pcg_iterations,
                                 config.pcg_tolerance, apply_M, matvec=mv,
                                 x0=x0)
            delta = jnp.nan_to_num(delta) * lin.free[:, None]
            new_poses = se3.normalize(se3.compose(poses, se3.exp(delta)))
            new_poses = jnp.where(pose_mask[:, None], new_poses, poses)
            return new_poses, pcg_it, _step_rms(delta)

    def gn_step(carry, _):
        poses, total, last_delta = carry
        # GN early-out: once an iteration's step norm drops below
        # gn_tolerance, later iterations are skipped entirely (lax.cond
        # executes one branch) — the warm-started incremental solve pays
        # for ONE linearize+solve instead of gn_iterations of them.
        def run(poses):
            return one_step(poses)

        def skip(poses):
            return poses, jnp.int32(0), last_delta

        poses, it, dnorm = jax.lax.cond(last_delta >= gn_tol, run, skip,
                                        poses)
        return (poses, total + it, dnorm), None

    (poses_out, pcg_total, _), _ = jax.lax.scan(
        gn_step, (poses, jnp.int32(0), jnp.float32(jnp.inf)), None,
        length=config.gn_iterations)
    e1 = (graph_error(graph, poses_out) if config.compute_errors
          else jnp.float32(-1.0))
    return SolveResult(poses=poses_out, error_initial=e0, error_final=e1,
                       pcg_iterations=pcg_total)


# ---------------------------------------------------------------------------
# Cached / truly-incremental solving (the iSAM2-reuse seam)
# ---------------------------------------------------------------------------

def _chol6_matrix(A):
    """Unrolled 6x6 Cholesky returning a dense lower-triangular matrix."""
    L = _cholesky6(A)
    rows = []
    for i in range(6):
        cols = [L[i][j] if j <= i else jnp.zeros_like(A[..., 0, 0])
                for j in range(6)]
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def _lower6_inverse(Lm):
    """Inverse of a dense lower-triangular [6,6] matrix, unrolled
    forward substitution (elementwise — no LAPACK loop)."""
    inv = [[None] * 6 for _ in range(6)]
    for i in range(6):
        inv[i][i] = 1.0 / Lm[..., i, i]
        for j in range(i):
            s = 0.0
            for k in range(j, i):
                s = s + Lm[..., i, k] * inv[k][j]
            inv[i][j] = -s / Lm[..., i, i]
    rows = []
    for i in range(6):
        cols = [inv[i][j] if j <= i else jnp.zeros_like(Lm[..., 0, 0])
                for j in range(6)]
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


@partial(jax.jit, static_argnames=('config',))
def build_cache(graph: FactorGraphData, poses, pose_mask,
                config: SolverConfig) -> WoodburyCache:
    """Factor the Woodbury preconditioner once, for reuse across solves.

    The cache is valid as long as the graph's CHAIN part (consecutive-key
    factors and priors) is unchanged; new off-chain factors are absorbed
    with :func:`extend_cache`.  Staleness (pose drift, appended chain
    factors) only costs PCG iterations, never accuracy — the
    preconditioner shapes convergence, PCG's matvec uses the fresh
    linearization.
    """
    lin = _linearize(graph, poses, pose_mask, config.cauchy_k)
    return _build_woodbury_cache(lin, jnp.float32(config.damping), config)


def _linearize_one_rel(graph: FactorGraphData, poses, pose_mask,
                       factor_idx, config: SolverConfig):
    """Whitened, weighted, free-gated linearization of ONE relative
    factor (shared by extend_cache and solve_closure_cached).  Returns
    (r_w, Ja_w, Jb_w, w, ka, kb, free)."""
    n = poses.shape[0]
    ka_n = graph.rel_keys[factor_idx, 0]
    kb_n = graph.rel_keys[factor_idx, 1]
    r, Ja, Jb = _rel_linearize_analytic(poses[ka_n][None], poses[kb_n][None],
                                        graph.rel_meas[factor_idx][None])
    s_info = graph.rel_sqrt_info[factor_idx]
    r_w = r[0] * s_info
    Ja_w = Ja[0] * s_info[:, None]
    Jb_w = Jb[0] * s_info[:, None]
    w = graph.rel_weight[factor_idx] * _cauchy_weight(
        r_w, graph.rel_robust[factor_idx], config.cauchy_k)
    Ja_w = jnp.where(graph.rel_fixed_a[factor_idx], 0.0, Ja_w)

    gauge = jnp.any(graph.prior_sqrt_info > GAUGE_FIX_THRESHOLD, axis=-1)
    frozen = jnp.zeros((n,), bool).at[graph.prior_keys].max(
        gauge & (graph.prior_weight > 0))
    free = (pose_mask & ~frozen).astype(poses.dtype)
    return r_w, Ja_w, Jb_w, w, ka_n, kb_n, free


@partial(jax.jit, static_argnames=('config',))
def extend_cache(graph: FactorGraphData, poses, pose_mask,
                 cache: WoodburyCache, factor_idx,
                 config: SolverConfig) -> WoodburyCache:
    """Absorb ONE new off-chain (loop-closure) factor into the cache.

    The rank-6 analogue of iSAM2 re-eliminating only the cliques a new
    factor touches (incremental_estimator.cpp:151-163): with the
    capacitance C = L L^T already factored and a new scaled column block
    u, the extended factor is

        [[C, B], [B^T, D]]  ->  L_new = [[L, 0], [X^T, Ls]],
        B = U_old^T T0^-1 u,  X = L^-1 B,  Ls = chol(D - X^T X),

    and since the cache stores L^-1 (see WoodburyCache), the appended
    inverse row block is  [-Ls^-1 X^T L^-1, Ls^-1]  — one chain solve
    with 6 right-hand sides plus two [K,.] matmuls, no triangular solve
    at all.  O(N log N / K^2) work instead of the full O(N K) rebuild.
    Slots are appended in order; when the off-chain capacity is full the
    cache is returned unchanged (the factor then simply isn't
    preconditioned — PCG still converges, just slower).
    """
    n = poses.shape[0]
    L_cap = cache.Ua.shape[0]
    K = 6 * L_cap

    (r_w, Ja_w, Jb_w, w, ka_n, kb_n, free) = _linearize_one_rel(
        graph, poses, pose_mask, factor_idx, config)
    sw = jnp.sqrt(w)
    Ua_n = Ja_w.T * sw * free[ka_n]              # [6(state),6(col)]
    Ub_n = Jb_w.T * sw * free[kb_n]

    # --- Column scaling, mirroring _build_woodbury_cache exactly.
    cn = jnp.sqrt(jnp.sum(Ua_n * Ua_n, axis=0) + jnp.sum(Ub_n * Ub_n, axis=0))
    s = jnp.where(cn > 1e-20, 1.0 / jnp.maximum(cn, 1e-20), 0.0)   # [6]
    Ua_n = Ua_n * s[None, :]
    Ub_n = Ub_n * s[None, :]
    diag_c = jnp.where(cn > 1e-20, s * s, 1.0)

    # --- v = T0^-1 u  (one chain solve, 6 RHS).
    u = jnp.zeros((n, 6, 6), poses.dtype)
    u = u.at[ka_n].add(Ua_n).at[kb_n].add(Ub_n)
    v = _tridiag_apply(cache.factors, u)                          # [n,6,6]

    # --- Coupling to existing columns and the new diagonal block.
    B = (jnp.einsum('lsc,lsd->lcd', cache.Ua, v[cache.ka]) +
         jnp.einsum('lsc,lsd->lcd', cache.Ub, v[cache.kb])).reshape(K, 6)
    D = (jnp.einsum('sc,sd->cd', Ua_n, v[ka_n]) +
         jnp.einsum('sc,sd->cd', Ub_n, v[kb_n]) + jnp.diag(diag_c))
    D = D + jnp.diag(1e-5 * jnp.abs(jnp.diagonal(D)))

    # --- Block-Cholesky-inverse extension at the append cursor.  Rows of
    # B at padding slots are zero (their U blocks are zero), so X
    # inherits zeros there and the row write below stays consistent with
    # the identity padding.
    X = cache.chol_inv @ B                                        # [K,6]
    S = D - X.T @ X
    Ls_inv = _lower6_inverse(_chol6_matrix(S))

    # Capacity overflow: re-write the occupied slot's OWN values — the
    # cache is then unchanged (the factor simply isn't preconditioned;
    # PCG still converges, just slower).
    full = cache.n_used >= L_cap
    slot = jnp.minimum(cache.n_used, L_cap - 1)
    Ua_n = jnp.where(full, cache.Ua[slot], Ua_n)
    Ub_n = jnp.where(full, cache.Ub[slot], Ub_n)
    # Appended row of L_new^-1: [-Ls^-1 X^T L^-1 | Ls^-1 at the slot].
    # Columns past the slot are zero already (X is zero at padding rows,
    # and L^-1's padding columns are canonical basis vectors).
    row = -Ls_inv @ (X.T @ cache.chol_inv)                        # [6,K]
    row = jax.lax.dynamic_update_slice(row, Ls_inv, (0, 6 * slot))
    old_row = jax.lax.dynamic_slice(cache.chol_inv, (6 * slot, 0), (6, K))
    row = jnp.where(full, old_row, row)
    ka_w = jnp.where(full, cache.ka[slot], ka_n.astype(cache.ka.dtype))
    kb_w = jnp.where(full, cache.kb[slot], kb_n.astype(cache.kb.dtype))
    cn2_n = jnp.where(full, cache.cn2[slot],
                      jnp.where(cn > 1e-20, cn * cn, 0.0))
    return WoodburyCache(
        factors=cache.factors,
        Ua=jax.lax.dynamic_update_slice(cache.Ua, Ua_n[None], (slot, 0, 0)),
        Ub=jax.lax.dynamic_update_slice(cache.Ub, Ub_n[None], (slot, 0, 0)),
        ka=cache.ka.at[slot].set(ka_w),
        kb=cache.kb.at[slot].set(kb_w),
        chol_inv=jax.lax.dynamic_update_slice(cache.chol_inv, row,
                                              (6 * slot, 0)),
        n_used=jnp.where(full, cache.n_used, cache.n_used + 1),
        T_B=cache.T_B, T_A=cache.T_A,
        cn2=jax.lax.dynamic_update_slice(cache.cn2, cn2_n[None], (slot, 0)),
    )


def _stale_matvec(cache: WoodburyCache):
    """y = H_build x from the cache alone: the exact Hessian AT THE
    CACHE'S BUILD POINT — unboosted chain blocks plus the unscaled
    low-rank part (H = T + Utilde diag(cn2) Utilde^T).  No graph access,
    no linearization: three batched [N,6,6] contractions + the compact
    off-chain term."""
    B, A = cache.T_B, cache.T_A
    zero = jnp.zeros((1, 6, 6), B.dtype)
    A_up = jnp.concatenate([jnp.swapaxes(A[1:], -1, -2), zero])
    Ua, Ub, ka, kb, cn2 = cache.Ua, cache.Ub, cache.ka, cache.kb, cache.cn2

    def mv(x):
        zrow = jnp.zeros((1, 6), x.dtype)
        x_prev = jnp.concatenate([zrow, x[:-1]])
        x_next = jnp.concatenate([x[1:], zrow])
        y = (jnp.einsum('nij,nj->ni', B, x)
             + jnp.einsum('nij,nj->ni', A, x_prev)
             + jnp.einsum('nij,nj->ni', A_up, x_next))
        t = (jnp.einsum('lsc,ls->lc', Ua, x[ka]) +
             jnp.einsum('lsc,ls->lc', Ub, x[kb])) * cn2
        y = y.at[ka].add(jnp.einsum('lsc,lc->ls', Ua, t))
        y = y.at[kb].add(jnp.einsum('lsc,lc->ls', Ub, t))
        return y

    return mv


@partial(jax.jit, static_argnames=('config',))
def solve_closure_cached(graph: FactorGraphData, poses, pose_mask,
                         cache: WoodburyCache, factor_idx,
                         config: SolverConfig):
    """Relinearize-skip incremental solve for ONE new loop closure — the
    closest TPU analogue of what iSAM2's update() actually does with
    relinearizeThreshold=0.001 (incremental_estimator.cpp:17-20): away
    from the touched cliques nothing is relinearized; the update is a
    backsolve against the existing factorization.

    Mirrors iSAM2's split between residuals and factorization: the
    RESIDUALS (gradient) are always fresh, but the quadratic model is
    the reused factorization.  Instead of the matvec build + PCG vector
    chain of :func:`solve_cached`, this:

      1. absorbs the factor into the cache (rank-6 extension),
      2. linearizes residuals and builds the FULL fresh gradient (one
         batched analytic pass, ~0.25 ms device at a 16k buffer — the
         cheap part; it also absorbs any gradient accumulated by
         earlier single-step closures),
      3. solves H delta = -g with the extended Woodbury apply plus
         ``config.delta_refine`` Richardson refinements against the
         cache's STALE-EXACT Hessian (:func:`_stale_matvec` — exact at
         the cache build point), each refinement contracting the
         residual by ~the preconditioner's f32 conditioning floor
         (~0.16 measured at 10k poses),
      4. retracts delta — and repeats 2-4 for up to
         ``config.gn_iterations`` outer steps with the usual
         ``gn_tolerance`` early-out (large closures need the fresh
         re-linearization of the residuals; the Hessian model stays
         cached throughout).

    Cost per outer step: one linearize/gradient pass +
    (1 + delta_refine) preconditioner applies + 2*delta_refine+1 stale
    matvecs — no chain build, no PCG dot-product chain; plus the one-
    time rank-6 extension and two gradient-norm acceptance passes.

    CONTRACT (round-5, measured): this is an EXPERIMENTAL fast path.
    It is numerically sound only when (a) the cache's chain
    factorization covers the current pose set (poses appended since
    build ride identity rows — the stale step model oversteps them by
    ~1/sigma^2) and (b) whitened closure lever arms stay within f32
    range (cn2 ~ lever^2/sigma^2 amplifies rounding noise; measured
    divergence at a 7.5 km lever, experiments/delta_divergence_probe.py).
    Outside that envelope the refinement guard and the final
    gradient-norm acceptance below degrade it to one-shot
    preconditioner quality or a NO-OP (input poses returned) — never a
    diverged trajectory (experiments/pr_delta_repro.py).  The safe
    general-purpose incremental path is :func:`solve_cached`
    (``closure_solve='full'``).  Returns (new_cache, SolveResult).
    """
    cache = extend_cache(graph, poses, pose_mask, cache, factor_idx,
                         config)
    apply_M = _apply_from_cache(cache)
    mv = _stale_matvec(cache)
    gn_tol = config.gn_tolerance
    n_active = jnp.maximum(jnp.sum(pose_mask.astype(jnp.float32)), 1.0)

    def grad_norm(poses):
        lin = _linearize(graph, poses, pose_mask, config.cauchy_k)
        return jnp.linalg.norm(_gradient(lin))

    def one_step(poses):
        lin = _linearize(graph, poses, pose_mask, config.cauchy_k)
        b = -_gradient(lin)
        # Guarded (residual-monotone) Richardson refinement: keep a
        # refined delta only while the stale-Hessian residual SHRINKS.
        # Unguarded refinement diverges once f32 noise in the low-rank
        # term (amplified by cn2 ~ whitened-lever^2) pushes
        # rho(I - M H_stale) past 1 — measured amplification ~700x/step
        # at a 7.5 km lever (experiments/delta_divergence_probe.py); the
        # guard bounds the result at one-shot preconditioner quality.
        delta = apply_M(b)
        r = b - mv(delta)
        rn = jnp.linalg.norm(r)
        for _ in range(max(int(config.delta_refine), 0)):
            cand = delta + apply_M(r)
            r_c = b - mv(cand)
            rn_c = jnp.linalg.norm(r_c)
            better = jnp.isfinite(rn_c) & (rn_c < rn)
            delta = jnp.where(better, cand, delta)
            r = jnp.where(better, r_c, r)
            rn = jnp.where(better, rn_c, rn)
        delta = jnp.nan_to_num(delta) * lin.free[:, None]
        new_poses = se3.normalize(se3.compose(poses, se3.exp(delta)))
        new_poses = jnp.where(pose_mask[:, None], new_poses, poses)
        return new_poses, jnp.linalg.norm(delta) / jnp.sqrt(n_active)

    def gn_step(carry, _):
        poses, total, last_delta = carry

        def run(poses):
            p, dn = one_step(poses)
            return p, jnp.int32(config.delta_refine), dn

        def skip(poses):
            return poses, jnp.int32(0), last_delta

        poses, it, dnorm = jax.lax.cond(last_delta >= gn_tol, run, skip,
                                        poses)
        return (poses, total + it, dnorm), None

    (new_poses, total, _), _ = jax.lax.scan(
        gn_step, (poses, jnp.int32(0), jnp.float32(jnp.inf)), None,
        length=max(config.gn_iterations, 1))
    # Step acceptance (the safety valve that makes 'delta' never WORSE
    # than a no-op): the cached step model is structurally wrong for
    # poses appended after the cache build (identity rows vs true
    # chain weights — a ~1/sigma^2 overstep), which diverged whole
    # trajectories in the online PR flow (experiments/pr_delta_repro.py:
    # mean err 1503 m vs 0.03 m).  Accept the result only if the fresh
    # gradient norm of the updated graph did not increase; otherwise
    # return the input poses unchanged (caller falls back to a full
    # solve or a later refine()).
    g0 = grad_norm(poses)
    g1 = grad_norm(new_poses)
    accept = jnp.isfinite(g1) & (g1 <= g0)
    new_poses = jnp.where(accept, new_poses, poses)
    e = (graph_error(graph, new_poses) if config.compute_errors
         else jnp.float32(-1.0))
    res = SolveResult(poses=new_poses, error_initial=jnp.float32(-1.0),
                      error_final=e, pcg_iterations=total)
    return cache, res


@partial(jax.jit, static_argnames=('config',))
def solve_cached(graph: FactorGraphData, poses, pose_mask,
                 cache: WoodburyCache,
                 config: SolverConfig) -> SolveResult:
    """Gauss-Newton with a PREBUILT preconditioner — the incremental
    fast path.  Identical fixed point to :func:`solve` (the matvec and
    gradient use the fresh linearization; only the preconditioner is
    cached), but skips the T0 factorization and capacitance build that
    dominate a cold solve.
    """
    damping = jnp.float32(config.damping)
    gauge = (jnp.any(graph.prior_sqrt_info > GAUGE_FIX_THRESHOLD, axis=-1)
             & (graph.prior_weight > 0))
    snap_idx = jnp.where(gauge, graph.prior_keys, poses.shape[0])
    poses = poses.at[snap_idx].set(graph.prior_meas, mode='drop')

    e0 = (graph_error(graph, poses) if config.compute_errors
          else jnp.float32(-1.0))
    gn_tol = config.gn_tolerance
    n_active = jnp.maximum(jnp.sum(pose_mask.astype(jnp.float32)), 1.0)
    apply_M = _apply_from_cache(cache)

    def one_step(poses):
        lin = _linearize(graph, poses, pose_mask, config.cauchy_k)
        b = -_gradient(lin)
        mv = _make_matvec(lin, damping, config)
        x0 = apply_M(b) if config.pcg_init == 'precond' else None
        delta, pcg_it = _pcg(lin, b, damping, config.pcg_iterations,
                             config.pcg_tolerance, apply_M, matvec=mv,
                             x0=x0)
        delta = jnp.nan_to_num(delta) * lin.free[:, None]
        new_poses = se3.normalize(se3.compose(poses, se3.exp(delta)))
        new_poses = jnp.where(pose_mask[:, None], new_poses, poses)
        return new_poses, pcg_it, jnp.linalg.norm(delta) / jnp.sqrt(n_active)

    def gn_step(carry, _):
        poses, total, last_delta = carry

        def run(poses):
            return one_step(poses)

        def skip(poses):
            return poses, jnp.int32(0), last_delta

        poses, it, dnorm = jax.lax.cond(last_delta >= gn_tol, run, skip,
                                        poses)
        return (poses, total + it, dnorm), None

    (poses_out, pcg_total, _), _ = jax.lax.scan(
        gn_step, (poses, jnp.int32(0), jnp.float32(jnp.inf)), None,
        length=config.gn_iterations)
    e1 = (graph_error(graph, poses_out) if config.compute_errors
          else jnp.float32(-1.0))
    return SolveResult(poses=poses_out, error_initial=e0, error_final=e1,
                       pcg_iterations=pcg_total)


@partial(jax.jit, static_argnames=('config',))
def marginal_covariance(graph: FactorGraphData, poses, pose_mask, keys,
                        config: SolverConfig) -> jax.Array:
    """Approximate per-key 6x6 marginal covariances.

    Replaces ``gtsam::Marginals::marginalCovariance``
    (laser_track.cpp:421-429) by solving H X = E_k with PCG for the 6
    canonical directions of each requested key (probe method).
    keys: [K] int32 -> returns [K,6,6].

    Uses the CONFIGURED preconditioner (tridiagonal/woodbury converge in
    a handful of iterations on chain-dominated graphs where block-Jacobi
    needs O(N)); all K*6 probe directions run as one vmapped batch, so
    every PCG iteration is a single batched matvec + preconditioner
    apply on the MXU rather than 6K sequential solves.

    ACCURACY ENVELOPE (round-5, measured against an f64 sparse ground
    truth): the f32 device probes are accurate for well-observed modes
    — window-local uncertainty, keys near the gauge anchor, directions
    tied down by closures — but SATURATE on weakly-observed modes: on
    a 10k-pose single-anchor chain the true end-of-chain lateral
    variance is ~4.2e3 m^2 (rot-drift x lever squared) while f32
    rounding inside the chain factorization floors the computation
    around 1e1 regardless of boost or iteration budget
    (experiments/cov_iteration_sweep.py findings).  For exact absolute
    marginals on weakly-anchored graphs use
    :func:`marginal_covariance_exact` (host sparse f64 — the same tool
    class as the reference's gtsam Marginals, laser_track.cpp:421-429).
    """
    lin = _linearize(graph, poses, pose_mask, config.cauchy_k)
    damping = jnp.float32(config.damping)
    apply_M = _make_preconditioner(lin, damping, config)
    # The chain-exact preconditioners converge in a few iterations; only
    # the local block-Jacobi needs the generous budget.
    iters = config.pcg_iterations * (
        4 if config.preconditioner == 'jacobi' else 1)
    return _marginal_probes(lin, damping, apply_M, iters, config, keys,
                            poses)


def _free_mask(graph: FactorGraphData, poses, pose_mask):
    """1.0 for optimizable poses, 0.0 for gauge-frozen/invalid (the
    ``lin.free`` vector without a full linearization)."""
    n = poses.shape[0]
    gauge = jnp.any(graph.prior_sqrt_info > GAUGE_FIX_THRESHOLD, axis=-1)
    frozen = jnp.zeros((n,), bool).at[graph.prior_keys].max(
        gauge & (graph.prior_weight > 0))
    return (pose_mask & ~frozen).astype(poses.dtype)


@partial(jax.jit, static_argnames=('config',))
def marginal_covariance_cached(graph: FactorGraphData, poses, pose_mask,
                               keys, cache: WoodburyCache,
                               config: SolverConfig) -> jax.Array:
    """:func:`marginal_covariance` entirely from a PREBUILT cache — the
    incremental fast path.

    Round-4 measured the old cached variant saving only 3%: the probes
    (not the factorization) dominate, and they still paid a full-graph
    linearize + chain matvec build per call.  Now BOTH operators come
    from the cache — the Woodbury apply as preconditioner and the
    stale-exact Hessian (:func:`_stale_matvec`) as the PCG matvec — so
    a covariance query does zero O(F) work.  The covariances are those
    of the cache's build-point linearization (the previous optimum);
    covariance is a curvature quantity and the difference from the
    fresh-point value is second order (pinned by
    test_marginal_covariance_cached_matches_oneshot).

    Probe solver (round-5): PCG over the cache operators with a DIRECT
    preconditioner start, x0 = M(e).  The r4/r5 measurements showed the
    probe cost is LAUNCH LATENCY of the cyclic-reduction apply chain
    times the iteration count (~95 ms/key at 10k poses for a
    zero-start 12-iteration budget), so the win is cutting ITERATIONS:
    the Woodbury start already satisfies a gating-grade tolerance and
    the loop exits after the 1-4 iterations needed to pass
    ``config.pcg_tolerance``.  Plain Richardson refinement was tried
    first and recorded as slower-converging: its contraction is
    rho(I - M H_stale), measured 0.43/step on an online runner cache
    (build point one closure behind), where PCG's Krylov acceleration
    converges in half the steps and stays robust when the cache is
    degraded."""
    damping = jnp.float32(config.damping)
    apply_M = _apply_from_cache(cache)
    mv = _stale_matvec(cache)
    free = _free_mask(graph, poses, pose_mask)
    n = poses.shape[0]

    def one_probe(key, d):
        e = jnp.zeros((n, 6), poses.dtype).at[key, d].set(1.0)
        x, _ = _pcg(None, e, damping, config.pcg_iterations,
                    config.pcg_tolerance, apply_M, matvec=mv,
                    x0=apply_M(e))
        return x[key]

    def one_key(key):
        cov = jax.vmap(lambda d: one_probe(key, d))(jnp.arange(6))
        return cov * free[key]

    return jax.vmap(one_key)(keys)


def _marginal_probes(lin: _LinearizedGraph, damping, apply_M, iters,
                     config: SolverConfig, keys, poses):
    """Shared probe core: all K keys x 6 canonical directions as ONE
    vmapped batch, so every PCG iteration is a single batched matvec +
    preconditioner apply rather than 6K sequential solves."""
    n = poses.shape[0]
    mv = _make_matvec(lin, damping, config)

    def one_probe(key, d):
        e = jnp.zeros((n, 6), poses.dtype).at[key, d].set(1.0)
        x0 = apply_M(e) if config.pcg_init == 'precond' else None
        x, _ = _pcg(lin, e, damping, iters, config.pcg_tolerance, apply_M,
                    matvec=mv, x0=x0)
        return x[key]

    def one_key(key):
        # Gauge-frozen poses are pinned: their marginal covariance is ~0
        # (the PCG identity row would otherwise report I).
        cov = jax.vmap(lambda d: one_probe(key, d))(jnp.arange(6))
        return cov * lin.free[key]

    return jax.vmap(one_key)(keys)


def marginal_covariance_exact(graph: FactorGraphData, poses, pose_mask,
                              keys, config: SolverConfig) -> 'np.ndarray':
    """EXACT per-key 6x6 marginal covariances via a host-side sparse
    f64 factorization — the same tool class as the reference's
    ``gtsam::Marginals`` (laser_track.cpp:421-429), which also runs
    f64 sparse elimination on the host CPU.

    Why a host path exists in a TPU framework: absolute marginals on
    weakly-anchored graphs span ~11 orders of magnitude (1e-7 rad^2 at
    the gauge anchor to 4.2e3 m^2 of lateral drift at the end of a
    10k-pose chain) and the round-5 ground-truth study showed f32 —
    ANY f32 formulation, direct or iterative, at any stabilization
    boost — floors the weak modes around 1e1
    (see :func:`marginal_covariance`'s accuracy envelope and
    experiments/cov_iteration_sweep.py).  Exactness here is a dynamic-
    range property, not an algorithm property, so the exact path runs
    where f64 is native.  Covariance queries are rare introspection /
    gating ops (the reference computes them on its single CPU thread
    too), and the one linearization pull is a few MB.

    Returns a host ``np.ndarray`` [K,6,6] float64.
    """
    import numpy as np
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    lin = _linearize(graph, poses, pose_mask, config.cauchy_k)
    free = np.asarray(lin.free, np.float64)
    n = free.shape[0]
    fkeys = np.asarray(lin.keys)
    w = np.asarray(lin.w_rel, np.float64)
    # Free-gated whitened Jacobians, exactly as _hessian_matvec gates.
    Jaf = np.asarray(lin.Ja, np.float64) * free[fkeys[:, 0], None, None]
    Jbf = np.asarray(lin.Jb, np.float64) * free[fkeys[:, 1], None, None]
    Haa = np.einsum('fji,fjk->fik', Jaf, Jaf * w[:, None, None])
    Hbb = np.einsum('fji,fjk->fik', Jbf, Jbf * w[:, None, None])
    Hab = np.einsum('fji,fjk->fik', Jaf, Jbf * w[:, None, None])
    pk = np.asarray(lin.prior_keys)
    wp = np.asarray(lin.w_prior, np.float64)
    Jpf = np.asarray(lin.Jp, np.float64) * free[pk, None, None]
    Hpp = np.einsum('pji,pjk->pik', Jpf, Jpf * wp[:, None, None])

    idx6 = np.arange(6)

    def coo_parts(bi, bj, B):
        r = np.broadcast_to((6 * bi)[:, None, None] + idx6[None, :, None],
                            B.shape)
        c = np.broadcast_to((6 * bj)[:, None, None] + idx6[None, None, :],
                            B.shape)
        return r.ravel(), c.ravel(), B.ravel()

    parts = [coo_parts(fkeys[:, 0], fkeys[:, 0], Haa),
             coo_parts(fkeys[:, 1], fkeys[:, 1], Hbb),
             coo_parts(fkeys[:, 0], fkeys[:, 1], Hab),
             coo_parts(fkeys[:, 1], fkeys[:, 0],
                       np.swapaxes(Hab, -1, -2)),
             coo_parts(pk, pk, Hpp)]
    rows = np.concatenate([p[0] for p in parts])
    cols = np.concatenate([p[1] for p in parts])
    vals = np.concatenate([p[2] for p in parts])
    H = sp.coo_matrix((vals, (rows, cols)), shape=(6 * n, 6 * n)).tocsc()
    # Damping on free states, identity rows for frozen/invalid ones —
    # the same semantics as _build_tridiag / _hessian_matvec.
    dvals = np.where(np.repeat(free, 6) > 0, float(config.damping), 1.0)
    H = (H + sp.diags(dvals)).tocsc()

    lu = spl.splu(H)
    kq = np.asarray(keys)
    E = np.zeros((6 * n, 6 * len(kq)))
    for i, k in enumerate(kq):
        for d in range(6):
            E[6 * int(k) + d, 6 * i + d] = 1.0
    X = lu.solve(E)
    out = np.zeros((len(kq), 6, 6))
    for i, k in enumerate(kq):
        out[i] = X[6 * int(k):6 * int(k) + 6, 6 * i:6 * i + 6].T
        out[i] *= free[int(k)]
    return out
