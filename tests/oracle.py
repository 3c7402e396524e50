"""Float64 reference-equivalent SLAM oracle (test-only).

A faithful numpy/scipy re-statement of the reference pipeline's numerics,
used to enforce the north-star accuracy clause (<1 cm / <0.1 deg final
trajectory divergence) against the TPU framework:

- ICP: cKDTree exact 1-NN matcher + trimmed-distance outlier filter
  (ratio 0.75) + point-to-plane Gauss-Newton, iteration cap 40 with the
  differential convergence checkers (minDiffRotErr 0.001, minDiffTransErr
  0.01, smooth 4) — the exact icp_default.yaml:1-30 pipeline that
  libpointmatcher executes for ``icp_.compute`` (laser_track.cpp:496).
- Reference-cloud normals: kNN (10) PCA, the SamplingSurfaceNormal filter.
- Front-end: scan-to-submap in the second-last scan's frame over the last
  nscan_in_sub_map scans (laser_track.cpp:466-519), odometry + ICP factors
  per scan (laser_track.cpp:211-222).
- Back-end: dense float64 Gauss-Newton over the full pose graph with the
  reference noise models, Cauchy(1) robust weights on ICP/LC factors, a
  1e-7-sigma prior on the first pose, and 3 GN iterations per scan
  (mirroring the 3x isam2_.update() schedule,
  incremental_estimator.cpp:151-163).
- Loop closures: world-frame alignment converted to key_a's frame exactly
  as incremental_estimator.cpp:83-87.

Everything is float64 end-to-end; pose convention matches the repo
(pose7 = [qw qx qy qz tx ty tz], tangent [omega(3), v(3)], right-
multiplicative retraction T * exp(xi)) so trajectories compare directly.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

# ---------------------------------------------------------------------------
# SE(3) in float64 (same conventions as laser_slam_tpu.ops.se3)
# ---------------------------------------------------------------------------


def quat_to_R(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def R_to_quat(R):
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                      (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(1.0 + R[i, i] - R[j, j] - R[k, k]) * 2
        q = np.empty(4)
        q[0] = (R[k, j] - R[j, k]) / s
        q[1 + i] = 0.25 * s
        q[1 + j] = (R[j, i] + R[i, j]) / s
        q[1 + k] = (R[k, i] + R[i, k]) / s
    if q[0] < 0:
        q = -q
    return q / np.linalg.norm(q)


def pose7_to_T(p):
    T = np.eye(4)
    T[:3, :3] = quat_to_R(p[:4])
    T[:3, 3] = p[4:]
    return T


def T_to_pose7(T):
    return np.concatenate([R_to_quat(T[:3, :3]), T[:3, 3]])


def so3_exp(w):
    th = np.linalg.norm(w)
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-12:
        return np.eye(3) + K
    return (np.eye(3) + np.sin(th) / th * K +
            (1 - np.cos(th)) / th ** 2 * K @ K)


def so3_log(R):
    c = np.clip((np.trace(R) - 1) / 2, -1.0, 1.0)
    th = np.arccos(c)
    if th < 1e-12:
        return np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                         R[1, 0] - R[0, 1]]) / 2
    return th / (2 * np.sin(th)) * np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])


def _left_jacobian(w):
    th2 = w @ w
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th2 < 1e-24:
        return np.eye(3) + 0.5 * K
    th = np.sqrt(th2)
    return (np.eye(3) + (1 - np.cos(th)) / th2 * K +
            (th - np.sin(th)) / (th2 * th) * K @ K)


def se3_exp(xi):
    """Tangent [omega, v] -> 4x4 (matches ops/se3.exp)."""
    w, v = xi[:3], xi[3:]
    T = np.eye(4)
    T[:3, :3] = so3_exp(w)
    T[:3, 3] = _left_jacobian(w) @ v
    return T


def se3_log(T):
    w = so3_log(T[:3, :3])
    v = np.linalg.solve(_left_jacobian(w), T[:3, 3])
    return np.concatenate([w, v])


# ---------------------------------------------------------------------------
# libpointmatcher-equivalent ICP (cKDTree, float64)
# ---------------------------------------------------------------------------


def knn_pca_normals(pts, knn=10):
    """SamplingSurfaceNormal-equivalent kNN PCA normals."""
    tree = cKDTree(pts)
    _, idx = tree.query(pts, k=knn)
    neigh = pts[idx]
    centered = neigh - neigh.mean(axis=1, keepdims=True)
    cov = np.einsum('nki,nkj->nij', centered, centered)
    _, vecs = np.linalg.eigh(cov)
    return np.ascontiguousarray(vecs[..., 0])


def icp_point_to_plane(reading, ref, ref_normals, T0, max_iter=40,
                       trim=0.75, min_diff_rot=0.001, min_diff_trans=0.01,
                       smooth=4, max_dist=3.0):
    """icp_.compute-equivalent: returns (T 4x4, converged bool)."""
    tree = cKDTree(ref)
    T = T0.copy()
    hist = []
    for _ in range(max_iter):
        p = reading @ T[:3, :3].T + T[:3, 3]
        d, idx = tree.query(p)
        ok = d <= max_dist
        if ok.sum() < 24:
            return T0, False
        thresh = np.quantile(d[ok], trim)
        sel = ok & (d <= thresh)
        q = ref[idx[sel]]
        n = ref_normals[idx[sel]]
        ps = p[sel]
        r = np.sum(n * (ps - q), axis=1)
        J = np.concatenate([np.cross(ps, n), n], axis=1)
        A = J.T @ J
        A += 1e-6 * np.eye(6) * (1.0 + np.trace(A) / 6.0)
        delta = np.linalg.solve(A, -J.T @ r)
        T = se3_exp(delta) @ T
        hist.append((np.linalg.norm(delta[:3]), np.linalg.norm(delta[3:])))
        if len(hist) >= smooth:
            mr = np.mean([h[0] for h in hist[-smooth:]])
            mt = np.mean([h[1] for h in hist[-smooth:]])
            if mr < min_diff_rot and mt < min_diff_trans:
                break
    return T, True


# ---------------------------------------------------------------------------
# Dense float64 pose-graph Gauss-Newton (GTSAM-equivalent numerics)
# ---------------------------------------------------------------------------


class OracleGraph:
    """Relative-pose + prior factors, dense GN in float64.

    Residual of a relative factor (a, b, Z): log(Z^-1 A^-1 B) in the
    repo's rot-first tangent, whitened by 1/sigma; Cauchy(1) IRLS weights
    when robust.  Jacobians by central finite differences (float64, step
    1e-7 — exact enough for <1e-10 solver agreement).
    """

    def __init__(self):
        self.rel = []      # (ka, kb, Z 4x4, sqrt_info[6], robust)
        self.priors = []   # (k, T 4x4, sqrt_info[6])

    def add_relative(self, ka, kb, Z, sigmas, robust=False):
        self.rel.append((ka, kb, Z.copy(),
                         1.0 / np.asarray(sigmas, float), robust))

    def add_prior(self, k, T, sigmas):
        self.priors.append((k, T.copy(), 1.0 / np.asarray(sigmas, float)))

    @staticmethod
    def _rel_residual(Ta, Tb, Z):
        return se3_log(np.linalg.inv(Z) @ np.linalg.inv(Ta) @ Tb)

    def solve(self, poses, iterations=3, cauchy_k=1.0):
        """poses: list of 4x4; returns optimized copies."""
        poses = [p.copy() for p in poses]
        N = len(poses)
        eps = 1e-7
        for _ in range(iterations):
            H = np.zeros((6 * N, 6 * N))
            g = np.zeros(6 * N)

            def add_block(keys, r, Js, sqrt_info, robust):
                r_w = r * sqrt_info
                if robust:
                    # Cauchy(1) IRLS weight on the whitened norm
                    # (gtsam mEstimator::Cauchy, incremental_estimator.cpp
                    # :30-48).
                    w = 1.0 / (1.0 + (r_w @ r_w) / cauchy_k ** 2)
                else:
                    w = 1.0
                for ki, Ji in zip(keys, Js):
                    Jw_i = Ji * sqrt_info[:, None]
                    g[6 * ki:6 * ki + 6] -= w * Jw_i.T @ r_w
                    for kj, Jj in zip(keys, Js):
                        Jw_j = Jj * sqrt_info[:, None]
                        H[6 * ki:6 * ki + 6, 6 * kj:6 * kj + 6] += (
                            w * Jw_i.T @ Jw_j)

            for ka, kb, Z, sq, robust in self.rel:
                Ta, Tb = poses[ka], poses[kb]
                r = self._rel_residual(Ta, Tb, Z)
                Ja = np.zeros((6, 6))
                Jb = np.zeros((6, 6))
                for d in range(6):
                    xi = np.zeros(6)
                    xi[d] = eps
                    Ja[:, d] = (self._rel_residual(Ta @ se3_exp(xi), Tb, Z)
                                - self._rel_residual(Ta @ se3_exp(-xi), Tb,
                                                     Z)) / (2 * eps)
                    Jb[:, d] = (self._rel_residual(Ta, Tb @ se3_exp(xi), Z)
                                - self._rel_residual(Ta, Tb @ se3_exp(-xi),
                                                     Z)) / (2 * eps)
                add_block((ka, kb), r, (Ja, Jb), sq, robust)

            for k, Tp, sq in self.priors:
                r = se3_log(np.linalg.inv(Tp) @ poses[k])
                J = np.zeros((6, 6))
                for d in range(6):
                    xi = np.zeros(6)
                    xi[d] = eps
                    J[:, d] = (se3_log(np.linalg.inv(Tp) @ poses[k]
                                       @ se3_exp(xi))
                               - se3_log(np.linalg.inv(Tp) @ poses[k]
                                         @ se3_exp(-xi))) / (2 * eps)
                add_block((k,), r, (J,), sq, False)

            H += 1e-9 * np.eye(6 * N)
            dx = np.linalg.solve(H, g)
            for k in range(N):
                poses[k] = poses[k] @ se3_exp(dx[6 * k:6 * k + 6])
        return poses


# ---------------------------------------------------------------------------
# Reference-equivalent online SLAM loop
# ---------------------------------------------------------------------------


class OracleSlam:
    """processPoseAndLaserScan + estimate, float64 (laser_track.cpp:122-231
    + incremental_estimator.cpp:151-163)."""

    def __init__(self, nscan_in_sub_map=3, odometry_sigmas=None,
                 icp_sigmas=None, prior_sigma=1e-7,
                 loop_closure_sigmas=None, robust_icp=True,
                 robust_lc=True, knn=10, solver_iterations=3,
                 reading_sampling_ratio=1.0, sampling_seed=0):
        # reading_sampling_ratio mirrors icp_default.yaml's
        # RandomSamplingDataPointsFilter prob: 0.5 on the READING only
        # (submaps stay full) — used by bench.py's CPU e2e baseline.
        self.reading_ratio = reading_sampling_ratio
        self._read_rng = np.random.default_rng(sampling_seed)
        self.nscan = nscan_in_sub_map
        self.odo_sig = np.asarray(
            odometry_sigmas if odometry_sigmas is not None
            else [0.0015] * 3 + [0.005] * 3, float)
        self.icp_sig = np.asarray(
            icp_sigmas if icp_sigmas is not None
            else [0.0015] * 3 + [0.005] * 3, float)
        self.lc_sig = np.asarray(
            loop_closure_sigmas if loop_closure_sigmas is not None
            else [0.0015] * 3 + [0.005] * 3, float)
        self.prior_sigma = prior_sigma
        self.robust_icp = robust_icp
        self.robust_lc = robust_lc
        self.knn = knn
        self.solver_iterations = solver_iterations
        self.graph = OracleGraph()
        self.poses = []          # current world estimates, 4x4
        self.odom = []           # raw odometry measurements, 4x4
        self.scans = []          # float64 points in sensor frame
        self.normals = []
        self.times = []

    def process_scan(self, time_ns, points, odom_pose7):
        pts = np.asarray(points, float)
        T_odom = pose7_to_T(np.asarray(odom_pose7, float))
        k = len(self.poses)
        nrm = knn_pca_normals(pts, knn=self.knn)
        if k == 0:
            self.poses.append(T_odom)
            self.graph.add_prior(0, T_odom, np.full(6, self.prior_sigma))
        else:
            rel = np.linalg.inv(self.odom[-1]) @ T_odom
            propagated = self.poses[-1] @ rel
            # Scan-to-submap ICP in the second-last scan's frame
            # (laser_track.cpp:466-519).
            T_a = self.poses[-1]
            sub = [self.scans[-1]]
            sub_n = [self.normals[-1]]
            for i in range(2, min(len(self.scans), self.nscan) + 1):
                Trel = np.linalg.inv(T_a) @ self.poses[-i]
                sub.append(self.scans[-i] @ Trel[:3, :3].T + Trel[:3, 3])
                sub_n.append(self.normals[-i] @ Trel[:3, :3].T)
            sub_map = np.concatenate(sub)
            sub_nrm = np.concatenate(sub_n)
            guess = np.linalg.inv(T_a) @ propagated
            reading = pts
            if self.reading_ratio < 1.0:
                sel = self._read_rng.random(len(pts)) < self.reading_ratio
                reading = pts[sel]
            T_icp, ok = icp_point_to_plane(reading, sub_map, sub_nrm, guess)
            self.graph.add_relative(k - 1, k, rel, self.odo_sig)
            if ok:
                self.graph.add_relative(k - 1, k, T_icp, self.icp_sig,
                                        robust=self.robust_icp)
            self.poses.append(propagated)
            self.poses = self.graph.solve(
                self.poses, iterations=self.solver_iterations)
        self.odom.append(T_odom)
        self.scans.append(pts)
        self.normals.append(nrm)
        self.times.append(time_ns)
        return k

    def add_loop_closure(self, key_a, key_b, w_T_a_b_pose7):
        """World-frame alignment -> key_a-frame factor
        (incremental_estimator.cpp:83-87)."""
        W = pose7_to_T(np.asarray(w_T_a_b_pose7, float))
        a_T_a_b = (np.linalg.inv(self.poses[key_a]) @ W
                   @ self.poses[key_b])
        self.graph.add_relative(key_a, key_b, a_T_a_b, self.lc_sig,
                                robust=self.robust_lc)
        self.poses = self.graph.solve(
            self.poses, iterations=self.solver_iterations)

    def trajectory(self):
        return {t: T_to_pose7(T) for t, T in zip(self.times, self.poses)}
