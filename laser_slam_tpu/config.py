"""Configuration dataclasses for the TPU-native laser SLAM framework.

One coherent config tree replaces the reference's three config tiers
(ROS param server structs, libpointmatcher ICP YAML, launch args — see
laser_slam_ros/include/laser_slam_ros/common.hpp:57-157,
laser_slam/include/laser_slam/parameters.hpp:8-34,
laser_slam/configurations/icp_default.yaml).  Everything can be loaded from
a single YAML file via :func:`load_config`.

Static-shape capacities (``*_capacity``) have no reference equivalent: they
exist because XLA compiles fixed shapes; growing state re-buckets to the
next power of two.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple


# Filter types accepted in an InputFilterConfig.chain entry, with their
# allowed parameters (ops/cloud.apply_filter_chain dispatches on these).
FILTER_PARAMS = {
    'range': {'min_distance_m', 'max_distance_m'},
    'random_sampling': {'prob'},
    'box': {'center', 'half_extent'},
    'cylindrical': {'center', 'radius_m', 'height_m', 'remove_inside'},
    'ground': {'robot_height_m', 'ground_clearance_m'},
    'voxel': {'voxel_size_m', 'min_points_per_voxel'},
}


def _canonical_chain(chain):
    """Normalize a filter chain to a hashable tuple of (type, params).

    Accepts YAML-style ``[{type: range, min_distance_m: 1.0}, ...]`` or
    already-canonical ``(('range', (('min_distance_m', 1.0),)), ...)``.
    Unknown filter types or parameters fail loudly (the reference FATALs
    on a bad input-filters file, laser_track.cpp:24-30).
    """
    out = []
    for entry in chain:
        if isinstance(entry, dict):
            entry = dict(entry)
            name = entry.pop('type', None)
            params = entry
        else:
            name, raw = entry
            params = dict(raw)
        if name not in FILTER_PARAMS:
            raise ValueError(
                f'unknown input filter type {name!r}; expected one of '
                f'{sorted(FILTER_PARAMS)}')
        bad = set(params) - FILTER_PARAMS[name]
        if bad:
            raise ValueError(f'unknown parameter(s) {sorted(bad)} for input '
                             f'filter {name!r}')
        canon = tuple(sorted(
            (k, tuple(v) if isinstance(v, (list, tuple)) else v)
            for k, v in params.items()))
        out.append((name, canon))
    return tuple(out)


@dataclass(frozen=True)
class InputFilterConfig:
    """Tensorized input filter chain applied to every incoming scan.

    Replaces the libpointmatcher DataPointsFilters loaded from
    ``icp_input_filters_file`` (laser_track.cpp:24-30,146).

    Two modes:

    * ``chain`` empty (default): the legacy fixed pipeline — range gate
      -> random sampling -> pad/truncate to capacity.
    * ``chain`` set (inline list of ``{type, params}`` entries, or loaded
      from ``chain_file`` — a YAML list mirroring the reference's separate
      input-filters file): the filters run IN ORDER, replacing the fixed
      pipeline.  A missing ``chain_file`` raises (reference parity:
      LaserTrack FATALs when its filter YAML is absent).
    """
    min_distance_m: float = 1.0          # drop self-hits near the sensor
    max_distance_m: float = 70.0         # drop far returns
    random_sampling_ratio: float = 1.0   # keep probability before padding
    scan_capacity: int = 16384           # fixed point budget for RAW scans
    # Post-filter storage budget (0 = scan_capacity).  TPU scatter/render
    # cost scales with array SHAPE, not valid-point count, so compacting
    # the filtered scan to a smaller fixed shape before ring storage cuts
    # every downstream per-scan cost (submap range-image render, ring
    # writes, normal z-buffers).  At KITTI density, scan_capacity=131072
    # with store_capacity=32768 keeps a 4x-denser-than-reading submap
    # while quartering the render scatter rows.
    store_capacity: int = 0
    chain: tuple = ()                    # ordered (type, params) filters
    chain_file: str = ''                 # optional YAML list file

    def __post_init__(self):
        chain = self.chain
        if self.chain_file:
            import os
            import yaml
            if not os.path.exists(self.chain_file):
                raise FileNotFoundError(
                    f'input-filters file not found: {self.chain_file!r} '
                    '(the reference FATALs here too, laser_track.cpp:24-30)')
            with open(self.chain_file) as f:
                chain = yaml.safe_load(f) or []
        object.__setattr__(self, 'chain', _canonical_chain(chain))


@dataclass(frozen=True)
class IcpConfig:
    """Point-to-plane ICP pipeline configuration.

    Mirrors laser_slam/configurations/icp_default.yaml: reading random
    sampling (prob 0.5), reference surface normals (knn 10), NN matcher
    (knn 1), trimmed-distance outlier filter (ratio 0.75), point-to-plane
    minimizer, counter (40) + differential (0.001/0.01, smooth 4) checkers.
    """
    reading_sampling_ratio: float = 0.5
    reading_capacity: int = 8192          # reading points after sampling
    normal_knn: int = 10
    # 'knn' = PCA of the k nearest neighbors (SamplingSurfaceNormal
    # parity, O(N^2) tiled top_k — the dominant ingest cost for big
    # scans); 'image_pca' = PCA over the 3x3 range-image neighborhood
    # (one wide gather, ~3x faster end-to-end, near-kNN quality);
    # 'range_image' = O(N) cross-product of image tangents (fastest,
    # noisier); 'auto' (default) = image_pca for scans >= 8192 points,
    # knn below (range_image.compute_normals; accuracy delta quantified
    # in tests/test_range_image.py::test_image_pca_vs_knn_accuracy).
    normal_method: str = 'auto'
    # Image size for normal estimation (should roughly match scan
    # density; independent of the matcher's range image).
    normal_image_rows: int = 32
    normal_image_cols: int = 512
    max_iterations: int = 40
    # Gauss-Newton steps per correspondence search (>=1).  The serial
    # per-iteration association gather is the ICP hot loop's dominant
    # cost on TPU (~90 Mrows/s random-row gather); re-using the matched
    # (q, n) pairs for a second GN step halves the gathers at equal
    # step count (fixed-correspondence inner iterations, standard ICP
    # practice).  1 = libpointmatcher parity (one match per step).
    gn_steps_per_match: int = 1
    # Coarse-to-fine: when >0 and < reading_capacity, first converge on
    # a strided subset of this many reading points (gather rows scale
    # with the query count), then refine on the full reading from the
    # coarse solution.  0 disables (parity default).
    coarse_capacity: int = 0
    coarse_max_iterations: int = 20
    trimmed_dist_ratio: float = 0.75
    # 'sort' = exact trim quantile (libpointmatcher parity);
    # 'histogram' = O(N) approximate quantile (~5x cheaper per iteration).
    trim_method: str = 'sort'
    min_diff_rot: float = 0.001
    min_diff_trans: float = 0.01
    smooth_length: int = 4
    # Correspondence engine:
    #   'brute'      exact MXU-tiled NN (kd-tree parity)
    #   'pallas'     exact NN via the VPU-broadcast Pallas kernel
    #                (~2x 'brute' at 8k x 64k, see ops/pallas_nn.py)
    #   'projective' spherical range-image association (LOAM/KISS-ICP
    #                style) — the fast path for LiDAR scan matching
    matcher: str = 'brute'
    # 'pallas' matcher only: Morton-sort the reference once and skip
    # (DMA + compute) reference tiles whose AABB lies beyond the
    # correspondence radius or the running per-tile best — exact within
    # max_correspondence_dist_m, which is all ICP ever uses (matches
    # beyond it are discarded at `d2 <= max_corr2`).  False = the flat
    # exact-NN kernel (unbounded distances, kd-tree-without-maxDist
    # parity).  See ops/pallas_nn.py::nn_indices_pruned.
    pallas_prune: bool = True
    max_correspondence_dist_m: float = 3.0
    range_image_rows: int = 64
    range_image_cols: int = 1024
    range_image_elev_min: float = -0.45
    range_image_elev_max: float = 0.25
    # Projective search window: '3x3' (9 px) or 'cross' (5 px, ~1.7x
    # fewer gathers per iteration at slightly lower hit rate).
    range_image_window: str = '3x3'


@dataclass(frozen=True)
class LaserTrackConfig:
    """Per-track front-end parameters.

    Mirrors ``LaserTrackParams`` (parameters.hpp:8-23).  Noise sigmas are
    6-vectors ordered [rot(3) rad, trans(3) m] — NOTE this is the
    *reverse* of the reference's convention: minkindr's
    ``QuatTransformation::log`` puts translation in ``head<3>`` and
    rotation in ``tail<3>``, so config_example.yaml:4-6's
    ``[0.005 x3, 0.0015 x3]`` means 5 mm translation / 1.5 mrad rotation.
    The defaults below are those same physical values re-ordered for this
    repo's rot-first tangent convention.
    """
    odometry_noise_model: Tuple[float, ...] = (0.0015, 0.0015, 0.0015,
                                               0.005, 0.005, 0.005)
    icp_noise_model: Tuple[float, ...] = (0.0015, 0.0015, 0.0015,
                                          0.005, 0.005, 0.005)
    add_m_estimator_on_odom: bool = False
    add_m_estimator_on_icp: bool = True
    use_icp_factors: bool = True
    use_odom_factors: bool = True
    nscan_in_sub_map: int = 5            # scan-to-submap window (laser_track.cpp:478)
    save_icp_results: bool = False
    force_priors: bool = False
    # kDistanceBetweenPriorPoses_m (laser_track.hpp:235): forced priors place
    # track i at y = i * this.
    distance_between_prior_poses_m: float = 100.0
    # Populate LaserTrack.covariances with the new key's 6x6 marginal
    # after every estimate.  Default off: the reference declares the same
    # path (laser_track.cpp:421-429 appendCovariances) but never invokes
    # it, and the marginal probes cost ~6 extra PCG solves per scan.
    update_covariances: bool = False
    icp: IcpConfig = field(default_factory=IcpConfig)
    input_filters: InputFilterConfig = field(default_factory=InputFilterConfig)


@dataclass(frozen=True)
class SolverConfig:
    """Incremental Gauss-Newton/PCG pose-graph solver parameters.

    TPU-native replacement for GTSAM iSAM2 (incremental_estimator.cpp:17-20:
    relinearizeSkip=1, threshold=0.001, 3x update per scan).  The 3 GN
    iterations mirror the reference's 3 ``isam2_.update()`` calls.
    """
    gn_iterations: int = 3
    # GN early-out: when an iteration's step norm falls below this, the
    # remaining GN iterations are skipped (lax.cond — the skipped work is
    # never executed).  0 disables (reference parity: always 3 updates).
    gn_tolerance: float = 0.0
    pcg_iterations: int = 32
    pcg_tolerance: float = 1e-7
    damping: float = 1e-6
    # Sliding optimization window (0 = full graph): only the most recent
    # `window` poses stay free per incremental solve; older poses are
    # frozen anchors (O(window) per-step cost — loop closures trigger a
    # full solve regardless).  The online fast path solves the window as a
    # COMPACT gathered subproblem with the dense direct method (see
    # ``method``) — per-scan solve cost is O(window^3) dense flops, not
    # O(capacity) latency.
    window: int = 0
    # Linear-system method per GN step:
    #   'pcg'   preconditioned conjugate gradients (scales to any graph)
    #   'dense' assemble the full [6N,6N] normal equations and Cholesky
    #           them — EXACT and latency-optimal for small pose tables
    #           (<= ~512 poses); the window fast path uses this.
    method: str = 'pcg'
    # PCG preconditioner: 'tridiagonal' solves the Hessian's chain part
    # exactly per iteration (cyclic reduction, log N batched levels) —
    # essential for distributing loop-closure corrections across long
    # trajectories; 'woodbury' extends it with an exact low-rank
    # correction for up to ``offchain_capacity`` off-chain factors
    # (loop closures) via the Woodbury identity — the preconditioner
    # becomes a near-exact H^-1 and PCG converges in a handful of
    # iterations; 'jacobi' is the cheap local alternative.
    #
    # Choosing for full-graph solves: woodbury costs ~1.7x per PCG
    # iteration but converges far faster, so at MATCHED final error it
    # wins decisively on closure-rich graphs — on the 10k-pose bench
    # graph, woodbury gn=2/pcg<=16 reaches err 0.07 in ~89 ms where
    # tridiagonal gn=3/pcg<=32 needs ~93 ms for err 0.77 (TPU v5e-1,
    # experiments/precond_sweep.py).  tridiagonal remains the right
    # default for closure-sparse chains and for the windowed online
    # path (which uses method='dense' anyway).
    preconditioner: str = 'tridiagonal'
    # Max off-chain factors given exact low-rank treatment under the
    # 'woodbury' preconditioner; excess off-chain factors fall back to
    # the tridiagonal approximation (more PCG iterations, same answer).
    offchain_capacity: int = 64
    # Hessian matvec form inside PCG:
    #   'chain'   exact H = T + U U^T: block-tridiagonal chain part
    #             (built once per GN step, applied as batched [N,6,6]
    #             einsums + shifts — no full-length scatter) plus the
    #             compact off-chain low-rank term.  Exact whenever the
    #             active off-chain factors fit in ``offchain_capacity``;
    #             falls back to 'scatter' at runtime otherwise
    #             (lax.cond).  ~10x cheaper per PCG iteration at 10k
    #             poses (the scatter-add over the full factor buffer
    #             costs ~1.8 ms regardless of structure).
    #   'scatter' the general gather/scatter form (any graph topology).
    matvec: str = 'chain'
    # PCG start vector:
    #   'zero'     classic x0 = 0 (default).
    #   'precond'  x0 = M(b) — the direct-Woodbury fast path.  With the
    #              near-exact Woodbury H^-1 the start already satisfies
    #              pcg_tolerance and the loop exits after 0-1 iterations
    #              (one matvec to confirm the residual), so a cached
    #              incremental solve costs ~2 preconditioner applies
    #              instead of pcg_iterations of them; a degraded
    #              preconditioner (stale cache, off-chain overflow) just
    #              falls back to the usual iteration count.  Only useful
    #              when the preconditioner approximates H^-1 well
    #              (woodbury; tridiagonal on closure-free chains).
    pcg_init: str = 'zero'
    # Compute error_initial/error_final (graph_error: a full-capacity
    # residual pass each) in SolveResult.  The errors are diagnostics —
    # the reference's estimate() doesn't report one either
    # (incremental_estimator.cpp:151-163) — and on the cached incremental
    # fast path the two passes are a measurable share of the fixed
    # per-call cost; False returns -1.0 for both.
    compute_errors: bool = True
    # Richardson refinement steps in the relinearize-skip delta solve
    # (solver.solve_closure_cached): each step contracts the residual by
    # the preconditioner's f32 conditioning floor (~0.16 at 10k poses),
    # so 3 steps ~ 4e-3 relative — comparable to the PCG-tolerance path
    # at a fraction of the launches.
    delta_refine: int = 3
    # How the online cached loop-closure injection solves
    # (online._append_lc_and_solve_cached):
    #   'full'   extend_cache + solve_cached — full-graph GN step with
    #            fresh linearization (reference-parity safe default).
    #   'delta'  solver.solve_closure_cached — the reused-factorization
    #            fast path (fresh gradients, cached Hessian model); a
    #            fraction of the launches.  Contract: intended for
    #            SMALL-correction closures at warm states (e.g. ICP-
    #            refined detections); decimetre+ corrections converge
    #            more slowly than full re-linearized GN — use 'full'
    #            there, or follow a delta burst with refine().
    closure_solve: str = 'full'
    # Cached-preconditioner staleness bound (OnlineRunner loop-closure
    # solves): once this many factors have been appended since the
    # WoodburyCache was built, the next full solve rebuilds it instead of
    # extending — appended CHAIN factors are invisible to the cached
    # chain factorization (their poses ride identity rows), costing PCG
    # iterations.  Correctness never depends on this (the preconditioner
    # only shapes convergence); 256 factors = 128 scans of drift.
    cache_rebuild_after: int = 256
    pose_capacity: int = 1024            # initial key budget; doubles on overflow
    factor_capacity: int = 4096          # initial factor budget
    cauchy_k: float = 1.0                # mEstimator::Cauchy::Create(1)
    dtype: str = 'float32'


@dataclass(frozen=True)
class EstimatorConfig:
    """Global back-end parameters.

    Mirrors ``EstimatorParams`` (parameters.hpp:25-34) plus the iSAM2
    replacement solver config.  Sigma 6-vectors are [rot(3), trans(3)] —
    the reference's values are translation-first (minkindr log ordering,
    see LaserTrackConfig) and are re-ordered here.
    """
    loop_closure_noise_model: Tuple[float, ...] = (0.0015, 0.0015, 0.0015,
                                                   0.005, 0.005, 0.005)
    add_m_estimator_on_loop_closures: bool = True
    do_icp_step_on_loop_closures: bool = True
    loop_closures_sub_maps_radius: int = 3
    # First-association sigmas (incremental_estimator.cpp:40-48): the
    # reference sets [0.05 x3 trans, 0.015 x3 rot]; rot-first here.
    first_association_noise_model: Tuple[float, ...] = (0.015, 0.015, 0.015,
                                                        0.05, 0.05, 0.05)
    # Prior sigma on the first node of each track (laser_track.cpp:56-64).
    prior_noise_sigma: float = 1e-7
    laser_track: LaserTrackConfig = field(default_factory=LaserTrackConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)


@dataclass(frozen=True)
class WorkerConfig:
    """Online orchestrator parameters.

    Mirrors ``LaserSlamWorkerParams`` (laser_slam_ros/common.hpp:20-55)
    minus ROS frames/topics, which are replaced by the in-process stream API.
    """
    distance_to_consider_fixed: float = 60.0
    separate_distant_map: bool = True
    create_filtered_map: bool = True
    minimum_distance_to_add_pose: float = 1.0
    voxel_size_m: float = 0.1
    minimum_point_number_per_voxel: int = 1
    remove_ground_from_local_map: bool = False
    ground_distance_to_robot_center_m: float = 1.0
    use_odometry_information: bool = True
    # Cylindrical separation height (laser_slam_worker.cpp:429: hard-coded 40).
    cylinder_height_m: float = 40.0
    local_map_capacity: int = 1 << 20    # fixed budget for the local map


@dataclass(frozen=True)
class BenchmarkerConfig:
    """Metrics registry parameters (mirrors BenchmarkerParams,
    benchmarker.hpp:48-56)."""
    save_statistics_only: bool = False
    enable_live_output: bool = False
    results_directory: str = '/tmp/laser_slam_tpu_benchmarks'


@dataclass(frozen=True)
class AssemblerConfig:
    """Revolution assembler parameters (velodyne_assembler_ros.cpp:145-156)."""
    naive_assembling: bool = False       # skip motion de-skew when True
    start_angle_rad: float = 1.5707963267948966  # pi/2 azimuth wrap


@dataclass(frozen=True)
class PlaceRecognitionConfig:
    """Scan-context loop-closure detection (ops/scan_context.py).

    The reference has no detector of its own — loop closures arrive from
    the external segmatch node (incremental_estimator.cpp:63).  This
    in-tree detector makes the framework self-contained; attach it to an
    OnlineRunner via the ``place_recognition`` constructor argument.
    """
    n_rings: int = 20
    n_sectors: int = 60
    max_radius_m: float = 80.0
    z_offset_m: float = 2.0              # keeps ground returns positive
    # Accept a match when the best scan-context distance is below this
    # (0 identical, ~1 unrelated).  True revisits score ~0.01-0.03 on
    # the synthetic room; rotationally aliased views (square rooms,
    # corridors — same geometry, different place) can score ~0.05-0.08,
    # so candidates are ICP-verified below (the primary rejector).
    # Running WITHOUT a scan archive disables verification — tighten
    # this to ~0.05 there.
    distance_threshold: float = 0.20
    # Database entries within this many global keys of the query are
    # excluded (temporal neighbors always match).  Keys are GLOBAL: with
    # N interleaved robots this window covers ~1/N as many scans per
    # track — scale it up accordingly (cross-track rendezvous detection
    # is unaffected; other robots' old scans stay eligible).
    exclude_recent_keys: int = 30
    # Query cadence: every Nth added scan.  Each query's verdict must
    # reach the host eventually — a device->host fetch that costs full
    # link latency (~30 ms D2H on this deployment's tunnel).
    detect_every: int = 2
    # Fetch batching: accumulate this many query results on device and
    # read them back in ONE transfer (latency amortizes K-fold; detection
    # lags up to detect_every*fetch_every scans, which loop closures
    # tolerate — the alignment is built from the poses current at fetch
    # time).  1 = fetch immediately.
    fetch_every: int = 1
    # Cooldown after an accepted detection: while revisiting a stretch of
    # old trajectory EVERY scan matches the previous lap, and one closure
    # per ~cooldown keys constrains the graph as well as one per scan
    # without paying a full solve each step.
    min_keys_between_detections: int = 10
    # Geometric verification (needs the runner's scan archive): candidate
    # closures are submap-ICP-scored and rejected unless ICP converges
    # with at least this trimmed-inlier fraction of the reading and at
    # most this mean point-to-plane residual.  The descriptor stage alone
    # is subject to perceptual aliasing (a rotationally symmetric room
    # matches its own mirror view); the ICP gate is what keeps aliased
    # candidates out of the graph.
    verify_with_icp: bool = True
    min_inlier_fraction: float = 0.3     # ceiling = trimmed_dist_ratio
    max_mean_residual_m: float = 0.3
    # Odometry-consistency gate: a same-track candidate asserts the two
    # keys are co-located, i.e. the current estimate is wrong by their
    # estimated separation.  That correction must be explainable by
    # accumulated odometry drift: reject when separation >
    # sigmas * sigma_trans * sqrt(key gap).  This is the gate ICP CANNOT
    # provide under perfect aliasing (two *identical* rooms register
    # with zero residual — measured in tests/test_adversarial.py); it is
    # the Mahalanobis test iSAM-style pipelines run before accepting a
    # closure.  Cross-track candidates are exempt (no odometry chain
    # links two robots — large separation IS the rendezvous signal).
    # 0 disables.  12 allows 12-sigma drift: generous for true revisits,
    # orders of magnitude below aliased rooms tens of metres apart.
    odom_consistency_sigmas: float = 12.0
    db_capacity: int = 1024              # initial slots; doubles when full


@dataclass(frozen=True)
class Config:
    """Top-level framework configuration."""
    estimator: EstimatorConfig = field(default_factory=EstimatorConfig)
    worker: WorkerConfig = field(default_factory=WorkerConfig)
    benchmarker: BenchmarkerConfig = field(default_factory=BenchmarkerConfig)
    assembler: AssemblerConfig = field(default_factory=AssemblerConfig)
    n_workers: int = 1


def _from_dict(cls, data):
    """Recursively build a (nested) dataclass from a plain dict."""
    if not dataclasses.is_dataclass(cls):
        if isinstance(data, list):
            return tuple(data)
        return data
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in data.items():
        if key not in fields:
            raise KeyError(f'Unknown config key {key!r} for {cls.__name__}')
        ftype = fields[key].type
        # Resolve nested dataclass types by inspecting the default factory.
        default = fields[key].default_factory if fields[key].default_factory \
            is not dataclasses.MISSING else None
        if default is not None and dataclasses.is_dataclass(default()):
            kwargs[key] = _from_dict(type(default()), value)
        elif isinstance(value, list):
            kwargs[key] = tuple(value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


def load_config(path: str) -> Config:
    """Load a :class:`Config` from a YAML file (missing keys -> defaults)."""
    import yaml
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return _from_dict(Config, data)


def save_config(config: Config, path: str) -> None:
    import yaml
    with open(path, 'w') as f:
        yaml.safe_dump(dataclasses.asdict(config), f, sort_keys=False)
