"""laser_slam_tpu — a TPU-native (JAX/XLA/Pallas) laser SLAM framework.

A from-scratch re-design of the capabilities of ethz-asl/laser_slam
(pose-graph LiDAR SLAM: ICP scan matching front-end + incremental factor
graph back-end) built for TPU hardware: fixed-shape tensor ops, jit/vmap
batched pipelines, Pallas kernels for the correspondence hot loop, and
pjit/Mesh sharding for fleet-scale estimation.

Layer map (bottom-up):
  ops/       geometry + point-cloud + ICP compute kernels (device)
  graph/     factor graph and Gauss-Newton/PCG solver (device)
  core/      LaserTrack / IncrementalEstimator orchestration (host + device)
  pipeline/  replay streams, scan assembly, worker loop, map export (host)
  parallel/  vmap fleet batching and multi-chip sharding
"""

import jax as _jax

# Geometry and solver math relies on small (3x3 / 6x6) contractions whose
# accuracy collapses under the TPU default bf16 matmul passes.  Default the
# whole library to full-f32 matmuls; the large NN-distance kernels opt into
# reduced precision explicitly where it is safe.
_jax.config.update('jax_default_matmul_precision', 'highest')

from laser_slam_tpu.config import (
    AssemblerConfig,
    BenchmarkerConfig,
    Config,
    EstimatorConfig,
    IcpConfig,
    InputFilterConfig,
    LaserTrackConfig,
    SolverConfig,
    WorkerConfig,
    load_config,
    save_config,
)

__version__ = '0.1.0'
