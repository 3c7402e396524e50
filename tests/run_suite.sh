#!/bin/bash
# Chunked test runner: the full suite in ONE process triggers flaky
# segfaults deep inside XLA:CPU's JIT compile after ~25 min / ~100 tests
# (jax 0.9.0 + the axon TPU plugin loaded into every interpreter; crash
# sites vary run to run — see CLAUDE.md).  Running the same tests as a
# few sequential fresh-process chunks bounds compile state per process
# and has been stable.  Usage:  bash tests/run_suite.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
# Tests are CPU-only (conftest forces JAX_PLATFORMS=cpu), so never register
# the axon TPU plugin in test interpreters: with PALLAS_AXON_POOL_IPS set,
# the sitecustomize calls axon register() at interpreter startup, which
# (a) loads the plugin implicated in the flaky XLA:CPU segfaults and
# (b) HANGS every python startup indefinitely whenever the TPU tunnel is
# down.  Unsetting it here makes test runs independent of tunnel health.
export -n PALLAS_AXON_POOL_IPS 2>/dev/null || true
unset PALLAS_AXON_POOL_IPS
export JAX_PLATFORMS=cpu
CHUNKS=(
  "tests/test_se3.py tests/test_cloud.py tests/test_neighbors.py tests/test_range_image.py"
  "tests/test_icp.py tests/test_pallas_nn.py tests/test_benchmarker.py"
  "tests/test_solver.py tests/test_track_estimator.py"
  "tests/test_solver_fast.py tests/test_velodyne_sim.py tests/test_evaluation.py tests/test_spherical.py"
  "tests/test_solver_cache.py tests/test_adversarial.py"
  "tests/test_worker.py tests/test_checkpoint.py tests/test_pipeline_tools.py"
  "tests/test_online.py"
  "tests/test_fleet.py tests/test_rosbag.py tests/test_place_recognition.py"
  "tests/test_parity.py tests/test_kitti.py tests/test_native_io.py tests/test_bag_e2e.py"
)
fail=0
for chunk in "${CHUNKS[@]}"; do
  echo "=== chunk: $chunk"
  # shellcheck disable=SC2086
  python -m pytest $chunk -q "$@"
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "CHUNK FAILED (exit $rc): $chunk"
    fail=$rc
  fi
done
exit $fail
