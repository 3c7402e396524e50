"""Host-side orchestration: LaserTrack, IncrementalEstimator, Benchmarker."""
