"""Factor-graph representation and incremental Gauss-Newton/PCG solver."""
