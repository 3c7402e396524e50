"""Device-side compute ops: SE(3) geometry, point clouds, NN search, ICP."""
