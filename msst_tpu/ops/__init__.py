"""Device-side compute kernels: geometry, point-cloud ops, NN search,
registration solvers, IMU preintegration, factor graphs, RANSAC, filters."""
