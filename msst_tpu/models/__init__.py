"""Estimator pipelines: LIO-SAM odometry, heading estimation, target
tracking, point-cloud fusion, calibration suite."""
