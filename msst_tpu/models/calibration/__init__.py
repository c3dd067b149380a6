"""Calibration suite: multi-LiDAR extrinsics (3 methods) + IMU intrinsics.

Rebuilds ``Calibration_Tookit/`` + ``imu_calib/``:

* :mod:`multi_lica`  — targetless FPFH + GNC-TLS coarse init, GICP fine
  (Multi_LiCa, MFI-2024);
* :mod:`auto_calib`  — ground-plane alignment + batched yaw search +
  point-to-plane ICP (SensorsCalibration lidar2lidar);
* :mod:`ndt_calib`   — online NDT parent/child calibration
  (Calibration_Tookit/multi_lidar);
* :mod:`imu_allan`   — Allan-variance IMU noise identification (imu_utils);
* :mod:`evaluation`  — RMSE vs ground truth (Multi_LiCa/evaluation).
"""

from .evaluation import calibration_rmse  # noqa: F401
