"""msst_tpu — a TPU-native multi-sensor SLAM framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference toolkit
``JBaien/multi-sensor-slam-tookit`` (a ROS1/C++ federation of LiDAR drivers,
point-cloud fusion, multi-LiDAR extrinsic + IMU intrinsic calibration, heading
estimation, reflective-target tracking, and a LIO-SAM LiDAR-inertial odometry
core).  Instead of OS processes talking over ROS topics with PCL KD-trees and
GTSAM on CPU:

* LiDAR scans are fixed-shape range-image / masked point tensors,
* nearest-neighbor search is a hash-grid kernel (``msst_tpu.ops.knn``),
* ICP / GICP / NDT / scan-to-map registration are batched fused Gauss-Newton
  programs (``msst_tpu.ops.registration``),
* IMU preintegration and LOAM feature extraction are jit/scan XLA programs,
* the keyframe pose graph solves as fixed-sparsity batched Gauss-Newton / LM
  on-chip (``msst_tpu.ops.graph``),

and one whole odometry step — deskew, feature extraction, scan-to-map
registration, factor update — compiles to a single TPU program with no host
round-trips (``msst_tpu.models.liosam``).

Package layout:

* ``msst_tpu.ops``      — geometry + compute kernels (the device hot path)
* ``msst_tpu.models``   — estimator pipelines (LIO-SAM, heading, target
                          tracker, fusion, calibration suite)
* ``msst_tpu.parallel`` — mesh/sharding helpers for multi-LiDAR / multi-session
                          scaling over device meshes
* ``msst_tpu.utils``    — host-side I/O adapters (KITTI, PCD, packets, rosbag)
  and profiling
* ``msst_tpu/native``   — C++ host runtime (packet decode, pcap replay)
"""

__version__ = "0.1.0"
