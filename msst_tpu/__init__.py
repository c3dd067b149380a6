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


def _configure_matmul_precision():
    """Force full-f32 dot/matmul precision for the whole framework.

    JAX's DEFAULT dot_general precision on TPU computes f32 contractions at
    reduced (bfloat16-mantissa) precision on the MXU.  That is the right
    trade for neural nets; it is the wrong one for a state estimator whose
    matmuls are geometric: point transforms and Gauss-Newton normal
    equations carry metric coordinates of 10-100 m where bf16 mantissa
    steps are centimeters.  Measured on the bench drive (16x1800, 96
    scans): identical programs gave max drift 0.065 m on CPU (true f32)
    but 0.110 m on v5e at DEFAULT precision, with more GN iterations
    burned on the noise floor (docs/DESIGN.md round 3).

    The hot-path matmuls are tiny ((N,3)x(3,3) transforms, (N,6) normal-
    equation reductions, 15x15 covariance updates), so HIGHEST costs
    nothing measurable.  Opt out (e.g. for offline calibration sweeps
    where speed beats the last millimeter) with
    ``MSST_MATMUL_PRECISION=default``.
    """
    import os

    pref = os.environ.get("MSST_MATMUL_PRECISION", "highest")
    if pref != "default":
        import jax

        jax.config.update("jax_default_matmul_precision", pref)


_configure_matmul_precision()
