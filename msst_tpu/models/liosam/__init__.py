"""TPU-native LIO-SAM: tightly-coupled LiDAR-inertial odometry.

The reference runs 4 OS processes in a ring over ROS topics
(``liosam_ws/src/LIO-SAM/launch/include/module_loam.launch:5-8``):
imageProjection -> featureExtraction -> mapOptmization -> imuPreintegration.
Here the whole per-scan path — deskew, feature extraction, scan-to-map
registration, keyframe/factor update — is ONE compiled XLA program over
fixed-shape state (`odometry_step`), with loop closure as a second,
lower-rate compiled program sharing the keyframe store.
"""

from .params import LioParams  # noqa: F401
from .pipeline import LioSam  # noqa: F401
