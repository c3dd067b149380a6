"""Device-mesh scaling: multi-session / multi-LiDAR data parallelism.

The reference is a single-robot, single-host stack (no NCCL/MPI — see
SURVEY.md §2.8); its natural scale-out axes on TPU are *sessions* (parallel
rosbag replays / robots building one map) and *LiDARs* (multi-sensor rigs).
These shard over a ``jax.sharding.Mesh`` with the estimator state batched on
the leading axis, so scaling is a sharding annotation, not a rewrite.
"""

from .mesh import make_mesh, shard_batch  # noqa: F401
from .multisession import (batched_odometry_step,  # noqa: F401
                           cooperative_map_merge,
                           cooperative_map_merge_selective,
                           cross_session_align, make_batched_state)
