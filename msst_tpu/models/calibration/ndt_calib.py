"""Online NDT parent/child calibrator.

Rebuild of ``Calibration_Tookit/multi_lidar`` (``multi_lidar_calibrator.cpp``):
synced parent/child cloud pairs, child voxel-downsampled (:113-121), NDT
aligned from a file-loaded initial guess (:28-63), each result re-fed as the
next initial guess (:72) so the estimate tracks over frames.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import registration, se3
from ...ops.pointcloud import Cloud
from ...ops.voxel import voxel_downsample


@dataclasses.dataclass(frozen=True)
class NdtCalibConfig:
    resolution: float = 1.0
    child_leaf: float = 0.2          # voxel_size param
    max_iters: int = 35
    step_size: float = 1.0
    map_capacity: int = 8192
    child_capacity: int = 16384


class NdtCalibResult(NamedTuple):
    pose: se3.Pose
    score: jnp.ndarray
    converged: jnp.ndarray


@partial(jax.jit, static_argnames=("cfg",))
def ndt_calibrate_frame(parent_xyz, parent_mask, child_xyz, child_mask,
                        init_pose: se3.Pose, cfg: NdtCalibConfig) -> NdtCalibResult:
    child = voxel_downsample(Cloud.create(child_xyz, mask=child_mask),
                             cfg.child_leaf, capacity=cfg.child_capacity)
    ndt_map = registration.build_ndt_map(parent_xyz, parent_mask,
                                         cfg.resolution, cfg.map_capacity)
    res = registration.ndt(child.xyz, child.mask, ndt_map, init_pose,
                           max_iters=cfg.max_iters, resolution=cfg.resolution,
                           step_size=cfg.step_size)
    return NdtCalibResult(res.pose, res.score, res.converged)


class NdtCalibrator:
    """Host loop: feeds each frame, carrying the estimate forward (:72)."""

    def __init__(self, cfg: NdtCalibConfig = NdtCalibConfig(),
                 initial_guess: se3.Pose | None = None):
        self.cfg = cfg
        self.pose = initial_guess or se3.Pose.identity()
        self.history = []

    def process_pair(self, parent_xyz: np.ndarray, child_xyz: np.ndarray):
        def pad(a, cap):
            n = min(len(a), cap)
            out = np.zeros((cap, 3), np.float32)
            out[:n] = a[:n]
            return jnp.asarray(out), jnp.asarray(np.arange(cap) < n)

        p_x, p_m = pad(parent_xyz, self.cfg.child_capacity)
        c_x, c_m = pad(child_xyz, self.cfg.child_capacity)
        res = ndt_calibrate_frame(p_x, p_m, c_x, c_m, self.pose, self.cfg)
        self.pose = res.pose
        self.history.append(float(res.score))
        return res

    def static_transform_command(self, parent="parent_lidar", child="child_lidar"):
        """The reference prints a ready-to-use static_transform_publisher line
        (:78-91)."""
        v6 = np.asarray(self.pose.to_vec6())
        r, p, y = v6[:3]
        x, yy, z = v6[3:]
        return (f"rosrun tf static_transform_publisher {x:.4f} {yy:.4f} {z:.4f} "
                f"{y:.4f} {p:.4f} {r:.4f} {parent} {child} 10")
