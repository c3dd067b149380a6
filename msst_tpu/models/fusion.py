"""Multi-LiDAR point-cloud fusion pipelines.

Rebuild of ``PointClouds_Fusion/``:

* ``lidar_fusion`` (2 LiDARs: TF transform + concat, ``lidar_fusion.cpp``)
* ``fusion_pointclouds`` (2-4 LiDARs: per-child static extrinsics, outer
  bounds crop, ego-box carve-out, ``fusion_pointclouds.cpp:34-204``)

The ApproximateTime synchronizer is host-side (``utils.sync``); by the time
data reaches the device everything is a fixed-shape batch, and the whole
fusion is one fused program (``ops.pointcloud.fuse``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import se3
from ..ops.pointcloud import Cloud, fuse


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """Mirrors ``fusion_pointclouds/config/params.yaml:1-66``."""

    n_lidars: int = 2
    capacity: int = 131072
    # per-child extrinsics as (x, y, z, roll, pitch, yaw) — loadTransParams
    extrinsics: tuple = ((0, 0, 0, 0, 0, 0), (0, 0, 0, 0, 0, 0))
    # outer bounds passthrough (None disables)
    bounds_lo: Optional[tuple] = None
    bounds_hi: Optional[tuple] = None
    # ego carve-out box
    ego_lo: Optional[tuple] = (-1.0, -1.0, -1.0)
    ego_hi: Optional[tuple] = (1.0, 1.0, 1.0)


class PointCloudFusion:
    def __init__(self, cfg: FusionConfig):
        self.cfg = cfg
        self._poses = [
            se3.Pose.from_rpy_xyz(jnp.asarray(e[3:6], jnp.float32),
                                  jnp.asarray(e[0:3], jnp.float32))
            for e in cfg.extrinsics
        ]
        self._fuse = jax.jit(self._build())

    def _build(self):
        cfg = self.cfg

        def run(clouds: Sequence[Cloud]):
            return fuse(
                list(clouds), self._poses, capacity=cfg.capacity,
                bounds_lo=None if cfg.bounds_lo is None else jnp.asarray(cfg.bounds_lo),
                bounds_hi=None if cfg.bounds_hi is None else jnp.asarray(cfg.bounds_hi),
                ego_lo=None if cfg.ego_lo is None else jnp.asarray(cfg.ego_lo),
                ego_hi=None if cfg.ego_hi is None else jnp.asarray(cfg.ego_hi),
            )

        return run

    def fuse_arrays(self, clouds_xyz: Sequence[np.ndarray],
                    attrs: Optional[Sequence[np.ndarray]] = None) -> Cloud:
        """Host entry: list of (Ni, 3) arrays (+ optional (Ni, A) attrs),
        padded per-lidar to capacity//n and fused."""
        cfg = self.cfg
        per = cfg.capacity // cfg.n_lidars
        clouds = []
        for i, xyz in enumerate(clouds_xyz):
            n = min(len(xyz), per)
            px = np.zeros((per, 3), np.float32)
            px[:n] = xyz[:n]
            m = np.zeros(per, bool)
            m[:n] = True
            a = None
            if attrs is not None:
                pa = np.zeros((per, attrs[i].shape[1]), np.float32)
                pa[:n] = attrs[i][:n]
                a = jnp.asarray(pa)
            clouds.append(Cloud.create(jnp.asarray(px), mask=jnp.asarray(m), attrs=a))
        return self._fuse(clouds)
