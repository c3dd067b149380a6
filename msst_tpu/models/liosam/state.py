"""LIO-SAM estimator state: fixed-capacity keyframe store + factor graph +
IMU filter — the functional equivalent of the mutable members of
``mapOptmization`` (cloudKeyPoses3D/6D, corner/surf keyframe clouds,
iSAM2 state :50-140) and ``IMUPreintegration``.

Everything is a pytree of fixed-shape device arrays, so a whole session runs
as repeated invocations of one compiled step with the state threaded through.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import graph as graph_ops
from ...ops import se3
from . import imu_fusion
from .params import LioParams

Array = jax.Array


class KeyframeStore(NamedTuple):
    pose6: Array        # (K, 6) roll,pitch,yaw,x,y,z in map frame
    time: Array         # (K,) scan timestamps
    corner_xyz: Array   # (K, Ck, 3) scan-frame downsampled corner features
    corner_mask: Array  # (K, Ck)
    surf_xyz: Array     # (K, Cs, 3)
    surf_mask: Array    # (K, Cs)
    count: Array        # () int32
    # incremental-map bookkeeping (map_update="incremental"): the pose at
    # which each keyframe's moments were merged into the local map, so
    # eviction can subtract the bitwise-recomputable contribution even after
    # graph updates moved pose6 (the reference's transformed-cloud cache has
    # the same insertion-time staleness, mapOptmization.cpp:899-938)
    baked_pose6: Array  # (K, 6)
    baked: Array        # (K,) bool — contribution currently in the map

    @property
    def positions(self) -> Array:
        return self.pose6[:, 3:]

    @property
    def mask(self) -> Array:
        return jnp.arange(self.pose6.shape[0]) < self.count


class LocalMap(NamedTuple):
    """Cached scan-matching map (the reference recomputes this per scan and
    caches transformed clouds, ``extractCloud`` :899-938; here it is rebuilt
    only when a keyframe is inserted or a loop rewrites history — between
    keyframes the robot moves less than the 1 m keyframe gate, far below the
    50 m gather radius, so the cached map is equivalent)."""

    corner_xyz: Array   # (map_corner_cap, 3) map-frame
    corner_mask: Array
    surf_xyz: Array     # (map_surf_cap, 3)
    surf_mask: Array
    corner_grid: "object"  # knn.HashGrid pytree (knn method; tiny when unused)
    surf_grid: "object"
    corner_vox: "object"   # voxelmap.VoxelFeatureMap (voxel method; tiny when unused)
    surf_vox: "object"
    corner_mom: "object"   # voxelmap.VoxelMoments (incremental mode; tiny otherwise)
    surf_mom: "object"
    anchor: Array       # (3,) fine-grid anchor of the moment tables
    valid: Array        # () bool
    # overflow telemetry (VERDICT r4 #6): occupied cells dropped from the
    # (corner, surf) moment tables since the last full re-bake.  Overflow
    # drops the HIGHEST cell keys — spatially biased — and once silently
    # diverged a saturated profile; this makes saturation observable
    # (StepOutput.map_dropped -> pipeline host warning -> bench extras).
    mom_dropped: Array  # (2,) int32


class LioState(NamedTuple):
    kf: KeyframeStore
    graph: graph_ops.PoseGraph
    local_map: LocalMap
    n_gps: Array            # () next free GPS factor slot
    n_loop: Array           # () number of loop factors added
    pose6: Array            # (6,) latest optimized pose (transformTobeMapped)
    filter: imu_fusion.FilterState
    last_scan_time: Array   # ()
    initialized: Array      # () bool
    degenerate: Array       # () bool
    loop_closed: Array      # () bool — a loop factor was merged since last optimize


def _empty_local_map(p: LioParams) -> LocalMap:
    from ...ops import knn, voxelmap

    use_vox = p.scan2map_method == "voxel"

    def grid(cap):
        # tiny placeholder grids when the voxel path is active
        c = cap if not use_vox else 8
        return knn.build(jnp.zeros((c, 3), jnp.float32),
                         jnp.zeros((c,), bool), 1.0,
                         p.knn_table_size if not use_vox else 16)

    def vox(cap, leaf, kind):
        c = cap if use_vox else 8
        return voxelmap.build(jnp.zeros((c, 3), jnp.float32),
                              jnp.zeros((c,), bool), leaf, c, kind,
                              table_size=2 * c)

    # voxel mode keeps only tiny placeholder map clouds (the voxel-feature
    # tables are the map; the flat clouds feed the knn path only)
    cc = p.map_corner_cap if not use_vox else 8
    sc = p.map_surf_cap if not use_vox else 8
    use_inc = use_vox and p.map_update == "incremental"
    return LocalMap(
        corner_xyz=jnp.zeros((cc, 3), jnp.float32),
        corner_mask=jnp.zeros((cc,), bool),
        surf_xyz=jnp.zeros((sc, 3), jnp.float32),
        surf_mask=jnp.zeros((sc,), bool),
        corner_grid=grid(p.map_corner_cap),
        surf_grid=grid(p.map_surf_cap),
        corner_vox=vox(p.vox_corner_cap, p.vox_corner_leaf, "line"),
        surf_vox=vox(p.vox_surf_cap, p.vox_surf_leaf, "plane"),
        corner_mom=voxelmap.empty_moments(p.map_corner_cap if use_inc else 8),
        surf_mom=voxelmap.empty_moments(p.map_surf_cap if use_inc else 8),
        anchor=jnp.zeros(3, jnp.float32),
        valid=jnp.asarray(False),
        mom_dropped=jnp.zeros(2, jnp.int32),
    )


def init_state(p: LioParams) -> LioState:
    K = p.max_keyframes
    kf = KeyframeStore(
        pose6=jnp.zeros((K, 6), jnp.float32),
        time=jnp.zeros((K,), jnp.float32),
        corner_xyz=jnp.zeros((K, p.kf_corner_cap, 3), jnp.float32),
        corner_mask=jnp.zeros((K, p.kf_corner_cap), bool),
        surf_xyz=jnp.zeros((K, p.kf_surf_cap, 3), jnp.float32),
        surf_mask=jnp.zeros((K, p.kf_surf_cap), bool),
        count=jnp.asarray(0, jnp.int32),
        baked_pose6=jnp.zeros((K, 6), jnp.float32),
        baked=jnp.zeros((K,), bool),
    )
    graph = graph_ops.empty_graph(
        max_poses=K,
        max_priors=1,
        max_betweens=K + p.max_loop_factors,
        max_gps=p.max_gps_factors,
    )
    return LioState(
        kf=kf,
        graph=graph,
        local_map=_empty_local_map(p),
        n_gps=jnp.asarray(0, jnp.int32),
        n_loop=jnp.asarray(0, jnp.int32),
        pose6=jnp.zeros(6, jnp.float32),
        filter=imu_fusion.FilterState.initial(),
        last_scan_time=jnp.asarray(0.0, jnp.float32),
        initialized=jnp.asarray(False),
        degenerate=jnp.asarray(False),
        loop_closed=jnp.asarray(False),
    )


def kf_pose(kf: KeyframeStore, i: Array) -> se3.Pose:
    return se3.Pose.from_vec6(kf.pose6[i])
