"""Master/slave multi-LiDAR calibration via ground alignment + yaw search.

Rebuild of ``Calibration_Tookit/SensorsCalibration/lidar2lidar/auto_calib``:

* RANSAC ground-plane extraction per cloud (``calibration.cpp:241-269``),
* roll/pitch from aligning the ground normals + z from the plane intercepts,
  with a flipped-normal retry when the z error exceeds 0.5 m (:203-233),
* near-field ego-point removal (:96-163),
* yaw search minimizing the summed NN distance of non-ground points — the
  reference's sequential coarse-to-fine halving (``registration_icp.cpp:
  49-101``) becomes a *batched* evaluation of all candidate yaw bins at once,
  in two refinement stages,
* final point-to-plane ICP using target normals (``RegistrationByICP2``
  :103-132) — expressed with the GICP solver in plane-to-plane mode.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import knn, ransac, registration, se3

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class AutoCalibConfig:
    ground_ransac_iters: int = 300
    ground_threshold: float = 0.2
    ego_radius: float = 2.5            # near-field removal
    yaw_coarse_bins: int = 72          # 5-degree steps, like the coarse stage
    yaw_fine_bins: int = 64            # fine stage around the coarse best
    yaw_fine_halfwidth_deg: float = 5.0
    icp_iters: int = 30
    icp_max_corr: float = 1.0
    knn_table: int = 8192
    nn_candidates: int = 16


class AutoCalibResult(NamedTuple):
    pose: se3.Pose          # slave -> master
    ground_ok: Array
    yaw_cost: Array
    icp_rmse: Array


def _ground_align(m_xyz, m_mask, s_xyz, s_mask, cfg, key) -> tuple:
    """Rotation+z aligning the slave's ground plane onto the master's."""
    k1, k2 = jax.random.split(key)
    fm = ransac.fit_plane_robust(m_xyz, m_mask, k1, cfg.ground_ransac_iters,
                                 cfg.ground_threshold)
    fs = ransac.fit_plane_robust(s_xyz, s_mask, k2, cfg.ground_ransac_iters,
                                 cfg.ground_threshold)
    nm = jnp.where(fm.normal[2] < 0, -fm.normal, fm.normal)
    dm = jnp.where(fm.normal[2] < 0, -fm.d, fm.d)

    def align(ns, ds):
        # rotate slave normal onto master normal
        axis = jnp.cross(ns, nm)
        s = jnp.linalg.norm(axis)
        c = jnp.clip(jnp.dot(ns, nm), -1.0, 1.0)
        ang = jnp.arctan2(s, c)
        q = se3.so3_exp_quat(jnp.where(s < 1e-9, jnp.zeros(3),
                                       axis / jnp.maximum(s, 1e-9) * ang))
        # z so plane offsets match: master plane n.x+dm=0, rotated slave has
        # same normal with offset ds -> shift along nm by (ds - dm)
        return se3.Pose(q, nm * (ds - dm))

    # flipped-normal retry (calibration.cpp:218-233): a tilted sensor makes
    # the z>0 sign heuristic ambiguous; when the first alignment's z shift
    # exceeds 0.5 m of the (already-applied) initial extrinsic, flip the
    # slave plane and realign
    ns = jnp.where(fs.normal[2] < 0, -fs.normal, fs.normal)
    ds = jnp.where(fs.normal[2] < 0, -fs.d, fs.d)
    pose_a = align(ns, ds)
    pose_b = align(-ns, -ds)
    use_b = jnp.abs(pose_a.t[2]) > 0.5
    pose = se3.Pose(jnp.where(use_b, pose_b.q, pose_a.q),
                    jnp.where(use_b, pose_b.t, pose_a.t))
    return pose, nm, dm, fm.ok & fs.ok, fm.inlier_mask, fs.inlier_mask


@partial(jax.jit, static_argnames=("cfg",))
def auto_calibrate(m_xyz: Array, m_mask: Array, s_xyz: Array, s_mask: Array,
                   cfg: AutoCalibConfig, key: Array,
                   init_pose: se3.Pose | None = None) -> AutoCalibResult:
    """init_pose: rough slave->master extrinsic, the reference's
    ``initial_extrinsic.txt`` input (``run_lidar2lidar.cpp:48-74``) — mainly
    the lever arm; the yaw search resolves the rotation."""
    # near-field ego removal (:96-163)
    m_mask = m_mask & (jnp.linalg.norm(m_xyz[:, :2], axis=1) > cfg.ego_radius)
    s_mask = s_mask & (jnp.linalg.norm(s_xyz[:, :2], axis=1) > cfg.ego_radius)
    if init_pose is None:
        init_pose = se3.Pose.identity()
    s_xyz = init_pose.apply(s_xyz)

    base, nm, dm, ground_ok, m_ground, s_ground = _ground_align(
        m_xyz, m_mask, s_xyz, s_mask, cfg, key)

    # non-ground points for the yaw search (:282: ground votes removed)
    m_ng = m_mask & ~m_ground
    s_ng = s_mask & ~s_ground
    s_lev = base.apply(s_xyz)

    grid = knn.build(m_xyz, m_ng, cell_size=2.0, table_size=cfg.knn_table)

    def yaw_cost(yaws):
        """Summed capped-NN distance of slave points rotated by each yaw about
        the (master) ground normal.  Evaluated with lax.map, NOT vmap: the
        vmapped kNN gather materializes (n_yaws, N, 27*C, 3), which TPU lane
        padding inflates to ~70 GB at realistic sizes."""
        def one(yaw):
            q = se3.so3_exp_quat(nm * yaw)
            moved = se3.quat_rotate(q, s_lev)
            res = knn.query(grid, moved, s_ng, k=1,
                            candidates_per_cell=cfg.nn_candidates,
                            max_sqdist=4.0)
            d = jnp.where(res.valid[:, 0], jnp.sqrt(res.sqdist[:, 0]), 2.0)
            return jnp.sum(jnp.where(s_ng, d, 0.0))

        return jax.lax.map(one, yaws)

    coarse = jnp.linspace(-jnp.pi, jnp.pi, cfg.yaw_coarse_bins, endpoint=False)
    cc = yaw_cost(coarse)
    y0 = coarse[jnp.argmin(cc)]
    half = jnp.radians(cfg.yaw_fine_halfwidth_deg)
    fine = y0 + jnp.linspace(-half, half, cfg.yaw_fine_bins)
    fc = yaw_cost(fine)
    y_best = fine[jnp.argmin(fc)]
    q_yaw = se3.so3_exp_quat(nm * y_best)
    pose0 = se3.Pose(q_yaw, jnp.zeros(3)).compose(base)

    # final refinement: plane-to-plane (covariance-weighted) ICP
    s_grid_full = knn.build(s_xyz, s_mask, cell_size=1.0, table_size=cfg.knn_table)
    m_grid_full = knn.build(m_xyz, m_mask, cell_size=1.0, table_size=cfg.knn_table)
    s_cov = registration.point_covariances(s_xyz, s_mask, s_grid_full, k=10)
    m_cov = registration.point_covariances(m_xyz, m_mask, m_grid_full, k=10)
    fine_res = registration.gicp(
        s_xyz, s_mask, s_cov, m_grid_full, m_xyz, m_cov, pose0,
        max_iters=cfg.icp_iters, max_corr_dist=cfg.icp_max_corr)
    # s_xyz was pre-transformed by init_pose; compose it back in
    return AutoCalibResult(fine_res.pose.compose(init_pose), ground_ok,
                           jnp.min(fc), fine_res.fitness)


def voxel_occupancy_score(m_xyz: Array, m_mask: Array,
                          s_xyz: Array, s_mask: Array,
                          pose: se3.Pose, voxel_size: float = 0.5,
                          table_size: int = 16384) -> Array:
    """Fraction of transformed-slave points landing in master-occupied voxels
    — the octree occupancy metric of the lidar2lidar variant's
    ``RegistrationByVoxelOccupancy`` refinement (``calibration.cpp:330``)."""
    from ...ops import voxel as voxel_ops

    c = voxel_ops.voxel_coords(m_xyz, voxel_size)
    h = (c[:, 0] * jnp.int32(73856093) ^ c[:, 1] * jnp.int32(19349663)
         ^ c[:, 2] * jnp.int32(83492791))
    h = jnp.abs(h) % jnp.int32(table_size)
    occ = jnp.zeros(table_size + 1, bool).at[
        jnp.where(m_mask, h, table_size)].set(True)[:table_size]
    moved = pose.apply(s_xyz)
    cs = voxel_ops.voxel_coords(moved, voxel_size)
    hs = (cs[:, 0] * jnp.int32(73856093) ^ cs[:, 1] * jnp.int32(19349663)
          ^ cs[:, 2] * jnp.int32(83492791))
    hs = jnp.abs(hs) % jnp.int32(table_size)
    hit = occ[hs] & s_mask
    return jnp.sum(hit) / jnp.maximum(jnp.sum(s_mask), 1)


def refine_by_voxel_occupancy(m_xyz, m_mask, s_xyz, s_mask, pose: se3.Pose,
                              voxel_size: float = 0.5,
                              delta: float = 0.05, steps: int = 5) -> se3.Pose:
    """Coordinate-descent occupancy refinement over translation, batched per
    axis (the variant's final stage; rotations are already ICP-refined)."""
    offsets = jnp.linspace(-delta * steps, delta * steps, 2 * steps + 1)

    def axis_pass(pose, axis):
        def score_at(o):
            t = pose.t.at[axis].add(o)
            return voxel_occupancy_score(m_xyz, m_mask, s_xyz, s_mask,
                                         se3.Pose(pose.q, t), voxel_size)
        scores = jax.vmap(score_at)(offsets)
        best = offsets[jnp.argmax(scores)]
        return se3.Pose(pose.q, pose.t.at[axis].add(best))

    for ax in range(3):
        pose = axis_pass(pose, ax)
    return pose
