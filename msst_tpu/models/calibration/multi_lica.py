"""Targetless multi-LiDAR -> LiDAR + LiDAR -> ground calibration.

Rebuild of ``Calibration_Tookit/Multi_LiCa`` (MFI 2024, DOI
10.1109/MFI62651.2024.10705773):

* per-source pipeline (``Calibration.py:95-345``): crop -> voxel downsample
  -> FPFH -> mutual-kNN correspondences -> GNC-TLS robust coarse init ->
  GICP fine refinement with a fitness gate;
* orchestration (``multi_lidar_calibrator.py:191-380``): standard per-source
  calibration against the target LiDAR with retry against the combined cloud,
  or greedy fitness-based pairwise ordering;
* target-to-ground (``Lidar.calibrate_pitch`` ``Lidar.py:99-126`` +
  ``process_data`` :382-478): RANSAC ground plane -> pitch/roll/z so the
  ground maps to z = 0.

The device path (one compiled program per pair) returns the transform and
fitness; the orchestration is a small host loop like the reference's.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import knn, ransac, registration, se3
from ...ops.pointcloud import Cloud
from ...ops.voxel import voxel_downsample
from . import coarse as coarse_mod
from .features import fpfh, mutual_correspondences


@dataclasses.dataclass(frozen=True)
class MultiLicaConfig:
    """Mirrors ``Multi_LiCa/config/params.yaml`` defaults."""

    voxel_size: float = 0.35           # TEASER stage voxel (Calibration.py:188)
    crop_lo: tuple = (-20.0, -20.0, -20.0)   # crop_cloud=20 cube (:406-408)
    crop_hi: tuple = (20.0, 20.0, 20.0)
    fpfh_k: int = 48
    # FPFH/normal support radius = factor * voxel (Open3D hybrid search with
    # radius 5*voxel, max_nn 100, :413-420); radius-capped support keeps the
    # feature scale density-consistent across sensors.  4*voxel is the exact
    # deterministic coverage of the 27-cell hash-grid probe.
    fpfh_radius_factor: float = 4.0
    max_corr: int = 1024
    gnc_noise_bound: float = 0.3
    gicp_max_iters: int = 50
    gicp_max_corr_dist: float = 1.0
    fitness_gate: float = 0.6          # reference's fitness threshold for retry
    min_coarse_inliers: int = 50       # below this the FPFH coarse is noise
    capacity: int = 16384
    knn_table: int = 16384
    ground_ransac_iters: int = 300
    ground_threshold: float = 0.1


class PairResult(NamedTuple):
    pose: se3.Pose        # source -> target extrinsic
    fitness: Array        # GICP matched fraction
    rmse: Array
    coarse_inliers: Array


@partial(jax.jit, static_argnames=("cfg",))
def _prep_stage(xyz, mask, cfg: MultiLicaConfig):
    cl = Cloud.create(xyz, mask=mask)
    from ...ops.pointcloud import crop_box
    cl = crop_box(cl, jnp.asarray(cfg.crop_lo), jnp.asarray(cfg.crop_hi))
    cl = voxel_downsample(cl, cfg.voxel_size, capacity=cfg.capacity)
    radius = cfg.fpfh_radius_factor * cfg.voxel_size
    grid = knn.build(cl.xyz, cl.mask, cell_size=radius,
                     table_size=cfg.knn_table)
    feat = fpfh(cl.xyz, cl.mask, grid, k=cfg.fpfh_k, candidates_per_cell=64,
                max_radius=radius)
    cov = registration.point_covariances(cl.xyz, cl.mask, grid, k=16)
    return cl, grid, feat, cov


@partial(jax.jit, static_argnames=("cfg",))
def _coarse_stage(s_cl, t_cl, s_feat, t_feat, cfg: MultiLicaConfig):
    ia, ib, cval = mutual_correspondences(s_feat, s_cl.mask, t_feat, t_cl.mask,
                                          cfg.max_corr)
    return coarse_mod.gnc_tls_registration(
        s_cl.xyz[ia], t_cl.xyz[ib], cval, noise_bound=cfg.gnc_noise_bound)


@partial(jax.jit, static_argnames=("cfg",))
def _fine_stage(s_cl, s_cov, t_grid, t_cl, t_cov, init_pose,
                cfg: MultiLicaConfig):
    return registration.gicp(
        s_cl.xyz, s_cl.mask, s_cov, t_grid, t_cl.xyz, t_cov, init_pose,
        max_iters=cfg.gicp_max_iters, max_corr_dist=cfg.gicp_max_corr_dist)


def calibrate_pair(src_xyz, src_mask, tgt_xyz, tgt_mask, cfg: MultiLicaConfig,
                   init: Optional[se3.Pose] = None,
                   key: Optional[jax.Array] = None) -> PairResult:
    """Full coarse+fine calibration of one source cloud to a target cloud.

    Runs as FOUR jitted stages rather than one fused program: fusing the whole
    pipeline tempts XLA's rematerializer into a ~70 GB intermediate on TPU
    (observed at capacity 8192); staged compilation is also ~4x faster and
    this path is offline.

    When the FPFH coarse stage starves (planar scenes make FPFH
    non-discriminative — the reference leans on TEASER++'s max-clique
    pruning to survive <5% correspondence inlier rates) and the fine fitness
    stays below the gate, retry from a SensorsCalibration-style ground-align
    + batched-yaw-search coarse pose and keep whichever refinement matches
    more points."""
    s_cl, s_grid, s_feat, s_cov = _prep_stage(src_xyz, src_mask, cfg)
    t_cl, t_grid, t_feat, t_cov = _prep_stage(tgt_xyz, tgt_mask, cfg)
    co = _coarse_stage(s_cl, t_cl, s_feat, t_feat, cfg)
    init_pose = co.pose if init is None else init
    fine = _fine_stage(s_cl, s_cov, t_grid, t_cl, t_cov, init_pose, cfg)
    best = PairResult(fine.pose, fine.matched_frac, fine.fitness, co.n_inliers)
    starved = int(co.n_inliers) < cfg.min_coarse_inliers
    if init is None and (starved or float(best.fitness) < cfg.fitness_gate):
        from .auto_calib import AutoCalibConfig, auto_calibrate

        k = jax.random.PRNGKey(0) if key is None else key
        acfg = AutoCalibConfig(knn_table=cfg.knn_table)
        alt = auto_calibrate(t_cl.xyz, t_cl.mask, s_cl.xyz, s_cl.mask, acfg, k)
        fine2 = _fine_stage(s_cl, s_cov, t_grid, t_cl, t_cov, alt.pose, cfg)
        # matched fraction first; a flipped/slid pose can still match ~2/3 of
        # the points through the ground plane, so break ties on inlier RMSE
        score1 = float(best.fitness) - 0.3 * float(best.rmse)
        score2 = float(fine2.matched_frac) - 0.3 * float(fine2.fitness)
        if score2 > score1:
            best = PairResult(fine2.pose, fine2.matched_frac, fine2.fitness,
                              co.n_inliers)
    return best


@partial(jax.jit, static_argnames=("cfg",))
def calibrate_to_ground(xyz, mask, cfg: MultiLicaConfig, key) -> se3.Pose:
    """Pitch/roll/z so the dominant ground plane maps to z=0
    (``Lidar.calibrate_pitch`` + GICP vs synthetic horizontal cloud —
    here solved in closed form from the robust plane fit)."""
    fit = ransac.fit_plane_robust(xyz, mask, key, cfg.ground_ransac_iters,
                                  cfg.ground_threshold)
    n = jnp.where(fit.normal[2] < 0, -fit.normal, fit.normal)
    d = jnp.where(fit.normal[2] < 0, -fit.d, fit.d)
    z = jnp.array([0.0, 0.0, 1.0])
    axis = jnp.cross(n, z)
    s = jnp.linalg.norm(axis)
    cang = jnp.clip(jnp.dot(n, z), -1.0, 1.0)
    angle = jnp.arctan2(s, cang)
    axis = axis / jnp.maximum(s, 1e-9)
    q = se3.so3_exp_quat(jnp.where(s < 1e-9, jnp.zeros(3), axis * angle))
    # after rotation, plane becomes z + d = 0 -> shift up by d
    return se3.Pose(q, jnp.array([0.0, 0.0, 1.0]) * d)


class MultiLidarCalibrator:
    """Host orchestration (``multi_lidar_calibrator.py:191-380``)."""

    def __init__(self, cfg: MultiLicaConfig = MultiLicaConfig()):
        self.cfg = cfg

    def _pad(self, xyz):
        cap = self.cfg.capacity
        n = min(len(xyz), cap)
        out = np.zeros((cap, 3), np.float32)
        out[:n] = xyz[:n]
        mask = np.arange(cap) < n
        return jnp.asarray(out), jnp.asarray(mask)

    def standard_calibration(self, target_xyz: np.ndarray,
                             sources: Sequence[np.ndarray]):
        """Each source -> target; on poor fitness, retry against the combined
        cloud of everything calibrated so far (:220-277)."""
        t_x, t_m = self._pad(target_xyz)
        combined = [np.asarray(target_xyz, np.float32)]
        results = []
        for s in sources:
            s_x, s_m = self._pad(s)
            res = calibrate_pair(s_x, s_m, t_x, t_m, self.cfg)
            if float(res.fitness) < self.cfg.fitness_gate:
                c_x, c_m = self._pad(np.concatenate(combined))
                res2 = calibrate_pair(s_x, s_m, c_x, c_m, self.cfg)
                if float(res2.fitness) > float(res.fitness):
                    res = res2
            results.append(res)
            moved = np.asarray(res.pose.apply(jnp.asarray(s.astype(np.float32))))
            combined.append(moved)
        return results

    def save_results(self, directory: str, results, sources,
                     target_xyz: np.ndarray, names: Optional[Sequence[str]] = None):
        """Write results.txt + the stitched cloud, like the reference's
        output stage (``multi_lidar_calibrator.py:430-478``)."""
        import os

        from ...utils.io_pcd import write_pcd

        os.makedirs(directory, exist_ok=True)
        lines = []
        stitched = [np.asarray(target_xyz, np.float32)]
        for i, (r, s) in enumerate(zip(results, sources)):
            name = names[i] if names else f"lidar_{i + 1}"
            T = np.asarray(r.pose.to_matrix())
            lines.append(f"[{name}]")
            lines.append(f"fitness: {float(r.fitness):.4f}  rmse: {float(r.rmse):.4f}")
            lines.append("transformation:")
            for row in T:
                lines.append("  " + " ".join(f"{v: .6f}" for v in row))
            lines.append("")
            stitched.append(np.asarray(r.pose.apply(
                jnp.asarray(np.asarray(s, np.float32)))))
        with open(os.path.join(directory, "results.txt"), "w") as f:
            f.write("\n".join(lines))
        write_pcd(os.path.join(directory, "stitched.pcd"),
                  np.concatenate(stitched))

    def fitness_based_calibration(self, clouds: Sequence[np.ndarray],
                                  target_index: int = 0):
        """Greedy best-fitness pairwise merge ordering (:285-380): repeatedly
        calibrate the uncalibrated cloud with the best fitness against the
        combined calibrated set."""
        n = len(clouds)
        done = {target_index}
        poses: dict = {target_index: se3.Pose.identity()}
        combined = np.asarray(clouds[target_index], np.float32)
        fits: dict = {target_index: 1.0}
        while len(done) < n:
            best, best_res, best_fit = None, None, -1.0
            c_x, c_m = self._pad(combined)
            for i in range(n):
                if i in done:
                    continue
                s_x, s_m = self._pad(clouds[i])
                res = calibrate_pair(s_x, s_m, c_x, c_m, self.cfg)
                f = float(res.fitness)
                if f > best_fit:
                    best, best_res, best_fit = i, res, f
            done.add(best)
            poses[best] = best_res.pose
            fits[best] = best_fit
            moved = np.asarray(best_res.pose.apply(
                jnp.asarray(clouds[best].astype(np.float32))))
            combined = np.concatenate([combined, moved])
        return poses, fits
