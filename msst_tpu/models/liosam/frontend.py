"""LIO-SAM front-end: scan assembly, deskew, feature extraction.

One fused program covering the reference's first two processes:

* ``imageProjection`` (``src/imageProjection.cpp``): IMU gyro integration over
  the scan window, range-image projection, per-point rotation deskew, ring
  extraction;
* ``featureExtraction`` (``src/featureExtraction.cpp``): curvature, occlusion
  marking, sector-wise corner/surface selection, per-ring surface voxel
  downsample (leaf ``odometry_surf_leaf_size``, :232-236).

Output is two fixed-capacity masked feature clouds in the (deskewed) scan
frame plus the scan-start orientation hints the mapping stage consumes
(``cloud_info`` fields imuRollInit/imuPitchInit/imuYawInit).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import features as F
from ...ops import range_image as ri
from ...ops import voxel
from ...ops.pointcloud import Cloud

Array = jax.Array


class ScanInput(NamedTuple):
    """One raw LiDAR scan + its IMU window (fixed shapes).

    xyz:   (N, 3) sensor-frame points
    mask:  (N,)
    ring:  (N,) int32
    time:  (N,) float32 — per-point time offset from scan start [s]
    scan_start: () absolute scan start time [s]
    imu_t:    (T,) absolute sample times
    imu_gyro: (T, 3) rad/s (lidar frame)
    imu_acc:  (T, 3) m/s^2 (lidar frame)
    imu_mask: (T,)
    imu_rpy_init: (3,) orientation hint at scan start from the IMU's own
        attitude output (cloudInfo.imu*Init, ``imageProjection.cpp:329-330``)
    imu_available: () bool
    """

    xyz: Array
    mask: Array
    ring: Array
    time: Array
    scan_start: Array
    imu_t: Array
    imu_gyro: Array
    imu_acc: Array
    imu_mask: Array
    imu_rpy_init: Array
    imu_available: Array


class FrontendOutput(NamedTuple):
    corner: Cloud       # (scan_corner_cap,) deskewed scan-frame corners
    surf: Cloud         # (scan_surf_cap,) deskewed downsampled surface points
    n_corner: Array
    n_surf: Array


def run_frontend(scan: ScanInput, p, vel_body: Array | None = None,
                 acc_body: Array | None = None,
                 carry_time: bool = False) -> FrontendOutput:
    """p: LioParams.  vel_body/acc_body: optional scan-start body-frame
    velocity/acceleration for translation deskew (ops/range_image.deskew).

    carry_time: attach each point's firing offset (scan.time) as a 1-wide
    attr so it survives feature selection and voxel downsampling (as the
    per-voxel mean) — the window pipeline runs this stage batched with
    rotation-only deskew and applies the (linear-in-dt) translation deskew
    to the downsampled features inside the sequential estimator step, where
    the ESKF velocity lives.  Centroid averaging commutes with the linear
    term exactly (mean(x_i + v dt_i) = mean(x_i) + v mean(dt_i))."""
    # --- deskew rotation timeline (imuDeskewInfo :305-362)
    imu_win = ri.ImuWindow(scan.imu_t, scan.imu_gyro, scan.imu_acc, scan.imu_mask)
    times, rots = ri.imu_rotation_timeline(imu_win)
    n_imu = jnp.sum(scan.imu_mask.astype(jnp.int32))
    deskewed = ri.deskew(
        scan.xyz,
        scan.scan_start + scan.time,
        times, rots, n_imu,
        t_start=scan.scan_start,
        enabled=scan.imu_available & (n_imu > 1),
        vel_body=vel_body,
        acc_body=acc_body,
    )
    attrs = scan.time[:, None] if carry_time else None
    cloud = Cloud.create(deskewed, mask=scan.mask, attrs=attrs)

    # --- range image + ring extraction (projectPointCloud/cloudExtraction)
    img = ri.project(cloud, scan.ring, p.n_scan, p.horizon_scan,
                     p.lidar_min_range, p.lidar_max_range, p.downsample_rate,
                     column_mode="counter" if getattr(p, "sensor", "velodyne")
                     == "livox" else "azimuth")
    ext = ri.extract_rings(img)
    return _loam_features(ext, p)


def run_frontend_grid(rng_grid: Array, az: Array, tcol: Array, elev: Array,
                      scan_start: Array, imu_t: Array, imu_gyro: Array,
                      imu_acc: Array, imu_mask: Array, imu_available: Array,
                      p, carry_time: bool = False) -> FrontendOutput:
    """:func:`run_frontend` for a scan shipped AS a range image (ranges grid
    (S, H) + azimuth (H,) / col_time (H,) / elevation (S,) firing pattern —
    the host upload layout of ``mapping.odometry_window_flat_ri{,2}``).

    For grid input the projection (``projectPointCloud``,
    ``imageProjection.cpp:544-562``) is the identity: row = ring index,
    column = grid column, exactly one point per pixel — so the xyz path's
    reconstruct-point-rows -> re-project round trip (materialize (N, 5)
    rows, scatter-min winners, wide row gather) vanishes, and the deskew
    rotation interpolates once per COLUMN (all rings of a column share a
    firing time) instead of per point.  This also matches the reference
    MORE closely than the xyz path: ``columnIdn`` there is computed from
    the RAW azimuth before deskew — which is precisely the grid column —
    whereas re-projecting deskewed points bins by the rotated azimuth.
    """
    S, H = rng_grid.shape
    imu_win = ri.ImuWindow(imu_t, imu_gyro, imu_acc, imu_mask)
    times, rots = ri.imu_rotation_timeline(imu_win)
    n_imu = jnp.sum(imu_mask.astype(jnp.int32))

    ce, se = jnp.cos(elev), jnp.sin(elev)                   # (S,)
    ca, sa = jnp.cos(az), jnp.sin(az)                       # (H,)
    xyz = jnp.stack([rng_grid * (ce[:, None] * ca[None, :]),
                     rng_grid * (ce[:, None] * sa[None, :]),
                     rng_grid * se[:, None]], axis=-1)      # (S, H, 3)
    deskewed = ri.deskew_grid(
        xyz, tcol, times, rots, n_imu, t_start=scan_start,
        enabled=imu_available & (n_imu > 1))

    # range/ring gates of projectPointCloud :521-543 (pad pixels carry
    # range 0 -> culled by the min-range gate, like the xyz path's zero rows)
    valid = (rng_grid >= p.lidar_min_range) & (rng_grid <= p.lidar_max_range)
    if p.downsample_rate > 1:
        valid &= (jnp.arange(S, dtype=jnp.int32)
                  % p.downsample_rate == 0)[:, None]
    attrs = (jnp.broadcast_to(tcol[None, :, None], (S, H, 1))
             if carry_time else jnp.zeros((S, H, 0), rng_grid.dtype))
    img = ri.RangeImage(jnp.where(valid, rng_grid, jnp.inf), deskewed,
                        attrs, valid)
    ext = ri.extract_rings(img)
    return _loam_features(ext, p)


def _loam_features(ext, p) -> FrontendOutput:
    """Shared feature tail (``featureExtraction.cpp``): LOAM corner/surface
    selection over the packed rings + per-ring surface voxel downsample."""
    # --- LOAM features (NMS variant by default; see features.py docstring)
    if getattr(p, "feature_method", "nms") == "exact":
        masks = F.extract_features(ext, p.edge_threshold, p.surf_threshold)
    else:
        masks = F.extract_features_nms(ext, p.edge_threshold, p.surf_threshold)

    flat_xyz = ext.xyz.reshape(-1, 3)
    flat_attrs = ext.attrs.reshape(flat_xyz.shape[0], -1)
    corner_mask = masks.corner.reshape(-1)
    surf_mask = masks.surface.reshape(-1)
    ring_id = jnp.broadcast_to(
        jnp.arange(p.n_scan, dtype=jnp.int32)[:, None], masks.surface.shape
    ).reshape(-1)

    from ...ops.pointcloud import compact

    corner = compact(Cloud(flat_xyz, corner_mask, flat_attrs),
                     p.scan_corner_cap)

    # per-ring surface voxel downsample (featureExtraction.cpp:226-236)
    surf_full = Cloud(flat_xyz, surf_mask, flat_attrs)
    surf = voxel.voxel_downsample(
        surf_full, p.odometry_surf_leaf_size, capacity=p.scan_surf_cap,
        extra_key=ring_id,
    )
    return FrontendOutput(corner, surf, corner.count, surf.count)
