"""Range-image projection, IMU deskew and ring extraction.

TPU rebuild of LIO-SAM's ``imageProjection`` stage
(``liosam_ws/src/LIO-SAM/src/imageProjection.cpp``):

* :func:`imu_rotation_timeline`  — gyro integration over the scan window
  (behavior of ``imuDeskewInfo`` :305-362)
* :func:`deskew`                 — per-point rotation deskew to scan start by
  linear interpolation of the integrated rotation
  (``findRotation`` :446-471 + ``deskewPoint`` :489-519; positional deskew is
  disabled in the reference :473-487 and here)
* :func:`project`                — N_SCAN x Horizon_SCAN range image with
  first-point-wins pixel assignment (``projectPointCloud`` :521-572)
* :func:`extract_rings`          — dense per-ring arrays + start/end indices
  (``cloudExtraction`` :574-598)

Everything is fixed shape: the IMU window is a masked (T,) buffer, the scan a
masked point set, the output a [N_SCAN, H] image + per-ring packed arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import se3
from .pointcloud import Cloud

Array = jax.Array


class ImuWindow(NamedTuple):
    """Fixed-size IMU sample window covering one scan.

    t:    (T,) seconds (absolute or scan-relative; must match point times)
    gyro: (T, 3) rad/s (already rotated into the LiDAR frame — the host-side
          ``imuConverter`` equivalent, ``utility.h:252-282``)
    acc:  (T, 3) m/s^2
    mask: (T,) bool
    """

    t: Array
    gyro: Array
    acc: Array
    mask: Array


def imu_rotation_timeline(imu: ImuWindow) -> tuple[Array, Array]:
    """Integrate gyro into per-sample accumulated euler-ish angles.

    Matches ``imuDeskewInfo`` :323-354: simple per-axis forward-Euler
    integration of angular velocity (NOT on-manifold — the reference treats
    the integrated angles as independent euler angles and builds RzRyRx from
    them; over one 100 ms scan this is accurate).

    Returns (times (T,), rot (T, 3)) with rot[0] = 0; invalid samples carry
    the previous value forward.
    """
    dt = jnp.diff(imu.t, prepend=imu.t[:1])
    dt = jnp.where(imu.mask & jnp.roll(imu.mask, 1), dt, 0.0)
    dt = dt.at[0].set(0.0)
    inc = imu.gyro * dt[:, None]
    inc = jnp.where(imu.mask[:, None], inc, 0.0)
    rot = jnp.cumsum(inc, axis=0)
    return imu.t, rot


def _interp_rotation(times: Array, rots: Array, n_valid: Array, t_query: Array) -> Array:
    """Linear interp of the integrated-rotation timeline at t_query (...,).

    Matches ``findRotation`` :446-471: clamp to last sample beyond the window,
    take front sample if query precedes the window.

    Form: the clamped piecewise-linear interpolant is the CUMULATIVE of its
    per-segment increments, ``r(q) = rots[0] + sum_t w_t(q) (rots[t] -
    rots[t-1])`` with ``w_t = clip((q - t_{t-1}) / dt_t, 0, 1)`` — queries
    before the window get all-zero weights (= rots[0]) and queries beyond it
    all-one weights (= last valid sample), the reference's clamps.  This
    needs NO index gathers: bracket-search variants pay 4 row gathers per
    query (~per-row overhead dominates 28.8k-point gathers on v5e), while
    here the (N, T) weight matrix contracts with the (T, 3) increments on
    the MXU, and the (N, T) broadcast work already existed as the bracket
    comparison sum.
    """
    T = times.shape[0]
    valid = jnp.arange(T) < n_valid
    t_safe = jnp.where(valid, times, jnp.inf)
    t_prev = jnp.concatenate([t_safe[:1], t_safe[:-1]])
    inc = rots - jnp.concatenate([rots[:1], rots[:-1]])     # (T, 3), inc[0]=0
    inc = jnp.where(valid[:, None], inc, 0.0)
    w = jnp.clip((t_query[..., None] - t_prev)
                 / jnp.maximum(t_safe - t_prev, 1e-9), 0.0, 1.0)
    # invalid lanes: t_prev may be inf - inf = nan there; they carry inc = 0
    # but nan * 0 = nan, so zero the weights explicitly
    w = jnp.where(valid, w, 0.0)
    return rots[0] + w @ inc


def deskew(
    xyz: Array,
    point_time: Array,
    imu_times: Array,
    imu_rots: Array,
    n_valid: Array,
    t_start: Array | None = None,
    enabled: Array | bool = True,
    vel_body: Array | None = None,
    acc_body: Array | None = None,
) -> Array:
    """Transform each point into the scan-start frame.

    xyz (N, 3), point_time (N,) absolute times on the same clock as imu_times.
    t_start: scan-start time (default: min point time).  The reference
    composes T_start^-1 * T_t with rotation-only transforms from the
    integrated gyro timeline (``deskewPoint`` :489-519).

    vel_body: optional (3,) scan-start body-frame velocity [m/s].  When
    given, the sensor's translation during the sweep is compensated too:
    x_start = R_{start<-t} x_t + v_body dt + 0.5 acc_body dt^2.  DEVIATION
    (an improvement): the reference stubs its position deskew to zero
    (``findPosition`` :473-487, "speed is slow, position deskew seems to
    have little benefit") because its odometry is not available in that
    callback; here the ESKF velocity is in-program and free.
    acc_body: optional (3,) scan-start body-frame acceleration (gravity
    removed) — second-order term; matters on curved paths (centripetal
    v^2/r reaches mm-scale per sweep at bench speeds).
    """
    if t_start is None:
        t_start = point_time.min()
    rot_t = _interp_rotation(imu_times, imu_rots, n_valid, point_time)  # (N,3)
    rot_start = _interp_rotation(imu_times, imu_rots, n_valid, jnp.reshape(t_start, (1,)))
    q_t = se3.quat_from_rpy(rot_t)
    q_s = se3.quat_from_rpy(rot_start)
    q_bt = se3.quat_mul(se3.quat_conj(q_s), q_t)
    out = se3.quat_rotate(q_bt, xyz)
    if vel_body is not None:
        dt = (point_time - t_start)[:, None]
        out = out + vel_body[None, :] * dt
        if acc_body is not None:
            out = out + 0.5 * acc_body[None, :] * dt * dt
    on = jnp.asarray(enabled)
    return jnp.where(on, out, xyz)


def deskew_grid(
    xyz: Array,
    col_time: Array,
    imu_times: Array,
    imu_rots: Array,
    n_valid: Array,
    t_start: Array,
    enabled: Array | bool = True,
) -> Array:
    """:func:`deskew` for a range-image grid (S, H, 3) whose firing time is
    per COLUMN (col_time (H,), relative to t_start): all rings of a column
    share one timestamp, so the rotation interpolation runs once per column
    (H queries instead of S*H) and the start-relative rotation broadcasts
    over rings.  Same ``findRotation``/``deskewPoint`` semantics
    (``imageProjection.cpp:446-519``) as the per-point path.
    """
    rot_t = _interp_rotation(imu_times, imu_rots, n_valid,
                             t_start + col_time)                  # (H, 3)
    rot_s = _interp_rotation(imu_times, imu_rots, n_valid,
                             jnp.reshape(t_start, (1,)))          # (1, 3)
    q_t = se3.quat_from_rpy(rot_t)
    q_s = se3.quat_from_rpy(rot_s)
    q_bt = se3.quat_mul(se3.quat_conj(q_s), q_t)                  # (H, 4)
    out = se3.quat_rotate(q_bt, xyz)                              # (S, H, 3)
    return jnp.where(jnp.asarray(enabled), out, xyz)


class RangeImage(NamedTuple):
    """Projected scan.

    rng:   (N_SCAN, H) float32 range, inf where empty
    xyz:   (N_SCAN, H, 3) deskewed points
    attrs: (N_SCAN, H, A)
    valid: (N_SCAN, H) bool
    """

    rng: Array
    xyz: Array
    attrs: Array
    valid: Array


def project(
    cloud: Cloud,
    ring: Array,
    n_scan: int,
    horizon: int,
    min_range: float,
    max_range: float,
    downsample_rate: int = 1,
    column_mode: str = "azimuth",
) -> RangeImage:
    """Project a masked point set into the range image.

    column_mode="azimuth" (Velodyne/Ouster) matches ``projectPointCloud``
    :544-552 exactly: ``col = -round((atan2(x, y)*180/pi - 90)/res) + H/2``
    with wraparound.  column_mode="counter" is the reference's LIVOX branch
    (:553-558): the column is a per-ring running counter over gate-passing
    points in input order (``columnIdnCountVec``) — solid-state lidars have
    no spinning azimuth, so arrival order IS the scan order.
    First point (in input order) wins each pixel (:561-562).
    """
    x, y = cloud.xyz[:, 0], cloud.xyz[:, 1]
    rng = jnp.linalg.norm(cloud.xyz, axis=-1)
    ok = cloud.mask & (rng >= min_range) & (rng <= max_range)
    ring = ring.astype(jnp.int32)
    ok &= (ring >= 0) & (ring < n_scan)
    if downsample_rate > 1:
        ok &= (ring % downsample_rate) == 0

    if column_mode == "counter":
        # per-ring running count of gate-passing points, in input order
        # (the counter increments for every point that passed the
        # range/ring/downsample gates, exactly like columnIdnCountVec)
        ring_safe = jnp.clip(ring, 0, n_scan - 1)
        onehot = (ring_safe[:, None] == jnp.arange(n_scan, dtype=jnp.int32)
                  ) & ok[:, None]
        cum = jnp.cumsum(onehot.astype(jnp.int32), axis=0)  # inclusive
        col = jnp.take_along_axis(cum, ring_safe[:, None], axis=1)[:, 0] - 1
    elif column_mode == "azimuth":
        ang_res = 360.0 / horizon
        horizon_angle = jnp.arctan2(x, y) * (180.0 / jnp.pi)
        col = (-jnp.round((horizon_angle - 90.0) / ang_res)).astype(jnp.int32) + horizon // 2
        col = jnp.where(col >= horizon, col - horizon, col)
    else:
        raise ValueError(f"unknown column_mode {column_mode!r}")
    ok &= (col >= 0) & (col < horizon)

    flat = ring * horizon + col
    n_pix = n_scan * horizon
    flat = jnp.where(ok, flat, n_pix)  # dropped bucket

    # first-point-wins: scatter-min of the point index, then gather
    order_idx = jnp.arange(cloud.capacity, dtype=jnp.int32)
    winner = jnp.full((n_pix + 1,), cloud.capacity, jnp.int32)
    winner = winner.at[flat].min(order_idx)
    winner = winner[:n_pix]
    valid = winner < cloud.capacity
    wsafe = jnp.minimum(winner, cloud.capacity - 1)

    # ONE wide row gather (xyz | attrs | rng): per-row overhead dominates
    # TPU gathers, so three narrow gathers of the same rows cost ~3x one
    # wide gather (measured round 2 on the voxel lookup, docs/DESIGN.md)
    A = cloud.attrs.shape[1]
    wide = jnp.concatenate([cloud.xyz, cloud.attrs, rng[:, None]], axis=1)
    wide_img = wide[wsafe].reshape(n_scan, horizon, 4 + A)
    img_xyz = wide_img[..., :3]
    img_attrs = wide_img[..., 3:3 + A]
    img_rng = wide_img[..., 3 + A]
    valid = valid.reshape(n_scan, horizon)
    img_rng = jnp.where(valid, img_rng, jnp.inf)
    return RangeImage(img_rng, img_xyz, img_attrs, valid)


class ExtractedScan(NamedTuple):
    """Per-ring packed dense arrays (the reference's flattened extracted cloud
    + startRingIndex/endRingIndex/pointColInd/pointRange, reshaped so each
    ring occupies its own fixed-width row).

    xyz:   (N_SCAN, H, 3)
    rng:   (N_SCAN, H)
    col:   (N_SCAN, H) original column index
    attrs: (N_SCAN, H, A)
    count: (N_SCAN,) number of valid (packed-prefix) points per ring
    """

    xyz: Array
    rng: Array
    col: Array
    attrs: Array
    count: Array


def extract_rings(img: RangeImage) -> ExtractedScan:
    """Pack valid pixels of each ring into a dense prefix (stable by column),
    mirroring ``cloudExtraction`` :574-598.

    One multi-operand ``lax.sort`` along the column axis carries every field
    through the sort network instead of argsort + per-field permutation
    gathers (the round-2 voxel_downsample rewrite, ~2x at scan sizes on
    v5e).  The key ``(~valid)*H + column`` is strictly increasing within
    each validity class, so the sort is the stable partition exactly."""
    n_scan, horizon = img.rng.shape
    iota = jnp.broadcast_to(jnp.arange(horizon, dtype=jnp.int32),
                            (n_scan, horizon))
    key = jnp.where(img.valid, iota, iota + horizon)
    A = img.attrs.shape[-1]
    rng_f = jnp.where(img.valid, img.rng, jnp.inf)
    sorted_ops = jax.lax.sort(
        (key, img.xyz[..., 0], img.xyz[..., 1], img.xyz[..., 2], rng_f,
         *(img.attrs[..., j] for j in range(A))),
        dimension=1, num_keys=1)
    key_s = sorted_ops[0]
    xyz = jnp.stack(sorted_ops[1:4], axis=-1)
    rng = sorted_ops[4]
    attrs = (jnp.stack(sorted_ops[5:], axis=-1) if A
             else img.attrs)
    col = jnp.where(key_s < horizon, key_s, key_s - horizon)
    count = jnp.sum(img.valid.astype(jnp.int32), axis=1)
    return ExtractedScan(xyz, rng, col, attrs, count)
