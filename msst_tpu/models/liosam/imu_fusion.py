"""Error-state fusion of preintegrated IMU with lidar odometry poses.

Fills the role of the reference's ``imuPreintegration`` process
(``src/imuPreintegration.cpp``): it maintained a small GTSAM chain (ImuFactor
+ bias BetweenFactor + lidar pose prior, reset every 100 keys :320-347) —
functionally a fixed-lag filter.  Here that is an explicit 15-state
error-state Kalman filter over [dtheta_w, dv, dp, dbg, dba]:

* :func:`propagate` — push (NavState, bias, cov) through a preintegrated IMU
  delta, building the transition from the preintegration's bias Jacobians;
* :func:`update_with_pose` — 6-dof lidar pose measurement update, with the
  noise widened when the scan matcher flagged degeneracy (the reference
  switches correctionNoise2 :269,378);
* :func:`reset_needed` — the reference's failure gates (:438-456).

The ESKF is algebraically the reference's marginalized two-node solve; the
difference (single- vs multi-iteration relinearization) is below sensor
noise for 10 Hz scan corrections.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import imu as imu_ops
from ...ops import se3

Array = jax.Array


class FilterState(NamedTuple):
    nav: imu_ops.NavState
    bias: imu_ops.ImuBias
    cov: Array  # (15, 15)

    @staticmethod
    def initial(pose: se3.Pose | None = None,
                rot_sigma: float = 0.1, pos_sigma: float = 0.1,
                vel_sigma: float = 1.0, bias_sigma: float = 0.1,
                velocity: "Array | None" = None) -> "FilterState":
        nav = imu_ops.NavState.identity()
        if pose is not None:
            nav = nav._replace(q=pose.q, p=pose.t)
        if velocity is not None:
            nav = nav._replace(v=jnp.asarray(velocity, jnp.float32))
        d = jnp.concatenate([
            jnp.full(3, rot_sigma**2), jnp.full(3, vel_sigma**2),
            jnp.full(3, pos_sigma**2), jnp.full(6, bias_sigma**2),
        ])
        return FilterState(nav, imu_ops.ImuBias.zero(), jnp.diag(d))


def propagate(fs: FilterState, pre: imu_ops.Preintegrated,
              params: imu_ops.ImuParams,
              bias_ref: imu_ops.ImuBias | None = None) -> FilterState:
    """Propagate through a preintegrated delta.

    bias_ref: the linearization bias `pre` was integrated at (default:
    fs.bias, i.e. no correction).  Passing zero lets the window pipeline
    preintegrate ALL scans in one batched pass outside the sequential
    estimator scan and correct to the current bias here via the standard
    first-order bias Jacobians (Forster eq. 70 — the same mechanism gtsam's
    predict applies between integrations, ``imuPreintegration.cpp:479``);
    the residual is O(|b|^2), orders below sensor noise at real bias scales.
    """
    nav = imu_ops.predict(fs.nav, pre, fs.bias,
                          fs.bias if bias_ref is None else bias_ref, params)
    R = se3.quat_to_matrix(fs.nav.q)
    dt = pre.dt
    Z = jnp.zeros((3, 3))
    eye = jnp.eye(3)

    RJr = R @ pre.J_dR_bg
    F = jnp.block([
        [eye, Z, Z, RJr, Z],
        [-se3.skew(R @ pre.dv), eye, Z, R @ pre.J_dv_bg, R @ pre.J_dv_ba],
        [-se3.skew(R @ pre.dp), eye * dt, eye, R @ pre.J_dp_bg, R @ pre.J_dp_ba],
        [Z, Z, Z, eye, Z],
        [Z, Z, Z, Z, eye],
    ])
    # preintegration noise rotated into world, in [theta, v, p] order
    Rblk = jax.scipy.linalg.block_diag(R, R, R)
    Q9 = Rblk @ pre.cov @ Rblk.T
    Qb = jnp.concatenate([
        jnp.full(3, params.gyr_bias_noise**2), jnp.full(3, params.acc_bias_noise**2)
    ]) * jnp.maximum(dt, 1e-6)
    Q = jax.scipy.linalg.block_diag(Q9, jnp.diag(Qb))
    cov = F @ fs.cov @ F.T + Q
    return FilterState(nav, fs.bias, 0.5 * (cov + cov.T))


def update_with_pose(fs: FilterState, meas: se3.Pose,
                     rot_sigma: float, pos_sigma: float,
                     degenerate: Array | bool = False,
                     degenerate_scale: float = 10.0) -> FilterState:
    """6-dof pose measurement update (world-frame left attitude error)."""
    scale = jnp.where(jnp.asarray(degenerate), degenerate_scale, 1.0)
    r_theta = se3.so3_log(se3.quat_mul(meas.q, se3.quat_conj(fs.nav.q)))
    r_p = meas.t - fs.nav.p
    r = jnp.concatenate([r_theta, r_p])                      # (6,)
    H = jnp.zeros((6, 15)).at[:3, :3].set(jnp.eye(3)).at[3:, 6:9].set(jnp.eye(3))
    Rm = jnp.diag(jnp.concatenate([
        jnp.full(3, (rot_sigma * scale) ** 2), jnp.full(3, (pos_sigma * scale) ** 2)
    ]))
    S = H @ fs.cov @ H.T + Rm
    K = fs.cov @ H.T @ jnp.linalg.inv(S)                     # (15, 6)
    dx = K @ r
    cov = (jnp.eye(15) - K @ H) @ fs.cov
    cov = 0.5 * (cov + cov.T)

    dq = se3.so3_exp_quat(dx[:3])
    nav = imu_ops.NavState(
        q=se3.quat_normalize(se3.quat_mul(dq, fs.nav.q)),
        p=fs.nav.p + dx[6:9],
        v=fs.nav.v + dx[3:6],
    )
    bias = imu_ops.ImuBias(fs.bias.gyr + dx[9:12], fs.bias.acc + dx[12:15])
    return FilterState(nav, bias, cov)


def update_with_position(fs: FilterState, pos: Array,
                         sigma: Array) -> FilterState:
    """3-dof absolute-position measurement update (the GPS leg of the
    reference's navsat EKF, ``module_navsat.launch:8-19`` — fusing the fix
    at the FILTER keeps velocity observable along axes scan matching cannot
    constrain; graph-only GPS factors yank position at keyframes and alias
    the jolt into velocity, measured as a +-15 m corridor oscillation)."""
    r = pos - fs.nav.p                                      # (3,)
    H = jnp.zeros((3, 15)).at[:, 6:9].set(jnp.eye(3))
    Rm = jnp.diag(jnp.asarray(sigma) ** 2)
    S = H @ fs.cov @ H.T + Rm
    K = fs.cov @ H.T @ jnp.linalg.inv(S)                    # (15, 3)
    dx = K @ r
    cov = (jnp.eye(15) - K @ H) @ fs.cov
    cov = 0.5 * (cov + cov.T)
    dq = se3.so3_exp_quat(dx[:3])
    nav = imu_ops.NavState(
        q=se3.quat_normalize(se3.quat_mul(dq, fs.nav.q)),
        p=fs.nav.p + dx[6:9],
        v=fs.nav.v + dx[3:6],
    )
    bias = imu_ops.ImuBias(fs.bias.gyr + dx[9:12], fs.bias.acc + dx[12:15])
    return FilterState(nav, bias, cov)


def reset_needed(fs: FilterState) -> Array:
    return imu_ops.failure_detected(fs.nav, fs.bias)
