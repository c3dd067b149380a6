"""IMU preintegration (Forster-style) and Allan-variance intrinsic calibration.

TPU rebuild of:

* the GTSAM ``PreintegratedImuMeasurements`` usage in
  ``liosam_ws/src/LIO-SAM/src/imuPreintegration.cpp`` (two integrators — one
  for optimization, one for real-time prediction :176-177; noise model from
  imuAccNoise/imuGyrNoise :84-98; prediction ``imuHandler`` :458-506;
  failure gates :438-456), implemented as a ``lax.scan`` over a fixed-size
  masked IMU window;
* the Allan-variance tool in ``imu_calib/src/imu_utils`` (overlapping Allan
  variance over log-spaced cluster factors, ``allan_gyr.cpp:41-148``; the
  5-coefficient model fit of ``fitallan_gyr.cpp:24-109`` — linear in the
  squared coefficients, so plain LSQ replaces Ceres DOGLEG).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import se3

Array = jax.Array


class ImuParams(NamedTuple):
    """Continuous-time noise densities (the reference's params.yaml names)."""

    acc_noise: float = 3.9939570888238808e-03      # imuAccNoise
    gyr_noise: float = 1.5636343949698187e-03      # imuGyrNoise
    acc_bias_noise: float = 6.4356659353532566e-05  # imuAccBiasN
    gyr_bias_noise: float = 3.5640318696367613e-05  # imuGyrBiasN
    gravity: float = 9.80511                        # imuGravity
    integration_noise: float = 1e-4                 # gtsam integrationCovariance^0.5


class Preintegrated(NamedTuple):
    """Preintegrated IMU measurement between two keyframes."""

    dt: Array       # () total time
    dq: Array       # (4,) quat of integrated rotation
    dv: Array       # (3,)
    dp: Array       # (3,)
    J_dR_bg: Array  # (3, 3) d Log(dR) / d bias_gyr
    J_dv_bg: Array
    J_dv_ba: Array
    J_dp_bg: Array
    J_dp_ba: Array
    cov: Array      # (9, 9) [rot, vel, pos] covariance
    n_used: Array   # () int32 number of samples integrated


class NavState(NamedTuple):
    """World-frame navigation state (gtsam::NavState)."""

    q: Array  # (4,)
    p: Array  # (3,)
    v: Array  # (3,)

    @staticmethod
    def identity() -> "NavState":
        return NavState(se3.quat_identity(), jnp.zeros(3), jnp.zeros(3))


class ImuBias(NamedTuple):
    gyr: Array  # (3,)
    acc: Array  # (3,)

    @staticmethod
    def zero() -> "ImuBias":
        return ImuBias(jnp.zeros(3), jnp.zeros(3))


def preintegrate(
    t: Array, gyro: Array, acc: Array, mask: Array,
    bias: ImuBias, params: ImuParams,
) -> Preintegrated:
    """Integrate a masked IMU window into a relative (dR, dv, dp) with bias
    Jacobians and covariance.  t (T,), gyro/acc (T, 3), mask (T,).

    Each sample k (k >= 1) integrates over dt = t[k] - t[k-1] using the k-1
    measurement (forward Euler, like gtsam's integrateMeasurement chain the
    reference feeds one msg at a time :351-358).
    """
    T = t.shape[0]
    dts = jnp.diff(t)
    step_mask = mask[1:] & mask[:-1]
    dts = jnp.where(step_mask, jnp.clip(dts, 0.0, 0.1), 0.0)

    g2 = params.gyr_noise**2
    a2 = params.acc_noise**2
    i2 = params.integration_noise**2

    def step(carry, inp):
        dq, dv, dp, Jrb, Jvb, Jva, Jpb, Jpa, cov, total_dt, n = carry
        dt, w_m, a_m, m = inp
        w = w_m - bias.gyr
        a = a_m - bias.acc
        R_k = se3.quat_to_matrix(dq)
        incr = w * dt
        dq_incr = se3.so3_exp_quat(incr)
        R_incr = se3.quat_to_matrix(dq_incr)
        Jr = se3.so3_left_jacobian(-incr)  # right Jacobian of exp at incr
        a_hat = se3.skew(a)

        new_dq = se3.quat_normalize(se3.quat_mul(dq, dq_incr))
        new_dp = dp + dv * dt + 0.5 * (R_k @ a) * dt * dt
        new_dv = dv + (R_k @ a) * dt

        # bias Jacobians (Forster et al. eq. 70)
        new_Jrb = R_incr.T @ Jrb - Jr * dt
        new_Jvb = Jvb - (R_k @ a_hat @ Jrb) * dt
        new_Jva = Jva - R_k * dt
        new_Jpb = Jpb + Jvb * dt - 0.5 * (R_k @ a_hat @ Jrb) * dt * dt
        new_Jpa = Jpa + Jva * dt - 0.5 * R_k * dt * dt

        # covariance propagation: state [dtheta, dv, dp]
        Z = jnp.zeros((3, 3))
        eye = jnp.eye(3)
        A = jnp.block([
            [R_incr.T, Z, Z],
            [-(R_k @ a_hat) * dt, eye, Z],
            [-0.5 * (R_k @ a_hat) * dt * dt, eye * dt, eye],
        ])
        # noise: gyro white -> rot; acc white -> vel/pos; integration -> pos
        Bg = jnp.concatenate([Jr * dt, Z, Z], axis=0)          # (9, 3)
        Ba = jnp.concatenate([Z, R_k * dt, 0.5 * R_k * dt * dt], axis=0)
        Qc = (Bg * (g2 / jnp.maximum(dt, 1e-9))) @ Bg.T + (
            Ba * (a2 / jnp.maximum(dt, 1e-9))
        ) @ Ba.T
        Qi = jnp.zeros((9, 9)).at[6:, 6:].set(eye * i2 * dt)
        new_cov = A @ cov @ A.T + Qc + Qi

        on = m.astype(dq.dtype)
        keep = lambda new, old: on * new + (1 - on) * old  # noqa: E731
        carry = (
            keep(new_dq, dq), keep(new_dv, dv), keep(new_dp, dp),
            keep(new_Jrb, Jrb), keep(new_Jvb, Jvb), keep(new_Jva, Jva),
            keep(new_Jpb, Jpb), keep(new_Jpa, Jpa), keep(new_cov, cov),
            total_dt + on * dt, n + m.astype(jnp.int32),
        )
        return carry, None

    Z3 = jnp.zeros((3, 3))
    init = (
        se3.quat_identity(), jnp.zeros(3), jnp.zeros(3),
        Z3, Z3, Z3, Z3, Z3, jnp.zeros((9, 9)), jnp.asarray(0.0), jnp.asarray(0, jnp.int32),
    )
    (dq, dv, dp, Jrb, Jvb, Jva, Jpb, Jpa, cov, total_dt, n), _ = jax.lax.scan(
        step, init, (dts, gyro[:-1], acc[:-1], step_mask)
    )
    return Preintegrated(total_dt, dq, dv, dp, Jrb, Jvb, Jva, Jpb, Jpa, cov, n)


def predict(state: NavState, pre: Preintegrated, bias: ImuBias,
            bias_ref: ImuBias, params: ImuParams) -> NavState:
    """Propagate a NavState through a preintegrated measurement with
    first-order bias correction (gtsam predict(), used at IMU rate
    ``imuPreintegration.cpp:479``)."""
    dbg = bias.gyr - bias_ref.gyr
    dba = bias.acc - bias_ref.acc
    dq = se3.quat_mul(pre.dq, se3.so3_exp_quat(pre.J_dR_bg @ dbg))
    dv = pre.dv + pre.J_dv_bg @ dbg + pre.J_dv_ba @ dba
    dp = pre.dp + pre.J_dp_bg @ dbg + pre.J_dp_ba @ dba

    g = jnp.array([0.0, 0.0, -params.gravity])
    R_i = se3.quat_to_matrix(state.q)
    q_j = se3.quat_normalize(se3.quat_mul(state.q, dq))
    v_j = state.v + g * pre.dt + R_i @ dv
    p_j = state.p + state.v * pre.dt + 0.5 * g * pre.dt**2 + R_i @ dp
    return NavState(q_j, p_j, v_j)


def failure_detected(state: NavState, bias: ImuBias,
                     vel_limit: float = 30.0, bias_limit: float = 1.0) -> Array:
    """The reference's divergence gates: |v| > 30 m/s or |b| > 1.0
    (``failureDetection`` :438-456) force re-initialization."""
    return (
        (jnp.linalg.norm(state.v) > vel_limit)
        | (jnp.linalg.norm(bias.acc) > bias_limit)
        | (jnp.linalg.norm(bias.gyr) > bias_limit)
    )


# ---------------------------------------------------------------------------
# Allan variance (imu_utils rebuild)
# ---------------------------------------------------------------------------


def allan_variance(samples: Array, dt: float, cluster_sizes: Array) -> Array:
    """Overlapping Allan variance of one axis.

    samples: (N,) rate signal (deg/h or m/s^2); cluster_sizes: (M,) int32.
    Matches ``AllanGyr::calcVariance`` (overlapping estimator over the theta
    integral): avar(m) = sum (th[k+2m] - 2 th[k+m] + th[k])^2
    / (2 m^2 dt^2 (N - 2m)).
    """
    n = samples.shape[0]
    theta = jnp.concatenate([jnp.zeros(1), jnp.cumsum(samples)]) * dt  # (N+1,)

    def one(m):
        idx = jnp.arange(n + 1)
        i2 = jnp.minimum(idx + 2 * m, n)
        i1 = jnp.minimum(idx + m, n)
        d = theta[i2] - 2.0 * theta[i1] + theta[idx]
        valid = idx + 2 * m <= n
        cnt = jnp.maximum(jnp.sum(valid), 1)
        s = jnp.sum(jnp.where(valid, d * d, 0.0))
        tau = m.astype(theta.dtype) * dt
        return s / (2.0 * tau * tau * cnt)

    return jax.vmap(one)(cluster_sizes.astype(jnp.int32))


def log_spaced_clusters(n_samples: int, n_clusters: int = 100) -> Array:
    """Log-spaced cluster sizes from 1 to n_samples//2 (mirrors the log-spaced
    cluster factors of ``allan_gyr.cpp``)."""
    import numpy as np

    m = np.unique(
        np.round(
            np.logspace(0, np.log10(max(n_samples // 2 - 1, 2)), n_clusters)
        ).astype(np.int32)
    )
    return jnp.asarray(m)


class AllanFit(NamedTuple):
    """sigma^2(tau) = Q^2/tau^2 + N^2/tau + B^2 + K^2 tau + R^2 tau^2."""

    Q: Array  # quantization
    N: Array  # white noise (angle/velocity random walk)  — sigma at tau=1
    B: Array  # bias instability
    K: Array  # rate random walk
    R: Array  # rate ramp
    white_noise: Array       # N (the reference's imuAccNoise/imuGyrNoise source)
    bias_instability: Array  # min sigma over the curve


def fit_allan(taus: Array, avar: Array) -> AllanFit:
    """LSQ fit of the 5-coefficient Allan model (linear in the squared
    coefficients; replaces the Ceres DOGLEG fit ``fitallan_gyr.cpp:24-109``
    whose LSQ init :67-109 is exactly this solve)."""
    t = taus
    X = jnp.stack([1.0 / t**2, 1.0 / t, jnp.ones_like(t), t, t**2], axis=1)
    # weight by 1/avar (relative error), as log-domain fits do approximately
    w = 1.0 / jnp.maximum(avar, 1e-18)
    Xw = X * w[:, None]
    c = jnp.linalg.lstsq(Xw, avar * w)[0]
    c = jnp.maximum(c, 0.0)
    fit = AllanFit(
        Q=jnp.sqrt(c[0]), N=jnp.sqrt(c[1]), B=jnp.sqrt(c[2]),
        K=jnp.sqrt(c[3]), R=jnp.sqrt(c[4]),
        white_noise=jnp.sqrt(c[1]),
        bias_instability=jnp.sqrt(jnp.min(avar)),
    )
    return fit
