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
    Jacobians and covariance — log-depth parallel formulation.

    The chained recurrences (rotation product, velocity/position cumsums,
    bias-Jacobian and covariance propagation) are all associative, so instead
    of a T-step sequential ``lax.scan`` (latency-bound on TPU) everything
    runs as ``associative_scan`` + cumsums in O(log T) depth.  Semantics are
    identical to the sequential forward-Euler chain (gtsam's
    integrateMeasurement fed one msg at a time, :351-358); see
    ``preintegrate_sequential`` kept for verification.
    """
    T = t.shape[0]
    dts = jnp.diff(t)
    step_mask = mask[1:] & mask[:-1]
    dts = jnp.where(step_mask, jnp.clip(dts, 0.0, 0.1), 0.0)
    m = step_mask.astype(t.dtype)

    w = (gyro[:-1] - bias.gyr) * m[:, None]
    a = (acc[:-1] - bias.acc) * m[:, None]
    dt = dts

    # --- rotation chain: R_k = prod_{j<=k} exp(w_j dt_j) via associative scan
    dq_steps = se3.so3_exp_quat(w * dt[:, None])            # (T-1, 4)
    q_cum = jax.lax.associative_scan(se3.quat_mul, dq_steps)  # R_1..R_{T-1}
    q_cum = se3.quat_normalize(q_cum)
    # R_k before step k (identity for k=0)
    q_prev = jnp.concatenate([se3.quat_identity((1,)), q_cum[:-1]], axis=0)
    R_prev = se3.quat_to_matrix(q_prev)                     # (T-1, 3, 3)

    # --- velocity / position: plain cumsums of rotated increments
    Ra = jnp.einsum("kij,kj->ki", R_prev, a)                # (T-1, 3)
    dv_steps = Ra * dt[:, None]
    dv_cum = jnp.cumsum(dv_steps, axis=0)
    dv_prev = jnp.concatenate([jnp.zeros((1, 3)), dv_cum[:-1]], axis=0)
    dp_steps = dv_prev * dt[:, None] + 0.5 * Ra * dt[:, None] ** 2
    dp = jnp.sum(dp_steps, axis=0)
    dv = dv_cum[-1]
    dq = q_cum[-1]

    # --- bias Jacobians (linear matrix recurrences -> associative scan on
    # (A, b) affine pairs: x_{k+1} = A_k x_k + b_k)
    incr = w * dt[:, None]
    R_incr_T = jnp.swapaxes(se3.quat_to_matrix(se3.so3_exp_quat(incr)), 1, 2)
    Jr = se3.so3_left_jacobian(-incr)                       # right Jacobian
    a_hat = se3.skew(a)

    def affine_compose(x, y):
        Ax, bx = x
        Ay, by = y
        return Ay @ Ax, jnp.einsum("kij,kjl->kil", Ay, bx) + by

    # J_dR_bg: J <- R_incr^T J - Jr dt
    A_r = R_incr_T
    b_r = -Jr * dt[:, None, None]
    _, JdRbg_cum = jax.lax.associative_scan(affine_compose, (A_r, b_r))
    J_dR_bg = JdRbg_cum[-1]
    JdRbg_prev = jnp.concatenate([jnp.zeros((1, 3, 3)), JdRbg_cum[:-1]], axis=0)

    # J_dv_ba = -cumsum(R_prev dt); J_dv_bg = -cumsum(R a_hat JdRbg_prev dt)
    J_dv_ba = -jnp.sum(R_prev * dt[:, None, None], axis=0)
    Rah = jnp.einsum("kij,kjl->kil", R_prev, a_hat)
    dvbg_steps = -Rah * dt[:, None, None]
    dvbg_steps = jnp.einsum("kij,kjl->kil", dvbg_steps, JdRbg_prev)
    Jvbg_cum = jnp.cumsum(dvbg_steps, axis=0)
    J_dv_bg = Jvbg_cum[-1]
    Jvbg_prev = jnp.concatenate([jnp.zeros((1, 3, 3)), Jvbg_cum[:-1]], axis=0)
    Jvba_cum = -jnp.cumsum(R_prev * dt[:, None, None], axis=0)
    Jvba_prev = jnp.concatenate([jnp.zeros((1, 3, 3)), Jvba_cum[:-1]], axis=0)

    J_dp_bg = jnp.sum(
        Jvbg_prev * dt[:, None, None]
        + 0.5 * dvbg_steps * dt[:, None, None], axis=0)
    J_dp_ba = jnp.sum(
        Jvba_prev * dt[:, None, None]
        - 0.5 * R_prev * dt[:, None, None] ** 2, axis=0)

    # --- covariance: Sigma <- A Sigma A^T + Q, composed associatively via the
    # same affine trick on (A, Q) pairs with Q composing as A Q A^T + Q'
    g2 = params.gyr_noise**2
    a2 = params.acc_noise**2
    i2 = params.integration_noise**2
    Z = jnp.zeros((T - 1, 3, 3))
    eye = jnp.broadcast_to(jnp.eye(3), (T - 1, 3, 3))
    A = jnp.concatenate([
        jnp.concatenate([R_incr_T, Z, Z], axis=2),
        jnp.concatenate([-Rah * dt[:, None, None], eye, Z], axis=2),
        jnp.concatenate([-0.5 * Rah * dt[:, None, None] ** 2, eye * dt[:, None, None], eye], axis=2),
    ], axis=1)                                              # (T-1, 9, 9)
    dt_safe = jnp.maximum(dt, 1e-9)
    Bg = jnp.concatenate([Jr * dt[:, None, None], Z, Z], axis=1)      # (T-1, 9, 3)
    Ba = jnp.concatenate([Z, R_prev * dt[:, None, None],
                          0.5 * R_prev * dt[:, None, None] ** 2], axis=1)
    Q = (jnp.einsum("kij,klj->kil", Bg * (g2 / dt_safe)[:, None, None], Bg)
         + jnp.einsum("kij,klj->kil", Ba * (a2 / dt_safe)[:, None, None], Ba))
    Q = Q.at[:, 6:, 6:].add(jnp.eye(3) * (i2 * dt)[:, None, None])
    Q = Q * m[:, None, None]

    def cov_compose(x, y):
        Ax, Qx = x
        Ay, Qy = y
        return Ay @ Ax, jnp.einsum("kij,kjl,kml->kim", Ay, Qx, Ay) + Qy

    _, Q_cum = jax.lax.associative_scan(cov_compose, (A, Q))
    cov = Q_cum[-1]

    total_dt = jnp.sum(dts)
    n = jnp.sum(step_mask.astype(jnp.int32))
    return Preintegrated(total_dt, dq, dv, dp, J_dR_bg, J_dv_bg, J_dv_ba,
                         J_dp_bg, J_dp_ba, cov, n)


def preintegrate_sequential(
    t: Array, gyro: Array, acc: Array, mask: Array,
    bias: ImuBias, params: ImuParams,
) -> Preintegrated:
    """Reference sequential formulation (kept for verification of the
    log-depth variant above).

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
