import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rs

from msst_tpu.ops import imu, se3

RNG = np.random.default_rng(8)
P = imu.ImuParams()


def simulate(T, dt, w_body, a_world_fn, q0=None):
    """Simulate IMU measurements for a trajectory with constant body rate
    w_body and world-frame acceleration a_world_fn(t).  Returns
    (t, gyro, acc_measured, states)."""
    g = np.array([0, 0, -P.gravity])
    q = np.array([1.0, 0, 0, 0]) if q0 is None else q0
    p = np.zeros(3)
    v = np.zeros(3)
    ts, gyrs, accs, states = [], [], [], []
    for k in range(T):
        t = k * dt
        R = Rs.from_quat(np.roll(q, -1)).as_matrix()  # wxyz -> xyzw
        a_w = a_world_fn(t)
        # accelerometer measures specific force in body frame
        f_b = R.T @ (a_w - g)
        ts.append(t)
        gyrs.append(w_body.copy())
        accs.append(f_b)
        states.append((q.copy(), p.copy(), v.copy()))
        # integrate ground truth (midpoint-free forward euler, same scheme)
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        dq = Rs.from_rotvec(w_body * dt).as_quat()  # xyzw
        q_s = Rs.from_quat(np.roll(q, -1)) * Rs.from_quat(dq)
        q = np.roll(q_s.as_quat(), 1)
    return (np.array(ts, np.float32), np.array(gyrs, np.float32),
            np.array(accs, np.float32), states)


def test_preintegrate_static():
    T, dt = 100, 0.005
    t = np.arange(T, dtype=np.float32) * dt
    gyro = np.zeros((T, 3), np.float32)
    acc = np.tile(np.array([0, 0, P.gravity], np.float32), (T, 1))
    pre = imu.preintegrate(jnp.asarray(t), jnp.asarray(gyro), jnp.asarray(acc),
                           jnp.ones(T, bool), imu.ImuBias.zero(), P)
    np.testing.assert_allclose(float(pre.dt), (T - 1) * dt, atol=1e-5)
    # dv = integral of R (a) = g_mag * t upward
    np.testing.assert_allclose(np.asarray(pre.dv), [0, 0, P.gravity * pre.dt], atol=1e-3)
    state = imu.NavState.identity()
    out = imu.predict(state, pre, imu.ImuBias.zero(), imu.ImuBias.zero(), P)
    # stationary: gravity cancels
    np.testing.assert_allclose(np.asarray(out.v), 0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.p), 0, atol=1e-4)


def test_preintegrate_rotation_and_accel():
    T, dt = 200, 0.0025
    w = np.array([0.2, -0.1, 0.5], np.float32)
    a_w = np.array([1.0, 0.5, -0.2])
    t, gyro, acc, states = simulate(T, dt, w, lambda _: a_w)
    pre = imu.preintegrate(jnp.asarray(t), jnp.asarray(gyro), jnp.asarray(acc),
                           jnp.ones(T, bool), imu.ImuBias.zero(), P)
    out = imu.predict(imu.NavState.identity(), pre, imu.ImuBias.zero(),
                      imu.ImuBias.zero(), P)
    q_gt, p_gt, v_gt = states[-1]
    np.testing.assert_allclose(np.asarray(out.v), v_gt, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.p), p_gt, atol=2e-3)
    dot = abs(np.dot(np.asarray(out.q), q_gt))
    assert dot > 1 - 1e-5


def test_bias_jacobian_first_order():
    T, dt = 100, 0.005
    w = np.array([0.3, 0.1, -0.2], np.float32)
    t, gyro, acc, _ = simulate(T, dt, w, lambda _: np.array([0.5, -1.0, 0.3]))
    b0 = imu.ImuBias.zero()
    db = 0.01
    bg = imu.ImuBias(jnp.asarray([db, 0, 0]), jnp.zeros(3))

    pre0 = imu.preintegrate(jnp.asarray(t), jnp.asarray(gyro), jnp.asarray(acc),
                            jnp.ones(T, bool), b0, P)
    pre1 = imu.preintegrate(jnp.asarray(t), jnp.asarray(gyro), jnp.asarray(acc),
                            jnp.ones(T, bool), bg, P)
    # predicted correction via Jacobian vs true re-integration
    corr_dv = np.asarray(pre0.J_dv_bg) @ np.array([db, 0, 0])
    np.testing.assert_allclose(np.asarray(pre1.dv) - np.asarray(pre0.dv), corr_dv, atol=1e-4)
    corr_dp = np.asarray(pre0.J_dp_bg) @ np.array([db, 0, 0])
    np.testing.assert_allclose(np.asarray(pre1.dp) - np.asarray(pre0.dp), corr_dp, atol=1e-4)
    # rotation correction
    dq_corr = se3.quat_mul(pre0.dq, se3.so3_exp_quat(jnp.asarray(pre0.J_dR_bg) @ jnp.asarray([db, 0, 0.0])))
    dot = abs(float(jnp.sum(dq_corr * pre1.dq)))
    assert dot > 1 - 1e-6


def test_preintegrate_mask():
    T, dt = 100, 0.005
    t = np.arange(T, dtype=np.float32) * dt
    gyro = np.tile(np.array([0, 0, 1.0], np.float32), (T, 1))
    acc = np.tile(np.array([0, 0, P.gravity], np.float32), (T, 1))
    mask = np.arange(T) < 50
    pre = imu.preintegrate(jnp.asarray(t), jnp.asarray(gyro), jnp.asarray(acc),
                           jnp.asarray(mask), imu.ImuBias.zero(), P)
    np.testing.assert_allclose(float(pre.dt), 49 * dt, atol=1e-6)
    rot = np.asarray(se3.so3_log(pre.dq))
    np.testing.assert_allclose(rot, [0, 0, 49 * dt], atol=1e-4)


def test_covariance_grows():
    T, dt = 100, 0.005
    t = np.arange(T, dtype=np.float32) * dt
    gyro = np.zeros((T, 3), np.float32)
    acc = np.tile(np.array([0, 0, P.gravity], np.float32), (T, 1))
    pre = imu.preintegrate(jnp.asarray(t), jnp.asarray(gyro), jnp.asarray(acc),
                           jnp.ones(T, bool), imu.ImuBias.zero(), P)
    cov = np.asarray(pre.cov)
    assert (np.diag(cov) >= 0).all()
    assert np.trace(cov) > 0
    np.testing.assert_allclose(cov, cov.T, atol=1e-12)


def test_failure_detection():
    ok = imu.NavState.identity()
    assert not bool(imu.failure_detected(ok, imu.ImuBias.zero()))
    fast = ok._replace(v=jnp.asarray([40.0, 0, 0]))
    assert bool(imu.failure_detected(fast, imu.ImuBias.zero()))
    biased = imu.ImuBias(jnp.asarray([1.5, 0, 0]), jnp.zeros(3))
    assert bool(imu.failure_detected(ok, biased))


def test_allan_variance_white_noise():
    # white noise: avar(tau) = N^2 / tau
    n = 20000
    dt = 0.01
    sigma = 0.02  # rate white noise per sqrt(Hz): std per sample = sigma/sqrt(dt)
    samples = (RNG.normal(size=n) * sigma / np.sqrt(dt)).astype(np.float32)
    ms = imu.log_spaced_clusters(n, 40)
    av = np.asarray(imu.allan_variance(jnp.asarray(samples), dt, ms))
    taus = np.asarray(ms) * dt
    expect = sigma**2 / taus
    mid = (taus > 0.05) & (taus < 2)  # avoid high-variance large-tau estimates
    np.testing.assert_allclose(av[mid], expect[mid], rtol=0.4)

    fit = imu.fit_allan(jnp.asarray(taus.astype(np.float32)), jnp.asarray(av))
    assert abs(float(fit.white_noise) - sigma) / sigma < 0.2


def test_parallel_preintegration_matches_sequential():
    T, dt = 150, 1 / 300
    w = np.array([0.3, -0.2, 0.8], np.float32)
    t, gyro, acc, _ = simulate(T, dt, w, lambda tt: np.array([0.5, -1.0, 0.3]) * np.sin(tt))
    mask = np.arange(T) < 120  # masked tail
    bias = imu.ImuBias(jnp.asarray([0.01, -0.02, 0.005]), jnp.asarray([0.05, 0.0, -0.03]))
    a = imu.preintegrate(jnp.asarray(t), jnp.asarray(gyro), jnp.asarray(acc),
                         jnp.asarray(mask), bias, P)
    b = imu.preintegrate_sequential(jnp.asarray(t), jnp.asarray(gyro), jnp.asarray(acc),
                                    jnp.asarray(mask), bias, P)
    np.testing.assert_allclose(float(a.dt), float(b.dt), atol=1e-6)
    assert abs(float(jnp.sum(a.dq * b.dq))) > 1 - 1e-6
    np.testing.assert_allclose(np.asarray(a.dv), np.asarray(b.dv), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.dp), np.asarray(b.dp), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.J_dR_bg), np.asarray(b.J_dR_bg), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.J_dv_bg), np.asarray(b.J_dv_bg), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.J_dv_ba), np.asarray(b.J_dv_ba), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.J_dp_bg), np.asarray(b.J_dp_bg), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.J_dp_ba), np.asarray(b.J_dp_ba), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.cov), np.asarray(b.cov), rtol=1e-3, atol=1e-10)
    assert int(a.n_used) == int(b.n_used)
