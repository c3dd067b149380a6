import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rs

from msst_tpu.ops import se3

RNG = np.random.default_rng(0)


def rand_rpy(n=64):
    # Keep pitch inside (-pi/2, pi/2) so Euler extraction is unique.
    rpy = RNG.uniform(-np.pi, np.pi, size=(n, 3)).astype(np.float32)
    rpy[:, 1] = RNG.uniform(-1.4, 1.4, size=n)
    return rpy


def scipy_matrix(rpy):
    # Our convention R = Rz(yaw) Ry(pitch) Rx(roll) == scipy extrinsic 'xyz'.
    return Rs.from_euler("xyz", rpy).as_matrix().astype(np.float32)


def test_rpy_matrix_roundtrip_matches_scipy():
    rpy = rand_rpy()
    R = np.asarray(se3.rpy_to_matrix(jnp.asarray(rpy)))
    np.testing.assert_allclose(R, scipy_matrix(rpy), atol=1e-5)
    back = np.asarray(se3.matrix_to_rpy(jnp.asarray(R)))
    np.testing.assert_allclose(back, rpy, atol=1e-4)


def test_quat_matches_scipy():
    rpy = rand_rpy()
    q = np.asarray(se3.quat_from_rpy(jnp.asarray(rpy)))
    # scipy quats are xyzw
    q_s = Rs.from_euler("xyz", rpy).as_quat()
    q_s = np.concatenate([q_s[:, 3:], q_s[:, :3]], axis=1)
    sign = np.sign(q_s[:, :1]) * np.sign(q[:, :1])
    np.testing.assert_allclose(q, sign * q_s, atol=1e-5)

    R = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(R, scipy_matrix(rpy), atol=1e-5)

    q2 = np.asarray(se3.matrix_to_quat(jnp.asarray(R)))
    dot = np.abs(np.sum(q2 * q, axis=1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_rotate_equals_matrix():
    rpy = rand_rpy()
    q = se3.quat_from_rpy(jnp.asarray(rpy))
    v = jnp.asarray(RNG.normal(size=(64, 3)).astype(np.float32))
    out_q = np.asarray(se3.quat_rotate(q, v))
    out_m = np.einsum("nij,nj->ni", np.asarray(se3.rpy_to_matrix(jnp.asarray(rpy))), np.asarray(v))
    np.testing.assert_allclose(out_q, out_m, atol=1e-5)


def test_exp_log_roundtrip():
    w = RNG.normal(size=(64, 3)).astype(np.float32)
    w = np.concatenate([w, np.zeros((2, 3), np.float32), 1e-6 * np.ones((1, 3), np.float32)])
    q = se3.so3_exp_quat(jnp.asarray(w))
    w2 = np.asarray(se3.so3_log(q))
    # log returns the wrapped equivalent; compare rotations, not raw vectors
    R1 = Rs.from_rotvec(w).as_matrix()
    R2 = Rs.from_rotvec(w2).as_matrix()
    np.testing.assert_allclose(R1, R2, atol=1e-4)


def test_so3_exp_matches_scipy():
    w = RNG.normal(size=(32, 3)).astype(np.float32)
    R = np.asarray(se3.so3_exp_matrix(jnp.asarray(w)))
    np.testing.assert_allclose(R, Rs.from_rotvec(w).as_matrix(), atol=1e-5)


def test_pose_compose_inverse_apply():
    rpy = rand_rpy(8)
    t = RNG.normal(size=(8, 3)).astype(np.float32)
    p = se3.Pose.from_rpy_xyz(jnp.asarray(rpy), jnp.asarray(t))
    ident = p.compose(p.inverse())
    np.testing.assert_allclose(np.asarray(ident.t), 0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(ident.q)[:, 0]), 1, atol=1e-5)

    pts = jnp.asarray(RNG.normal(size=(8, 16, 3)).astype(np.float32))
    out = np.asarray(p.apply(pts))
    T = np.asarray(p.to_matrix())
    expect = np.einsum("nij,nkj->nki", T[:, :3, :3], np.asarray(pts)) + T[:, None, :3, 3]
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_pose_vec6_roundtrip_matches_reference_layout():
    # Reference layout: (roll, pitch, yaw, x, y, z), R = RzRyRx.
    v = np.concatenate([rand_rpy(16), RNG.normal(size=(16, 3)).astype(np.float32)], axis=1)
    p = se3.Pose.from_vec6(jnp.asarray(v))
    v2 = np.asarray(p.to_vec6())
    np.testing.assert_allclose(v2, v, atol=1e-4)


def test_pose_between():
    a = se3.Pose.from_rpy_xyz(jnp.asarray(rand_rpy(4)), jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32)))
    b = se3.Pose.from_rpy_xyz(jnp.asarray(rand_rpy(4)), jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32)))
    d = a.between(b)
    b2 = a.compose(d)
    np.testing.assert_allclose(np.asarray(b2.t), np.asarray(b.t), atol=1e-4)
    dot = np.abs(np.sum(np.asarray(b2.q) * np.asarray(b.q), axis=1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_retract_and_log_inverse():
    p = se3.Pose.from_rpy_xyz(jnp.asarray(rand_rpy(4)), jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32)))
    delta = jnp.asarray(0.1 * RNG.normal(size=(4, 6)).astype(np.float32))
    p2 = se3.pose_retract(p, delta)
    d = p.between(p2)
    local = np.concatenate(
        [np.asarray(se3.so3_log(d.q)), np.asarray(se3.quat_rotate(se3.quat_conj(d.q), d.t) if False else d.t)], axis=1
    )
    # rotation part of retraction delta should match log of between
    np.testing.assert_allclose(local[:, :3], np.asarray(delta)[:, :3], atol=1e-3)


def test_slerp_angle():
    a = jnp.asarray([0.0, 3.0, -3.0], dtype=jnp.float32)
    b = jnp.asarray([0.2, -3.0, 3.0], dtype=jnp.float32)
    out = np.asarray(se3.slerp_angle(a, b, 0.5))
    assert abs(out[0] - 0.1) < 1e-5
    # wraps through pi, not through zero
    assert abs(abs(out[1]) - np.pi) < 0.15
    assert abs(abs(out[2]) - np.pi) < 0.15


def test_quat_slerp_matches_scipy():
    from scipy.spatial.transform import Slerp
    rpy = rand_rpy(2)
    r = Rs.from_euler("xyz", rpy)
    s = Slerp([0.0, 1.0], r)
    for w in [0.0, 0.25, 0.7, 1.0]:
        expect = s([w]).as_matrix()[0]
        q = se3.quat_slerp(
            se3.quat_from_rpy(jnp.asarray(rpy[0])), se3.quat_from_rpy(jnp.asarray(rpy[1])), w
        )
        got = np.asarray(se3.quat_to_matrix(q))
        np.testing.assert_allclose(got, expect, atol=1e-4)


def test_jacobian_left_so3():
    # J_l(w) satisfies exp(w + dw) ~ exp(J_l dw) exp(w)
    w = np.array([0.3, -0.2, 0.5], np.float32)
    dw = np.array([1e-4, -2e-4, 1.5e-4], np.float32)
    Jl = np.asarray(se3.so3_left_jacobian(jnp.asarray(w)))
    R1 = Rs.from_rotvec(w + dw).as_matrix()
    R2 = Rs.from_rotvec(Jl @ dw).as_matrix() @ Rs.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R1, R2, atol=1e-7)


def test_jit_compatible():
    f = jax.jit(lambda v: se3.Pose.from_vec6(v).inverse().to_vec6())
    v = jnp.asarray(np.concatenate([rand_rpy(4), RNG.normal(size=(4, 3)).astype(np.float32)], axis=1))
    out = f(v)
    assert out.shape == (4, 6)
