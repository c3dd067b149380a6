"""SO(3)/SE(3) geometry core.

Conventions (chosen to match the reference toolkit exactly; see
``liosam_ws/src/LIO-SAM/src/mapOptmization.cpp:287-341`` where poses are
``(roll, pitch, yaw, x, y, z)`` with ``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)``
— i.e. ``pcl::getTransformation`` / ``gtsam::Rot3::RzRyRx``):

* Euler angles are (roll, pitch, yaw) applied X-first: ``R = Rz @ Ry @ Rx``.
* Quaternions are stored ``(w, x, y, z)`` (Hamilton, active rotation).
* ``Pose`` is a pytree of a unit quaternion and a translation; batched ops
  broadcast over leading axes.

Everything here is pure ``jax.numpy`` — these are tiny ops that XLA fuses
into their callers; no Pallas needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

# ---------------------------------------------------------------------------
# Euler <-> rotation matrix
# ---------------------------------------------------------------------------


def rpy_to_matrix(rpy: Array) -> Array:
    """(..., 3) (roll, pitch, yaw) -> (..., 3, 3) with R = Rz(y) @ Ry(p) @ Rx(r)."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    # Row-major expansion of Rz @ Ry @ Rx.
    R = jnp.stack(
        [
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ],
        axis=-1,
    )
    return R.reshape(rpy.shape[:-1] + (3, 3))


def matrix_to_rpy(R: Array) -> Array:
    """(..., 3, 3) -> (..., 3) (roll, pitch, yaw); inverse of :func:`rpy_to_matrix`."""
    # pitch = asin(-R[2,0]); roll = atan2(R[2,1], R[2,2]); yaw = atan2(R[1,0], R[0,0])
    sp = -R[..., 2, 0]
    sp = jnp.clip(sp, -1.0, 1.0)
    pitch = jnp.arcsin(sp)
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_identity(shape=()) -> Array:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def quat_normalize(q: Array, eps: float = 1e-12) -> Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, eps)
    # Canonicalize sign (w >= 0) so log/slerp take the short path.
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_mul(a: Array, b: Array) -> Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: Array) -> Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: Array, v: Array) -> Array:
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def quat_to_matrix(q: Array) -> Array:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    R = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(R: Array) -> Array:
    """Shepperd's method, branch-free via jnp.where (safe for all traces)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def mk(w, x, y, z):
        return jnp.stack([w, x, y, z], axis=-1)

    # Four candidate decodes; pick the numerically best by largest pivot.
    s0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0
    q0 = mk(0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0)
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    q1 = mk((m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1)
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    q2 = mk((m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2)
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    q3 = mk((m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3)

    c0 = tr
    c1 = m00 - m11 - m22
    c2 = m11 - m00 - m22
    c3 = m22 - m00 - m11
    cmax = jnp.maximum(jnp.maximum(c0, c1), jnp.maximum(c2, c3))
    q = jnp.where((c0 == cmax)[..., None], q0,
        jnp.where((c1 == cmax)[..., None], q1,
        jnp.where((c2 == cmax)[..., None], q2, q3)))
    return quat_normalize(q)


def quat_from_rpy(rpy: Array) -> Array:
    r, p, y = rpy[..., 0] * 0.5, rpy[..., 1] * 0.5, rpy[..., 2] * 0.5
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return quat_normalize(
        jnp.stack(
            [
                cy * cp * cr + sy * sp * sr,
                cy * cp * sr - sy * sp * cr,
                cy * sp * cr + sy * cp * sr,
                sy * cp * cr - cy * sp * sr,
            ],
            axis=-1,
        )
    )


def quat_to_rpy(q: Array) -> Array:
    return matrix_to_rpy(quat_to_matrix(q))


# ---------------------------------------------------------------------------
# so(3)/se(3) exp & log
# ---------------------------------------------------------------------------


def so3_exp_quat(w: Array) -> Array:
    """Axis-angle (..., 3) -> unit quaternion, small-angle safe."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    half = 0.5 * theta
    small = theta2 < 1e-12
    # sin(t/2)/t with Taylor fallback 1/2 - t^2/48
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    wq = jnp.concatenate([jnp.cos(half), k * w], axis=-1)
    return quat_normalize(wq)


def so3_log(q: Array) -> Array:
    """Unit quaternion -> axis-angle (..., 3), small-angle safe."""
    q = quat_normalize(q)
    w, v = q[..., :1], q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(vn, w)
    small = vn < 1e-9
    k = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12), theta / jnp.maximum(vn, 1e-24))
    return k * v


def so3_exp_matrix(w: Array) -> Array:
    return quat_to_matrix(so3_exp_quat(w))


def skew(v: Array) -> Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    M = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return M.reshape(v.shape[:-1] + (3, 3))


def so3_left_jacobian(w: Array) -> Array:
    """Left Jacobian of SO(3) exp at w (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    W = skew(w)
    W2 = W @ W
    small = theta2 < 1e-10
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-24))
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, 1e-24))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


# ---------------------------------------------------------------------------
# Pose pytree
# ---------------------------------------------------------------------------


class Pose(NamedTuple):
    """Rigid transform: x_world = R(q) @ x_local + t.  Batched over leading dims."""

    q: Array  # (..., 4) wxyz unit quaternion
    t: Array  # (..., 3)

    @staticmethod
    def identity(shape=()) -> "Pose":
        return Pose(quat_identity(shape), jnp.zeros(shape + (3,)))

    @staticmethod
    def from_rpy_xyz(rpy: Array, xyz: Array) -> "Pose":
        return Pose(quat_from_rpy(rpy), xyz)

    @staticmethod
    def from_vec6(v: Array) -> "Pose":
        """v = (roll, pitch, yaw, x, y, z) — the reference's transform layout
        (``mapOptmization.cpp:313-317`` trans2gtsamPose)."""
        return Pose(quat_from_rpy(v[..., :3]), v[..., 3:])

    def to_vec6(self) -> Array:
        return jnp.concatenate([quat_to_rpy(self.q), self.t], axis=-1)

    @staticmethod
    def from_matrix(T: Array) -> "Pose":
        return Pose(matrix_to_quat(T[..., :3, :3]), T[..., :3, 3])

    def to_matrix(self) -> Array:
        R = quat_to_matrix(self.q)
        top = jnp.concatenate([R, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)

    def compose(self, other: "Pose") -> "Pose":
        """self ∘ other (apply `other` first, then `self`)."""
        return Pose(
            quat_normalize(quat_mul(self.q, other.q)),
            quat_rotate(self.q, other.t) + self.t,
        )

    def inverse(self) -> "Pose":
        qi = quat_conj(self.q)
        return Pose(qi, -quat_rotate(qi, self.t))

    def apply(self, pts: Array) -> Array:
        """Transform points (..., N, 3) (or (..., 3)) into the parent frame."""
        if pts.ndim == self.t.ndim:
            return quat_rotate(self.q, pts) + self.t
        return quat_rotate(self.q[..., None, :], pts) + self.t[..., None, :]

    def between(self, other: "Pose") -> "Pose":
        """self^-1 ∘ other — the relative pose, matching gtsam's between()."""
        return self.inverse().compose(other)


def pose_log(p: Pose) -> Array:
    """SE(3)-ish log used for factor residuals: (log R, t) 6-vector
    (rotation log + plain translation; matches a Pose3 ChartAtOrigin-style
    local coordinate that is adequate for small residuals)."""
    return jnp.concatenate([so3_log(p.q), p.t], axis=-1)


def pose_retract(p: Pose, delta: Array) -> Pose:
    """Right-perturbation retraction: (R, t) <- (R exp(dw), t + R dv)."""
    dq = so3_exp_quat(delta[..., :3])
    return Pose(quat_normalize(quat_mul(p.q, dq)), p.t + quat_rotate(p.q, delta[..., 3:]))


def slerp_angle(a: Array, b: Array, w: Array) -> Array:
    """Interpolate between two angles on the unit circle: (1-w)*a ⊕ w*b.

    Matches the roll/pitch slerp fusion in ``mapOptmization.cpp:1312-1342``
    (tf quaternion slerp of single-axis rotations)."""
    d = jnp.arctan2(jnp.sin(b - a), jnp.cos(b - a))
    return a + w * d


def quat_slerp(a: Array, b: Array, w) -> Array:
    """Quaternion slerp, shortest path, small-angle safe."""
    a = quat_normalize(a)
    b = quat_normalize(b)
    dot = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(dot < 0, -b, b)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    wa = jnp.where(small, 1.0 - w, jnp.sin((1.0 - w) * theta) / jnp.maximum(sin_theta, 1e-12))
    wb = jnp.where(small, w, jnp.sin(w * theta) / jnp.maximum(sin_theta, 1e-12))
    return quat_normalize(wa * a + wb * b)
