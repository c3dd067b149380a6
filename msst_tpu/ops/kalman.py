"""Small linear Kalman filters.

Rebuild of the constant-velocity target trackers:
``lidar_target_ws/lidar_target01/src/src/kalman_filter.cpp`` and
``lidar_target02/src/kalman_filter.cpp:21-81`` (4-state x, y, vx, vy;
Q = q*I, R = r*I).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class KalmanState(NamedTuple):
    x: Array    # (4,) [x, y, vx, vy]
    P: Array    # (4, 4)
    initialized: Array

    @staticmethod
    def create() -> "KalmanState":
        return KalmanState(jnp.zeros(4), jnp.eye(4), jnp.asarray(False))


def predict(s: KalmanState, dt: Array, q: float = 0.01) -> KalmanState:
    F = jnp.eye(4).at[0, 2].set(dt).at[1, 3].set(dt)
    x = F @ s.x
    P = F @ s.P @ F.T + q * jnp.eye(4)
    return s._replace(x=x, P=P)


def update(s: KalmanState, z: Array, r: float = 0.05) -> KalmanState:
    """Position measurement z (2,)."""
    H = jnp.zeros((2, 4)).at[0, 0].set(1.0).at[1, 1].set(1.0)

    def do_init():
        return KalmanState(jnp.concatenate([z, jnp.zeros(2)]), jnp.eye(4),
                           jnp.asarray(True))

    def do_update():
        y = z - H @ s.x
        S = H @ s.P @ H.T + r * jnp.eye(2)
        K = s.P @ H.T @ jnp.linalg.inv(S)
        x = s.x + K @ y
        P = (jnp.eye(4) - K @ H) @ s.P
        return KalmanState(x, 0.5 * (P + P.T), jnp.asarray(True))

    return jax.lax.cond(s.initialized, do_update, do_init)
