"""Polynomial root finding + small numeric helpers.

Rebuild of the pieces of ``imu_calib/src/code_utils`` the toolkit actually
exposes (``Polynomial.cpp``: root finding used by the calibration fits; the
PnP/DLT solvers there are unused by the SLAM path and intentionally omitted).
Roots come from the companion-matrix eigenvalues — batched and jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def polyval(coeffs: Array, x: Array) -> Array:
    """Horner evaluation; coeffs ordered highest degree first."""
    out = jnp.zeros_like(x)
    for c in coeffs:
        out = out * x + c
    return out


def companion(coeffs: Array) -> Array:
    """Companion matrix of a monic-normalized polynomial (degree n)."""
    c = jnp.asarray(coeffs)
    c = c / c[0]
    n = c.shape[0] - 1
    M = jnp.zeros((n, n), c.dtype)
    M = M.at[1:, :-1].set(jnp.eye(n - 1, dtype=c.dtype))
    M = M.at[0, :].set(-c[1:])
    return M


def roots(coeffs) -> np.ndarray:
    """All (complex) roots via companion eigenvalues (host-side numpy: complex
    eig has no TPU lowering, and the calibration fits need it offline only)."""
    c = np.asarray(coeffs, np.float64)
    c = np.trim_zeros(c, "f")
    if len(c) <= 1:
        return np.zeros(0)
    return np.linalg.eigvals(np.asarray(companion(c)))


def real_roots(coeffs, tol: float = 1e-9) -> np.ndarray:
    r = roots(coeffs)
    return np.sort(r[np.abs(r.imag) < tol].real)
