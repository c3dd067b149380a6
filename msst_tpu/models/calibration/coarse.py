"""Robust coarse registration: GNC-TLS over feature correspondences.

The TEASER++ role in Multi_LiCa (``Calibration.py:139-212``
compute_initial_transformation: FPFH -> mutual kNN -> GNC-TLS robust
registration).  TEASER's full invariant-measurement machinery is replaced by
graduated non-convexity on the correspondence residuals (Yang et al., GNC)
around a weighted-Kabsch core — the same estimator family TEASER uses for
its GNC-TLS backend, fully batched: every iteration is one weighted Kabsch
+ one vectorized weight update.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import linalg, se3

Array = jax.Array


class CoarseResult(NamedTuple):
    pose: se3.Pose
    inliers: Array      # (P,) final TLS weights in [0, 1]
    n_inliers: Array
    ok: Array


def gnc_tls_registration(
    src: Array, dst: Array, valid: Array,
    noise_bound: float = 0.1,
    max_outer: int = 20,
    gnc_factor: float = 1.4,
) -> CoarseResult:
    """Estimate (R, t) with src -> dst correspondences (P, 3) under heavy
    outliers via GNC-TLS.

    TLS cost: sum_i min(r_i^2, c^2).  GNC relaxes with mu: w_i =
    (mu c^2 / (r_i^2 + mu c^2))^2, mu increasing by gnc_factor each outer
    iteration (standard GNC-TLS weight schedule)."""
    c2 = noise_bound * noise_bound
    w0 = valid.astype(src.dtype)

    def solve(w):
        R, t = linalg.weighted_kabsch(src, dst, w)
        r2 = jnp.sum((src @ R.T + t - dst) ** 2, axis=1)
        return R, t, r2

    # initialize mu from the max residual of the unweighted solve (Yang et al.)
    R, t, r2 = solve(w0)
    r2max = jnp.max(jnp.where(valid, r2, 0.0))
    mu0 = jnp.maximum(c2 / jnp.maximum(2.0 * r2max - c2, 1e-9), 1e-6)

    def body(carry, _):
        mu, w = carry
        R, t, r2 = solve(w)
        new_w = (mu * c2 / (r2 + mu * c2)) ** 2 * w0
        return (mu * gnc_factor, new_w), None

    (mu, w), _ = jax.lax.scan(body, (mu0, w0), None, length=max_outer)
    R, t, r2 = solve(w)
    inl = (r2 < c2) & valid
    n = jnp.sum(inl)
    return CoarseResult(se3.Pose(se3.matrix_to_quat(R), t), w, n, n >= 3)
