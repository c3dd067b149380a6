"""Small batched linear-algebra kernels used by the registration solvers.

The reference leans on cv::eigen / Eigen dense solvers for 3x3 and 6x6
problems (``mapOptmization.cpp:1019,1244``, ``surfOptimization`` QR solve);
on TPU we want closed forms that vmap over tens of thousands of points
without LAPACK-style iteration: trigonometric symmetric 3x3 eigendecomposition,
adjugate inverses, and an SVD-free weighted Kabsch built on it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def sym3x3_eigvals(A: Array) -> Array:
    """Eigenvalues of symmetric (..., 3, 3), ascending — trigonometric method
    (Smith's algorithm), branch-free and batched."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    # det(B)/2 with B = (A - qI)/p
    inv_p = 1.0 / p
    c00, c11, c22 = b00 * inv_p, b11 * inv_p, b22 * inv_p
    c01, c02, c12 = a01 * inv_p, a02 * inv_p, a12 * inv_p
    half_det = 0.5 * (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    half_det = jnp.clip(half_det, -1.0, 1.0)
    phi = jnp.arccos(half_det) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    # Degenerate (p ~ 0): all eigenvalues == q.
    tiny = p2 < 1e-24
    e_lo = jnp.where(tiny, q, e_lo)
    e_mid = jnp.where(tiny, q, e_mid)
    e_hi = jnp.where(tiny, q, e_hi)
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def _eigvec_for(A: Array, lam: Array, eps: float = 1e-12) -> Array:
    """Eigenvector of symmetric 3x3 for eigenvalue lam via the largest
    cross-product of rows of (A - lam I)."""
    return _eigvec_with_quality(A, lam, eps)[0]


def _eigvec_with_quality(A: Array, lam: Array, eps: float = 1e-12
                         ) -> tuple[Array, Array]:
    """(unit eigenvector, well-defined?) for eigenvalue lam.

    The vector is ill-defined when lam is (numerically) a repeated root: all
    row cross-products of B = A - lam I collapse toward zero.  `good` gates
    on the best cross-norm relative to ||B||_F^2 (scale-free)."""
    B = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
    n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
    n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
    v = jnp.where(n01 >= jnp.maximum(n02, n12), c01, jnp.where(n02 >= n12, c02, c12))
    n = jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps)
    s2 = jnp.sum(B * B, axis=(-2, -1))
    q = jnp.maximum(jnp.maximum(n01, n02), n12)[..., 0]
    good = q > 1e-10 * s2 * s2 + 1e-30
    return v / jnp.sqrt(n), good


def sym3x3_eigh(A: Array) -> tuple[Array, Array]:
    """(eigvals ascending (..., 3), eigvecs (..., 3, 3) with vecs in rows).

    Closed-form, batched, and ROBUST to repeated eigenvalues.  With
    exactly-degenerate moments (all points of a voxel on a perfect
    line/plane — common now that the demeaned segment reductions are exact)
    the cross-product eigenvector for a REPEATED eigenvalue is numerically
    undefined; reconstructing a clamped covariance from such a frame made
    NDT inverses blow up to ~1e6.  Ill-defined vectors (quality-gated in
    `_eigvec_with_quality`) are replaced by a unit perpendicular of the
    well-defined one (or a fixed frame when the spectrum is fully
    degenerate); healthy inputs reproduce the original closed form
    bit-for-bit, because downstream consumers (FPFH normals ->
    correspondences -> GNC basins) are sensitive to tiny systematic changes
    in healthy outputs."""
    vals = sym3x3_eigvals(A)
    v_hi, hi_ok = _eigvec_with_quality(A, vals[..., 2])
    v_lo, lo_ok = _eigvec_with_quality(A, vals[..., 0])

    def perp_of(g):
        # any unit vector perpendicular to unit-ish g
        ax = jnp.argmin(jnp.abs(g), axis=-1)
        e = jax.nn.one_hot(ax, 3, dtype=A.dtype)
        w = jnp.cross(g, e)
        return w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True),
                               1e-12)

    # Repair ONLY ill-defined vectors (quality-gated), so well-conditioned
    # inputs reproduce the original closed form bit-for-bit: downstream
    # consumers (FPFH normals -> correspondence -> GNC basins) are sensitive
    # to even tiny systematic changes in healthy outputs.
    e_x = jnp.zeros_like(v_hi).at[..., 0].set(1.0)
    e_z = jnp.zeros_like(v_hi).at[..., 2].set(1.0)
    both_bad = (~hi_ok & ~lo_ok)[..., None]
    v_hi = jnp.where(both_bad, e_z,
                     jnp.where(hi_ok[..., None], v_hi, perp_of(v_lo)))
    v_lo = jnp.where(both_bad, e_x,
                     jnp.where(lo_ok[..., None], v_lo, perp_of(v_hi)))
    v_mid = jnp.cross(v_hi, v_lo)
    n = jnp.maximum(jnp.linalg.norm(v_mid, axis=-1, keepdims=True), 1e-12)
    v_mid = v_mid / n
    vecs = jnp.stack([v_lo, v_mid, v_hi], axis=-2)
    return vals, vecs


def inv3x3(A: Array, eps: float = 1e-12) -> Array:
    """Batched adjugate inverse of (..., 3, 3)."""
    a = A
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c02 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c10 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c20 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c21 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c10 + a[..., 0, 2] * c20
    det = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + (det == 0) * eps, det)
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def solve3x3(A: Array, b: Array) -> Array:
    """Batched solve for (..., 3, 3) @ x = (..., 3)."""
    return jnp.einsum("...ij,...j->...i", inv3x3(A), b)


def solve_psd(A: Array, b: Array, damping: float = 0.0) -> Array:
    """Solve small dense PSD systems (e.g. the 6x6 normal equations of
    ``LMOptimization``) via Cholesky with optional LM damping."""
    n = A.shape[-1]
    A = A + damping * jnp.eye(n, dtype=A.dtype)
    L = jnp.linalg.cholesky(A)
    y = jax.scipy.linalg.solve_triangular(L, b[..., None], lower=True)
    x = jax.scipy.linalg.solve_triangular(jnp.swapaxes(L, -1, -2), y, lower=False)
    return x[..., 0]


def weighted_kabsch(
    src: Array, dst: Array, w: Array
) -> tuple[Array, Array]:
    """Best-fit rigid transform (R, t) minimizing sum w |R src + t - dst|^2.

    src, dst: (N, 3); w: (N,) nonneg weights.  SVD-free: builds the 3x3
    cross-covariance and extracts rotation via the symmetric eigensolver on
    H^T H plus sign correction (classic Kabsch via polar decomposition).
    Falls back to jnp.linalg.svd for robustness — 3x3 SVD is cheap and XLA
    lowers it fine; keep this entry point so a Pallas variant can replace it.
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    # full f32 accumulation: the TPU's default matmul precision leaves
    # ~bf16 noise in this (3,N)@(N,3) cross-covariance, which jitters the
    # per-iteration ICP update above the 1e-6 transform epsilon forever
    # (the output is 3x3 — HIGHEST costs nothing measurable)
    H = jnp.matmul(((src - mu_s) * w[:, None]).T, dst - mu_d,
                   precision=jax.lax.Precision.HIGHEST)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 0.0], H.dtype)) + jnp.diag(
        jnp.array([0.0, 0.0, 1.0], H.dtype)
    ) * d
    R = Vt.T @ D @ U.T
    t = mu_d - R @ mu_s
    return R, t
