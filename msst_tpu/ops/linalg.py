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
    return v / jnp.sqrt(n)


def sym3x3_eigh(A: Array) -> tuple[Array, Array]:
    """(eigvals ascending (..., 3), eigvecs (..., 3, 3) with vecs in rows).

    Closed-form, batched, and ROBUST to repeated eigenvalues: the returned
    rows are always an orthonormal frame.  With exactly-degenerate moments
    (all points of a voxel on a perfect line/plane — common now that the
    demeaned segment reductions are exact) the cross-product eigenvector
    for a REPEATED eigenvalue is numerically undefined; reconstructing a
    clamped covariance from a non-orthogonal frame made NDT inverses blow
    up to ~1e6.  The fix anchors on the eigenvector of the best-separated
    eigenvalue (always well-defined), orthogonalizes the other against it,
    and falls back to an arbitrary perpendicular when the spectrum is fully
    degenerate."""
    vals = sym3x3_eigvals(A)
    v_hi = _eigvec_for(A, vals[..., 2])
    v_lo = _eigvec_for(A, vals[..., 0])
    hi_reliable = ((vals[..., 2] - vals[..., 1])
                   >= (vals[..., 1] - vals[..., 0]))[..., None]
    anchor = jnp.where(hi_reliable, v_hi, v_lo)
    other = jnp.where(hi_reliable, v_lo, v_hi)
    # fully-degenerate spectra give a ~0 anchor: fall back to e_x
    an2 = jnp.sum(anchor * anchor, axis=-1, keepdims=True)
    e_x = jnp.zeros_like(anchor).at[..., 0].set(1.0)
    anchor = jnp.where(an2 < 1e-12, e_x, anchor / jnp.sqrt(
        jnp.maximum(an2, 1e-24)))
    # orthogonalize `other` against the anchor; if they are parallel or
    # `other` degenerated too, use any unit vector perpendicular to anchor
    w = other - jnp.sum(other * anchor, axis=-1, keepdims=True) * anchor
    wn2 = jnp.sum(w * w, axis=-1, keepdims=True)
    ax = jnp.argmin(jnp.abs(anchor), axis=-1)
    e = jax.nn.one_hot(ax, 3, dtype=A.dtype)
    w_fb = jnp.cross(anchor, e)
    w_fb = w_fb / jnp.maximum(
        jnp.linalg.norm(w_fb, axis=-1, keepdims=True), 1e-12)
    w = jnp.where(wn2 < 1e-12, w_fb,
                  w / jnp.sqrt(jnp.maximum(wn2, 1e-24)))
    v_hi = jnp.where(hi_reliable, anchor, w)
    v_lo = jnp.where(hi_reliable, w, anchor)
    v_mid = jnp.cross(v_hi, v_lo)
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
    H = ((src - mu_s) * w[:, None]).T @ (dst - mu_d)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 0.0], H.dtype)) + jnp.diag(
        jnp.array([0.0, 0.0, 1.0], H.dtype)
    ) * d
    R = Vt.T @ D @ U.T
    t = mu_d - R @ mu_s
    return R, t
