import jax.numpy as jnp
import numpy as np

from msst_tpu.ops import linalg

RNG = np.random.default_rng(6)


def rand_sym(n=128):
    A = RNG.normal(size=(n, 3, 3)).astype(np.float32)
    return (A + A.transpose(0, 2, 1)) / 2


def test_sym3x3_eigvals_match_numpy():
    A = rand_sym()
    vals = np.asarray(linalg.sym3x3_eigvals(jnp.asarray(A)))
    expect = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(vals, expect, atol=2e-5)


def test_sym3x3_eigh_reconstruction():
    A = rand_sym(64)
    vals, vecs = linalg.sym3x3_eigh(jnp.asarray(A))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    # vecs rows are eigenvectors: A v = lambda v
    for i in range(64):
        for j in range(3):
            np.testing.assert_allclose(
                A[i] @ vecs[i, j], vals[i, j] * vecs[i, j], atol=5e-4
            )
    # orthonormal
    eye = np.einsum("nij,nkj->nik", vecs, vecs)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-4)


def test_sym3x3_eigh_isotropic():
    A = np.tile(2.5 * np.eye(3, dtype=np.float32), (4, 1, 1))
    vals, vecs = linalg.sym3x3_eigh(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(vals), 2.5, atol=1e-6)
    assert np.isfinite(np.asarray(vecs)).all()


def test_inv3x3():
    A = RNG.normal(size=(32, 3, 3)).astype(np.float32) + 3 * np.eye(3, dtype=np.float32)
    Ainv = np.asarray(linalg.inv3x3(jnp.asarray(A)))
    np.testing.assert_allclose(
        np.einsum("nij,njk->nik", A, Ainv), np.tile(np.eye(3), (32, 1, 1)), atol=1e-3
    )


def test_solve_psd():
    J = RNG.normal(size=(100, 6)).astype(np.float32)
    A = J.T @ J + 0.1 * np.eye(6, dtype=np.float32)
    b = RNG.normal(size=6).astype(np.float32)
    x = np.asarray(linalg.solve_psd(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(A @ x, b, atol=1e-3)


def test_weighted_kabsch_exact_recovery():
    from scipy.spatial.transform import Rotation as Rs
    src = RNG.normal(size=(200, 3)).astype(np.float32)
    R_gt = Rs.from_euler("xyz", [0.3, -0.2, 0.8]).as_matrix().astype(np.float32)
    t_gt = np.array([1.0, -2.0, 0.5], np.float32)
    dst = src @ R_gt.T + t_gt
    w = np.ones(200, np.float32)
    # zero-weight outliers must be ignored
    dst[:10] += 100.0
    w[:10] = 0.0
    R, t = linalg.weighted_kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-4)
