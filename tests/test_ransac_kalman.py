import jax
import jax.numpy as jnp
import numpy as np

from msst_tpu.ops import kalman, ransac

RNG = np.random.default_rng(10)


def test_ransac_plane_finds_dominant_plane():
    n_in, n_out = 400, 100
    xy = RNG.uniform(-5, 5, size=(n_in, 2))
    plane = np.column_stack([xy, 0.5 * xy[:, 0] - 0.2 * xy[:, 1] + 1.0])
    plane += RNG.normal(scale=0.01, size=plane.shape)
    outliers = RNG.uniform(-5, 5, size=(n_out, 3))
    pts = np.concatenate([plane, outliers]).astype(np.float32)
    fit = ransac.ransac_plane(jnp.asarray(pts), jnp.ones(len(pts), bool),
                              jax.random.PRNGKey(0), max_iters=300, threshold=0.05)
    assert bool(fit.ok)
    assert int(fit.inlier_count) > 350
    # normal proportional to (0.5, -0.2, -1)/|.|
    n_gt = np.array([0.5, -0.2, -1.0])
    n_gt /= np.linalg.norm(n_gt)
    got = np.asarray(fit.normal)
    assert abs(abs(np.dot(got, n_gt)) - 1) < 1e-3


def test_fit_plane_robust_outlier_resistance():
    g = np.arange(-3, 3, 0.1, dtype=np.float32)
    xx, yy = np.meshgrid(g, g)
    pts = np.stack([xx.ravel(), yy.ravel(), np.zeros(xx.size)], 1)
    pts += RNG.normal(scale=0.005, size=pts.shape).astype(np.float32)
    junk = RNG.uniform(-3, 3, size=(300, 3)).astype(np.float32)
    junk[:, 2] = RNG.uniform(0.5, 3, 300)
    allp = np.concatenate([pts, junk]).astype(np.float32)
    fit = ransac.fit_plane_robust(jnp.asarray(allp), jnp.ones(len(allp), bool),
                                  jax.random.PRNGKey(1))
    got = np.asarray(fit.normal)
    assert abs(abs(got[2]) - 1) < 1e-3
    assert float(fit.rms) < 0.02


def test_ransac_circle():
    theta = RNG.uniform(0, 2 * np.pi, 60)
    c_gt, r_gt = np.array([1.5, -0.7]), 0.25
    pts = c_gt + r_gt * np.column_stack([np.cos(theta), np.sin(theta)])
    pts += RNG.normal(scale=0.005, size=pts.shape)
    noise = RNG.uniform(-3, 3, size=(40, 2))
    xy = np.concatenate([pts, noise]).astype(np.float32)
    fit = ransac.ransac_circle(jnp.asarray(xy), jnp.ones(len(xy), bool),
                               jax.random.PRNGKey(2), threshold=0.02,
                               radius_range=(0.05, 0.5))
    assert bool(fit.ok)
    np.testing.assert_allclose(np.asarray(fit.center), c_gt, atol=0.02)
    assert abs(float(fit.radius) - r_gt) < 0.02


def test_algebraic_circle_fit():
    theta = RNG.uniform(0, 2 * np.pi, 30)
    c_gt, r_gt = np.array([-0.5, 2.0]), 0.15
    pts = (c_gt + r_gt * np.column_stack([np.cos(theta), np.sin(theta)])
           + RNG.normal(scale=0.002, size=(30, 2))).astype(np.float32)
    # padded with masked garbage
    xy = np.concatenate([pts, np.full((10, 2), 99.0, np.float32)])
    mask = np.concatenate([np.ones(30, bool), np.zeros(10, bool)])
    fit = ransac.fit_circle_algebraic(jnp.asarray(xy), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(fit.center), c_gt, atol=0.01)
    assert abs(float(fit.radius) - r_gt) < 0.01


def test_statistical_outlier_mask():
    dense = RNG.uniform(0, 1, size=(300, 3)).astype(np.float32)
    lonely = np.array([[5.0, 5.0, 5.0], [-4.0, 6.0, 2.0]], np.float32)
    pts = np.concatenate([dense, lonely])
    keep = np.asarray(ransac.statistical_outlier_mask(
        jnp.asarray(pts), jnp.ones(len(pts), bool), k=8, std_mul=1.5,
        cell_size=1.0))
    assert not keep[300] and not keep[301]
    assert keep[:300].mean() > 0.9


def test_kalman_tracks_constant_velocity():
    s = kalman.KalmanState.create()
    dt = 0.1
    true_v = np.array([1.0, -0.5])
    for k in range(30):
        z = true_v * (k * dt) + RNG.normal(scale=0.02, size=2)
        s = kalman.predict(s, jnp.asarray(dt))
        s = kalman.update(s, jnp.asarray(z.astype(np.float32)))
    x = np.asarray(s.kf.x) if hasattr(s, "kf") else np.asarray(s.x)
    np.testing.assert_allclose(x[2:], true_v, atol=0.15)
    np.testing.assert_allclose(x[:2], true_v * 29 * dt, atol=0.1)
