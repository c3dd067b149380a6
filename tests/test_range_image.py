import jax.numpy as jnp
import numpy as np

from msst_tpu.ops import range_image as ri
from msst_tpu.ops import se3
from msst_tpu.ops.pointcloud import Cloud

RNG = np.random.default_rng(4)
N_SCAN, H = 4, 360


def ref_project(xyz, ring, n_scan, horizon, rmin, rmax):
    """NumPy oracle mirroring projectPointCloud (imageProjection.cpp:521-572)."""
    rng_img = np.full((n_scan, horizon), np.inf, np.float32)
    idx_img = np.full((n_scan, horizon), -1, np.int64)
    res = 360.0 / horizon
    for i, (p, r) in enumerate(zip(xyz, ring)):
        d = np.linalg.norm(p)
        if d < rmin or d > rmax:
            continue
        if r < 0 or r >= n_scan:
            continue
        ang = np.arctan2(p[0], p[1]) * 180 / np.pi
        col = int(-np.round((ang - 90.0) / res) + horizon / 2)
        if col >= horizon:
            col -= horizon
        if col < 0 or col >= horizon:
            continue
        if np.isfinite(rng_img[r, col]):
            continue
        rng_img[r, col] = d
        idx_img[r, col] = i
    return rng_img, idx_img


def test_project_matches_oracle():
    n = 2000
    xyz = RNG.normal(size=(n, 3)).astype(np.float32) * 10
    ring = RNG.integers(0, N_SCAN, size=n)
    cloud = Cloud.create(jnp.asarray(xyz))
    img = ri.project(cloud, jnp.asarray(ring), N_SCAN, H, 1.0, 50.0)
    exp_rng, exp_idx = ref_project(xyz, ring, N_SCAN, H, 1.0, 50.0)
    got = np.asarray(img.rng)
    np.testing.assert_allclose(got, exp_rng, rtol=1e-5)
    valid = np.asarray(img.valid)
    np.testing.assert_array_equal(valid, np.isfinite(exp_rng))
    got_xyz = np.asarray(img.xyz)
    for r in range(N_SCAN):
        for c in range(H):
            if exp_idx[r, c] >= 0:
                np.testing.assert_allclose(got_xyz[r, c], xyz[exp_idx[r, c]], atol=0)


def test_extract_rings_packs_by_column():
    n = 500
    xyz = RNG.normal(size=(n, 3)).astype(np.float32) * 10
    ring = RNG.integers(0, N_SCAN, size=n)
    cloud = Cloud.create(jnp.asarray(xyz))
    img = ri.project(cloud, jnp.asarray(ring), N_SCAN, H, 1.0, 50.0)
    scan = ri.extract_rings(img)
    valid = np.asarray(img.valid)
    for r in range(N_SCAN):
        cnt = int(np.asarray(scan.count)[r])
        assert cnt == valid[r].sum()
        cols = np.asarray(scan.col)[r, :cnt]
        assert (np.diff(cols) > 0).all()  # strictly increasing columns
        np.testing.assert_allclose(
            np.asarray(scan.rng)[r, :cnt], np.asarray(img.rng)[r][cols], atol=0
        )
        assert not np.isfinite(np.asarray(scan.rng)[r, cnt:]).any()


def test_imu_rotation_timeline_constant_gyro():
    T = 50
    t = np.linspace(0, 0.1, T).astype(np.float32)
    gyro = np.tile(np.array([[0.1, -0.2, 0.5]], np.float32), (T, 1))
    imu = ri.ImuWindow(jnp.asarray(t), jnp.asarray(gyro), jnp.zeros((T, 3)), jnp.ones(T, bool))
    times, rot = ri.imu_rotation_timeline(imu)
    expect = np.outer(t, [0.1, -0.2, 0.5])
    np.testing.assert_allclose(np.asarray(rot), expect, atol=1e-6)


def test_imu_rotation_timeline_masked_tail():
    T = 20
    t = np.linspace(0, 0.1, T).astype(np.float32)
    gyro = np.ones((T, 3), np.float32)
    mask = np.arange(T) < 10
    imu = ri.ImuWindow(jnp.asarray(t), jnp.asarray(gyro), jnp.zeros((T, 3)), jnp.asarray(mask))
    _, rot = ri.imu_rotation_timeline(imu)
    r = np.asarray(rot)
    np.testing.assert_allclose(r[10:], np.tile(r[9], (10, 1)), atol=1e-7)  # frozen after mask ends


def test_deskew_constant_rotation():
    # Points at time t have been rotated by R(t); deskewing returns them to
    # the scan-start frame.
    T = 40
    w = np.array([0.0, 0.0, 1.0], np.float32)  # 1 rad/s yaw
    t = np.linspace(0.0, 0.1, T).astype(np.float32)
    imu = ri.ImuWindow(
        jnp.asarray(t),
        jnp.asarray(np.tile(w, (T, 1))),
        jnp.zeros((T, 3)),
        jnp.ones(T, bool),
    )
    times, rots = ri.imu_rotation_timeline(imu)

    pts0 = RNG.normal(size=(100, 3)).astype(np.float32)
    pt_time = RNG.uniform(0.0, 0.1, size=100).astype(np.float32)
    # sensor rotated by +w t -> static world point appears rotated by R(-w t)
    appear = np.stack(
        [
            np.asarray(se3.quat_rotate(se3.so3_exp_quat(jnp.asarray(-w * ti)), jnp.asarray(p)))
            for p, ti in zip(pts0, pt_time)
        ]
    )
    out = ri.deskew(jnp.asarray(appear), jnp.asarray(pt_time), times, rots, jnp.asarray(T),
                    t_start=jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(out), pts0, atol=2e-3)


def test_deskew_grid_matches_per_point():
    """deskew_grid (one rotation per column, broadcast over rings) must equal
    the per-point path on the same grid: identical math, restructured."""
    T, S, H = 24, 6, 50
    t = np.linspace(0.0, 0.1, T).astype(np.float32)
    gyro = RNG.normal(size=(T, 3)).astype(np.float32) * 0.5
    imu = ri.ImuWindow(jnp.asarray(t), jnp.asarray(gyro), jnp.zeros((T, 3)),
                       jnp.ones(T, bool))
    times, rots = ri.imu_rotation_timeline(imu)
    xyz = RNG.normal(size=(S, H, 3)).astype(np.float32) * 5.0
    # columns spanning before/inside/past the IMU window (clamp paths)
    tcol = np.linspace(-0.01, 0.13, H).astype(np.float32)
    t0 = jnp.asarray(0.0)

    grid = ri.deskew_grid(jnp.asarray(xyz), jnp.asarray(tcol), times, rots,
                          jnp.asarray(T), t_start=t0)
    flat = ri.deskew(jnp.asarray(xyz.reshape(-1, 3)),
                     jnp.asarray(np.tile(tcol, S)), times, rots,
                     jnp.asarray(T), t_start=t0)
    np.testing.assert_allclose(np.asarray(grid).reshape(-1, 3),
                               np.asarray(flat), atol=1e-5)
    # disabled -> passthrough, like the per-point path
    off = ri.deskew_grid(jnp.asarray(xyz), jnp.asarray(tcol), times, rots,
                         jnp.asarray(T), t_start=t0, enabled=False)
    np.testing.assert_allclose(np.asarray(off), xyz, atol=0)


def test_deskew_disabled_passthrough():
    T = 10
    t = np.linspace(0, 0.1, T).astype(np.float32)
    imu = ri.ImuWindow(jnp.asarray(t), jnp.ones((T, 3)), jnp.zeros((T, 3)), jnp.ones(T, bool))
    times, rots = ri.imu_rotation_timeline(imu)
    pts = RNG.normal(size=(20, 3)).astype(np.float32)
    out = ri.deskew(jnp.asarray(pts), jnp.asarray(np.linspace(0, 0.1, 20, dtype=np.float32)),
                    times, rots, jnp.asarray(T), enabled=False)
    np.testing.assert_allclose(np.asarray(out), pts, atol=0)
