import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rs

from msst_tpu.models.calibration import coarse as coarse_mod
from msst_tpu.models.calibration import evaluation as ev
from msst_tpu.models.calibration.auto_calib import AutoCalibConfig, auto_calibrate
from msst_tpu.models.calibration.multi_lica import (
    MultiLicaConfig, MultiLidarCalibrator, calibrate_pair, calibrate_to_ground)
from msst_tpu.models.calibration.ndt_calib import NdtCalibConfig, NdtCalibrator
from msst_tpu.ops import se3

RNG = np.random.default_rng(12)


def scene(n=4000):
    """Structured scene: ground + two walls + pillars (world frame)."""
    g = RNG.uniform(-15, 15, size=(n // 2, 2))
    ground = np.column_stack([g, np.zeros(n // 2)])
    w = RNG.uniform(-15, 15, size=(n // 4, 2))
    wall1 = np.column_stack([w[:, 0], np.full(n // 4, 12.0), w[:, 1] % 4])
    w2 = RNG.uniform(-15, 15, size=(n // 4, 2))
    wall2 = np.column_stack([np.full(n // 4, 13.5), w2[:, 0], w2[:, 1] % 4])
    pts = np.concatenate([ground, wall1, wall2])
    k = 400
    px = RNG.uniform(-10, 10, size=(4, 2))
    pillars = np.concatenate([
        np.column_stack([np.full(k // 4, x), np.full(k // 4, y),
                         RNG.uniform(0, 4, k // 4)]) for x, y in px
    ])
    pts = np.concatenate([pts, pillars])
    return (pts + RNG.normal(scale=0.01, size=pts.shape)).astype(np.float32)


def view_from(pts, rpy, t):
    """Transform world points into a sensor frame with pose (rpy, t)."""
    R = Rs.from_euler("xyz", rpy).as_matrix().astype(np.float32)
    return ((pts - t) @ R).astype(np.float32)


def test_gnc_tls_robust_to_outliers():
    src = RNG.uniform(-5, 5, size=(300, 3)).astype(np.float32)
    R = Rs.from_euler("xyz", [0.05, -0.1, 0.4]).as_matrix().astype(np.float32)
    t = np.array([1.0, -0.5, 0.3], np.float32)
    dst = src @ R.T + t
    # 40% outlier correspondences
    n_out = 120
    dst[:n_out] = RNG.uniform(-5, 5, size=(n_out, 3))
    res = coarse_mod.gnc_tls_registration(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(300, bool), noise_bound=0.1)
    T = np.asarray(res.pose.to_matrix())
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=5e-3)
    assert int(res.n_inliers) >= 170


def test_calibrate_pair_recovers_extrinsic():
    world = scene()
    tgt = view_from(world, [0, 0, 0], np.array([0, 0, 1.5]))
    gt_rpy = [0.02, -0.03, 0.5]
    gt_t = np.array([2.0, 1.0, 1.4])
    src = view_from(world, gt_rpy, gt_t)
    # extrinsic src->tgt: T_tgt^-1 T_src... x_tgt = R_t^T(x_world - t_t) etc.
    T_t = np.eye(4); T_t[:3, :3] = Rs.from_euler("xyz", [0, 0, 0]).as_matrix(); T_t[:3, 3] = [0, 0, 1.5]
    T_s = np.eye(4); T_s[:3, :3] = Rs.from_euler("xyz", gt_rpy).as_matrix(); T_s[:3, 3] = gt_t
    T_gt = np.linalg.inv(T_t) @ T_s

    cfg = MultiLicaConfig(capacity=8192, knn_table=8192, max_corr=512)
    res = calibrate_pair(jnp.asarray(src), jnp.ones(len(src), bool),
                         jnp.asarray(tgt), jnp.ones(len(tgt), bool), cfg)
    T = np.asarray(res.pose.to_matrix())
    r_err = np.degrees(np.arccos(np.clip((np.trace(T[:3, :3].T @ T_gt[:3, :3]) - 1) / 2, -1, 1)))
    t_err = np.linalg.norm(T[:3, 3] - T_gt[:3, 3])
    assert r_err < 1.0, (r_err, t_err)
    assert t_err < 0.1, (r_err, t_err)
    assert float(res.fitness) > 0.7


def test_calibrate_to_ground():
    world = scene()
    rpy = [0.05, -0.08, 0.0]
    t = np.array([0, 0, 1.8])
    src = view_from(world, rpy, t)
    cfg = MultiLicaConfig(capacity=8192)
    pose = calibrate_to_ground(jnp.asarray(src), jnp.ones(len(src), bool), cfg,
                               jax.random.PRNGKey(0))
    # applying the pose must level the ground to z ~ 0
    moved = np.asarray(pose.apply(jnp.asarray(src)))
    ground = moved[np.abs(moved[:, 2]) < 1.0]  # points near the plane
    # robust: at least half the cloud is ground; its z spread should be tiny
    assert len(ground) > len(src) * 0.3
    assert abs(np.median(ground[:, 2])) < 0.05


def test_auto_calibrate():
    world = scene()
    master = view_from(world, [0, 0, 0], np.array([0, 0, 1.5]))
    gt_rpy = [0.01, 0.02, 0.8]
    gt_t = np.array([1.5, -1.0, 1.6])
    slave = view_from(world, gt_rpy, gt_t)
    T_m = np.eye(4); T_m[:3, 3] = [0, 0, 1.5]
    T_s = np.eye(4); T_s[:3, :3] = Rs.from_euler("xyz", gt_rpy).as_matrix(); T_s[:3, 3] = gt_t
    T_gt = np.linalg.inv(T_m) @ T_s

    cfg = AutoCalibConfig(knn_table=8192)
    # rough lever-arm initial guess (the reference reads initial_extrinsic.txt)
    init = se3.Pose.from_rpy_xyz(jnp.zeros(3), jnp.asarray(T_gt[:3, 3] +
                                                           np.array([0.1, -0.1, 0.05], np.float32)))
    res = auto_calibrate(jnp.asarray(master), jnp.ones(len(master), bool),
                         jnp.asarray(slave), jnp.ones(len(slave), bool),
                         cfg, jax.random.PRNGKey(1), init_pose=init)
    assert bool(res.ground_ok)
    T = np.asarray(res.pose.to_matrix())
    r_err = np.degrees(np.arccos(np.clip((np.trace(T[:3, :3].T @ T_gt[:3, :3]) - 1) / 2, -1, 1)))
    t_err = np.linalg.norm(T[:3, 3] - T_gt[:3, 3])
    assert r_err < 2.0, (r_err, t_err)
    assert t_err < 0.2, (r_err, t_err)


def test_ndt_calibrator_tracks_over_frames():
    world = scene()
    parent = view_from(world, [0, 0, 0], np.array([0, 0, 1.5]))
    gt_rpy = [0.0, 0.0, 0.1]
    gt_t = np.array([0.5, 0.3, 1.5])
    child = view_from(world, gt_rpy, gt_t)
    T_gt = np.linalg.inv(
        np.block([[np.eye(3), np.array([[0], [0], [1.5]])], [np.zeros((1, 3)), np.ones((1, 1))]])
    ) @ np.block([[Rs.from_euler("xyz", gt_rpy).as_matrix(), gt_t[:, None]],
                  [np.zeros((1, 3)), np.ones((1, 1))]])

    cal = NdtCalibrator(NdtCalibConfig(map_capacity=4096, child_capacity=8192))
    for _ in range(3):
        res = cal.process_pair(parent, child)
    T = np.asarray(cal.pose.to_matrix())
    t_err = np.linalg.norm(T[:3, 3] - T_gt[:3, 3])
    r_err = np.degrees(np.arccos(np.clip((np.trace(T[:3, :3].T @ T_gt[:3, :3]) - 1) / 2, -1, 1)))
    assert t_err < 0.15, (t_err, r_err)
    assert r_err < 1.5, (t_err, r_err)
    assert "static_transform_publisher" in cal.static_transform_command()


def test_evaluation_rmse():
    gt = [se3.Pose.from_rpy_xyz(jnp.asarray([0.0, 0, 0]), jnp.asarray([0.0, 0, 0])),
          se3.Pose.from_rpy_xyz(jnp.asarray([0.0, 0, 0.1]), jnp.asarray([1.0, 0, 0]))]
    est = [gt[0],
           se3.Pose.from_rpy_xyz(jnp.asarray([0.0, 0, 0.1]), jnp.asarray([1.1, 0, 0]))]
    out = ev.calibration_rmse(est, gt)
    np.testing.assert_allclose(out["translation_rmse_m"], 0.1 / np.sqrt(2), atol=1e-5)
    assert out["rotation_rmse_deg"] < 1e-3
    rel = ev.relative_calibration_rmse(est, gt)
    np.testing.assert_allclose(rel["rel_translation_rmse_m"], 0.1, atol=1e-5)
