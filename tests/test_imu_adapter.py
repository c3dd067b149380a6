"""IMU->lidar extrinsic conversion (``imuConverter``, utility.h:252-282).

Oracle tests against scipy plus the end-to-end criterion from SURVEY §7's
"convention traps": with the IMU mounted 90 deg off the lidar, the pipeline
fed through the adapter must produce the same trajectory as the
IMU-in-lidar-frame run.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from msst_tpu.utils.imu_adapter import (
    ImuExtrinsics, convert_imu, convert_scan_dict, load_kitti_imu_extrinsics)


def _rand_rot(seed):
    return R.random(rng=np.random.default_rng(seed)).as_matrix()


def test_vector_rotation_oracle():
    rng = np.random.default_rng(0)
    ext_rot = _rand_rot(1)
    ext = ImuExtrinsics.create(ext_rot)
    gyro_b = rng.normal(size=(40, 3))
    acc_b = rng.normal(size=(40, 3))
    gyro_l, acc_l, rpy_l = convert_imu(ext, gyro_b, acc_b)
    np.testing.assert_allclose(gyro_l, gyro_b @ ext_rot.T, rtol=1e-5)
    np.testing.assert_allclose(acc_l, acc_b @ ext_rot.T, rtol=1e-5)
    assert rpy_l is None


def test_attitude_composition_oracle():
    """R_wl = R_wb @ ext_rpy^-1 with ext_rpy DIFFERENT from ext_rot (the
    dual-extrinsic Microstrain case, utility.h:108-115)."""
    rng = np.random.default_rng(2)
    ext = ImuExtrinsics.create(_rand_rot(3), ext_rpy=_rand_rot(4))
    rpy_b = rng.uniform(-1.0, 1.0, size=(10, 3))
    _, _, rpy_l = convert_imu(ext, np.zeros((10, 3)), np.zeros((10, 3)),
                              rpy=rpy_b)
    R_wb = R.from_euler("xyz", rpy_b).as_matrix()
    R_wl = R.from_euler("xyz", rpy_l.astype(np.float64)).as_matrix()
    np.testing.assert_allclose(
        R_wl, R_wb @ np.linalg.inv(ext.ext_rpy), atol=1e-5)


def test_quaternion_input_matches_rpy_input():
    ext = ImuExtrinsics.create(_rand_rot(5))
    rpy_b = np.array([[0.2, -0.1, 1.3]])
    q_b = R.from_euler("xyz", rpy_b).as_quat()
    _, _, out_rpy = convert_imu(ext, np.zeros((1, 3)), np.zeros((1, 3)),
                                rpy=rpy_b)
    _, _, out_q = convert_imu(ext, np.zeros((1, 3)), np.zeros((1, 3)),
                              quat_wb=q_b)
    np.testing.assert_allclose(out_rpy, out_q, atol=1e-6)


def test_degenerate_quaternion_raises():
    """The reference aborts on zero-norm orientation (9-axis IMU check,
    utility.h:276-280)."""
    ext = ImuExtrinsics.create(_rand_rot(6))
    with pytest.raises(ValueError, match="9-axis"):
        convert_imu(ext, np.zeros((1, 3)), np.zeros((1, 3)),
                    quat_wb=np.zeros((1, 4)))


def test_convert_scan_dict_identity_passthrough():
    scan = {"imu_gyro": np.ones((4, 3)), "imu_acc": np.ones((4, 3))}
    assert convert_scan_dict(ImuExtrinsics.identity(), scan) is scan


def test_kitti_calib_load(tmp_path):
    Rm = _rand_rot(7)
    t = np.array([0.1, -0.2, 0.3])
    f = tmp_path / "calib_imu_to_velo.txt"
    f.write_text(
        "calib_time: 25-May-2012 16:47:16\n"
        "R: " + " ".join(f"{v:.9e}" for v in Rm.ravel()) + "\n"
        "T: " + " ".join(f"{v:.9e}" for v in t) + "\n")
    ext = load_kitti_imu_extrinsics(str(f))
    np.testing.assert_allclose(ext.ext_rot, Rm, atol=1e-8)
    np.testing.assert_allclose(ext.ext_rpy, Rm, atol=1e-8)
    np.testing.assert_allclose(ext.ext_trans, -Rm.T @ t, atol=1e-8)


# ---------------------------------------------------------------------------
# end-to-end: 90 deg mount through the pipeline
# ---------------------------------------------------------------------------


def _to_imu_frame(scan, ext: ImuExtrinsics):
    """Inverse of convert_imu: re-express lidar-frame sim IMU data as if
    measured by an IMU mounted with extrinsics `ext`."""
    out = dict(scan)
    out["imu_gyro"] = (scan["imu_gyro"] @ ext.ext_rot).astype(np.float32)
    out["imu_acc"] = (scan["imu_acc"] @ ext.ext_rot).astype(np.float32)
    R_wl = R.from_euler("xyz", scan["imu_rpy"].astype(np.float64))
    R_wb = R_wl * R.from_matrix(ext.ext_rpy)
    out["imu_rpy"] = R_wb.as_euler("xyz").astype(np.float32)
    return out


def test_pipeline_converges_with_90deg_mount():
    from msst_tpu.models.liosam import LioSam
    from msst_tpu.models.liosam.params import tiny_params

    from msst_tpu.utils import sim

    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=10.0, speed=2.0)
    data = sim.make_dataset(world, traj, n_scans=20, scan_dt=0.1,
                            n_scan=16, horizon=360, seed=11)
    # IMU mounted yaw-90, roll-180 relative to the lidar
    ext = ImuExtrinsics.create(
        R.from_euler("zx", [np.pi / 2, np.pi]).as_matrix())
    mounted = [_to_imu_frame(s, ext) for s in data]

    def run(scans, extrinsics):
        lio = LioSam(tiny_params(loop_closure_enabled=False))
        for s in scans:
            s = convert_scan_dict(extrinsics, s)
            lio.process_scan(
                s["xyz"], s["ring"], s["time_rel"], s["scan_start"],
                imu_t=s["imu_t"], imu_gyro=s["imu_gyro"],
                imu_acc=s["imu_acc"], imu_rpy=s["imu_rpy"])
        return lio.trajectory.as_matrices()[:, :3, 3]

    est_direct = run(data, ImuExtrinsics.identity())
    est_adapter = run(mounted, ext)
    # adapter output must reproduce the in-lidar-frame run (float32 rpy
    # round-trip is the only input difference; the estimator amplifies it to
    # ~2 cm over the 20-scan drive)
    np.testing.assert_allclose(est_adapter, est_direct, atol=5e-2)

    gt = np.stack([s["gt_pose"][:3, 3] for s in data])
    err = np.linalg.norm(est_adapter + gt[0] - gt, axis=1)
    assert err.max() < 0.5, err.max()
