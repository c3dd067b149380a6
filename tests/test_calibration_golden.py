"""Calibration tests on the REAL golden scenes shipped with the reference.

Inputs (read directly from the read-only reference mount):

* ``SensorsCalibration/lidar2lidar/auto_calib/data/0001/`` — top/left/right
  clouds + ``initial_extrinsic.txt`` (``run_lidar2lidar.cpp:75-145`` defines
  the input format; RPY order from ``calibration.cpp:37-47`` is Rz*Ry*Rx).
* ``SensorsCalibration/lidar2lidar/manual_calib/data/`` — p64/qt pair with
  the expected extrinsic JSON (``p64-to-qt-extrinsic.json``).
* ``Multi_LiCa/data/demo/lidar_{1,2,3}.pcd`` — the Multi_LiCa demo scene.

The left/right sensors are mounted tilted ~45 degrees; the shipped initial
extrinsics carry only yaw + lever arm, so a correct calibration must
*discover* the tilt from the ground planes — that makes these scenes real
accuracy tests, not smoke tests.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/Calibration_Tookit"
AUTO = f"{REF}/SensorsCalibration/lidar2lidar/auto_calib/data/0001"
MANUAL = f"{REF}/SensorsCalibration/lidar2lidar/manual_calib/data"
LICA = f"{REF}/Multi_LiCa/data/demo"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference golden data not mounted")

CAP = 65536


def _load_pcd(path, cap=CAP):
    from msst_tpu.utils.io_pcd import read_pcd

    xyz = read_pcd(path)["xyz"]
    xyz = xyz[np.isfinite(xyz).all(1)]
    out = np.zeros((cap, 3), np.float32)
    n = min(len(xyz), cap)
    out[:n] = xyz[:n]
    mask = np.arange(cap) < n
    return jnp.asarray(out), jnp.asarray(mask)


def _parse_initial_extrinsics(path):
    """device_id -> pose6 (roll,pitch,yaw rad + xyz), reference RPY order."""
    out = {}
    lines = open(path).read().strip().splitlines()
    for i in range(0, len(lines), 2):
        dev = int(lines[i].split(":")[1])
        vals = [float(v) for v in lines[i + 1].split(":")[1].split()]
        rpy = np.radians(vals[:3])
        out[dev] = np.asarray([*rpy, *vals[3:]], np.float32)
    return out


def _median_nn(t_xyz, t_mask, s_xyz, s_mask, pose):
    from msst_tpu.ops import knn

    grid = knn.build(t_xyz, t_mask, 1.0, 65536)
    moved = pose.apply(s_xyz)
    r = knn.query(grid, moved, s_mask, k=1, candidates_per_cell=16,
                  max_sqdist=25.0)
    d = np.sqrt(np.asarray(r.sqdist[:, 0]))
    v = np.asarray(r.valid[:, 0]) & np.asarray(s_mask)
    return float(np.median(d[v]))


def _rot_err_deg(Ra, Rb):
    def proj(R):  # nearest SO(3): the shipped expected matrix has det 0.969
        U, _, Vt = np.linalg.svd(R)
        return U @ np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))]) @ Vt

    c = (np.trace(proj(Ra) @ proj(Rb).T) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


@pytest.fixture(scope="module")
def scene0001():
    from msst_tpu.ops.pointcloud import Cloud
    from msst_tpu.ops.voxel import voxel_downsample

    def load(name):
        x, m = _load_pcd(f"{AUTO}/{name}.pcd")
        c = voxel_downsample(Cloud.create(x, mask=m), 0.3, capacity=16384)
        return c.xyz, c.mask

    init = _parse_initial_extrinsics(f"{AUTO}/initial_extrinsic.txt")
    return {"top": load("top"), "left": load("left"), "right": load("right"),
            "init": init}


@pytest.mark.parametrize("slave,dev", [("left", 1), ("right", 2)])
def test_auto_calib_golden_scene(scene0001, slave, dev):
    """auto_calib on the shipped scene: starting from the rough initial
    extrinsic (yaw + lever arm only), the calibrated pose must discover the
    ~45-degree sensor tilt, stay near the surveyed lever arm, and improve
    cloud-to-cloud alignment."""
    from msst_tpu.models.calibration.auto_calib import (AutoCalibConfig,
                                                        auto_calibrate)
    from msst_tpu.ops import se3

    m_xyz, m_mask = scene0001["top"]
    s_xyz, s_mask = scene0001[slave]
    init6 = scene0001["init"][dev]
    init = se3.Pose.from_vec6(jnp.asarray(init6))

    cfg = AutoCalibConfig(knn_table=32768)
    res = auto_calibrate(m_xyz, m_mask, s_xyz, s_mask, cfg,
                         jax.random.PRNGKey(0), init_pose=init)
    assert bool(res.ground_ok)
    vec = np.asarray(res.pose.to_vec6())
    assert np.isfinite(vec).all()

    # yaw stays near the surveyed yaw; pitch discovers the ~45 deg tilt
    yaw_err = np.degrees(abs(np.arctan2(np.sin(vec[2] - init6[2]),
                                        np.cos(vec[2] - init6[2]))))
    assert yaw_err < 8.0, (np.degrees(vec[:3]), np.degrees(init6[:3]))
    assert 35.0 < abs(np.degrees(vec[1])) < 55.0, np.degrees(vec[:3])
    # lever arm within 0.5 m of the surveyed initial translation
    assert np.linalg.norm(vec[3:] - init6[3:]) < 0.5, (vec[3:], init6[3:])

    # alignment must improve on the initial extrinsic
    nn_init = _median_nn(m_xyz, m_mask, s_xyz, s_mask, init)
    nn_final = _median_nn(m_xyz, m_mask, s_xyz, s_mask, res.pose)
    assert nn_final < nn_init, (nn_final, nn_init)
    assert nn_final < 0.8, nn_final


def test_manual_calib_pair_gicp_recovers_expected_extrinsic(tmp_path):
    """GICP on the manual_calib p64/qt pair: from a perturbed version of the
    shipped expected extrinsic (3 deg / 0.36 m off), refinement must recover
    the expected pose to < 1.5 deg / 0.2 m."""
    import json

    from scipy.spatial.transform import Rotation as R

    from msst_tpu.models.calibration.manual_calib import ManualCalibrator
    from msst_tpu.ops import knn, registration, se3
    from msst_tpu.ops.pointcloud import Cloud
    from msst_tpu.ops.voxel import voxel_downsample

    exp = json.load(open(f"{MANUAL}/p64-to-qt-extrinsic.json"))
    T = np.asarray(
        exp["left_lidar-to-top_center_lidar-extrinsic"]["param"]["sensor_calib"]["data"])

    from msst_tpu.utils.io_pcd import read_pcd

    def load(name):
        xyz = read_pcd(f"{MANUAL}/{name}.pcd")["xyz"]
        xyz = xyz[np.isfinite(xyz).all(1)]
        xyz = xyz[np.linalg.norm(xyz, axis=1) > 0.5][:120000]
        c = voxel_downsample(Cloud.create(jnp.asarray(xyz)), 0.2,
                             capacity=16384)
        return c.xyz, c.mask

    s_xyz, s_mask = load("p64")
    t_xyz, t_mask = load("qt")

    pert = np.eye(4)
    pert[:3, :3] = R.from_euler("z", 3.0, degrees=True).as_matrix()
    pert[:3, 3] = [0.2, -0.1, 0.05]
    T0 = pert @ T
    q = R.from_matrix(T0[:3, :3]).as_quat()
    init = se3.Pose(jnp.asarray([q[3], q[0], q[1], q[2]], jnp.float32),
                    jnp.asarray(T0[:3, 3], jnp.float32))

    grid = knn.build(t_xyz, t_mask, 1.0, 32768)
    s_cov = registration.point_covariances(
        s_xyz, s_mask, knn.build(s_xyz, s_mask, 1.0, 32768), k=10)
    t_cov = registration.point_covariances(t_xyz, t_mask, grid, k=10)
    res = registration.gicp(s_xyz, s_mask, s_cov, grid, t_xyz, t_cov, init,
                            max_iters=40, max_corr_dist=1.0)

    M = np.asarray(res.pose.to_matrix())
    assert _rot_err_deg(M[:3, :3], T[:3, :3]) < 1.5
    assert np.linalg.norm(M[:3, 3] - T[:3, 3]) < 0.2

    # the interactive tool's scoring must also prefer the expected extrinsic
    # over the perturbed one (manual_calib keymap drives the same score)
    def pose_of(M):
        qq = R.from_matrix(M[:3, :3]).as_quat()
        return se3.Pose(jnp.asarray([qq[3], qq[0], qq[1], qq[2]], jnp.float32),
                        jnp.asarray(M[:3, 3], jnp.float32))

    src_np = np.asarray(s_xyz)[np.asarray(s_mask)]
    tgt_np = np.asarray(t_xyz)[np.asarray(t_mask)]
    mc = ManualCalibrator(src_np, tgt_np, init_pose=pose_of(T))
    mc2 = ManualCalibrator(src_np, tgt_np, init_pose=pose_of(T0))
    assert mc.score() < mc2.score()


@pytest.mark.parametrize("src,exp_yaw_deg", [("lidar_2", 90.0),
                                             ("lidar_3", -90.0)])
def test_multi_lica_demo_scene(src, exp_yaw_deg):
    """Multi_LiCa demo: targetless calibration (NO initial guess) of the
    tilted side lidars onto lidar_1.  The yaw must land near the mounting
    yaw, the discovered tilt near 45 deg, and the lever arm near the values
    surveyed in the (same-rig) auto_calib scene."""
    from msst_tpu.models.calibration.multi_lica import (MultiLicaConfig,
                                                        calibrate_pair)

    t_xyz, t_mask = _load_pcd(f"{LICA}/lidar_1.pcd")
    s_xyz, s_mask = _load_pcd(f"{LICA}/{src}.pcd")
    cfg = MultiLicaConfig()
    res = calibrate_pair(s_xyz, s_mask, t_xyz, t_mask, cfg)
    vec = np.asarray(res.pose.to_vec6())
    assert np.isfinite(vec).all()

    yaw_err = np.degrees(abs(np.arctan2(
        np.sin(vec[2] - np.radians(exp_yaw_deg)),
        np.cos(vec[2] - np.radians(exp_yaw_deg)))))
    assert yaw_err < 8.0, np.degrees(vec[:3])
    assert 35.0 < abs(np.degrees(vec[1])) < 55.0, np.degrees(vec[:3])
    assert abs(np.degrees(vec[0])) < 10.0, np.degrees(vec[:3])
    # lever arm is sub-meter on this rig
    assert np.linalg.norm(vec[3:]) < 1.2, vec[3:]
    assert float(res.fitness) > 0.4

    nn = _median_nn(t_xyz, t_mask, s_xyz, s_mask, res.pose)
    assert nn < 0.8, nn


def test_cross_tool_consistency_on_shared_clouds(scene0001):
    """Multi_LiCa's demo lidar_2 IS auto_calib scene 0001's left cloud (byte-
    identical files); the two independent pipelines must agree on the
    extrinsic within tight bounds."""
    from msst_tpu.models.calibration.auto_calib import (AutoCalibConfig,
                                                        auto_calibrate)
    from msst_tpu.models.calibration.multi_lica import (MultiLicaConfig,
                                                        calibrate_pair)
    from msst_tpu.ops import se3

    m_xyz, m_mask = scene0001["top"]
    s_xyz, s_mask = scene0001["left"]
    init = se3.Pose.from_vec6(jnp.asarray(scene0001["init"][1]))
    a = auto_calibrate(m_xyz, m_mask, s_xyz, s_mask,
                       AutoCalibConfig(knn_table=32768),
                       jax.random.PRNGKey(0), init_pose=init)

    t_xyz, t_mask = _load_pcd(f"{LICA}/lidar_1.pcd")
    sx, sm = _load_pcd(f"{LICA}/lidar_2.pcd")
    b = calibrate_pair(sx, sm, t_xyz, t_mask, MultiLicaConfig())

    Ma = np.asarray(a.pose.to_matrix())
    Mb = np.asarray(b.pose.to_matrix())
    assert _rot_err_deg(Ma[:3, :3], Mb[:3, :3]) < 3.0
    assert np.linalg.norm(Ma[:3, 3] - Mb[:3, 3]) < 0.4
