import os

import numpy as np
import jax.numpy as jnp

from msst_tpu.utils import calibration_io, checkpoint, laserscan, navsat, profiling

RNG = np.random.default_rng(14)


def test_checkpoint_roundtrip_lio_state(tmp_path):
    from msst_tpu.models.liosam.params import tiny_params
    from msst_tpu.models.liosam.state import init_state

    p = tiny_params()
    s = init_state(p)
    # mutate a few fields
    s = s._replace(pose6=jnp.asarray([0.1, 0.2, 0.3, 1, 2, 3], jnp.float32),
                   initialized=jnp.asarray(True))
    path = os.path.join(tmp_path, "state.npz")
    checkpoint.save_state(path, s)
    s2 = checkpoint.load_state(path, init_state(p))
    np.testing.assert_allclose(np.asarray(s2.pose6), [0.1, 0.2, 0.3, 1, 2, 3], atol=1e-6)
    assert bool(s2.initialized)
    # wrong-caps template must fail loudly
    import pytest
    with pytest.raises(ValueError):
        checkpoint.load_state(path, init_state(tiny_params(max_keyframes=32)))


def test_laserscan_extraction():
    n = 1000
    az = RNG.uniform(-np.pi, np.pi, n)
    r = RNG.uniform(1, 20, n)
    xyz = np.stack([r * np.cos(az), r * np.sin(az), np.zeros(n)], 1)
    ring = np.full(n, 8, np.int32)
    scan = laserscan.extract_laserscan(xyz.astype(np.float32), ring, n_rings=16)
    assert scan["ring"] == 8
    finite = np.isfinite(scan["ranges"])
    assert finite.sum() > 500
    # check a specific bin
    i = np.argmax(finite)
    ang = -np.pi + (i + 0.5) * scan["angle_increment"]
    sel = np.abs(((az - ang + np.pi) % (2 * np.pi)) - np.pi) < scan["angle_increment"]
    assert abs(scan["ranges"][i] - r[sel].min()) < 0.5


def test_calibration_yaml_roundtrip(tmp_path):
    calib = {
        "num_lasers": 4,
        "distance_resolution": 0.004,
        "lasers": [
            {"laser_id": float(i), "rot_correction": 0.01 * i,
             "vert_correction": np.radians(-15 + 2 * i)}
            for i in range(4)
        ],
    }
    path = os.path.join(tmp_path, "cal.yaml")
    calibration_io.write_calibration_yaml(path, calib)
    back = calibration_io.load_calibration_yaml(path)
    assert back["num_lasers"] == 4
    assert abs(back["distance_resolution"] - 0.004) < 1e-9
    assert len(back["lasers"]) == 4
    np.testing.assert_allclose(back["lasers"][2]["vert_correction"],
                               np.radians(-11), atol=1e-6)
    cfg = calibration_io.decoder_config_from_calibration(back)
    assert abs(cfg.vert_angles_deg[2] - (-11.0)) < 1e-4
    assert cfg.distance_resolution == 0.004


def test_velodyne_xml_conversion(tmp_path):
    xml = """<boost_serialization><DB><points_>
    <item><px><id_>1</id_><rotCorrection_>0.5</rotCorrection_>
      <vertCorrection_>-15.0</vertCorrection_><distCorrection_>120</distCorrection_></px></item>
    <item><px><id_>0</id_><rotCorrection_>-0.5</rotCorrection_>
      <vertCorrection_>1.0</vertCorrection_><distCorrection_>130</distCorrection_></px></item>
    </points_></DB></boost_serialization>"""
    p = os.path.join(tmp_path, "db.xml")
    open(p, "w").write(xml)
    calib = calibration_io.convert_velodyne_xml(p)
    assert calib["num_lasers"] == 2
    assert calib["lasers"][0]["laser_id"] == 0
    np.testing.assert_allclose(calib["lasers"][1]["vert_correction"],
                               np.radians(-15), atol=1e-9)
    np.testing.assert_allclose(calib["lasers"][0]["dist_correction"], 1.3, atol=1e-9)


def test_navsat_alignment():
    al = navsat.NavsatAligner(min_pairs=5)
    # odometry frame rotated 30 deg + offset from ENU
    yaw = np.radians(30)
    R = np.array([[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]])
    t = np.array([5.0, -3.0])
    lat0, lon0 = 48.0, 11.0
    for k in range(20):
        # walk east
        dlat = 0.0
        dlon = k * 1e-5
        enu = navsat.latlon_to_enu(np.asarray([lat0 + dlat]), np.asarray([lon0 + dlon]),
                                   np.asarray([500.0]), lat0, lon0, 500.0)[0]
        odom = np.concatenate([R @ enu[:2] + t, [0.0]])
        al.add_fix(lat0 + dlat, lon0 + dlon, 500.0, odom)
    assert al.is_aligned
    got = al.gps_to_map(lat0, lon0 + 10e-5, 500.0)
    enu = navsat.latlon_to_enu(np.asarray([lat0]), np.asarray([lon0 + 10e-5]),
                               np.asarray([500.0]), lat0, lon0, 500.0)[0]
    expect = np.concatenate([R @ enu[:2] + t, [0.0]])
    np.testing.assert_allclose(got, expect, atol=0.05)


def test_manual_calibrator_scoring_and_keys():
    from msst_tpu.models.calibration.manual_calib import ManualCalibrator

    tgt = RNG.uniform(-5, 5, size=(2000, 3)).astype(np.float32)
    src = tgt + np.array([0.3, 0, 0], np.float32)  # offset in +x
    cal = ManualCalibrator(src, tgt, trans_step=0.3)
    d0, f0 = cal.score()
    assert cal.nudge("f")  # -x
    d1, f1 = cal.score()
    assert d1 < d0  # alignment improved
    js = cal.extrinsic_json()
    assert "rotation" in js and "translation" in js
    assert not cal.nudge("x")  # exit


def test_rate_tracker_and_stage_timer():
    msgs = []
    rt = profiling.RateTracker("test", report_every_s=0.0, printer=msgs.append)
    for _ in range(5):
        rt.tick(latency_s=0.01)
    assert rt.rate_hz > 0
    assert abs(rt.mean_latency_ms - 10.0) < 1.0
    assert msgs

    st = profiling.StageTimer()
    with st.stage("a"):
        pass
    with st.stage("a"):
        pass
    s = st.summary()
    assert s["a"]["count"] == 2


def test_polynomial_roots():
    from msst_tpu.ops import polynomial as P
    # (x-1)(x-2)(x+3) = x^3 - 7x + 6
    r = P.real_roots([1.0, 0.0, -7.0, 6.0])
    np.testing.assert_allclose(r, [-3, 1, 2], atol=1e-8)
    v = np.asarray(P.polyval(jnp.asarray([1.0, 0.0, -7.0, 6.0]), jnp.asarray([1.0, 2.0])))
    np.testing.assert_allclose(v, 0, atol=1e-6)


def test_voxel_occupancy_refinement():
    import jax
    from msst_tpu.models.calibration.auto_calib import (
        refine_by_voxel_occupancy, voxel_occupancy_score)
    from msst_tpu.ops import se3

    rng = np.random.default_rng(15)
    m = rng.uniform(-10, 10, (4000, 3)).astype(np.float32)
    s = (m[:2000] + np.array([0.15, -0.1, 0.05], np.float32))
    mm = jnp.ones(len(m), bool)
    sm = jnp.ones(len(s), bool)
    p0 = se3.Pose.identity()
    s0 = float(voxel_occupancy_score(jnp.asarray(m), mm, jnp.asarray(s), sm, p0, 0.25))
    p1 = refine_by_voxel_occupancy(jnp.asarray(m), mm, jnp.asarray(s), sm, p0,
                                   voxel_size=0.25, delta=0.05, steps=4)
    s1 = float(voxel_occupancy_score(jnp.asarray(m), mm, jnp.asarray(s), sm, p1, 0.25))
    assert s1 >= s0
    # refinement should move toward -offset
    t = np.asarray(p1.t)
    assert t[0] < -0.05 and t[1] > 0.02


def test_imu_rate_pose_and_divergence_guard():
    import jax
    from msst_tpu.models.liosam import LioSam
    from msst_tpu.models.liosam.params import tiny_params
    from msst_tpu.utils import sim

    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=10.0, speed=2.0)
    data = sim.make_dataset(world, traj, n_scans=6, scan_dt=0.1,
                            n_scan=16, horizon=360, seed=5)
    lio = LioSam(tiny_params(loop_closure_enabled=False))
    for s in data:
        lio.process_scan(s["xyz"], s["ring"], s["time_rel"], s["scan_start"],
                         imu_t=s["imu_t"], imu_gyro=s["imu_gyro"],
                         imu_acc=s["imu_acc"], imu_rpy=s["imu_rpy"])
    s = data[-1]
    pose, vel = lio.imu_rate_pose(s["imu_t"], s["imu_gyro"], s["imu_acc"])
    assert np.isfinite(np.asarray(pose.t)).all()
    assert np.isfinite(vel).all()


def test_save_map_writes_pcds(tmp_path):
    from msst_tpu.models.liosam import LioSam
    from msst_tpu.models.liosam.params import tiny_params
    from msst_tpu.utils import sim
    from msst_tpu.utils.io_pcd import read_pcd

    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=10.0, speed=2.0)
    data = sim.make_dataset(world, traj, n_scans=4, scan_dt=0.1,
                            n_scan=16, horizon=360, seed=6)
    lio = LioSam(tiny_params(loop_closure_enabled=False))
    for s in data:
        lio.process_scan(s["xyz"], s["ring"], s["time_rel"], s["scan_start"],
                         imu_t=s["imu_t"], imu_gyro=s["imu_gyro"],
                         imu_acc=s["imu_acc"], imu_rpy=s["imu_rpy"])
    out = lio.save_map(str(tmp_path), resolution=0.5)
    back = read_pcd(str(tmp_path / "global_map.pcd"))
    assert len(back["xyz"]) > 100
    assert (tmp_path / "trajectory.txt").exists()


def test_viz_export(tmp_path):
    from msst_tpu.models.liosam import LioSam
    from msst_tpu.models.liosam.params import tiny_params
    from msst_tpu.utils import sim, viz

    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=10.0, speed=2.0)
    data = sim.make_dataset(world, traj, n_scans=4, scan_dt=0.1,
                            n_scan=16, horizon=360, seed=8)
    lio = LioSam(tiny_params(loop_closure_enabled=False))
    for s in data:
        lio.process_scan(s["xyz"], s["ring"], s["time_rel"], s["scan_start"],
                         imu_t=s["imu_t"], imu_gyro=s["imu_gyro"],
                         imu_acc=s["imu_acc"], imu_rpy=s["imu_rpy"])
    gt = np.stack([s["gt_pose"][:3, 3] for s in data])
    viz.export_session(lio, str(tmp_path), gt)
    assert (tmp_path / "trajectory.png").exists()
    assert (tmp_path / "global_map.ply").exists()
    head = open(tmp_path / "global_map.ply").readline()
    assert head.strip() == "ply"


def test_kitti_eval_metrics():
    from msst_tpu.utils import kitti_eval as KE

    # straight 1 km drive, 1 m/frame; estimate drifts 1% in x
    n = 1001
    gt = np.tile(np.eye(4), (n, 1, 1))
    gt[:, 0, 3] = np.arange(n, dtype=np.float64)
    est = gt.copy()
    est[:, 0, 3] *= 1.01
    s = KE.kitti_summary(est, gt)
    assert s["n_segments"] > 100
    assert abs(s["t_err_pct"] - 1.0) < 0.15
    assert s["r_err_deg_per_m"] < 1e-6
    assert KE.ate_rmse(est, gt, align=False) > 0
    r = KE.rpe(est, gt)
    assert abs(r["rpe_trans_rmse_m"] - 0.01) < 2e-3


def test_gpstime_rollover():
    from msst_tpu.utils import gpstime

    hour = 3600.0
    base = 1_700_000_000.0
    base -= base % hour  # top of hour
    # packet at 5 s past the hour, received 6 s past -> same hour
    assert abs(gpstime.resolve_hour_timestamp(int(5e6), base + 6) - (base + 5)) < 1e-6
    # packet at 3599 s past the hour, received 1 s past the NEXT hour
    assert abs(gpstime.resolve_hour_timestamp(int(3599e6), base + hour + 1)
               - (base + 3599)) < 1e-6
    # packet at 1 s past the hour, received 3599 s into the PREVIOUS hour
    assert abs(gpstime.resolve_hour_timestamp(int(1e6), base - 1)
               - (base + 1)) < 1e-6
    pkt = bytes(1200) + (12345).to_bytes(4, "little") + bytes(2)
    assert gpstime.packet_timestamp_us(pkt) == 12345


def test_urdf_joint_origin_writer(tmp_path):
    from msst_tpu.models.calibration.urdf import (modify_urdf_joint_origin,
                                                  write_calibrated_urdf)
    from msst_tpu.ops import se3

    urdf = tmp_path / "robot.urdf"
    urdf.write_text("""<?xml version="1.0"?>
<robot name="rig">
  <joint name="lidar_1_joint" type="fixed"><parent link="base"/><child link="l1"/></joint>
  <joint name="lidar_2_joint" type="fixed">
    <origin xyz="0 0 0" rpy="0 0 0"/>
    <parent link="base"/><child link="l2"/>
  </joint>
</robot>""")
    p1 = se3.Pose.from_rpy_xyz(jnp.asarray([0.1, 0.0, 0.5]), jnp.asarray([1.0, 2.0, 0.3]))
    out = tmp_path / "calibrated.urdf"
    write_calibrated_urdf(str(urdf), {"lidar_1_joint": p1, "lidar_2_joint": p1}, str(out))
    import xml.etree.ElementTree as ET
    root = ET.parse(out).getroot()
    for name in ("lidar_1_joint", "lidar_2_joint"):
        j = [x for x in root.iter("joint") if x.get("name") == name][0]
        o = j.find("origin")
        xyz = [float(v) for v in o.get("xyz").split()]
        rpy = [float(v) for v in o.get("rpy").split()]
        np.testing.assert_allclose(xyz, [1, 2, 0.3], atol=1e-5)
        np.testing.assert_allclose(rpy, [0.1, 0, 0.5], atol=1e-5)


def test_multi_lica_save_results(tmp_path):
    from msst_tpu.models.calibration.multi_lica import (MultiLicaConfig,
                                                        MultiLidarCalibrator)
    from msst_tpu.utils.io_pcd import read_pcd
    from tests.test_calibration import scene, view_from

    world = scene(2000)
    tgt = view_from(world, [0, 0, 0], np.array([0, 0, 1.5]))
    src = view_from(world, [0, 0, 0.3], np.array([1.0, 0.5, 1.5]))
    cal = MultiLidarCalibrator(MultiLicaConfig(capacity=4096, knn_table=4096,
                                               max_corr=256))
    res = cal.standard_calibration(tgt, [src])
    cal.save_results(str(tmp_path), res, [src], tgt)
    txt = (tmp_path / "results.txt").read_text()
    assert "transformation:" in txt and "fitness:" in txt
    st = read_pcd(str(tmp_path / "stitched.pcd"))
    assert len(st["xyz"]) == 2 * len(world)
