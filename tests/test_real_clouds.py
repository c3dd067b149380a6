"""The LIO frontend + registration on REAL sensor data (VERDICT r4 #4).

The reference ships real LiDAR scans with its calibration tools — the only
real point clouds in this environment:

* ``manual_calib/data/p64.pcd`` — a real Pandar64 scan (77k points, 130 m)
* ``manual_calib/data/qt.pcd`` — the same scene from a short-range QT lidar,
  with the known cross-sensor extrinsic ``p64-to-qt-extrinsic.json``
* ``auto_calib/data/0001/top.pcd`` — a real 64-beam rooftop scan

Until round 5 only the calibration suite consumed them; these tests drive
the LIO pipeline's own stages — ring recovery, range-image projection, LOAM
feature extraction (``featureExtraction.cpp``), and the voxel scan-to-map
Gauss-Newton (``mapOptmization.cpp:974-1310``) — on real geometry, with the
known extrinsic as ground truth for the cross-sensor registration.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

MANUAL = ("/root/reference/Calibration_Tookit/SensorsCalibration/"
          "lidar2lidar/manual_calib/data")
AUTO = ("/root/reference/Calibration_Tookit/SensorsCalibration/"
        "lidar2lidar/auto_calib/data/0001")

pytestmark = pytest.mark.skipif(not os.path.isdir(MANUAL),
                                reason="reference golden data not mounted")


def _load(path):
    from msst_tpu.utils.io_pcd import read_pcd

    xyz = read_pcd(path)["xyz"]
    return xyz[np.isfinite(xyz).all(1)]


def _true6():
    """(roll,pitch,yaw,x,y,z) of the shipped p64->qt extrinsic, in the
    framework's R = Rz(yaw)Ry(pitch)Rx(roll) convention."""
    from scipy.spatial.transform import Rotation as Rs

    T = np.asarray(json.load(open(f"{MANUAL}/p64-to-qt-extrinsic.json"))
                   ["left_lidar-to-top_center_lidar-extrinsic"]["param"]
                   ["sensor_calib"]["data"])
    ypr = Rs.from_matrix(T[:3, :3]).as_euler("ZYX")
    return np.concatenate([ypr[::-1], T[:3, 3]]).astype(np.float32), T


def _pad(a, cap):
    out = np.zeros((cap, 3), np.float32)
    n = min(len(a), cap)
    out[:n] = a[:n]
    return jnp.asarray(out), jnp.asarray(np.arange(cap) < n)


def test_rings_from_elevation_real_scans():
    """Geometric ring recovery on the real 64-beam scans: a plausible beam
    count, tight per-ring elevation spread, rings ordered bottom-up."""
    from msst_tpu.utils.sensor_formats import rings_from_elevation

    for name in (f"{MANUAL}/p64.pcd", f"{AUTO}/top.pcd"):
        xyz = _load(name)
        ring, n_rings = rings_from_elevation(xyz)
        assert 40 <= n_rings <= 64, (name, n_rings)
        elev = np.degrees(np.arctan2(xyz[:, 2], np.hypot(xyz[:, 0],
                                                         xyz[:, 1])))
        means = np.array([elev[ring == r].mean() for r in range(n_rings)])
        spread = np.array([elev[ring == r].std() for r in range(n_rings)])
        assert np.all(np.diff(means) > 0), name   # ring 0 = lowest beam
        assert np.median(spread) < 0.1, (name, np.median(spread))


def _frontend_params():
    from msst_tpu.models.liosam.params import LioParams

    return LioParams(n_scan=64, horizon_scan=900, max_points=98304,
                     imu_window=8)


def _run_frontend(xyz, p):
    from functools import partial

    from msst_tpu.models.liosam.frontend import ScanInput, run_frontend
    from msst_tpu.utils.sensor_formats import (rings_from_elevation,
                                               times_from_azimuth)

    ring, _ = rings_from_elevation(xyz)
    t_rel = times_from_azimuth(xyz)
    cap = p.max_points
    px, pm = _pad(xyz, cap)
    pring = np.zeros(cap, np.int32)
    pring[:len(ring)] = ring
    pt = np.zeros(cap, np.float32)
    pt[:len(t_rel)] = t_rel
    T = p.imu_window
    scan = ScanInput(
        xyz=px, mask=pm, ring=jnp.asarray(pring), time=jnp.asarray(pt),
        scan_start=jnp.asarray(0.0, jnp.float32),
        imu_t=jnp.zeros(T), imu_gyro=jnp.zeros((T, 3)),
        imu_acc=jnp.zeros((T, 3)), imu_mask=jnp.zeros(T, bool),
        imu_rpy_init=jnp.zeros(3), imu_available=jnp.asarray(False),
    )
    fe = partial(jax.jit, static_argnames=("p",))(
        lambda s, p: run_frontend(s, p))
    return fe(scan, p)


def test_frontend_features_on_real_scans():
    """Range-image projection + LOAM feature extraction on the real scans:
    sane corner/surface feature populations (``calculateSmoothness`` /
    ``extractFeatures`` behavior on real geometry), features drawn from the
    input cloud's support."""
    p = _frontend_params()
    for name in (f"{MANUAL}/p64.pcd", f"{AUTO}/top.pcd"):
        xyz = _load(name)
        front = _run_frontend(xyz, p)
        n_c = int(front.n_corner)
        n_s = int(front.n_surf)
        # 64 rings x 6 sectors x <=20 corners: a real urban scene must
        # produce a healthy population of both classes
        assert 200 <= n_c <= 64 * 6 * 20, (name, n_c)
        assert n_s > 5000, (name, n_s)
        for cloud in (front.corner, front.surf):
            pts = np.asarray(cloud.xyz)[np.asarray(cloud.mask)]
            assert len(pts) > 0
            r_in = np.linalg.norm(xyz, axis=1)
            assert pts[:, 2].min() >= xyz[:, 2].min() - 1.0
            assert np.linalg.norm(pts, axis=1).max() <= r_in.max() + 1.0


def test_scan_to_map_recovers_pose_on_real_scan():
    """Voxel scan-to-map GN on real p64 features: target maps built from
    the features moved by a known pose; the solver must recover that pose
    from a perturbed initial guess (the scan-to-map contract of
    ``scan2MapOptimization`` on real geometry)."""
    from msst_tpu.ops import se3, voxelmap
    from msst_tpu.ops.registration import scan_to_map_voxel

    p = _frontend_params()
    xyz = _load(f"{MANUAL}/p64.pcd")
    front = _run_frontend(xyz, p)
    true6 = jnp.asarray([0.03, -0.02, 0.05, 0.4, -0.3, 0.2], jnp.float32)
    pose = se3.Pose.from_vec6(true6)
    origin = pose.t

    def vox(cloud, kind):
        return voxelmap.build(pose.apply(cloud.xyz), cloud.mask, 0.8, 16384,
                              kind, table_size=32768, origin=origin)

    cvox = vox(front.corner, "line")
    svox = vox(front.surf, "plane")
    init = true6 + jnp.asarray([0.01, -0.008, 0.012, 0.06, -0.05, 0.04])
    res = scan_to_map_voxel(front.corner.xyz, front.corner.mask,
                            front.surf.xyz, front.surf.mask,
                            cvox, svox, init, max_iters=30)
    rec = np.asarray(res.pose)
    err_rot = np.degrees(np.abs(rec[:3] - np.asarray(true6[:3])))
    err_t = np.abs(rec[3:] - np.asarray(true6[3:]))
    assert not bool(res.degenerate)
    assert np.all(err_rot < 0.3), err_rot
    assert np.all(err_t < 0.05), err_t


def test_registration_recovers_known_cross_sensor_extrinsic():
    """p64 registered against the QT cloud must land on the SHIPPED
    p64->qt extrinsic (two real sensors, one real scene — the known-truth
    registration test VERDICT r4 #4 asked for), independent of the initial
    guess."""
    from msst_tpu.ops import voxelmap
    from msst_tpu.ops.registration import scan_to_map_voxel

    true6, T = _true6()
    p64 = _load(f"{MANUAL}/p64.pcd")
    qt = _load(f"{MANUAL}/qt.pcd")
    # keep the p64 points that land inside the QT sensor's ~27 m field
    moved = p64 @ T[:3, :3].T + T[:3, 3]
    src = p64[np.linalg.norm(moved[:, :2], axis=1) < 26][::2]

    qx, qm = _pad(qt, 16384)
    origin = jnp.zeros(3, jnp.float32)
    cvox = voxelmap.build(qx, qm, 0.4, 8192, "line", table_size=16384,
                          origin=origin)
    svox = voxelmap.build(qx, qm, 0.4, 8192, "plane", table_size=16384,
                          origin=origin)
    sx, sm = _pad(src, 32768)
    zero3, zm = jnp.zeros((8, 3), jnp.float32), jnp.zeros(8, bool)

    recs = []
    for pert in (np.zeros(6, np.float32),
                 np.asarray([0.01, -0.008, 0.012, 0.05, -0.04, 0.06],
                            np.float32)):
        res = scan_to_map_voxel(zero3, zm, sx, sm, cvox, svox,
                                jnp.asarray(true6 + pert), max_iters=30,
                                min_points=50)
        assert not bool(res.degenerate)
        assert int(res.n_surf) > 3000
        recs.append(np.asarray(res.pose))
    # within the (manually calibrated, ~0.2 m class) shipped extrinsic
    for rec in recs:
        assert np.all(np.degrees(np.abs(rec[:3] - true6[:3])) < 1.5), rec
        assert np.all(np.abs(rec[3:] - true6[3:]) < 0.25), rec
    # and init-independent: both runs converge to the same refined pose
    d = np.abs(recs[0] - recs[1])
    assert np.all(np.degrees(d[:3]) < 0.15) and np.all(d[3:] < 0.03), d
