"""Sensor point-format parity: Velodyne/Ouster/Livox
(``imageProjection.cpp:4-34,197-284,521-572``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from msst_tpu.ops import range_image as ri
from msst_tpu.ops.pointcloud import Cloud
from msst_tpu.utils.sensor_formats import (ScanStreamChecker, detect_sensor,
                                           to_xyzirt)

RNG = np.random.default_rng(11)


def _ouster_cloud(n=100):
    xyz = RNG.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    return {
        "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
        "intensity": RNG.uniform(0, 255, n).astype(np.float32),
        "t": (RNG.uniform(0, 0.1, n) * 1e9).astype(np.uint32),  # NANOSECONDS
        "reflectivity": RNG.integers(0, 65535, n).astype(np.uint16),
        "ring": RNG.integers(0, 16, n).astype(np.uint8),
        "noise": np.zeros(n, np.uint16),
        "range": (np.linalg.norm(xyz, axis=1) * 1000).astype(np.uint32),
        "is_dense": True,
    }, xyz


def test_ouster_detect_and_ns_conversion():
    cloud, xyz = _ouster_cloud()
    assert detect_sensor(cloud) == "ouster"
    out = to_xyzirt(cloud, "auto")
    np.testing.assert_allclose(out["xyz"], xyz, atol=1e-6)
    # dst.time = src.t * 1e-9f (imageProjection.cpp:226)
    np.testing.assert_allclose(out["time_rel"],
                               cloud["t"].astype(np.float64) * 1e-9,
                               atol=1e-6)
    assert out["time_rel"].dtype == np.float32
    assert out["ring"].dtype == np.int32
    assert out["deskew_ok"] and out["was_dense"]


def test_velodyne_passthrough_and_t_ns_heuristic():
    n = 50
    cloud = {"x": np.ones(n, np.float32), "y": np.zeros(n, np.float32),
             "z": np.zeros(n, np.float32),
             "ring": np.zeros(n, np.uint16),
             "time": np.linspace(0, 0.1, n).astype(np.float32)}
    out = to_xyzirt(cloud, "velodyne")
    np.testing.assert_allclose(out["time_rel"], cloud["time"])
    # a velodyne-ish bag naming the field `t` in integer nanoseconds
    cloud2 = dict(cloud)
    del cloud2["time"]
    cloud2["t"] = (np.linspace(0, 0.1, n) * 1e9).astype(np.uint32)
    out2 = to_xyzirt(cloud2, "velodyne")
    np.testing.assert_allclose(out2["time_rel"], np.linspace(0, 0.1, n),
                               atol=1e-6)


def test_missing_ring_is_fatal():
    cloud = {"x": np.ones(3, np.float32), "y": np.zeros(3, np.float32),
             "z": np.zeros(3, np.float32),
             "time": np.zeros(3, np.float32)}
    with pytest.raises(ValueError, match="ring channel"):
        to_xyzirt(cloud, "velodyne")


def test_missing_time_warns_once_per_stream():
    cloud = {"x": np.ones(4, np.float32), "y": np.zeros(4, np.float32),
             "z": np.zeros(4, np.float32), "ring": np.zeros(4, np.uint16)}
    checker = ScanStreamChecker("velodyne")
    with pytest.warns(UserWarning, match="deskew function disabled"):
        out = checker.convert(cloud)
    assert not out["deskew_ok"]
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # second scan must NOT warn again
        checker.convert(cloud)


def test_non_dense_rows_masked_not_fatal():
    cloud = {"x": np.array([1, np.nan, 3], np.float32),
             "y": np.zeros(3, np.float32), "z": np.zeros(3, np.float32),
             "ring": np.arange(3, dtype=np.uint16),
             "time": np.zeros(3, np.float32),
             "intensity": np.array([10, 20, 30], np.float32),
             "is_dense": False}
    out = to_xyzirt(cloud, "velodyne")
    assert len(out["xyz"]) == 2 and not out["was_dense"]
    np.testing.assert_array_equal(out["ring"], [0, 2])
    np.testing.assert_array_equal(out["intensity"], [10, 30])


def test_livox_counter_columns_match_scalar_oracle():
    """column_mode="counter" == the reference's columnIdnCountVec walk
    (imageProjection.cpp:553-558), including counter increments for points
    later dropped by the column bound."""
    n, n_scan, horizon = 400, 4, 40
    xyz = RNG.uniform(-20, 20, size=(n, 3)).astype(np.float32)
    ring = RNG.integers(0, n_scan + 1, n).astype(np.int32)  # some out of range
    mask = RNG.uniform(size=n) < 0.9
    min_r, max_r = 1.0, 30.0

    cloud = Cloud.create(jnp.asarray(xyz), mask=jnp.asarray(mask))
    img = ri.project(cloud, jnp.asarray(ring), n_scan, horizon,
                     min_r, max_r, column_mode="counter")

    # scalar oracle
    want_rng = np.full((n_scan, horizon), np.inf, np.float32)
    want_idx = np.full((n_scan, horizon), -1)
    counts = [0] * n_scan
    for i in range(n):
        if not mask[i]:
            continue
        r = np.linalg.norm(xyz[i])
        if r < min_r or r > max_r:
            continue
        if not (0 <= ring[i] < n_scan):
            continue
        col = counts[ring[i]]
        counts[ring[i]] += 1
        if col >= horizon:
            continue
        if want_idx[ring[i], col] >= 0:
            continue
        want_rng[ring[i], col] = r
        want_idx[ring[i], col] = i

    np.testing.assert_allclose(np.asarray(img.rng), want_rng, rtol=1e-6)
    got_valid = np.asarray(img.valid)
    np.testing.assert_array_equal(got_valid, want_idx >= 0)
    sel = want_idx >= 0
    np.testing.assert_allclose(np.asarray(img.xyz)[sel],
                               xyz[want_idx[sel]], atol=1e-6)


def test_livox_pipeline_end_to_end():
    """A livox-configured pipeline tracks the simulator drive (the counter
    columns preserve intra-ring arrival order = azimuth order in the sim,
    so features and registration still work)."""
    from msst_tpu.models.liosam import LioSam
    from msst_tpu.models.liosam.params import tiny_params
    from msst_tpu.utils import sim

    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=10.0, speed=2.0)
    data = sim.make_dataset(world, traj, n_scans=8, scan_dt=0.1,
                            n_scan=16, horizon=360, seed=3)
    lio = LioSam(tiny_params(sensor="livox", dynamic_init=False))
    for s in data:
        lio.process_scan(s["xyz"], s["ring"], s["time_rel"],
                         s["scan_start"], imu_t=s["imu_t"],
                         imu_gyro=s["imu_gyro"], imu_acc=s["imu_acc"],
                         imu_rpy=s["imu_rpy"])
    est = lio.trajectory.as_matrices()[:, :3, 3]
    gt0 = data[0]["gt_pose"][:3, 3]
    gt = np.stack([s["gt_pose"][:3, 3] - gt0 for s in data])
    err = np.linalg.norm(est - gt[: len(est)], axis=1).max()
    assert err < 0.5, err


def test_ouster_bag_roundtrip(tmp_path):
    """An Ouster-format bag (uint32 ns `t`, uint8 ring) replays with correct
    second-scale point times."""
    import os
    import struct

    from msst_tpu.utils.io_rosbag import iter_lio_inputs
    from test_io import encode_imu, make_tiny_bag

    n = 60
    xyz = RNG.normal(size=(n, 3)).astype(np.float32) * 5
    ring = RNG.integers(0, 16, n).astype(np.uint8)
    t_ns = (np.linspace(0, 0.1, n) * 1e9).astype(np.uint32)

    b = struct.pack("<I", 0)
    b += struct.pack("<II", 10, 0)
    b += struct.pack("<I", 5) + b"laser"
    b += struct.pack("<II", 1, n)
    fields = [(b"x", 0, 7, 1), (b"y", 4, 7, 1), (b"z", 8, 7, 1),
              (b"intensity", 12, 7, 1), (b"t", 16, 6, 1),
              (b"reflectivity", 20, 4, 1), (b"ring", 22, 2, 1),
              (b"noise", 23, 4, 1), (b"range", 25, 6, 1)]
    b += struct.pack("<I", len(fields))
    for name, off, dt, cnt in fields:
        b += struct.pack("<I", len(name)) + name
        b += struct.pack("<IBI", off, dt, cnt)
    b += b"\x00"
    point_step = 29
    b += struct.pack("<II", point_step, point_step * n)
    payload = bytearray(point_step * n)
    for i in range(n):
        struct.pack_into("<ffff", payload, i * point_step, *xyz[i], 100.0)
        struct.pack_into("<I", payload, i * point_step + 16, int(t_ns[i]))
        struct.pack_into("<H", payload, i * point_step + 20, 5)
        struct.pack_into("<B", payload, i * point_step + 22, int(ring[i]))
        struct.pack_into("<H", payload, i * point_step + 23, 0)
        struct.pack_into("<I", payload, i * point_step + 25, 1000)
    b += struct.pack("<I", len(payload)) + bytes(payload)
    b += b"\x01"

    path = os.path.join(tmp_path, "ouster.bag")
    imu = [(10.0 + k * 0.01, encode_imu(10.0 + k * 0.01, (0, 0, 0.1),
                                        (0, 0, 9.8))) for k in range(30)]
    make_tiny_bag(path, imu, [(10.2, b)])
    scans = list(iter_lio_inputs(path, "/points", "/imu"))
    assert len(scans) == 1
    s = scans[0]
    np.testing.assert_allclose(s["xyz"], xyz, atol=1e-5)
    np.testing.assert_array_equal(s["ring"], ring.astype(np.int32))
    np.testing.assert_allclose(s["time_rel"], np.linspace(0, 0.1, n),
                               atol=1e-6)
