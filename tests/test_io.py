import os
import struct
import tempfile

import numpy as np
import pytest

from msst_tpu.utils import io_pcd, packets, sync
from msst_tpu.utils.modbus import (ModbusTcpClient, ModbusTcpServer,
                                   float_to_registers, registers_to_float)

RNG = np.random.default_rng(13)


# ---------------------------------------------------------------------------
# packets


def make_packet(azimuths, dist_m=10.0, intensity=100, res=0.002):
    """Build one synthetic 1206-byte packet with given 12 block azimuths."""
    pkt = bytearray(1206)
    for b, az in enumerate(azimuths):
        o = b * 100
        pkt[o:o + 2] = struct.pack("<H", 0xEEFF)
        pkt[o + 2:o + 4] = struct.pack("<H", int(az * 100) % 36000)
        for c in range(32):
            d = int(dist_m / res)
            pkt[o + 4 + c * 3:o + 4 + c * 3 + 2] = struct.pack("<H", d)
            pkt[o + 4 + c * 3 + 2] = intensity
    return bytes(pkt)


def test_decode_packets_numpy_geometry():
    pkt = np.frombuffer(make_packet([0.0] * 12), np.uint8).reshape(1, 1206)
    out = packets.decode_packets_numpy(pkt)
    v = out["valid"]
    assert v.all()
    r = np.sqrt(out["x"] ** 2 + out["y"] ** 2 + out["z"] ** 2)
    np.testing.assert_allclose(r, 10.0, atol=1e-3)
    # azimuth 0 -> x = d cos(el) sin(0) = 0, y = d cos(el)
    np.testing.assert_allclose(out["x"][:16], 0.0, atol=1e-4)
    assert (out["y"][:16] > 9.0).all()
    # rings are a permutation of 0..15
    assert sorted(set(out["ring"].tolist())) == list(range(16))
    # intensities preserved
    np.testing.assert_allclose(out["intensity"], 100.0)


def test_decode_packets_native_matches_numpy():
    lib = packets._load_native()
    if not lib:
        pytest.skip("native library not built")
    azs = np.linspace(0, 350, 12)
    pkts = np.stack([
        np.frombuffer(make_packet(azs + i), np.uint8) for i in range(4)
    ])
    a = packets.decode_packets_numpy(pkts)
    b = packets.decode_packets(pkts)
    np.testing.assert_array_equal(a["valid"], b["valid"])
    for k in ("x", "y", "z", "intensity", "time_us"):
        np.testing.assert_allclose(a[k][a["valid"]], b[k][b["valid"]], atol=2e-3)
    np.testing.assert_array_equal(a["ring"], b["ring"])


def test_packets_to_scan():
    pkts = np.stack([np.frombuffer(make_packet(np.linspace(0, 350, 12)), np.uint8)])
    xyz, ring, trel, inten = packets.packets_to_scan(pkts)
    assert xyz.shape[1] == 3 and len(xyz) == 384
    # one packet spans 12 blocks x 2 firings x 55.296 us ~ 1.33 ms
    assert trel.min() == 0.0 and trel.max() < 2e-3


def test_invalid_flag_rejected():
    pkt = bytearray(make_packet([0.0] * 12))
    pkt[0:2] = b"\x00\x00"  # corrupt first block flag
    out = packets.decode_packets_numpy(
        np.frombuffer(bytes(pkt), np.uint8).reshape(1, 1206))
    assert not out["valid"][:32].any()
    assert out["valid"][32:].all()


# ---------------------------------------------------------------------------
# pcd


def test_pcd_roundtrip_binary_and_ascii(tmp_path):
    xyz = RNG.normal(size=(100, 3)).astype(np.float32)
    inten = RNG.uniform(0, 255, 100).astype(np.float32)
    for binary in (True, False):
        p = os.path.join(tmp_path, f"t_{binary}.pcd")
        io_pcd.write_pcd(p, xyz, inten, binary=binary)
        back = io_pcd.read_pcd(p)
        np.testing.assert_allclose(back["xyz"], xyz, atol=1e-5)
        np.testing.assert_allclose(back["fields"]["intensity"], inten, atol=1e-4)


# ---------------------------------------------------------------------------
# sync


def test_approximate_time_sync():
    got = []
    s = sync.ApproximateTimeSynchronizer(2, slop=0.02,
                                         callback=lambda a, b: got.append((a, b)))
    for k in range(5):
        t = k * 0.1
        s.push(0, t, f"a{k}")
        s.push(1, t + 0.005, f"b{k}")
    assert got == [(f"a{k}", f"b{k}") for k in range(5)]


def test_approximate_time_sync_drops_unmatched():
    got = []
    s = sync.ApproximateTimeSynchronizer(2, slop=0.01,
                                         callback=lambda a, b: got.append((a, b)))
    s.push(0, 0.0, "a0")        # never matched (b stream starts at 0.5)
    s.push(0, 0.5, "a1")
    s.push(1, 0.501, "b1")
    assert got == [("a1", "b1")]


def test_imu_lidar_sync():
    s = sync.ImuLidarSync()
    for k in range(20):
        s.push_imu(k * 0.01, k)
    out = s.on_lidar(0.095)
    assert [m for _, m in out] == list(range(10))
    out2 = s.on_lidar(0.155)
    assert [m for _, m in out2] == list(range(10, 16))


# ---------------------------------------------------------------------------
# modbus


def test_modbus_float_roundtrip():
    for v in (0.0, 1.5, -123.25, 3.14159):
        hi, lo = float_to_registers(v)
        assert abs(registers_to_float(hi, lo) - v) < 1e-5


def test_modbus_server_client_roundtrip():
    srv = ModbusTcpServer(host="127.0.0.1", port=0)
    srv.start()
    try:
        srv.set_float(0, 42.5)
        srv.set_registers(10, [7, 8, 9])
        cli = ModbusTcpClient("127.0.0.1", srv.port)
        cli.connect()
        regs = cli.read_registers(0, 2)
        assert abs(registers_to_float(regs[0], regs[1]) - 42.5) < 1e-5
        assert cli.read_registers(10, 3) == [7, 8, 9]
        cli.close()
    finally:
        srv.stop()


# ---------------------------------------------------------------------------
# rosbag (synthetic writer -> reader roundtrip)


def _bag_header_record(fields: dict) -> bytes:
    h = b""
    for k, v in fields.items():
        entry = k.encode() + b"=" + v
        h += struct.pack("<I", len(entry)) + entry
    return h


def _record(fields: dict, data: bytes) -> bytes:
    h = _bag_header_record(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def make_tiny_bag(path, imu_msgs, cloud_msgs):
    """Write a minimal uncompressed rosbag 2.0 with one chunk."""
    chunk = b""
    # connections
    chunk += _record(
        {"op": b"\x07", "conn": (0).to_bytes(4, "little"), "topic": b"/imu"},
        _bag_header_record({"type": b"sensor_msgs/Imu", "md5sum": b"x",
                            "topic": b"/imu"}))
    chunk += _record(
        {"op": b"\x07", "conn": (1).to_bytes(4, "little"), "topic": b"/points"},
        _bag_header_record({"type": b"sensor_msgs/PointCloud2", "md5sum": b"y",
                            "topic": b"/points"}))
    for stamp, raw in imu_msgs:
        sec, nsec = int(stamp), int((stamp % 1) * 1e9)
        chunk += _record({"op": b"\x02", "conn": (0).to_bytes(4, "little"),
                          "time": struct.pack("<II", sec, nsec)}, raw)
    for stamp, raw in cloud_msgs:
        sec, nsec = int(stamp), int((stamp % 1) * 1e9)
        chunk += _record({"op": b"\x02", "conn": (1).to_bytes(4, "little"),
                          "time": struct.pack("<II", sec, nsec)}, raw)
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({"op": b"\x05", "compression": b"none",
                         "size": struct.pack("<I", len(chunk))}, chunk))


def encode_imu(stamp, gyro, acc):
    b = struct.pack("<I", 0)
    b += struct.pack("<II", int(stamp), int((stamp % 1) * 1e9))
    b += struct.pack("<I", 3) + b"imu"
    b += struct.pack("<4d", 0, 0, 0, 1)
    b += b"\x00" * 72
    b += struct.pack("<3d", *gyro)
    b += b"\x00" * 72
    b += struct.pack("<3d", *acc)
    b += b"\x00" * 72
    return b


def encode_cloud(stamp, xyz, ring, trel):
    n = len(xyz)
    b = struct.pack("<I", 0)
    b += struct.pack("<II", int(stamp), int((stamp % 1) * 1e9))
    b += struct.pack("<I", 5) + b"lidar"
    b += struct.pack("<II", 1, n)
    fields = [(b"x", 0, 7, 1), (b"y", 4, 7, 1), (b"z", 8, 7, 1),
              (b"ring", 12, 4, 1), (b"time", 14, 7, 1)]
    b += struct.pack("<I", len(fields))
    for name, off, dt, cnt in fields:
        b += struct.pack("<I", len(name)) + name
        b += struct.pack("<IBI", off, dt, cnt)
    b += b"\x00"                       # bigendian
    point_step = 18
    b += struct.pack("<II", point_step, point_step * n)
    payload = bytearray(point_step * n)
    for i in range(n):
        struct.pack_into("<fff", payload, i * point_step, *xyz[i])
        struct.pack_into("<H", payload, i * point_step + 12, int(ring[i]))
        struct.pack_into("<f", payload, i * point_step + 14, float(trel[i]))
    b += struct.pack("<I", len(payload)) + bytes(payload)
    b += b"\x01"                       # is_dense
    return b


def test_rosbag_roundtrip(tmp_path):
    from msst_tpu.utils.io_rosbag import iter_lio_inputs

    path = os.path.join(tmp_path, "tiny.bag")
    xyz = RNG.normal(size=(50, 3)).astype(np.float32) * 5
    ring = RNG.integers(0, 16, 50)
    trel = np.linspace(0, 0.1, 50).astype(np.float32)
    imu = [(10.0 + k * 0.01, encode_imu(10.0 + k * 0.01, (0.1, 0, 0), (0, 0, 9.8)))
           for k in range(30)]
    clouds = [(10.2, encode_cloud(10.2, xyz, ring, trel))]
    make_tiny_bag(path, imu, clouds)

    scans = list(iter_lio_inputs(path, "/points", "/imu"))
    assert len(scans) == 1
    s = scans[0]
    np.testing.assert_allclose(s["xyz"], xyz, atol=1e-5)
    np.testing.assert_array_equal(s["ring"], ring)
    assert abs(s["scan_start"] - 10.2) < 1e-6
    assert len(s["imu_t"]) > 20
    np.testing.assert_allclose(s["imu_gyro"][:, 0], 0.1, atol=1e-6)


def test_lio_bag_cli_end_to_end(tmp_path):
    """Replay a synthetic bag through the msst CLI into a trajectory file."""
    import subprocess
    import sys

    from msst_tpu.utils import sim

    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=10.0, speed=2.0)
    data = sim.make_dataset(world, traj, n_scans=4, scan_dt=0.1,
                            n_scan=16, horizon=360, seed=9)
    imu_msgs, cloud_msgs = [], []
    for s in data:
        for k in range(len(s["imu_t"])):
            imu_msgs.append((float(s["imu_t"][k]),
                             encode_imu(float(s["imu_t"][k]),
                                        s["imu_gyro"][k], s["imu_acc"][k])))
        cloud_msgs.append((s["scan_start"] + 1000.0,
                           encode_cloud(s["scan_start"] + 1000.0,
                                        s["xyz"], s["ring"], s["time_rel"])))
    # shift imu stamps to match clouds
    imu_msgs = [(t + 1000.0, encode_imu(t + 1000.0, g, a)) for (t, _), g, a in
                zip(imu_msgs, np.concatenate([s["imu_gyro"] for s in data]),
                    np.concatenate([s["imu_acc"] for s in data]))]
    bag = os.path.join(tmp_path, "session.bag")
    make_tiny_bag(bag, imu_msgs, cloud_msgs)

    out = os.path.join(tmp_path, "traj.txt")
    r = subprocess.run(
        [sys.executable, "-m", "msst_tpu.cli", "lio-bag", bag,
         "--cloud-topic", "/points", "--imu-topic", "/imu",
         "--tiny", "--output", out],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    traj_out = np.loadtxt(out)
    assert traj_out.shape == (4, 12)
    assert np.isfinite(traj_out).all()


def test_lio_kitti_cli_on_synthetic_drive(tmp_path):
    """Build a synthetic KITTI raw drive dir from the simulator and replay it
    through the lio-kitti CLI (including the OXTS accuracy report path)."""
    import datetime
    import subprocess
    import sys

    from scipy.spatial.transform import Rotation as Rs

    from msst_tpu.utils import sim

    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=10.0, speed=2.0)
    data = sim.make_dataset(world, traj, n_scans=4, scan_dt=0.1,
                            n_scan=16, horizon=360, seed=21)
    d = tmp_path / "2011_09_26" / "drive_sync"
    (d / "velodyne_points" / "data").mkdir(parents=True)
    (d / "oxts" / "data").mkdir(parents=True)

    def fmt_ts(t):
        base = datetime.datetime(2011, 9, 26, 12, 0, 0)
        dt = base + datetime.timedelta(seconds=t)
        return f"{dt.strftime('%Y-%m-%d %H:%M:%S')}.{dt.microsecond:06d}000"

    velo_ts, oxts_ts = [], []
    lat0, lon0 = 48.0, 11.0
    re = 6378137.0
    for i, s in enumerate(data):
        pts = np.concatenate([s["xyz"], np.ones((len(s["xyz"]), 1), np.float32)], 1)
        pts.astype(np.float32).tofile(d / "velodyne_points" / "data" / f"{i:010d}.bin")
        velo_ts.append(fmt_ts(s["scan_start"]))
    (d / "velodyne_points" / "timestamps.txt").write_text("\n".join(velo_ts) + "\n")

    # oxts samples at imu rate covering the drive
    t_all = data[0]["imu_t"].tolist()
    for s in data[1:]:
        t_all += [t for t in s["imu_t"] if t > t_all[-1]]
    k = 0
    for t in t_all:
        T = traj.pose(float(t))
        rpy = Rs.from_matrix(T[:3, :3]).as_euler("xyz")
        lat = lat0 + T[1, 3] / re * 180 / np.pi
        lon = lon0 + T[0, 3] / (re * np.cos(np.radians(lat0))) * 180 / np.pi
        # find sim imu sample for gyro/acc
        row = [lat, lon, 500.0 + T[2, 3], *rpy] + [0.0] * 5
        row += [0.0, 0.0, 9.80511, 0.0, 0.0, 0.0]  # ax..au
        row += [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]      # wx..wu
        row += [1.0, 1.0, 4.0, 11.0, 0.0, 0.0]
        np.savetxt(d / "oxts" / "data" / f"{k:010d}.txt", np.asarray(row)[None], fmt="%.9f")
        oxts_ts.append(fmt_ts(float(t)))
        k += 1
    (d / "oxts" / "timestamps.txt").write_text("\n".join(oxts_ts) + "\n")

    out = tmp_path / "traj.txt"
    r = subprocess.run(
        [sys.executable, "-m", "msst_tpu.cli", "lio-kitti", str(d),
         "--rings", "16", "--tiny", "--output", str(out)],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = np.loadtxt(out)
    assert got.shape == (4, 12)
    assert "ATE RMSE" in r.stdout
