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


def make_packet(azimuths, dist_m=10.0, intensity=100, res=0.002, flags=None,
                dists=None):
    """Build one synthetic 1206-byte packet with given 12 block azimuths.
    `dists`: optional (12, 32) per-channel distances in meters."""
    pkt = bytearray(1206)
    for b, az in enumerate(azimuths):
        o = b * 100
        pkt[o:o + 2] = struct.pack("<H", 0xEEFF if flags is None else flags[b])
        pkt[o + 2:o + 4] = struct.pack("<H", int(az * 100) % 36000)
        for c in range(32):
            dm = dist_m if dists is None else dists[b][c]
            d = int(round(dm / res))
            pkt[o + 4 + c * 3:o + 4 + c * 3 + 2] = struct.pack("<H", d)
            pkt[o + 4 + c * 3 + 2] = intensity
    return bytes(pkt)


def oracle_point(cfg, laser, raw, az_cd, inten_raw, tm16):
    """Independent scalar transliteration of the reference correction math
    (rawdata.cc:334-460 / :620-735) used as the decode oracle."""
    import math

    tab = cfg.laser_tables()
    dist = raw * cfg.distance_resolution + tab["dist"][laser]
    az = math.radians(az_cd / 100.0)
    rc = float(tab["rot_rad"][laser])
    cos_rot = math.cos(az) * math.cos(rc) + math.sin(az) * math.sin(rc)
    sin_rot = math.sin(az) * math.cos(rc) - math.cos(az) * math.sin(rc)
    cv, sv = math.cos(tab["vert_rad"][laser]), math.sin(tab["vert_rad"][laser])
    vo, ho = float(tab["vert_off"][laser]), float(tab["horiz_off"][laser])
    xy = dist * cv - vo * sv
    xx = abs(xy * sin_rot - ho * cos_rot)
    yy = abs(xy * cos_rot + ho * sin_rot)
    cx = cy = 0.0
    if tab["two_pt"][laser]:
        dc, dcx, dcy = (float(tab["dist"][laser]), float(tab["dist_x"][laser]),
                        float(tab["dist_y"][laser]))
        cx = (dc - dcx) * (xx - 2.4) / (25.04 - 2.4) + dcx - dc
        cy = (dc - dcy) * (yy - 1.93) / (25.04 - 1.93) + dcy - dc
    x = ((dist + cx) * cv - vo * sv) * sin_rot - ho * cos_rot
    y = ((dist + cy) * cv - vo * sv) * cos_rot + ho * sin_rot
    z = (dist + cy) * sv + vo * cv
    fo = 256.0 * (1 - tab["focal_dist"][laser] / 13100.0) ** 2
    term = 256.0 * (1 - (raw // 65535 if tm16 else raw / 65535.0)) ** 2
    inten = inten_raw + tab["focal_slope"][laser] * abs(fo - term)
    inten = min(max(inten, tab["min_int"][laser]), tab["max_int"][laser])
    return y, -x, z, inten, dist


# a deliberately non-ideal calibration exercising every correction field
RICH_CFG = packets.DecoderConfig(
    rot_correction_deg=tuple(np.linspace(-2.0, 2.0, 16)),
    dist_correction=tuple(np.linspace(-0.05, 0.08, 16)),
    two_pt_correction_available=(1,) * 8 + (0,) * 8,
    dist_correction_x=tuple(np.linspace(0.01, 0.06, 16)),
    dist_correction_y=tuple(np.linspace(-0.04, 0.02, 16)),
    vert_offset_correction=tuple(np.linspace(-0.02, 0.02, 16)),
    horiz_offset_correction=tuple(np.linspace(-0.03, 0.03, 16)),
    focal_distance=(1000.0,) * 16,
    focal_slope=(0.5,) * 16,
    min_intensity=(2.0,) * 16,
    max_intensity=(250.0,) * 16,
)


def test_decode_packets_numpy_geometry():
    pkt = np.frombuffer(make_packet([0.0] * 12), np.uint8).reshape(1, 1206)
    out = packets.decode_packets_numpy(pkt)
    v = out["valid"]
    assert v.all()
    r = np.sqrt(out["x"] ** 2 + out["y"] ** 2 + out["z"] ** 2)
    np.testing.assert_allclose(r, 10.0, atol=1e-3)
    # azimuth 0, ROS frame (rawdata.cc:454-456): x = d cos(el), y = 0
    assert (out["x"][:16] > 9.0).all()
    np.testing.assert_allclose(out["y"][:16], 0.0, atol=1e-4)
    # rings are a permutation of 0..15
    assert sorted(set(out["ring"].tolist())) == list(range(16))
    # intensities preserved (default calibration: no focal correction)
    np.testing.assert_allclose(out["intensity"], 100.0)


def test_decode_matches_scalar_oracle_with_corrections():
    """NumPy decode == independent scalar oracle for a non-ideal per-laser
    calibration (rot/dist/two-pt/offset/focal corrections all non-zero)."""
    az = 37.0
    pkt = np.frombuffer(make_packet([az] * 12, dist_m=12.345), np.uint8
                        ).reshape(1, 1206)
    out = packets.decode_packets_numpy(pkt, RICH_CFG)
    # same azimuth in every block -> az_diff = 0 -> per-point azimuth = block
    az_cd = int(az * 100)
    raw = int(round(12.345 / RICH_CFG.distance_resolution))
    for laser in range(16):
        ex, ey, ez, ei, _ = oracle_point(RICH_CFG, laser, raw, az_cd, 100, True)
        np.testing.assert_allclose(
            [out["x"][laser], out["y"][laser], out["z"][laser],
             out["intensity"][laser]],
            [ex, ey, ez, ei], atol=1e-4,
            err_msg=f"laser {laser}")


def test_decode_timing_matches_reference_formula():
    """Per-point times follow buildTimings (rawdata.cc:158-176): full cycle
    49.152 us, single firing 3.072 us, offsets rebased to the packet end."""
    pkt = np.frombuffer(make_packet([10.0] * 12), np.uint8).reshape(1, 1206)
    out = packets.decode_packets_numpy(pkt)
    t = out["time_us"].reshape(12, 2, 16)
    for block in (0, 5, 11):
        for firing in (0, 1):
            for dsr in (0, 7, 15):
                expected = (49.152 * (block * 2 + firing)
                            + 3.072 * (dsr + 1) - 1179.648)
                assert abs(t[block, firing, dsr] - expected) < 1e-3
    # last point of the packet fires at the packet stamp (offset 0)
    assert abs(t[11, 1, 15]) < 1e-3


def test_decode_azimuth_interpolation():
    """Within a block, firing 2 advances by cycle/blockdur = half the block
    step and each dsr adds single/blockdur (unpack_tm16 :585-591)."""
    azs = np.arange(12) * 0.4  # 0.4 deg per block
    pkt = np.frombuffer(make_packet(azs.tolist()), np.uint8).reshape(1, 1206)
    out = packets.decode_packets_numpy(pkt)
    az = out["azimuth_deg"].reshape(12, 2, 16)
    np.testing.assert_allclose(az[0, 0, 0], 0.0, atol=0.011)
    np.testing.assert_allclose(az[0, 1, 0], 0.2, atol=0.011)   # half step
    np.testing.assert_allclose(az[0, 0, 8], 0.4 * (8 * 3.072 / 98.304),
                               atol=0.011)
    np.testing.assert_allclose(az[3, 0, 0], 1.2, atol=0.011)


def test_decode_packets_native_matches_numpy():
    lib = packets._load_native()
    if not lib:
        pytest.skip("native library not built")
    azs = np.linspace(0, 350, 12)
    pkts = np.stack([
        np.frombuffer(make_packet(azs + i), np.uint8) for i in range(4)
    ])
    for cfg in (packets.DecoderConfig(), RICH_CFG):
        a = packets.decode_packets_numpy(pkts, cfg)
        b = packets.decode_packets(pkts, cfg)
        np.testing.assert_array_equal(a["valid"], b["valid"])
        for k in ("x", "y", "z", "intensity", "time_us", "azimuth_deg"):
            np.testing.assert_allclose(a[k][a["valid"]], b[k][b["valid"]],
                                       atol=2e-3, err_msg=k)
        np.testing.assert_array_equal(a["ring"], b["ring"])


GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "data")


def _golden_stream():
    """Deterministic varied 4-packet stream: sweeping azimuths with jitter,
    per-channel distances across the full range, zero-distance dropouts,
    distinct intensity per packet.  Regenerate the committed fixture with
    ``python -c "from tests.test_io import regen_golden; regen_golden()"``
    (only legitimate when the WIRE FORMAT intentionally changes)."""
    rng = np.random.default_rng(99)
    pkts = []
    az = 0.0
    for _ in range(4):
        azs = []
        dists = np.empty((12, 32))
        for b in range(12):
            az = (az + 0.18 + float(rng.uniform(0, 0.08))) % 360.0
            azs.append(az)
            dists[b] = rng.uniform(0.4, 95.0, size=32)
        dists[rng.uniform(size=dists.shape) < 0.06] = 0.0
        pkts.append(make_packet(azs, dists=dists,
                                intensity=int(rng.integers(5, 250))))
    return np.frombuffer(b"".join(pkts), np.uint8).reshape(4, 1206).copy()


def regen_golden():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    stream = _golden_stream()
    stream.tofile(os.path.join(GOLDEN_DIR, "golden_packets.bin"))
    out = packets.decode_packets_numpy(stream, RICH_CFG)
    np.savez(os.path.join(GOLDEN_DIR, "golden_packets_expected.npz"),
             **{k: np.asarray(v) for k, v in out.items()})
    print(f"regenerated fixtures in {GOLDEN_DIR}")


def test_golden_packet_fixture_decode():
    """Frozen wire-format pin (round-3 VERDICT #9; no real pcap is reachable
    in this egress-less environment, so the committed fixture carries the
    full 1206-byte wire layout — block flags, little-endian azimuth
    centidegrees, 3-byte returns, dropouts — through the REAL decoders):
    the checked-in byte stream and its decoded output must be reproduced
    exactly by both the NumPy and the native C decoder.  Catches any silent
    change to the correction math, timing offsets (49.152/3.072 us,
    rawdata.cc:148-176) or packing that the self-consistent tests above
    would follow along with."""
    bin_path = os.path.join(GOLDEN_DIR, "golden_packets.bin")
    npz_path = os.path.join(GOLDEN_DIR, "golden_packets_expected.npz")
    stream = np.fromfile(bin_path, np.uint8).reshape(4, 1206)
    # the generator still produces the committed bytes (fixture provenance)
    np.testing.assert_array_equal(stream, _golden_stream())

    exp = np.load(npz_path)
    out = packets.decode_packets_numpy(stream, RICH_CFG)
    assert set(exp.files) == set(out.keys())
    np.testing.assert_array_equal(out["valid"], exp["valid"])
    np.testing.assert_array_equal(out["ring"], exp["ring"])
    for k in ("x", "y", "z", "intensity", "time_us", "azimuth_deg"):
        np.testing.assert_allclose(out[k], exp[k], atol=1e-6, err_msg=k)

    lib = packets._load_native()
    if lib:
        nat = packets.decode_packets(stream, RICH_CFG)
        np.testing.assert_array_equal(nat["valid"], exp["valid"])
        v = exp["valid"]
        for k in ("x", "y", "z", "intensity", "time_us", "azimuth_deg"):
            np.testing.assert_allclose(nat[k][v], exp[k][v], atol=2e-3,
                                       err_msg=k)


def test_decode_banked_64_laser():
    """32/64-laser devices use banked blocks: 0xEEFF = lasers 0..31,
    0xDDFF = 32..63 (unpack :306-330); zero returns are skipped (:342-346)."""
    vert = tuple(np.linspace(-24.0, 2.0, 64))
    cfg = packets.DecoderConfig(num_lasers=64, vert_angles_deg=vert,
                                max_range=200.0)
    flags = [0xEEFF, 0xDDFF] * 6
    dists = np.full((12, 32), 20.0)
    dists[0, 5] = 0.0  # no return
    pkt = np.frombuffer(make_packet([90.0] * 12, flags=flags, dists=dists),
                        np.uint8).reshape(1, 1206)
    out = packets.decode_packets_numpy(pkt, cfg)
    v = out["valid"].reshape(12, 32)
    assert not v[0, 5]          # zero return dropped
    assert v[0, :5].all() and v[0, 6:].all() and v[1].all()
    ring = out["ring"].reshape(12, 32)
    # lower-bank block 1 gets lasers 32..63 -> higher elevations -> ring 32+
    assert (ring[1] >= 32).all() and (ring[0] < 32).all()
    # monotone vert table -> ring == laser id
    np.testing.assert_array_equal(ring[1], np.arange(32, 64))
    # all 64-laser times are 0 (buildTimings supports TM16 only :178-181)
    assert (out["time_us"] == 0).all()
    if packets._load_native():
        b = packets.decode_packets(pkt, cfg)
        np.testing.assert_array_equal(out["valid"], b["valid"])
        np.testing.assert_allclose(out["x"][out["valid"]],
                                   b["x"][b["valid"]], atol=2e-3)


def test_hide_line_restricts_to_azimuth_window():
    """hide_line rings keep only azimuth-window points; unlisted rings bypass
    the window entirely (unpack_tm16 :601-618)."""
    azs = np.linspace(0, 330, 12)
    pkt = np.frombuffer(make_packet(azs.tolist()), np.uint8).reshape(1, 1206)
    cfg = packets.DecoderConfig(hide_rings=(0, 1),
                                azimuth_windows=((0.0, 90.0),))
    out = packets.decode_packets_numpy(pkt, cfg)
    hidden = np.isin(out["ring"], (0, 1))
    in_win = out["azimuth_deg"] <= 90.0
    np.testing.assert_array_equal(out["valid"][hidden], in_win[hidden])
    assert out["valid"][~hidden].all()
    if packets._load_native():
        b = packets.decode_packets(pkt, cfg)
        np.testing.assert_array_equal(out["valid"], b["valid"])


def test_tm16_denoise_filter():
    """filter_tm16 (:748-796): smooth per-ring distance streams pass (with a
    one-point delay and stream edges dropped); an isolated spike is removed."""
    dists = np.full((12, 32), 10.0)
    dists[5, 3] = 30.0   # spike on dsr 3, block 5 firing 0
    pkt = np.frombuffer(make_packet([0.0] * 12, dists=dists), np.uint8
                        ).reshape(1, 1206)
    cfg = packets.DecoderConfig(filter_threshold=(10, 10, 10, 10),
                                max_range=130.0)
    out = packets.decode_packets_numpy(pkt, cfg)
    v = out["valid"].reshape(12, 2, 16)
    # the spike never gets emitted (its neighbor deltas are huge)
    assert not v[5, 0, 3]
    # smooth ring far from the spike: interior points all emitted
    assert v[3:9, :, 8].all()
    # stream edges (first point, last two) are never emitted
    assert not v[0, 0, 8] and not v[11, 1, 8]
    if packets._load_native():
        b = packets.decode_packets(pkt, cfg)
        np.testing.assert_array_equal(out["valid"], b["valid"])


def test_packets_to_scan():
    pkts = np.stack([np.frombuffer(make_packet(np.linspace(0, 350, 12)), np.uint8)])
    xyz, ring, trel, inten = packets.packets_to_scan(pkts)
    assert xyz.shape[1] == 3 and len(xyz) == 384
    # one packet spans 24 firings x 49.152 us ~ 1.18 ms
    assert trel.min() == 0.0 and trel.max() < 1.3e-3


def test_packets_to_scan_multi_packet_spans_scan():
    """Per-point times must span the whole multi-packet scan, not repeat per
    packet (uses per-packet capture stamps; ADVICE r1)."""
    azs = np.linspace(0, 350, 12)
    pkts = np.stack([np.frombuffer(make_packet(azs), np.uint8)
                     for _ in range(10)])
    stamps = 1000.0 + np.arange(10) * 0.01  # 10 ms apart
    xyz, ring, trel, inten = packets.packets_to_scan(pkts, stamps=stamps)
    assert trel.max() > 0.09   # spans ~90 ms + in-packet offsets
    # without stamps, back-to-back packet cycles still give a monotone span
    _, _, trel2, _ = packets.packets_to_scan(pkts)
    assert trel2.max() > 9 * 1179.648e-6 * 0.9


def test_invalid_flag_aborts_rest_of_packet():
    """A mangled TM16 block header drops the REST of the packet
    (unpack_tm16 :540-549), not just that block."""
    pkt = bytearray(make_packet([0.0] * 12))
    pkt[5 * 100: 5 * 100 + 2] = b"\x00\x00"  # corrupt block 5 flag
    out = packets.decode_packets_numpy(
        np.frombuffer(bytes(pkt), np.uint8).reshape(1, 1206))
    v = out["valid"].reshape(12, 32)
    assert v[:5].all()
    assert not v[5:].any()
    if packets._load_native():
        b = packets.decode_packets(
            np.frombuffer(bytes(pkt), np.uint8).reshape(1, 1206))
        np.testing.assert_array_equal(out["valid"], b["valid"])


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


def test_rings_from_elevation_infers_non_hdl64_span():
    """16-ring data at VLP-16 geometry (+-15 deg) must spread over all 16
    rings.  Regression: the fixed HDL-64E span (-24.9..2.0) collapsed
    everything above +2 deg into the top ring (6.25% correct assignment),
    scrambling the range image for every non-64-ring KITTI-layout drive."""
    from msst_tpu.utils.io_kitti import rings_from_elevation

    elev = np.linspace(-15, 15, 16)
    az = np.linspace(-np.pi, np.pi, 360, endpoint=False)
    E, A = np.meshgrid(np.radians(elev), az)
    r = 10.0
    xyz = np.stack([r * np.cos(E) * np.cos(A), r * np.cos(E) * np.sin(A),
                    r * np.sin(E)], axis=-1).reshape(-1, 3).astype(np.float32)
    true_ring = np.tile(np.arange(16), (360, 1)).reshape(-1)

    ring = rings_from_elevation(xyz, 16)
    assert (ring == true_ring).all()

    # 64-ring data keeps the HDL-64E convention (real KITTI raw dumps)
    ring64 = rings_from_elevation(xyz, 64)
    assert ring64.min() >= 0 and ring64.max() <= 63


# ---------------------------------------------------------------------------
# transform node (fixed-frame re-projection)


def test_transform_node_makes_static_world_static():
    """A sensor translating past a fixed wall: re-projecting each packet by
    the pose at its stamp (transform.cc:28-74) must collapse the wall back
    to one plane in the fixed frame, while naive accumulation smears it."""
    from msst_tpu.utils.packets import packets_to_fixed_frame

    res = 0.002
    wall_y = 20.0
    n_pkt = 8
    pkts, stamps = [], []
    vels = 5.0  # m/s along +x
    el = np.radians(packets.VLP16_VERT_ANGLES)
    for pk in range(n_pkt):
        t = pk * 0.1
        x_sensor = vels * t
        # all lasers see the wall straight ahead (azimuth 0 -> +x in the ROS
        # frame); a laser at elevation el hits the vertical wall at range
        # (wall_x - x_sensor) / cos(el)
        per_laser = (wall_y - x_sensor) / np.cos(el)
        dists = np.tile(np.tile(per_laser, 2), (12, 1))
        pkt = bytearray(make_packet([0.0] * 12, dists=dists))
        pkts.append(np.frombuffer(bytes(pkt), np.uint8))
        stamps.append(1000.0 + t)
    packets_arr = np.stack(pkts)

    pose_times = 1000.0 + np.arange(n_pkt + 1) * 0.1
    poses6 = np.zeros((n_pkt + 1, 6), np.float32)
    poses6[:, 3] = vels * np.arange(n_pkt + 1) * 0.1  # x(t)

    xyz, ring, inten = packets_to_fixed_frame(packets_arr, stamps,
                                              pose_times, poses6)
    # in the fixed frame every wall hit lies on x = wall_y (per-point firing
    # times add sub-mm motion; allow a few cm for elevation cosine effects)
    x = xyz[:, 0]
    assert np.abs(x - wall_y).max() < 0.05, np.abs(x - wall_y).max()

    # naive accumulation (no re-projection) smears the wall by the travel
    from msst_tpu.utils.packets import decode_packets
    d = decode_packets(packets_arr)
    naive_x = d["x"][d["valid"]]
    assert naive_x.max() - naive_x.min() > 3.0


def test_status_vertical_angle_override():
    """timooStatus consumption (convert.cc:75-76 -> unpackDifop,
    rawdata.cc:489-505): live vertical angles replace the config's and the
    decode uses them (ring order re-derives too)."""
    from msst_tpu.utils.packets import DecoderConfig

    cfg = DecoderConfig()
    new_angles = tuple(a + 0.5 for a in cfg.vert_angles_deg)
    cfg2 = cfg.with_status_vertical_angles(new_angles)
    assert cfg2.vert_angles_deg == new_angles
    t1, t2 = cfg.laser_tables(), cfg2.laser_tables()
    assert np.allclose(t2["vert_rad"], np.radians(new_angles))
    # ring ranks persist (uniform shift keeps ordering)
    assert np.array_equal(t1["ring"], t2["ring"])
    import pytest
    with pytest.raises(ValueError, match="vertical angles"):
        cfg.with_status_vertical_angles(new_angles[:8])


def test_kitti_iter_scans_attaches_gps(tmp_path):
    """with_gps=True attaches the nearest OXTS fix as an ENU gps_xyz +
    pos_accuracy-derived gps_sigma (the reference's gpsHandler input,
    mapOptmization.cpp:96-120); stale fixes (> gps_max_age) are dropped."""
    import datetime

    from msst_tpu.utils.io_kitti import KittiRawDrive, latlon_to_enu

    d = tmp_path / "2011_09_26" / "drive_sync"
    (d / "velodyne_points" / "data").mkdir(parents=True)
    (d / "oxts" / "data").mkdir(parents=True)

    def fmt_ts(t):
        base = datetime.datetime(2011, 9, 26, 12, 0, 0)
        dt = base + datetime.timedelta(seconds=t)
        return f"{dt.strftime('%Y-%m-%d %H:%M:%S')}.{dt.microsecond:06d}000"

    rng = np.random.default_rng(3)
    for i in range(3):
        pts = rng.normal(size=(64, 4)).astype(np.float32)
        pts.tofile(d / "velodyne_points" / "data" / f"{i:010d}.bin")
    (d / "velodyne_points" / "timestamps.txt").write_text(
        "\n".join(fmt_ts(0.1 * i) for i in range(3)) + "\n")

    # fixes at scans 0 and 1 (x displacement 5 m east); scan 2 has no fix
    # within the age gate
    lat0, lon0 = 48.0, 11.0
    re = 6378137.0
    lons = [lon0, lon0 + 5.0 / (re * np.cos(np.radians(lat0))) * 180 / np.pi]
    for k, lon in enumerate(lons):
        row = [lat0, lon, 500.0, 0, 0, 0] + [0.0] * 17 + [1.5, 0.02, 4, 11, 0, 0]
        np.savetxt(d / "oxts" / "data" / f"{k:010d}.txt",
                   np.asarray(row)[None], fmt="%.9f")
    (d / "oxts" / "timestamps.txt").write_text(
        fmt_ts(0.0) + "\n" + fmt_ts(0.1) + "\n")

    drive = KittiRawDrive(str(d), n_rings=16)
    scans = list(drive.iter_scans(with_gps=True))
    assert "gps_xyz" in scans[0] and "gps_xyz" in scans[1]
    np.testing.assert_allclose(scans[0]["gps_xyz"], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(scans[1]["gps_xyz"], [5, 0, 0], atol=1e-3)
    np.testing.assert_allclose(scans[1]["gps_sigma"], 1.5)
    # scan 2 (t=0.2): nearest fix is 0.1 s old — inside the default 0.2 s
    # age gate, dropped under a tighter one
    assert "gps_xyz" in scans[2]
    scans_tight = list(drive.iter_scans(with_gps=True, gps_max_age=0.05))
    assert "gps_xyz" in scans_tight[1]
    assert "gps_xyz" not in scans_tight[2]
