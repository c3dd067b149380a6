"""Vendor LiDAR packet decoding (host-side).

Rebuild of the driver stack ``timoo/`` + ``tmlidar_ws/`` (the two
Velodyne-style vendor forks): 1206-byte UDP packets of 12 blocks x (0xFFEE
flag, 2-byte azimuth in 0.01 deg, 32 x [2-byte distance, 1-byte intensity]),
dual-firing 16-laser unpack with per-point timing offsets
(``timoo_pointcloud/src/lib/rawdata.cc:306-519``, ``buildTimings`` :148-176),
per-laser vertical angles, distance resolution, ring filtering and azimuth
window (:212-232).

Two implementations behind one API:
* a vectorized NumPy decoder (always available), and
* the C++ batch decoder in ``msst_tpu/native`` via ctypes (same memory
  layout), used automatically when the shared library is built.

Both decode a whole scan's packet batch at once — the TPU pipeline consumes
the resulting arrays directly.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

PACKET_SIZE = 1206
BLOCKS_PER_PACKET = 12
CHANNELS_PER_BLOCK = 32
LASERS = 16
BLOCK_FLAG = 0xEEFF

# VLP-16-class vertical angles (degrees), ring order laser id 0..15
VLP16_VERT_ANGLES = np.array(
    [-15, 1, -13, 3, -11, 5, -9, 7, -7, 9, -5, 11, -3, 13, -1, 15],
    dtype=np.float32,
)
# laser id -> ring index (sorted by elevation)
VLP16_RING = np.argsort(VLP16_VERT_ANGLES).argsort().astype(np.int32)

# timing (rawdata.cc buildTimings: full firing cycle 55.296us, single 2.304us
# for VLP16; the TM16 fork uses 49.152/3.072 — configurable)
FIRING_CYCLE_US = 55.296
SINGLE_FIRING_US = 2.304


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    distance_resolution: float = 0.002
    min_range: float = 0.4
    max_range: float = 130.0
    vert_angles_deg: tuple = tuple(VLP16_VERT_ANGLES.tolist())
    firing_cycle_us: float = FIRING_CYCLE_US
    single_firing_us: float = SINGLE_FIRING_US
    hide_rings: tuple = ()            # ring filtering (`hide_line` :212-214)
    azimuth_min_deg: float = 0.0      # azimuth window filter (:222-232)
    azimuth_max_deg: float = 360.0


def decode_packets_numpy(packets: np.ndarray, cfg: DecoderConfig = DecoderConfig()):
    """packets: (P, 1206) uint8.  Returns dict of flat arrays
    (x, y, z, intensity, ring, time_us, azimuth_deg, valid)."""
    P = packets.shape[0]
    assert packets.shape[1] == PACKET_SIZE
    body = packets[:, : BLOCKS_PER_PACKET * 100].reshape(P, BLOCKS_PER_PACKET, 100)
    flag = body[:, :, 0].astype(np.uint16) | (body[:, :, 1].astype(np.uint16) << 8)
    az_raw = body[:, :, 2].astype(np.uint32) | (body[:, :, 3].astype(np.uint32) << 8)
    az = az_raw.astype(np.float32) / 100.0                     # (P, 12)
    ch = body[:, :, 4:].reshape(P, BLOCKS_PER_PACKET, CHANNELS_PER_BLOCK, 3)
    dist_raw = ch[..., 0].astype(np.uint32) | (ch[..., 1].astype(np.uint32) << 8)
    intensity = ch[..., 2].astype(np.float32)

    # azimuth interpolation between blocks for the second firing group
    az_next = np.roll(az, -1, axis=1)
    az_next[:, -1] = az[:, -1] + (az[:, -1] - az[:, -2]) % 360.0
    az_diff = (az_next - az) % 360.0
    # channel j: lasers 0..15 = firing 1 (block azimuth), 16..31 = firing 2
    firing2 = np.arange(CHANNELS_PER_BLOCK) >= LASERS            # (32,)
    az_pt = az[..., None] + np.where(firing2, az_diff[..., None] * 0.5, 0.0)
    az_pt = az_pt % 360.0                                        # (P, 12, 32)

    laser = (np.arange(CHANNELS_PER_BLOCK) % LASERS)
    vert = np.asarray(cfg.vert_angles_deg, np.float32)[laser]    # (32,)
    ring = VLP16_RING[laser]                                     # (32,)

    dist = dist_raw.astype(np.float32) * cfg.distance_resolution
    valid = (flag == BLOCK_FLAG)[..., None] & (dist >= cfg.min_range) & (
        dist <= cfg.max_range)
    if cfg.hide_rings:
        hidden = np.isin(ring, np.asarray(cfg.hide_rings))
        valid &= ~hidden
    if cfg.azimuth_min_deg > 0 or cfg.azimuth_max_deg < 360:
        valid &= (az_pt >= cfg.azimuth_min_deg) & (az_pt <= cfg.azimuth_max_deg)

    az_rad = np.radians(az_pt)
    el_rad = np.radians(vert)[None, None, :]
    cos_el = np.cos(el_rad)
    # Velodyne convention (rawdata.cc:334-460): x = d cos(el) sin(az),
    # y = d cos(el) cos(az), z = d sin(el)
    x = dist * cos_el * np.sin(az_rad)
    y = dist * cos_el * np.cos(az_rad)
    z = dist * np.sin(el_rad)

    # per-point time offsets: block*2 firings + in-firing laser sequence
    blk = np.arange(BLOCKS_PER_PACKET)[None, :, None]
    seq = blk * 2 + firing2.astype(np.int64)
    t_us = seq * cfg.firing_cycle_us + laser * cfg.single_firing_us
    t_us = np.broadcast_to(t_us, dist.shape).astype(np.float32)

    flat = lambda a: np.broadcast_to(a, dist.shape).reshape(-1)  # noqa: E731
    return {
        "x": x.reshape(-1).astype(np.float32),
        "y": y.reshape(-1).astype(np.float32),
        "z": z.reshape(-1).astype(np.float32),
        "intensity": flat(intensity).astype(np.float32),
        "ring": flat(ring).astype(np.int32),
        "time_us": t_us.reshape(-1),
        "azimuth_deg": az_pt.reshape(-1).astype(np.float32),
        "valid": valid.reshape(-1),
    }


_native = None


def _load_native():
    global _native
    if _native is not None:
        return _native
    import ctypes

    path = os.path.join(os.path.dirname(__file__), "..", "native",
                        "libmsst_native.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        _native = False
        return False
    lib = ctypes.CDLL(path)
    lib.decode_packets.restype = ctypes.c_int
    lib.decode_packets.argtypes = [
        ctypes.c_void_p, ctypes.c_int,          # packets, n
        ctypes.c_float, ctypes.c_float, ctypes.c_float,  # res, min, max
        ctypes.c_void_p,                        # vert angles (16 f32)
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # x, y, z
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # inten, ring, t
        ctypes.c_void_p,                        # valid (uint8)
    ]
    _native = lib
    return lib


def decode_packets(packets: np.ndarray, cfg: DecoderConfig = DecoderConfig(),
                   force_numpy: bool = False):
    """Decode a packet batch; uses the native C++ decoder when built."""
    lib = None if force_numpy else _load_native()
    if not lib:
        return decode_packets_numpy(packets, cfg)

    import ctypes

    P = packets.shape[0]
    n = P * BLOCKS_PER_PACKET * CHANNELS_PER_BLOCK
    pk = np.ascontiguousarray(packets, np.uint8)
    va = np.asarray(cfg.vert_angles_deg, np.float32)
    x = np.empty(n, np.float32)
    y = np.empty(n, np.float32)
    z = np.empty(n, np.float32)
    inten = np.empty(n, np.float32)
    ring = np.empty(n, np.int32)
    t_us = np.empty(n, np.float32)
    valid = np.empty(n, np.uint8)
    lib.decode_packets(
        pk.ctypes.data, P, cfg.distance_resolution, cfg.min_range,
        cfg.max_range, va.ctypes.data,
        x.ctypes.data, y.ctypes.data, z.ctypes.data,
        inten.ctypes.data, ring.ctypes.data, t_us.ctypes.data,
        valid.ctypes.data,
    )
    out = {"x": x, "y": y, "z": z, "intensity": inten, "ring": ring,
           "time_us": t_us, "valid": valid.astype(bool)}
    # azimuth window / ring filters applied on top (kept in python: cheap)
    if cfg.hide_rings:
        out["valid"] &= ~np.isin(out["ring"], np.asarray(cfg.hide_rings))
    return out


def packets_to_scan(packets: np.ndarray, cfg: DecoderConfig = DecoderConfig()):
    """Decode + compact to the (xyz, ring, time_rel) arrays the LIO frontend
    takes (the convert-node role, ``convert.cc:126``)."""
    d = decode_packets(packets, cfg)
    v = d["valid"]
    xyz = np.stack([d["x"][v], d["y"][v], d["z"][v]], axis=1)
    t = d["time_us"][v]
    return xyz, d["ring"][v], (t - t.min()) * 1e-6, d["intensity"][v]
