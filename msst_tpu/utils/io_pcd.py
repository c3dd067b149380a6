"""PCD file I/O (the pcl::io role: calibration goldens, save_map export).

Supports ascii and binary PCD v0.7 with arbitrary scalar fields — enough to
read the reference's shipped calibration inputs
(``SensorsCalibration/lidar2lidar/auto_calib/data/``, ``Multi_LiCa/data/``)
and to write ``save_map``-style exports (``mapOptmization.cpp:355-419``).
"""

from __future__ import annotations

import numpy as np

_TYPEMAP = {
    ("F", 4): np.float32, ("F", 8): np.float64,
    ("I", 1): np.int8, ("I", 2): np.int16, ("I", 4): np.int32,
    ("U", 1): np.uint8, ("U", 2): np.uint16, ("U", 4): np.uint32,
}


def read_pcd(path: str) -> dict:
    """Returns {"xyz": (N,3) f32, "fields": {name: (N,) array}}."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            if not line or line.startswith("#"):
                continue
            key, _, val = line.partition(" ")
            header[key.upper()] = val
            if key.upper() == "DATA":
                break
        fields = header["FIELDS"].split()
        sizes = list(map(int, header["SIZE"].split()))
        types = header["TYPE"].split()
        counts = list(map(int, header.get("COUNT", " ".join(["1"] * len(fields))).split()))
        n = int(header["POINTS"])
        mode = header["DATA"]

        dtypes = []
        for name, t, s, c in zip(fields, types, sizes, counts):
            base = _TYPEMAP[(t, s)]
            if c == 1:
                dtypes.append((name, base))
            else:
                dtypes.append((name, base, (c,)))
        dt = np.dtype(dtypes)

        if mode == "ascii":
            raw = np.loadtxt(f, dtype=np.float64, max_rows=n)
            raw = np.atleast_2d(raw)
            rec = np.zeros(n, dt)
            col = 0
            for name, t, s, c in zip(fields, types, sizes, counts):
                w = c
                vals = raw[:, col:col + w]
                rec[name] = vals[:, 0] if w == 1 else vals
                col += w
        elif mode == "binary":
            rec = np.frombuffer(f.read(n * dt.itemsize), dtype=dt, count=n)
        else:
            raise ValueError(f"unsupported PCD DATA mode: {mode}")

    out_fields = {name: np.asarray(rec[name]) for name in rec.dtype.names}
    xyz = np.stack([out_fields.get(k, np.zeros(n)) for k in ("x", "y", "z")],
                   axis=1).astype(np.float32)
    return {"xyz": xyz, "fields": out_fields}


def write_pcd(path: str, xyz: np.ndarray, intensity: np.ndarray | None = None,
              binary: bool = True):
    n = len(xyz)
    fields = ["x", "y", "z"] + (["intensity"] if intensity is not None else [])
    k = len(fields)
    header = "\n".join([
        "# .PCD v0.7 - Point Cloud Data file format",
        "VERSION 0.7",
        f"FIELDS {' '.join(fields)}",
        f"SIZE {' '.join(['4'] * k)}",
        f"TYPE {' '.join(['F'] * k)}",
        f"COUNT {' '.join(['1'] * k)}",
        f"WIDTH {n}",
        "HEIGHT 1",
        "VIEWPOINT 0 0 0 1 0 0 0",
        f"POINTS {n}",
        f"DATA {'binary' if binary else 'ascii'}",
    ]) + "\n"
    cols = [np.asarray(xyz, np.float32)]
    if intensity is not None:
        cols.append(np.asarray(intensity, np.float32).reshape(-1, 1))
    data = np.concatenate(cols, axis=1).astype(np.float32)
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if binary:
            f.write(data.tobytes())
        else:
            np.savetxt(f, data, fmt="%.6f")
