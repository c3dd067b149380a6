"""Host-side orchestration of the LIO-SAM pipeline.

The host loop is the only non-compiled code: it pads raw sensor arrays to the
static shapes, threads the device-resident state through the compiled
odometry step, and triggers the loop-closure program at its own (lower) rate
— mirroring the reference's 4-process + loop-thread topology
(``module_loam.launch:5-8``, ``mapOptmization.cpp:1770``) collapsed onto one
device.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import se3
from .loop import loop_closure_step
from .mapping import (POINT_QUANT, odometry_step, odometry_step_packed,
                      odometry_window_flat, odometry_window_flat_q16,
                      odometry_window_packed)
from .params import LioParams
from .state import LioState, init_state


_Q16_SCALES = np.asarray(POINT_QUANT, np.float32)
_q16_lib = None


def _q16_native():
    """ctypes handle to the native quantized packer (False when the shared
    library is absent or predates pack_scan_q16)."""
    global _q16_lib
    if _q16_lib is None:
        from ...utils.packets import _load_native

        lib = _load_native()
        if lib:
            import ctypes
            try:
                lib.pack_scan_q16.restype = None
                lib.pack_scan_q16.argtypes = (
                    [ctypes.c_void_p] * 3 + [ctypes.c_int] * 2
                    + [ctypes.c_void_p] * 2)
            except AttributeError:
                lib = False
        _q16_lib = lib if lib else False
    return _q16_lib


def _pad(a: np.ndarray, n: int, fill=0):
    a = np.asarray(a)
    if a.shape[0] >= n:
        return a[:n].copy()
    pad_width = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad_width, constant_values=fill)


def _vec6_to_mats_np(pose6: np.ndarray) -> np.ndarray:
    """Host-side (N, 6) pose6 -> (N, 4, 4), R = Rz(yaw)Ry(pitch)Rx(roll)
    (ops/se3 convention).  The host loop must NEVER stage this through jax:
    a ``Pose.from_vec6(pose6[:n]).to_matrix()`` dispatch is shape-keyed on
    the live keyframe count, so every call with a new count is a fresh
    remote compile (~7 s each through the tunneled runtime — measured as
    22 s of a 35 s loop-ON bench phase, docs/DESIGN.md round 3)."""
    pose6 = np.asarray(pose6, np.float64)
    r, p, y = pose6[:, 0], pose6[:, 1], pose6[:, 2]
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    m = np.zeros((len(pose6), 4, 4), np.float64)
    m[:, 0, 0] = cy * cp
    m[:, 0, 1] = cy * sp * sr - sy * cr
    m[:, 0, 2] = cy * sp * cr + sy * sr
    m[:, 1, 0] = sy * cp
    m[:, 1, 1] = sy * sp * sr + cy * cr
    m[:, 1, 2] = sy * sp * cr - cy * sr
    m[:, 2, 0] = -sp
    m[:, 2, 1] = cp * sr
    m[:, 2, 2] = cp * cr
    m[:, :3, 3] = pose6[:, 3:]
    m[:, 3, 3] = 1.0
    return m.astype(np.float32)


@dataclasses.dataclass
class Trajectory:
    times: list
    poses: list  # 4x4 matrices

    def as_matrices(self) -> np.ndarray:
        return np.stack(self.poses) if self.poses else np.zeros((0, 4, 4))

    def ate_rmse(self, gt: np.ndarray, align: bool = True) -> float:
        """Absolute trajectory error vs ground-truth positions (N, 3),
        Umeyama-aligned like the standard KITTI/TUM evaluators."""
        est = self.as_matrices()[:, :3, 3]
        n = min(len(est), len(gt))
        est, gt = est[:n], gt[:n]
        if align and n >= 3:
            mu_e, mu_g = est.mean(0), gt.mean(0)
            H = (est - mu_e).T @ (gt - mu_g)
            U, _, Vt = np.linalg.svd(H)
            d = np.sign(np.linalg.det(Vt.T @ U.T))
            D = np.diag([1.0, 1.0, d])
            R = Vt.T @ D @ U.T
            est = (est - mu_e) @ R.T + mu_g
        return float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=1))))


class LioSam:
    """Tightly-coupled LiDAR-inertial odometry, one compiled step per scan."""

    def __init__(self, params: Optional[LioParams] = None,
                 readback_interval: Optional[int] = None, window: int = 1):
        self.p = params or LioParams()
        # loop enablement/frequency are host-side scheduling knobs, but the
        # whole params object is the jit static key: canonicalize them so
        # toggling loops between runs reuses every compiled program (a
        # full-size remote recompile costs 10-50 min, CLAUDE.md)
        self.loop_enabled = self.p.loop_closure_enabled
        loop_every = max(
            1, int(round(1.0 / max(self.p.loop_closure_frequency, 1e-3) * 10))
        )  # scans between loop attempts, assuming ~10 Hz scans
        dynamic_init = self.p.dynamic_init
        self.p = dataclasses.replace(self.p, loop_closure_enabled=True,
                                     loop_closure_frequency=1.0,
                                     dynamic_init=True)
        # dynamic init: the very first scan is deskewed with an unknown
        # velocity, so its smeared cloud anchors the map ~v*sweep/2 off the
        # true start pose (a constant, unobservable-from-inside gauge offset;
        # the reference shares it — its first cloud is rotation-only
        # deskewed).  Buffer the first boot window, read back the converged
        # velocity, reset, and re-feed with the hint (StepInput.init_vel_*).
        self._init_vel = None
        self._boot_scans: Optional[list] = [] if dynamic_init else None
        self._boot_n = 8
        # scans dispatched per compiled program via process_window(); each
        # dispatch through the tunneled runtime pays a fixed ~25-35 ms, so
        # batching W scans divides that overhead by W (docs/DESIGN.md)
        self.window = max(1, window)
        self.state: LioState = init_state(self.p)
        self._trajectory = Trajectory([], [])
        self._scan_count = 0
        self._last_scan_time = None
        # all device-side times are float32; absolute unix-epoch stamps
        # (~1.7e9 s, float32 ULP 128 s) would collapse every dt to zero, so
        # every time is rebased to the first received stamp (held in float64
        # host-side) before casting — see ADVICE.md r1 (high)
        self._epoch: Optional[float] = None
        self._loop_every = loop_every
        # device->host readbacks have ~tens-of-ms latency on tunneled TPUs
        # AND synchronize the pipeline (the transfer blocks on the last
        # dispatched window), so poses are fetched in batches. The default
        # scales with the dispatch window: flushing every window would
        # re-serialize host packing/upload against device execution and
        # measured 2x slower end to end (micro-profile, docs/DESIGN.md).
        if readback_interval is None:
            readback_interval = max(8, 4 * self.window)
        self._readback_interval = max(1, readback_interval)
        self._pending: list = []  # (time, device pose_matrix)
        self._pending_loops: list = []  # device `found` flags, read lazily
        # a closed loop rewrote keyframe history: the recorded trajectory
        # tail is stale until the next resync.  Resyncing EAGERLY at every
        # flush paid ~0.2 s of D2H latency per closed loop inside the hot
        # feed loop (r4 bench: resync 0.38 s of a 2.5 s phase); nothing
        # reads the trajectory mid-feed, so the rewrite is DEFERRED to the
        # consumers (trajectory / flush / save_map).  The only mid-feed
        # reader is the loop-plausibility pre-gate, whose radius margin
        # (+1 m on a 15 m radius) absorbs the stale tail by design.
        self._resync_needed = False
        self._executor = None          # lazy worker for process_window_async
        self._dispatch_future = None
        # wall-time accounting per host-side stage (pack/dispatch/loop/
        # flush/resync) — near-free perf_counter pairs; read via .timings
        self.timings: dict = {}
        # capped-structure health (VERDICT r4 #6): running max of the
        # local-map table occupancy and the cumulative overflow-dropped
        # cell count, updated at every flush from StepOutput telemetry;
        # saturation warns once host-side instead of silently thinning the
        # map (the failure mode that diverged the tiny profile in r4)
        self.map_health = {"max_occupancy": 0.0, "dropped_cells": 0}
        self._overflow_warned = False

    def _acct(self, key, t0):
        self.timings[key] = self.timings.get(key, 0.0) + (
            time.perf_counter() - t0)

    # -- input assembly -----------------------------------------------------

    def _make_input_np(self, xyz, ring, time_rel, scan_start,
                       imu_t=None, imu_gyro=None, imu_acc=None, imu_rpy=None,
                       gps_xyz=None, gps_sigma=None):
        """Pack one scan's inputs into TWO host arrays (points, aux) —
        transfers through the device tunnel pay a fixed latency each, so 13
        small uploads cost more than 2 larger ones.  Layout documented in
        mapping.unpack_step_input."""
        p = self.p
        n = min(len(xyz), p.max_points)

        points = np.zeros((p.max_points, 5), np.float32)
        points[:n, :3] = np.asarray(xyz, np.float32)[:n]
        points[:n, 3] = np.asarray(time_rel, np.float32)[:n]
        points[:n, 4] = np.asarray(ring, np.float32)[:n]
        aux = self._make_aux_np(n, time_rel, scan_start, imu_t=imu_t,
                                imu_gyro=imu_gyro, imu_acc=imu_acc,
                                imu_rpy=imu_rpy, gps_xyz=gps_xyz,
                                gps_sigma=gps_sigma)
        return points, aux

    def _pack_points_q16(self, xyz, ring, time_rel, out) -> int:
        """One-pass quantized point pack into an int16 row view (native
        pack_scan_q16 when the library is built; numpy fallback)."""
        p = self.p
        n = min(len(xyz), p.max_points)
        lib = _q16_native()
        xyz32 = np.ascontiguousarray(np.asarray(xyz, np.float32)[:n])
        t32 = np.ascontiguousarray(np.asarray(time_rel, np.float32)[:n])
        r32 = np.ascontiguousarray(np.asarray(ring, np.int32)[:n])
        dst = out[:p.max_points * 5]
        if lib:
            import ctypes
            lib.pack_scan_q16(
                xyz32.ctypes.data_as(ctypes.c_void_p),
                t32.ctypes.data_as(ctypes.c_void_p),
                r32.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_int(n), ctypes.c_int(p.max_points),
                _Q16_SCALES.ctypes.data_as(ctypes.c_void_p),
                dst.ctypes.data_as(ctypes.c_void_p))
        else:
            pts = np.zeros((p.max_points, 5), np.float32)
            pts[:n, :3] = xyz32
            pts[:n, 3] = t32
            pts[:n, 4] = r32
            dst[:] = np.clip(np.rint(pts * _Q16_SCALES), -32767,
                             32767).astype(np.int16).reshape(-1)
        return n

    def _make_aux_np(self, n, time_rel, scan_start,
                     imu_t=None, imu_gyro=None, imu_acc=None, imu_rpy=None,
                     gps_xyz=None, gps_sigma=None):
        p = self.p
        T = p.imu_window

        if imu_t is None or len(imu_t) == 0:
            imu_t = np.zeros(0, np.float64)
            imu_gyro = np.zeros((0, 3), np.float32)
            imu_acc = np.zeros((0, 3), np.float32)
        # selection + rebasing in float64; only offsets are cast to float32
        scan_start = float(scan_start)
        if self._epoch is None:
            self._epoch = scan_start
        imu_t = np.asarray(imu_t, np.float64)
        imu_gyro = np.asarray(imu_gyro, np.float32)
        imu_acc = np.asarray(imu_acc, np.float32)

        scan_end = scan_start + (float(np.max(time_rel)) if n else 0.1)
        in_scan = (imu_t >= scan_start - 0.01) & (imu_t <= scan_end + 0.01)
        t_prev = self._last_scan_time if self._last_scan_time is not None else scan_start
        in_pre = (imu_t >= t_prev) & (imu_t <= scan_start + 0.005)

        aux = np.zeros((2 * T + 3, 8), np.float32)

        def fill(rows, sel):
            k = min(int(sel.sum()), T)
            aux[rows:rows + k, 0] = (imu_t[sel][:k] - self._epoch).astype(np.float32)
            aux[rows:rows + k, 1:4] = imu_gyro[sel][:k]
            aux[rows:rows + k, 4:7] = imu_acc[sel][:k]
            aux[rows:rows + k, 7] = 1.0
            return k

        k_scan = fill(0, in_scan)
        fill(T, in_pre)
        misc = aux[2 * T]
        misc[0] = scan_start - self._epoch
        misc[1] = n
        misc[2] = 1.0 if k_scan > 1 else 0.0
        if imu_rpy is not None:
            misc[3:6] = np.asarray(imu_rpy, np.float32)
        misc[6] = 1.0 if gps_xyz is not None else 0.0
        if gps_xyz is not None:
            aux[2 * T + 1, :3] = np.asarray(gps_xyz, np.float32)
            aux[2 * T + 1, 3:6] = np.asarray(
                gps_sigma if gps_sigma is not None else np.ones(3), np.float32)
        else:
            aux[2 * T + 1, 3:6] = 1.0
        misc[7] = 1.0  # scan-valid flag (padded window slots leave this 0)
        if self._init_vel is not None:
            aux[2 * T + 2, :3] = self._init_vel
            aux[2 * T + 2, 3] = 1.0
        return aux

    def _make_input(self, *args, **kw):
        points, aux = self._make_input_np(*args, **kw)
        return jnp.asarray(points), jnp.asarray(aux)

    # -- public API ---------------------------------------------------------

    def process_scan(self, xyz, ring, time_rel, scan_start, **sensors):
        """Feed one scan (+ optional imu_t/imu_gyro/imu_acc/imu_rpy/gps_xyz/
        gps_sigma keyword arrays); returns the StepOutput.

        Grid keys (ranges/azimuth/col_time/elev — the window path's
        range-image upload hint) are accepted and ignored: at window=1 the
        xyz rows carry the same information, so sources that always attach
        grids work unchanged at any window size."""
        sensors = {k: v for k, v in sensors.items()
                   if k in ("imu_t", "imu_gyro", "imu_acc", "imu_rpy",
                            "gps_xyz", "gps_sigma")}
        self._join_dispatch()  # never race an in-flight async window
        points, aux = self._make_input(xyz, ring, time_rel, scan_start, **sensors)
        new_state, out = odometry_step_packed(self.state, points, aux, self.p)
        self.state = new_state
        self._last_scan_time = float(scan_start)
        self._scan_count += 1
        self._pending.append((scan_start, out.pose_matrix,
                              out.map_occupancy, out.map_dropped))

        if self._boot_scans is not None:
            self._boot_scans.append(dict(xyz=xyz, ring=ring,
                                         time_rel=time_rel,
                                         scan_start=scan_start, **sensors))
            if self._scan_count >= self._boot_n:
                res = self._bootstrap_refeed()
                return res if res is not None else out

        if len(self._pending) >= self._readback_interval:
            self._flush_pending()

        if (self.loop_enabled
                and self._scan_count % self._loop_every == 0):
            self._try_loop_closure()
        return out

    def process_window(self, scans):
        """Feed up to ``self.window`` scans in ONE compiled dispatch.

        ``scans`` is a list of dicts with keys ``xyz, ring, time_rel,
        scan_start`` plus the optional sensor keywords of ``process_scan``.
        Semantically identical to calling ``process_scan`` per element (the
        window program's body IS the per-scan step) but pays the fixed
        ~25-35 ms tunnel dispatch cost once per window instead of per scan.
        A partial window is padded with invalid slots that pass the state
        through, reusing the same compiled program.  Returns the stacked
        StepOutput (leading axis = window slot; padded slots echo state)."""
        self._join_dispatch()  # never race an in-flight async window
        t0 = time.perf_counter()
        flat_w, times, prev_count = self._pack_window(scans)
        self._acct("pack", t0)
        outs = self._dispatch_window(flat_w, times, prev_count)

        if self._boot_scans is not None:
            self._boot_scans.extend(scans)
            if self._scan_count >= self._boot_n:
                res = self._bootstrap_refeed()
                return res if res is not None else outs
        return outs

    def process_window_async(self, scans):
        """Pipelined :meth:`process_window`: the window is packed HERE (the
        caller's thread) and dispatched on a single worker thread, so the
        next window's host-side packing overlaps the in-flight dispatch's
        fixed ~25-35 ms tunnel cost.  Returns a
        ``concurrent.futures.Future[StepOutput]``; results resolve in feed
        order (one dispatch in flight — the estimator state is a chain).
        ``flush()`` / ``trajectory`` join automatically.  During the
        dynamic-init boot window this falls back to the synchronous path
        (the bootstrap needs a readback)."""
        import concurrent.futures as cf

        if self._boot_scans is not None:
            fut = cf.Future()
            fut.set_result(self.process_window(scans))
            return fut
        if self._executor is None:
            from concurrent.futures import ThreadPoolExecutor
            self._executor = ThreadPoolExecutor(max_workers=1)
        t0 = time.perf_counter()
        flat_w, times, prev_count = self._pack_window(scans)
        self._acct("pack", t0)
        fut = self._executor.submit(self._dispatch_window, flat_w, times,
                                    prev_count)
        self._dispatch_future = fut
        return fut

    def _join_dispatch(self):
        if self._dispatch_future is not None:
            f, self._dispatch_future = self._dispatch_future, None
            f.result()

    def _pack_window(self, scans):
        W = self.window
        if not 1 <= len(scans) <= W:
            raise ValueError(f"expected 1..{W} scans, got {len(scans)}")
        p = self.p
        n5 = p.max_points * 5
        a8 = (2 * p.imu_window + 3) * 8
        # ONE flat buffer -> ONE upload: each transfer pays a fixed
        # post-execute stall through the tunneled runtime, so the window's
        # points and aux ship together (split again in-program).  With
        # quantized_upload the buffer is int16 (points scaled, aux rows as
        # raw f32 bit halves) — half the serialized transfer bytes.
        quant = p.quantized_upload
        # range-image upload: grid-structured sources (sim, spinning-lidar
        # drivers) ship per-pixel ranges + per-column azimuth/time +
        # per-ring elevation; xyz is reconstructed in-program
        # (mapping.odometry_window_flat_ri) — ~3.9x fewer upload bytes, and
        # transfers serialize against execution through the tunnel
        ri = (quant and p.max_points >= p.n_scan * p.horizon_scan and all(
            all(k in s for k in ("ranges", "azimuth", "col_time", "elev"))
            for s in scans))
        if ri:
            return self._pack_window_ri(scans)
        if quant:
            flat_w = np.zeros((W, n5 + 2 * a8), np.int16)
        else:
            flat_w = np.zeros((W, n5 + a8), np.float32)
        times = []
        prev_count = self._scan_count
        for i, s in enumerate(scans):
            kw = {k: v for k, v in s.items()
                  if k in ("imu_t", "imu_gyro", "imu_acc", "imu_rpy",
                           "gps_xyz", "gps_sigma")}
            if quant:
                n_i = self._pack_points_q16(s["xyz"], s["ring"],
                                            s["time_rel"], flat_w[i, :n5])
                aux_i = self._make_aux_np(n_i, s["time_rel"],
                                          s["scan_start"], **kw)
                flat_w[i, n5:] = aux_i.reshape(-1).view(np.int16)
            else:
                pts_i, aux_i = self._make_input_np(
                    s["xyz"], s["ring"], s["time_rel"], s["scan_start"], **kw)
                flat_w[i, :n5] = pts_i.reshape(-1)
                flat_w[i, n5:] = aux_i.reshape(-1)
            self._last_scan_time = float(s["scan_start"])
            self._scan_count += 1
            times.append(float(s["scan_start"]))
        return flat_w, times, prev_count

    def _pack_window_ri(self, scans):
        """Range-image window pack (see mapping.odometry_window_flat_ri for
        the layout and why).

        When every scan in the window carries THE SAME azimuth/col_time/
        elevation grids (a fixed firing pattern — always true for the sim
        and for drivers that report the nominal pattern), the grids ship
        ONCE per window (mapping.odometry_window_flat_ri2, 1-D buffer,
        ~20% fewer upload bytes); jittering sources fall back to the
        per-scan layout.  A source that flips between the two pays one
        extra remote compile — fixed-pattern sources are verified-equal
        every window, jittering ones fail in the first."""
        from .mapping import RI_RANGE_SCALE, ri2_flat_len, ri_flat_width
        p = self.p
        W = self.window
        S, H = p.n_scan, p.horizon_scan
        n_pix = S * H
        a16 = (2 * p.imu_window + 3) * 8 * 2

        grids = [tuple(np.asarray(s[k], np.float32).reshape(-1)
                       for k in ("azimuth", "col_time", "elev"))
                 for s in scans]
        hoist = all(all(np.array_equal(a, b) for a, b in zip(g, grids[0]))
                    for g in grids[1:])

        def put_f32(dst, o, a, width):
            buf = np.zeros(width, np.float32)
            a = np.asarray(a, np.float32).reshape(-1)[:width]
            buf[:len(a)] = a
            dst[o:o + 2 * width] = buf.view(np.int16)
            return o + 2 * width

        if hoist:
            flat_w = np.zeros(ri2_flat_len(p, W), np.int16)
            o = len(flat_w) - 2 * (2 * H + S)
            o = put_f32(flat_w, o, grids[0][0], H)
            o = put_f32(flat_w, o, grids[0][1], H)
            put_f32(flat_w, o, grids[0][2], S)
        else:
            flat_w = np.zeros((W, ri_flat_width(p)), np.int16)
        times = []
        prev_count = self._scan_count
        for i, s in enumerate(scans):
            kw = {k: v for k, v in s.items()
                  if k in ("imu_t", "imu_gyro", "imu_acc", "imu_rpy",
                           "gps_xyz", "gps_sigma")}
            r = np.asarray(s["ranges"], np.float32).reshape(-1)[:n_pix]
            rq = np.clip(np.rint(r * RI_RANGE_SCALE), 0, 32767).astype(
                np.int16)
            aux_i = self._make_aux_np(n_pix, s["col_time"],
                                      s["scan_start"], **kw)
            if hoist:
                flat_w[i * n_pix:i * n_pix + len(rq)] = rq
                ao = W * n_pix + i * a16
                flat_w[ao:ao + a16] = aux_i.reshape(-1).view(np.int16)
            else:
                flat_w[i, :len(rq)] = rq
                o = n_pix
                o = put_f32(flat_w[i], o, s["azimuth"], H)
                o = put_f32(flat_w[i], o, s["col_time"], H)
                o = put_f32(flat_w[i], o, s["elev"], S)
                flat_w[i, o:] = aux_i.reshape(-1).view(np.int16)
            self._last_scan_time = float(s["scan_start"])
            self._scan_count += 1
            times.append(float(s["scan_start"]))
        return flat_w, times, prev_count

    def _dispatch_window(self, flat_w, times, prev_count):
        from .mapping import select_window_fn
        window_fn = select_window_fn(self.p, flat_w)
        t0 = time.perf_counter()
        new_state, outs = window_fn(self.state, jnp.asarray(flat_w), self.p)
        self._acct("dispatch", t0)
        self.state = new_state
        self._pending.append((times, outs.pose_matrix,
                              outs.map_occupancy[-1], outs.map_dropped[-1]))

        if len(self._pending) * self.window >= self._readback_interval:
            self._flush_pending()
        if (self.loop_enabled
                and self._scan_count // self._loop_every
                > prev_count // self._loop_every):
            self._try_loop_closure()
        return outs

    def _bootstrap_refeed(self):
        """Dynamic init second pass: reset the estimator and replay the
        buffered boot scans with the converged velocity as the first-scan
        deskew/filter hint.  Costs one extra pass over ~boot_n scans at
        session start; removes the smeared-first-cloud gauge offset
        (measured 0.11 m at bench speeds).  Returns the outputs of the
        final re-fed call so callers see only clean results."""
        scans = self._boot_scans
        self._boot_scans = None  # re-feed must not re-trigger
        self._pending_loops.clear()
        self._resync_needed = False
        fs = self.state.filter
        q = np.asarray(fs.nav.q, np.float64)   # wxyz (ops/se3 convention)
        v = np.asarray(fs.nav.v, np.float64)
        from scipy.spatial.transform import Rotation as Rs
        if not (np.isfinite(q).all() and np.isfinite(v).all()
                and np.linalg.norm(v) < 1e3):
            return None  # keep the first pass; nothing sane to re-feed with
        v_b = Rs.from_quat([q[1], q[2], q[3], q[0]]).inv().apply(v)
        self._init_vel = v_b.astype(np.float32)

        self.state = init_state(self.p)
        self._trajectory = Trajectory([], [])
        self._pending.clear()
        self._scan_count = 0
        self._last_scan_time = None

        out = None
        if self.window > 1:
            for i in range(0, len(scans), self.window):
                out = self.process_window(scans[i:i + self.window])
        else:
            for s in scans:
                kw = {k: val for k, val in s.items()
                      if k not in ("xyz", "ring", "time_rel", "scan_start")}
                out = self.process_scan(s["xyz"], s["ring"], s["time_rel"],
                                        s["scan_start"], **kw)
        return out

    def _try_loop_closure(self):
        """Dispatch one loop-closure program.  NO host sync here: the
        state update (graph re-solve, map re-bake) is entirely device-side;
        reading ``found`` eagerly would stall the pipeline ~30-130 ms per
        attempt through the tunneled runtime (the round-3 loop-on bench
        measured 24 scans/s with eager reads vs 60 loops-off, with zero
        loops actually closing — pure sync overhead).  The flags are read
        at the next readback, where the trajectory tail is rewritten if any
        loop actually closed."""
        if not self._loop_plausible():
            return
        t0 = time.perf_counter()
        self.state, loop = loop_closure_step(self.state, self.p)
        self._acct("loop_dispatch", t0)
        self._pending_loops.append(loop.found)

    def _loop_plausible(self) -> bool:
        """Host-side pre-gate: skip the loop dispatch when the device-side
        candidate search (``detectLoopClosureDistance``, :610-643) provably
        cannot find one.  Every dispatch costs a fixed ~30 ms through the
        tunneled runtime even when the program immediately takes the
        no-candidate branch, and on non-revisiting stretches (the common
        production case) EVERY attempt is such a no-op.  Two conservative
        checks from host-known data:

        * age — EXACT: keyframe times are a subset of dispatched scan times,
          so a session younger than the age gate has no eligible candidate.
        * radius — the flushed trajectory is the keyframe positions'
          superset (keyframes are selected from scan poses); if no pose old
          enough lies within radius + a lag-travel margin of the latest
          known pose, none can on device.  The margin covers the readback
          lag at 2x the recently observed speed, so a true candidate is
          never gated out; at worst detection shifts to the next attempt
          (the reference's loop thread has the same 1 Hz granularity,
          :1770-1781).  Unknown positions (nothing flushed yet) dispatch."""
        p, t_cur = self.p, self._last_scan_time
        if t_cur is None or self._epoch is None:
            return True
        if (t_cur - self._epoch) <= p.history_keyframe_search_time_diff:
            return False
        times = self._trajectory.times
        if not times:
            return True
        t = np.asarray(times, np.float64)
        old = (t_cur - t) > p.history_keyframe_search_time_diff
        if not old.any():
            return True
        pos = np.asarray([m[:3, 3] for m in self._trajectory.poses])
        dt_tail = max(t[-1] - t[max(len(t) - 8, 0)], 1e-3)
        v = float(np.linalg.norm(pos[-1] - pos[max(len(t) - 8, 0)])) / dt_tail
        margin = 2.0 * v * max(t_cur - t[-1], 0.0) + 1.0
        d = np.linalg.norm(pos[old] - pos[-1], axis=1)
        return bool((d < p.history_keyframe_search_radius + margin).any())

    def _flush_pending(self):
        """Batch-fetch accumulated poses + loop flags in ONE D2H + divergence
        check (the respawn="true" equivalent, checked at readback
        granularity).  Entries are (time, (4,4)) from process_scan or
        ([times], (W,4,4)) from process_window.  Every D2H through the
        tunneled runtime pays ~27-40 ms of latency/bookkeeping on top of the
        pipeline sync, so the per-window transfers of the old code (4 per
        flush at the default interval = 120-160 ms) are first concatenated
        device-side and fetched as one array; pending loop flags ride in the
        same ``device_get``."""
        if not self._pending and not self._pending_loops:
            return
        devs: list = []
        meta: list = []  # (times_list, device rows)
        health: list = []  # ((2,) occupancy, (2,) dropped) device rows
        for t, m, occ, drop in self._pending:
            if isinstance(t, (list, tuple)):
                devs.append(m)          # (W, 4, 4) — padded rows trimmed on host
                meta.append((list(t), m.shape[0]))
            else:
                devs.append(m[None])    # process_scan path (non-windowed)
                meta.append(([t], 1))
            health.append((occ, drop))
        self._pending = []
        loops, self._pending_loops = self._pending_loops, []
        # pad both device lists to a multiple of the canonical flush length:
        # jnp.stack/concatenate are compiled programs keyed on the list
        # LENGTH, so a terminal partial flush with a fresh length is a fresh
        # remote compile (~7 s on axon).  Padding bounds the shape set to
        # {C, 2C, ...}; padded rows are trimmed on host (mats via meta
        # offsets, founds pad with False so .any() is unchanged).
        C = max(1, -(-self._readback_interval // self.window))

        def _pad_to_chunk(lst, fill):
            want = C * -(-len(lst) // C)
            return lst + [fill] * (want - len(lst))

        founds_dev = None
        if loops:
            founds_dev = jnp.stack(_pad_to_chunk(
                loops, jnp.zeros((), bool)))
        mats_dev = health_dev = None
        if devs:
            devs = _pad_to_chunk(devs, devs[-1])
            mats_dev = devs[0] if len(devs) == 1 else jnp.concatenate(devs)
            health = _pad_to_chunk(health, health[-1])
            health_dev = (jnp.stack([h[0] for h in health]),
                          jnp.stack([h[1] for h in health]))
        t0 = time.perf_counter()
        if mats_dev is not None and founds_dev is not None:
            mats_all, founds, health_np = jax.device_get(
                (mats_dev, founds_dev, health_dev))
        elif mats_dev is not None:
            mats_all, health_np = jax.device_get((mats_dev, health_dev))
            founds = np.zeros(0, bool)
        else:
            founds = jax.device_get(founds_dev)
            self._acct("flush_get", t0)
            if founds.any():
                self._resync_needed = True
            return
        self._acct("flush_get", t0)
        self._update_map_health(health_np)
        times: list = []
        rows: list = []
        off = 0
        for ts, n in meta:
            times.extend(ts)
            rows.append(mats_all[off:off + len(ts)])
            off += n
        mats = np.concatenate(rows, axis=0)
        if not np.isfinite(mats).all():
            import warnings

            warnings.warn("odometry diverged (non-finite pose); reinitializing")
            self.state = init_state(self.p)
            self._last_scan_time = None
            self._init_vel = None  # stale bootstrap hint must not re-apply
            self._pending_loops.clear()
            self._resync_needed = False  # fresh kf store: nothing to resync from
            # keep the finite prefix
            for t, m in zip(times, mats):
                if np.isfinite(m).all():
                    self._trajectory.times.append(t)
                    self._trajectory.poses.append(m)
            return
        self._trajectory.times.extend(times)
        self._trajectory.poses.extend(list(mats))
        if founds.any():
            # history was rewritten by >=1 closed loop: the recorded tail
            # needs a resync from the optimized keyframes — deferred to the
            # trajectory consumers (see _resync_needed)
            self._resync_needed = True

    def _update_map_health(self, health_np):
        """Fold flushed (occupancy, dropped) rows into map_health and warn
        ONCE when any capped map structure saturates (occupancy > 0.98) or
        has dropped cells — overflow thins the map with a spatial bias, so
        it must never pass silently (VERDICT r4 #6)."""
        occ, drop = health_np
        max_occ = float(np.max(occ)) if len(occ) else 0.0
        dropped = int(np.max(drop)) if len(drop) else 0
        h = self.map_health
        h["max_occupancy"] = max(h["max_occupancy"], max_occ)
        h["dropped_cells"] = max(h["dropped_cells"], dropped)
        if not self._overflow_warned and (max_occ > 0.98 or dropped > 0):
            import warnings

            warnings.warn(
                f"local-map capacity saturated: occupancy {max_occ:.2f}, "
                f"{dropped} cells dropped — raise map_corner_cap/"
                "map_surf_cap (overflow drops the highest cell keys, which "
                "is spatially biased and degrades scan-to-map accuracy)")
            self._overflow_warned = True

    @property
    def trajectory(self) -> Trajectory:
        """Host trajectory (drains any pending device results first)."""
        self._join_dispatch()
        self._flush_pending()
        if self._resync_needed:
            self._resync_trajectory()
        return self._trajectory

    def _resync_trajectory(self):
        t0 = time.perf_counter()
        self._resync_needed = False
        self._flush_pending()
        kf = self.state.kf
        # ONE fixed-shape D2H, then pure-numpy math: any dynamic-n device
        # slice or staged from_vec6 here is shape-keyed on the live keyframe
        # count and recompiles per resync (see _vec6_to_mats_np)
        pose6_all, time_all, n = jax.device_get(
            (kf.pose6, kf.time, kf.count))
        n = int(n)
        if n == 0 or not self._trajectory.times:
            return
        poses6 = pose6_all[:n]
        # keyframe times are float32 session-relative offsets; trajectory
        # times are absolute float64 — compare in the absolute frame with a
        # nearest-match tolerance (exact float keys silently miss, ADVICE r1)
        epoch = self._epoch or 0.0
        times = np.asarray(time_all[:n], np.float64) + epoch
        traj_t = np.asarray(self._trajectory.times, np.float64)
        order = np.argsort(traj_t, kind="stable")
        sorted_t = traj_t[order]
        hi = np.searchsorted(sorted_t, times)
        mats = _vec6_to_mats_np(poses6)
        for t, m, j in zip(times, mats, hi):
            best, best_dt = -1, 0.02  # half a 10 Hz scan period
            for k in (j - 1, j):
                if 0 <= k < len(sorted_t) and abs(sorted_t[k] - t) < best_dt:
                    best, best_dt = int(order[k]), abs(sorted_t[k] - t)
            if best >= 0:
                self._trajectory.poses[best] = m
        self._acct("resync", t0)

    def flush(self):
        """Drain pending device results into the host trajectory."""
        self._join_dispatch()
        self._flush_pending()
        if self._resync_needed:
            self._resync_trajectory()

    def save_map(self, directory: Optional[str] = None, resolution: float = 0.0):
        self._join_dispatch()
        self._flush_pending()
        if self._resync_needed:
            self._resync_trajectory()
        """Terminal map export (the ``save_map`` service,
        ``mapOptmization.cpp:355-419``): returns dict of numpy arrays and, if
        `directory` is given, writes trajectory + corner/surf/global PCDs
        (optionally voxel-downsampled to `resolution`, like the service's
        resolution request field)."""
        kf = self.state.kf
        # fixed-shape D2H + numpy transform: dynamic-n device slices here
        # recompile per keyframe count (see _vec6_to_mats_np)
        (pose6_all, time_all, cx_all, cm_all, sx_all, sm_all,
         n) = jax.device_get((kf.pose6, kf.time, kf.corner_xyz,
                              kf.corner_mask, kf.surf_xyz, kf.surf_mask,
                              kf.count))
        n = int(n)
        out = {"trajectory": pose6_all[:n],
               "times": np.asarray(time_all[:n], np.float64)
               + (self._epoch or 0.0)}
        mats = _vec6_to_mats_np(pose6_all[:n])
        R, t = mats[:, :3, :3], mats[:, None, :3, 3]
        corner = np.einsum("kij,kpj->kpi", R, cx_all[:n]) + t
        surf = np.einsum("kij,kpj->kpi", R, sx_all[:n]) + t
        out["corner_map"] = corner[cm_all[:n]]
        out["surf_map"] = surf[sm_all[:n]]
        if directory is not None:
            import os

            from ...ops.pointcloud import Cloud
            from ...ops.voxel import voxel_downsample
            from ...utils.io_pcd import write_pcd

            os.makedirs(directory, exist_ok=True)
            np.savetxt(os.path.join(directory, "trajectory.txt"),
                       np.concatenate([out["times"][:, None], out["trajectory"]], axis=1),
                       header="time roll pitch yaw x y z")
            for name in ("corner_map", "surf_map"):
                pts = out[name]
                if resolution > 0 and len(pts):
                    c = voxel_downsample(Cloud.create(jnp.asarray(pts)), resolution)
                    pts = np.asarray(c.xyz)[np.asarray(c.mask)]
                write_pcd(os.path.join(directory, f"{name}.pcd"), pts)
            both = np.concatenate([out["corner_map"], out["surf_map"]]) \
                if len(out["corner_map"]) or len(out["surf_map"]) else np.zeros((0, 3), np.float32)
            write_pcd(os.path.join(directory, "global_map.pcd"), both)
        return out

    # -- IMU-rate output (the TransformFusion process,
    #    mapOptmization's sibling in imuPreintegration.cpp:23-154) ----------

    def imu_rate_pose(self, imu_t, imu_gyro, imu_acc):
        """Compose the latest optimized pose with the IMU increments since the
        last scan — the smooth high-rate `odometry/imu` output.  Host-side
        numpy (tiny state), like the reference's 500 Hz path."""
        self._join_dispatch()  # read a settled filter state
        from ...ops import imu as imu_ops

        fs = self.state.filter
        T = self.p.imu_window
        t = np.asarray(imu_t, np.float64)[-T:]
        t = (t - (self._epoch if self._epoch is not None else t[0] if len(t) else 0.0)
             ).astype(np.float32)
        g = np.asarray(imu_gyro, np.float32)[-T:]
        a = np.asarray(imu_acc, np.float32)[-T:]
        k = len(t)
        pad = T - k
        pre = imu_ops.preintegrate(
            jnp.asarray(np.pad(t, (0, pad))),
            jnp.asarray(np.pad(g, ((0, pad), (0, 0)))),
            jnp.asarray(np.pad(a, ((0, pad), (0, 0)))),
            jnp.asarray(np.arange(T) < k),
            fs.bias, self.p.imu_params)
        nav = imu_ops.predict(fs.nav, pre, fs.bias, fs.bias, self.p.imu_params)
        return se3.Pose(nav.q, nav.p), np.asarray(nav.v)
