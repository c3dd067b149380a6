"""Command-line entry points (the reference's launch-file surface).

    msst lio-sim        [--scans N] [--loop] [--tpu]     synthetic demo replay
    msst lio-kitti DIR  [--scans N]                      KITTI raw drive
    msst lio-bag BAG --cloud-topic T --imu-topic T       rosbag replay
    msst calibrate TARGET.pcd SRC.pcd [SRC2.pcd ...]     multi-LiDAR extrinsics
        [--method lica|auto|ndt] [--output out.json]
    msst manual-calib TARGET.pcd SRC.pcd                 interactive nudging
    msst allan CSV      [--rate HZ]                      IMU Allan calibration
    msst decode-pcap IN.pcap OUT.pcd                     packet decode
    msst heading PCD [PCD ...]                           attitude + wall distances
    msst track PCD [PCD ...] [--serve-modbus PORT]       reflective-target tracking
    msst viz-serve [DIR] [--port P]                      interactive map viewer
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _lio_run(scans_iter, params=None, loop=False, gps=False, progress=True,
             viz_every=0, viz_dir=None):
    """viz_every/viz_dir: streaming visualization (the live RViz surface of
    the reference — global map @0.2 Hz + path publishers,
    ``mapOptmization.cpp:421-490``): every N scans the current global map
    PLY + trajectory PNG are (re)written under viz_dir.  Like the
    reference's subscriber gate (``utility.h:292`` publishes only when
    someone listens), the export runs only when requested."""
    from msst_tpu.models.liosam import LioSam
    from msst_tpu.models.liosam.params import LioParams

    lio = LioSam(params or LioParams(loop_closure_enabled=loop))
    n = 0
    degen_flags = []  # per-scan degeneracy (device scalars, fetched at end)
    # GPS -> odom frame datum (the navsat_transform role,
    # module_navsat.launch:8-19): the fix stream's local frame is anchored at
    # its own (noisy) first fix, so fusing it raw biases every factor by that
    # fix's error.  Wait-for-datum: collect (estimate - fix) over the first
    # GPS scans — while the estimator still tracks confidently — then freeze
    # the mean as the translation datum.  Translation-only: like the
    # reference (useImuHeadingInitialization), the odometry frame's yaw comes
    # from the absolute IMU attitude, so the frames are co-oriented and a
    # track-fit yaw (which a drifting track would corrupt) is not needed.
    GPS_DATUM_SCANS = 30
    datum_pairs: list = []
    gps_datum = None
    for s in scans_iter:
        kwargs = {k: s[k] for k in ("imu_t", "imu_gyro", "imu_acc", "imu_rpy")
                  if k in s and s[k] is not None}
        fix = s.get("gps_xyz") if gps else None
        if fix is not None and gps_datum is not None:
            kwargs["gps_xyz"] = (fix + gps_datum).astype(np.float32)
            kwargs["gps_sigma"] = s.get("gps_sigma", np.full(3, 2.0, np.float32))
        out = lio.process_scan(s["xyz"], s["ring"], s["time_rel"],
                               s["scan_start"], **kwargs)
        if fix is not None and gps_datum is None:
            datum_pairs.append(np.asarray(out.pose6)[3:6] - fix)
            if len(datum_pairs) >= GPS_DATUM_SCANS:
                gps_datum = np.mean(datum_pairs, axis=0)
                print(f"gps datum locked after {len(datum_pairs)} fixes: "
                      f"{np.round(gps_datum, 3)}", file=sys.stderr)
        degen_flags.append(out.degenerate)
        n += 1
        if progress and n % 10 == 0:
            p = np.asarray(out.pose6)
            print(f"scan {n}: pos=({p[3]:+.2f},{p[4]:+.2f},{p[5]:+.2f}) "
                  f"kf={int(out.kf_count)}", file=sys.stderr)
        if viz_every and n % viz_every == 0:
            _stream_viz(lio, viz_dir or "viz_live", n)
    if viz_every and viz_dir:
        _stream_viz(lio, viz_dir, n)
    # run stats: how often the scan-matching degeneracy projection fired
    # (the reference propagates this flag in odometry covariance[0],
    # mapOptmization.cpp:1696-1699) — consumed by --stats-json.  The flags
    # are device scalars: fetch them in ONE stacked D2H instead of one
    # ~27-30 ms tunneled transfer per scan (ADVICE r4 low — a
    # multi-thousand-scan replay spent minutes in per-element teardown)
    import jax.numpy as jnp
    n_degen = 0
    if degen_flags:
        # fixed-size padded chunks: a bare stack would be shape-keyed on the
        # run length (a fresh remote compile per distinct scan count)
        C = 1024
        pad = (-len(degen_flags)) % C
        flags = degen_flags + [jnp.zeros((), bool)] * pad
        chunks = [jnp.stack(flags[i:i + C]) for i in range(0, len(flags), C)]
        n_degen = int(sum(np.asarray(c).sum() for c in chunks))
    lio.last_run_stats = {
        "scans": n,
        "degenerate_scans": n_degen,
        "loops_closed": int(lio.state.n_loop),
    }
    return lio


def _stream_viz(lio, directory, n):
    """One live-visualization tick: overwrite global_map.ply +
    trajectory.png (atomic-ish: write then rename)."""
    import os

    from msst_tpu.utils import viz, viz_html

    os.makedirs(directory, exist_ok=True)
    m = lio.save_map()
    pts = np.concatenate([m["corner_map"], m["surf_map"]]) \
        if len(m["corner_map"]) or len(m["surf_map"]) else np.zeros((0, 3))
    tmp = os.path.join(directory, ".global_map.ply.tmp")
    viz.write_ply(tmp, pts)
    os.replace(tmp, os.path.join(directory, "global_map.ply"))
    est = lio.trajectory.as_matrices()
    if len(est):
        viz.plot_trajectory(os.path.join(directory, "trajectory.png"),
                            est[:, :3, 3])
        viz_html.write_trajectory_json(
            os.path.join(directory, "trajectory.json"), est[:, :3, 3])
    if not os.path.exists(os.path.join(directory, "viewer.html")):
        viz_html.write_viewer(directory)  # `msst viz-serve DIR` to watch live
    print(f"viz: scan {n} -> {directory}/global_map.ply "
          f"({len(pts)} pts)", file=sys.stderr)


def cmd_lio_sim(args):
    from msst_tpu.models.liosam import demo

    sys.argv = ["demo", "--scans", str(args.scans), "--horizon", str(args.horizon)]
    if args.loop:
        sys.argv.append("--loop")
    if args.tpu:
        sys.argv.append("--tpu")
    demo.main()


def cmd_lio_kitti(args):
    from msst_tpu.models.liosam.params import LioParams
    from msst_tpu.utils.io_kitti import KittiRawDrive

    drive = KittiRawDrive(args.dir, n_rings=args.rings)
    it = drive.iter_scans(with_gps=args.gps)
    if args.scans:
        import itertools
        it = itertools.islice(it, args.scans)
    if args.tiny:
        from msst_tpu.models.liosam.params import tiny_params
        p = tiny_params(n_scan=args.rings, loop_closure_enabled=args.loop,
                        max_points=args.max_points or 32768)
    else:
        p = LioParams(n_scan=args.rings, horizon_scan=args.horizon,
                      max_points=args.max_points or 150000,
                      loop_closure_enabled=args.loop)
    lio = _lio_run(it, params=p, loop=args.loop, gps=args.gps,
                   viz_every=args.viz_every, viz_dir=args.viz_dir)
    traj = lio.trajectory.as_matrices()
    np.savetxt(args.output, traj[:, :3, :].reshape(len(traj), 12), fmt="%.6f")
    print(f"{len(traj)} poses -> {args.output} (KITTI format)")

    # accuracy report against the OXTS ground truth when available
    if drive.oxts is not None and len(traj) >= 2:
        from scipy.spatial.transform import Rotation as Rs

        from msst_tpu.utils import kitti_eval as KE

        enu = drive.gps_enu()
        t_gt, _, _, rpy = drive.imu_samples()
        gt = []
        for k in range(len(traj)):
            ts = drive.velo_times[k]
            i = int(np.clip(np.searchsorted(t_gt, ts), 0, len(enu) - 1))
            T = np.eye(4)
            T[:3, :3] = Rs.from_euler("xyz", rpy[i]).as_matrix()
            T[:3, 3] = enu[i]
            gt.append(T)
        gt = np.stack(gt)
        print(f"ATE RMSE: {KE.ate_rmse(traj, gt) * 100:.1f} cm")
        s = KE.kitti_summary(traj, gt)
        if s["n_segments"]:
            print(f"KITTI drift: {s['t_err_pct']:.2f} % translation, "
                  f"{s['r_err_deg_per_m']:.4f} deg/m rotation "
                  f"({s['n_segments']} segments)")

    if getattr(args, "stats_json", None):
        with open(args.stats_json, "w") as f:
            json.dump(lio.last_run_stats, f)


def cmd_viz_serve(args):
    """Interactive map viewer (the reference's RViz surface,
    ``mapOptmization.cpp:421-490,723-774``): serves viewer.html + the
    streamed global_map.ply / trajectory.json, polling for overwrites."""
    from msst_tpu.utils import viz_html

    viz_html.serve(args.dir, port=args.port)


def _lio_sensor(sensor: str) -> str:
    """CLI --sensor auto -> the params default (column binning only differs
    for livox, which has no auto signature; explicit flag required there)."""
    return "velodyne" if sensor == "auto" else sensor


def cmd_lio_bag(args):
    from msst_tpu.utils.io_rosbag import iter_lio_inputs

    it = iter_lio_inputs(args.bag, args.cloud_topic, args.imu_topic,
                         sensor=args.sensor)
    if args.scans:
        import itertools
        it = itertools.islice(it, args.scans)
    params = None
    if args.tiny:
        from msst_tpu.models.liosam.params import tiny_params
        params = tiny_params(loop_closure_enabled=args.loop,
                             sensor=_lio_sensor(args.sensor))
    elif args.sensor != "auto":
        from msst_tpu.models.liosam.params import LioParams
        params = LioParams(sensor=_lio_sensor(args.sensor))
    lio = _lio_run(it, params=params, loop=args.loop,
                   viz_every=args.viz_every, viz_dir=args.viz_dir)
    traj = lio.trajectory.as_matrices()
    np.savetxt(args.output, traj[:, :3, :].reshape(len(traj), 12), fmt="%.6f")
    print(f"{len(traj)} poses -> {args.output}")


def cmd_calibrate(args):
    import jax
    import jax.numpy as jnp

    from msst_tpu.utils.io_pcd import read_pcd

    tgt = read_pcd(args.target)["xyz"]
    srcs = [read_pcd(p)["xyz"] for p in args.sources]
    results = {}
    if args.method == "lica":
        from msst_tpu.models.calibration.multi_lica import (MultiLicaConfig,
                                                            MultiLidarCalibrator)
        cal = MultiLidarCalibrator(MultiLicaConfig())
        res = cal.standard_calibration(tgt, srcs)
        for i, r in enumerate(res):
            results[f"source_{i}"] = {
                "matrix": np.asarray(r.pose.to_matrix()).tolist(),
                "fitness": float(r.fitness), "rmse": float(r.rmse),
            }
    elif args.method == "auto":
        from msst_tpu.models.calibration.auto_calib import (AutoCalibConfig,
                                                            auto_calibrate)
        cfg = AutoCalibConfig()
        for i, s in enumerate(srcs):
            def pad(a, cap=32768):
                n = min(len(a), cap)
                out = np.zeros((cap, 3), np.float32)
                out[:n] = a[:n]
                return jnp.asarray(out), jnp.asarray(np.arange(cap) < n)
            m_x, m_m = pad(tgt)
            s_x, s_m = pad(s)
            r = auto_calibrate(m_x, m_m, s_x, s_m, cfg, jax.random.PRNGKey(i))
            results[f"source_{i}"] = {
                "matrix": np.asarray(r.pose.to_matrix()).tolist(),
                "fitness": float(r.icp_rmse),
            }
    else:  # ndt
        from msst_tpu.models.calibration.ndt_calib import NdtCalibrator
        for i, s in enumerate(srcs):
            cal = NdtCalibrator()
            cal.process_pair(tgt, s)
            results[f"source_{i}"] = {
                "matrix": np.asarray(cal.pose.to_matrix()).tolist(),
                "score": cal.history[-1],
                "tf_command": cal.static_transform_command(),
            }
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    print(f"calibration -> {args.output}")


def cmd_manual_calib(args):  # pragma: no cover - interactive
    from msst_tpu.models.calibration.manual_calib import ManualCalibrator
    from msst_tpu.utils.io_pcd import read_pcd

    cal = ManualCalibrator(read_pcd(args.source)["xyz"],
                           read_pcd(args.target)["xyz"])
    cal.run_interactive()


def cmd_allan(args):
    from msst_tpu.models.calibration.imu_allan import AllanCalibrator

    data = np.loadtxt(args.csv, delimiter=",")  # t, gx, gy, gz, ax, ay, az
    cal = AllanCalibrator(name=args.name)
    for row in data:
        cal.add_sample(row[0], row[1:4], row[4:7])
    res = cal.write_yaml(args.output)
    print(json.dumps({k: res[k] for k in
                      ("gyr_n", "gyr_w", "acc_n", "acc_w", "duration_min")},
                     indent=2))
    print(f"noise YAML -> {args.output}")


def cmd_decode_pcap(args):
    import ctypes

    from msst_tpu.utils import packets
    from msst_tpu.utils.io_pcd import write_pcd

    lib = packets._load_native()
    if not lib:
        sys.exit("native library not built (make -C msst_tpu/native)")
    cap = args.max_packets
    out = np.empty((cap, 1206), np.uint8)
    stamps = np.empty(cap, np.float64)
    lib.pcap_read_packets.restype = ctypes.c_int
    n = lib.pcap_read_packets(args.pcap.encode(),
                              out.ctypes.data_as(ctypes.c_void_p),
                              stamps.ctypes.data_as(ctypes.c_void_p), cap)
    if n <= 0:
        sys.exit(f"pcap read failed: {n}")
    xyz, ring, trel, inten = packets.packets_to_scan(out[:n], stamps=stamps[:n])
    write_pcd(args.output, xyz, inten)
    print(f"{n} packets, {len(xyz)} points -> {args.output}")


def cmd_heading(args):
    import jax
    import jax.numpy as jnp

    from msst_tpu.models.heading import HeadingConfig, HeadingState, heading_step
    from msst_tpu.utils.io_pcd import read_pcd

    cfg = HeadingConfig(max_points=args.max_points)
    st = HeadingState.create()
    for i, path in enumerate(args.clouds):
        xyz = read_pcd(path)["xyz"]
        n = min(len(xyz), cfg.max_points)
        pts = np.zeros((cfg.max_points, 3), np.float32)
        pts[:n] = xyz[:n]
        mask = np.arange(cfg.max_points) < n
        st, res = heading_step(st, jnp.asarray(pts), jnp.asarray(mask),
                               jnp.asarray(0.1 * (i + 1)), jax.random.PRNGKey(i), cfg)
        d = np.asarray(res.distances)
        print(json.dumps({
            "frame": i, "roll_deg": round(float(res.roll), 3),
            "pitch_deg": round(float(res.pitch), 3),
            "yaw_deg": round(float(res.yaw), 3),
            "distances_LF_LB_RF_RB": [round(float(x), 3) for x in d],
            "confidence": int(res.confidence),
        }))


def cmd_track(args):
    import jax
    import jax.numpy as jnp

    from msst_tpu.models.target_tracker import (TargetConfig, TrackerState,
                                                track_step)
    from msst_tpu.utils.io_pcd import read_pcd

    cfg = TargetConfig(max_points=args.max_points)
    st = TrackerState.create()
    srv = None
    if args.serve_modbus:
        from msst_tpu.utils.modbus import ModbusTcpServer
        srv = ModbusTcpServer(host="0.0.0.0", port=args.serve_modbus)
        srv.start()
        print(f"modbus server on :{srv.port}", file=sys.stderr)
    try:
        for i, path in enumerate(args.clouds):
            pcd = read_pcd(path)
            xyz = pcd["xyz"]
            inten = pcd["fields"].get("intensity", np.zeros(len(xyz)))
            n = min(len(xyz), cfg.max_points)
            pts = np.zeros((cfg.max_points, 3), np.float32)
            pts[:n] = xyz[:n]
            iv = np.zeros(cfg.max_points, np.float32)
            iv[:n] = inten[:n]
            mask = np.arange(cfg.max_points) < n
            st, out = track_step(st, jnp.asarray(pts), jnp.asarray(iv),
                                 jnp.asarray(mask), jnp.asarray(0.1 * (i + 1)),
                                 jax.random.PRNGKey(i), cfg)
            rec = {"frame": i, "valid": bool(out.is_valid),
                   "x": round(float(out.x), 4), "y": round(float(out.y), 4),
                   "distance": round(float(out.distance), 4),
                   "points": int(out.point_count),
                   "track": [round(float(out.track_x), 4),
                             round(float(out.track_y), 4)]}
            print(json.dumps(rec))
            if srv is not None:
                # register map like the reference's bank (node.cpp:151-158)
                srv.set_float(0, float(out.x))
                srv.set_float(2, float(out.y))
                srv.set_float(4, float(out.distance))
                srv.set_registers(6, [int(out.point_count), int(bool(out.is_valid))])
    finally:
        if srv is not None and not args.keep_serving:
            srv.stop()


def _apply_platform_env():
    """Honor JAX_PLATFORMS / MSST_PLATFORM for CLI subprocesses.

    Site hooks that register an accelerator backend at interpreter startup
    may override the JAX_PLATFORMS env var inside jax itself, so a caller's
    ``JAX_PLATFORMS=cpu`` silently lands on the accelerator (and, on
    single-tenant TPU runtimes, collides with any concurrently running
    process).  Re-apply the caller's intent through jax.config, which wins
    over the hook."""
    import os

    plat = os.environ.get("MSST_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialized; leave it


def main(argv=None):
    _apply_platform_env()
    ap = argparse.ArgumentParser(prog="msst", description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("lio-sim")
    s.add_argument("--scans", type=int, default=40)
    s.add_argument("--horizon", type=int, default=720)
    s.add_argument("--loop", action="store_true")
    s.add_argument("--tpu", action="store_true")
    s.set_defaults(fn=cmd_lio_sim)

    s = sub.add_parser("lio-kitti")
    s.add_argument("dir")
    s.add_argument("--rings", type=int, default=64)
    s.add_argument("--horizon", type=int, default=1800)
    s.add_argument("--scans", type=int, default=0)
    s.add_argument("--loop", action="store_true")
    s.add_argument("--gps", action="store_true",
                   help="fuse the OXTS GNSS fix as GPS factors (the"
                   " reference's gpsTopic path, mapOptmization.cpp:1397-1475)")
    s.add_argument("--tiny", action="store_true",
                   help="small-capacity params (CPU-friendly)")
    s.add_argument("--output", default="trajectory_kitti.txt")
    s.add_argument("--stats-json", default=None,
                   help="write run stats (degenerate scans, loops) as JSON")
    s.add_argument("--max-points", type=int, default=0,
                   help="input cloud capacity override (0 = profile default;"
                   " full-capacity runs on small scans waste padding)")
    s.add_argument("--viz-every", type=int, default=0,
                   help="write global_map.ply + trajectory.png every N scans")
    s.add_argument("--viz-dir", default="viz_live")
    s.set_defaults(fn=cmd_lio_kitti)

    s = sub.add_parser("lio-bag")
    s.add_argument("bag")
    s.add_argument("--cloud-topic", required=True)
    s.add_argument("--imu-topic", required=True)
    s.add_argument("--scans", type=int, default=0)
    s.add_argument("--loop", action="store_true")
    s.add_argument("--tiny", action="store_true",
                   help="small-capacity params (CPU-friendly)")
    s.add_argument("--sensor", default="auto",
                   choices=("auto", "velodyne", "ouster", "livox"),
                   help="vendor point format (the reference's `sensor` "
                        "param, imageProjection.cpp:207-233)")
    s.add_argument("--output", default="trajectory.txt")
    s.add_argument("--viz-every", type=int, default=0,
                   help="write global_map.ply + trajectory.png every N scans")
    s.add_argument("--viz-dir", default="viz_live")
    s.set_defaults(fn=cmd_lio_bag)

    s = sub.add_parser("viz-serve", help="interactive WebGL viewer over a "
                       "viz directory (live-reloads the --viz-every stream)")
    s.add_argument("dir", nargs="?", default="viz_live")
    s.add_argument("--port", type=int, default=8642)
    s.set_defaults(fn=cmd_viz_serve)

    s = sub.add_parser("calibrate")
    s.add_argument("target")
    s.add_argument("sources", nargs="+")
    s.add_argument("--method", choices=["lica", "auto", "ndt"], default="lica")
    s.add_argument("--output", default="calibration.json")
    s.set_defaults(fn=cmd_calibrate)

    s = sub.add_parser("manual-calib")
    s.add_argument("target")
    s.add_argument("source")
    s.set_defaults(fn=cmd_manual_calib)

    s = sub.add_parser("allan")
    s.add_argument("csv")
    s.add_argument("--name", default="imu")
    s.add_argument("--output", default="imu_noise.yaml")
    s.set_defaults(fn=cmd_allan)

    s = sub.add_parser("heading")
    s.add_argument("clouds", nargs="+")
    s.add_argument("--max-points", type=int, default=16384)
    s.set_defaults(fn=cmd_heading)

    s = sub.add_parser("track")
    s.add_argument("clouds", nargs="+")
    s.add_argument("--max-points", type=int, default=1024)
    s.add_argument("--serve-modbus", type=int, default=0)
    s.add_argument("--keep-serving", action="store_true")
    s.set_defaults(fn=cmd_track)

    s = sub.add_parser("decode-pcap")
    s.add_argument("pcap")
    s.add_argument("output")
    s.add_argument("--max-packets", type=int, default=100000)
    s.set_defaults(fn=cmd_decode_pcap)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
