"""Per-stage device-time probe for the odometry step (bench shapes).

Methodology (CLAUDE.md): dispatch-loop microbenchmarks lie on axon, so each
stage is chained K times inside ONE jit via a data-dependent
``lax.fori_loop`` (dynamic trip count -> one compile per stage) and timed as
ms = (wall_K - wall_1) / (K - 1).  Valid for single ops / small fused stages;
NOT for the full step (its ~100 MB state carry forces copies the dispatch
path elides by donation — docs/DESIGN.md round-3 notes).

Stages probed at bench shapes (16x1800, default caps):
  frontend   unpack + deskew + range image + feature extraction (per scan)
  scan_ds    per-scan corner+surf voxel_downsample feeding scan-to-map
  lookup     one corner+surf voxel-table lookup (the re-association cost)
  s2m        full scan_to_map_voxel (frozen-correspondence GN)
  kf_update  incremental map keyframe work: _kf_moments + 2x merge_moments
             + _features_from_moments (per KEYFRAME, ~1 in 5 scans)
  preint     inter-scan IMU preintegration (per scan)

Run with the host otherwise IDLE (concurrent CPU load inflates axon wall
times ~5x — memory: bench-needs-idle-host).

Usage: python scripts/stage_probe.py [--reps 64] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--stages", default="",
                    help="comma-separated subset (default: all)")
    ap.add_argument("--batch", type=int, default=1,
                    help="vmap each probed stage over a W-slot batch (the "
                         "window program runs the scan-local prepare phase "
                         "vmapped over the dispatch window; batched lowering "
                         "can differ wildly from the single-scan one). Only "
                         "scan-local stages are meaningful batched.")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from msst_tpu.models.liosam import mapping
    from msst_tpu.models.liosam.frontend import run_frontend
    from msst_tpu.models.liosam.mapping import (_features_from_moments,
                                                _moment_group_bits,
                                                unpack_step_input)
    from msst_tpu.models.liosam.params import LioParams
    from msst_tpu.models.liosam.pipeline import LioSam
    from msst_tpu.ops import features as F
    from msst_tpu.ops import imu as imu_ops
    from msst_tpu.ops import registration, se3, voxel, voxelmap
    from msst_tpu.utils import sim

    n_scan, horizon = 16, 1800
    p = LioParams(n_scan=n_scan, horizon_scan=horizon,
                  max_points=n_scan * horizon + 64,
                  loop_closure_enabled=False, max_keyframes=256)

    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=10.0, speed=2.0)
    data = sim.make_dataset(world, traj, n_scans=24, scan_dt=0.1,
                            n_scan=n_scan, horizon=horizon, seed=7)

    # one packed scan input (points, aux) at bench shapes
    lio = LioSam(p, window=1)
    s0 = data[8]
    points_np, aux_np = lio._make_input_np(
        s0["xyz"], s0["ring"], s0["time_rel"], s0["scan_start"],
        imu_t=s0["imu_t"], imu_gyro=s0["imu_gyro"], imu_acc=s0["imu_acc"],
        imu_rpy=s0["imu_rpy"])
    points = jnp.asarray(points_np)
    aux = jnp.asarray(aux_np)
    inp = unpack_step_input(points, aux, p)

    # frontend output -> scan-level downsampled features (host-built once).
    # ONE jitted program reused for every setup scan: a fresh lambda per
    # scan would remote-recompile each time (minutes each on axon).
    @jax.jit
    def _front_ds(pts, ax):
        i = unpack_step_input(pts, ax, p)
        fr = run_frontend(i.scan, p)
        c = voxel.voxel_downsample(fr.corner, p.mapping_corner_leaf_size,
                                   capacity=p.scan_corner_cap)
        su = voxel.voxel_downsample(fr.surf, p.mapping_surf_leaf_size,
                                    capacity=p.scan_surf_cap)
        return fr, c, su

    front, corner_ds, surf_ds = _front_ds(points, aux)

    # realistic local map: all 24 scans' features in world frame -> moments
    # -> voxel feature tables (the incremental path's steady state)
    anchor = jnp.asarray(data[8]["gt_pose"][:3, 3].astype(np.float32))

    @jax.jit
    def _to_world(cxyz, sxyz, T):
        R, t = T[:3, :3], T[:3, 3]
        return cxyz @ R.T + t, sxyz @ R.T + t

    def world_feats(s):
        pi, ai = lio._make_input_np(
            s["xyz"], s["ring"], s["time_rel"], s["scan_start"],
            imu_t=s["imu_t"], imu_gyro=s["imu_gyro"], imu_acc=s["imu_acc"],
            imu_rpy=s["imu_rpy"])
        _, c, su = _front_ds(jnp.asarray(pi), jnp.asarray(ai))
        cw, sw = _to_world(c.xyz, su.xyz,
                           jnp.asarray(s["gt_pose"].astype(np.float32)))
        return (cw, c.mask, sw, su.mask)

    feats = [world_feats(s) for s in data[::3]]
    cxyz = jnp.concatenate([f[0] for f in feats])
    cmask = jnp.concatenate([f[1] for f in feats])
    sxyz = jnp.concatenate([f[2] for f in feats])
    smask = jnp.concatenate([f[3] for f in feats])
    @jax.jit
    def _build_map(cxyz, cmask, sxyz, smask):
        ck, sk = _moment_group_bits(p)
        cm = voxelmap.points_to_moments(
            cxyz, cmask, p.mapping_corner_leaf_size, anchor,
            p.map_corner_cap, group_bits=ck or 0)
        sm = voxelmap.points_to_moments(
            sxyz, smask, p.mapping_surf_leaf_size, anchor,
            p.map_surf_cap, group_bits=sk or 0)
        return cm, sm, _features_from_moments(cm, sm, anchor, p)

    corner_mom, surf_mom, lm = _build_map(cxyz, cmask, sxyz, smask)
    init6 = se3.Pose(
        se3.matrix_to_quat(jnp.asarray(s0["gt_pose"][:3, :3].astype(np.float32))),
        jnp.asarray(s0["gt_pose"][:3, 3].astype(np.float32))).to_vec6()

    # keyframe-sized feature clouds for the kf_update probe
    from msst_tpu.ops.pointcloud import compact
    kf_c = compact(corner_ds, p.kf_corner_cap)
    kf_s = compact(surf_ds, p.kf_surf_cap)

    # keyframe-delta moment tables for the merge stage
    _ckb, _skb = _moment_group_bits(p)
    kfm_c = voxelmap.points_to_moments(
        kf_c.xyz, kf_c.mask, p.mapping_corner_leaf_size, anchor,
        p.kf_corner_cap, group_bits=_ckb or 0)
    kfm_s = voxelmap.points_to_moments(
        kf_s.xyz, kf_s.mask, p.mapping_surf_leaf_size, anchor,
        p.kf_surf_cap, group_bits=_skb or 0)

    EPS = 1e-9

    def probe_frontend(c, d):
        pts, ax = d
        fr = run_frontend(
            unpack_step_input(pts + c * EPS, ax, p).scan, p)
        return jnp.sum(fr.corner.xyz) * EPS

    def probe_scan_ds(c, d):
        cx, cm, sx, sm = d
        from msst_tpu.ops.pointcloud import Cloud
        cc = voxel.voxel_downsample(Cloud.create(cx + c * EPS, mask=cm),
                                    p.mapping_corner_leaf_size,
                                    capacity=p.scan_corner_cap)
        ss = voxel.voxel_downsample(Cloud.create(sx + c * EPS, mask=sm),
                                    p.mapping_surf_leaf_size,
                                    capacity=p.scan_surf_cap)
        return (jnp.sum(cc.xyz) + jnp.sum(ss.xyz)) * EPS

    def probe_lookup(c, d):
        cx, cm, sx, sm = d
        hc = voxelmap.lookup(lm.corner_vox, cx + c * EPS, cm)
        hs = voxelmap.lookup(lm.surf_vox, sx + c * EPS, sm)
        return (jnp.sum(hc.mean) + jnp.sum(hs.mean)) * EPS

    def probe_s2m(c, d):
        cx, cm, sx, sm, i6 = d
        res = registration.scan_to_map_voxel(
            cx, cm, sx, sm, lm.corner_vox, lm.surf_vox, i6 + c * EPS,
            max_iters=p.scan2map_max_iters,
            eig_threshold=p.degeneracy_threshold,
            plateau_rtol=p.plateau_rtol,
            plateau_min_iters=p.plateau_min_iters,
            reassoc_rot=p.s2m_reassoc_rot,
            reassoc_trans=p.s2m_reassoc_trans)
        return jnp.sum(res.pose) * EPS

    def probe_kf_update(c, d):
        kcx, kcm, ksx, ksm, cm0_k, cm0_r, cm0_c, sm0_k, sm0_r, sm0_c = d
        cm0 = voxelmap.VoxelMoments(cm0_k, cm0_r, cm0_c)
        sm0 = voxelmap.VoxelMoments(sm0_k, sm0_r, sm0_c)
        ck, sk = _moment_group_bits(p)
        cmom = voxelmap.points_to_moments(
            kcx + c * EPS, kcm, p.mapping_corner_leaf_size, anchor,
            p.kf_corner_cap, group_bits=ck or 0)
        smom = voxelmap.points_to_moments(
            ksx + c * EPS, ksm, p.mapping_surf_leaf_size, anchor,
            p.kf_surf_cap, group_bits=sk or 0)
        r = p.surrounding_keyframe_search_radius
        cmg = voxelmap.merge_moments(
            cm0, cmom, p.map_corner_cap, trim_center=anchor, trim_radius=r,
            leaf=p.mapping_corner_leaf_size, origin=anchor, group_bits=ck or 0)
        smg = voxelmap.merge_moments(
            sm0, smom, p.map_surf_cap, trim_center=anchor, trim_radius=r,
            leaf=p.mapping_surf_leaf_size, origin=anchor, group_bits=sk or 0)
        lmap = _features_from_moments(cmg, smg, anchor, p)
        return (jnp.sum(lmap.corner_vox.mean) + jnp.sum(lmap.surf_vox.mean)
                ) * EPS

    def probe_surf_ds_full(c, d):
        # the frontend's full-scan per-ring surface voxel downsample alone
        # (28.8k-row 10-operand sort at bench shapes)
        pts, ax = d
        i = unpack_step_input(pts + c * EPS, ax, p)
        from msst_tpu.ops.pointcloud import Cloud
        cl = Cloud.create(i.scan.xyz, mask=i.scan.mask,
                          attrs=i.scan.time[:, None])
        ring_id = i.scan.ring
        su = voxel.voxel_downsample(cl, p.odometry_surf_leaf_size,
                                    capacity=p.scan_surf_cap,
                                    extra_key=ring_id)
        return jnp.sum(su.xyz) * EPS

    def probe_deskew(c, d):
        # rotation timeline + per-point interpolation + quat rotate alone
        pts, ax = d
        i = unpack_step_input(pts + c * EPS, ax, p)
        from msst_tpu.ops import range_image as ri_ops
        win = ri_ops.ImuWindow(i.scan.imu_t, i.scan.imu_gyro,
                               i.scan.imu_acc, i.scan.imu_mask)
        times, rots = ri_ops.imu_rotation_timeline(win)
        n_imu = jnp.sum(i.scan.imu_mask.astype(jnp.int32))
        out = ri_ops.deskew(i.scan.xyz, i.scan.scan_start + i.scan.time,
                            times, rots, n_imu, t_start=i.scan.scan_start)
        return jnp.sum(out) * EPS

    def _scan_cloud(pts, ax, c):
        i = unpack_step_input(pts + c * EPS, ax, p)
        from msst_tpu.ops.pointcloud import Cloud
        return i, Cloud.create(i.scan.xyz, mask=i.scan.mask,
                               attrs=i.scan.time[:, None])

    def probe_project(c, d):
        # range-image projection alone (scatter-min + winner gathers)
        pts, ax = d
        from msst_tpu.ops import range_image as ri_ops
        i, cl = _scan_cloud(pts, ax, c)
        img = ri_ops.project(cl, i.scan.ring, p.n_scan, p.horizon_scan,
                             p.lidar_min_range, p.lidar_max_range,
                             p.downsample_rate)
        return jnp.sum(img.xyz) * EPS

    def probe_extract(c, d):
        # CUMULATIVE: project + ring packing (read extract = this - project)
        pts, ax = d
        from msst_tpu.ops import range_image as ri_ops
        i, cl = _scan_cloud(pts, ax, c)
        img = ri_ops.project(cl, i.scan.ring, p.n_scan, p.horizon_scan,
                             p.lidar_min_range, p.lidar_max_range,
                             p.downsample_rate)
        ext = ri_ops.extract_rings(img)
        return jnp.sum(ext.xyz) * EPS

    def probe_features(c, d):
        # CUMULATIVE: project + extract + NMS feature masks
        pts, ax = d
        from msst_tpu.ops import range_image as ri_ops
        i, cl = _scan_cloud(pts, ax, c)
        img = ri_ops.project(cl, i.scan.ring, p.n_scan, p.horizon_scan,
                             p.lidar_min_range, p.lidar_max_range,
                             p.downsample_rate)
        ext = ri_ops.extract_rings(img)
        m = F.extract_features_nms(ext, p.edge_threshold, p.surf_threshold)
        return (jnp.sum(jnp.where(m.corner, ext.xyz[..., 0], 0.0))
                + jnp.sum(jnp.where(m.surface, ext.xyz[..., 1], 0.0))) * EPS

    def probe_kfmom(c, d):
        # the keyframe-delta summarization alone (2x points_to_moments)
        kcx, kcm, ksx, ksm = d
        ck, sk = _moment_group_bits(p)
        cmom = voxelmap.points_to_moments(
            kcx + c * EPS, kcm, p.mapping_corner_leaf_size, anchor,
            p.kf_corner_cap, group_bits=ck or 0)
        smom = voxelmap.points_to_moments(
            ksx + c * EPS, ksm, p.mapping_surf_leaf_size, anchor,
            p.kf_surf_cap, group_bits=sk or 0)
        return (jnp.sum(cmom.rsum) + jnp.sum(smom.rsum)) * EPS

    def probe_merge(c, d):
        # the table merges alone (2x merge_moments at map capacities)
        cm0_k, cm0_r, cm0_c, sm0_k, sm0_r, sm0_c, kc_k, kc_r, kc_c, \
            ks_k, ks_r, ks_c = d
        cm0 = voxelmap.VoxelMoments(cm0_k, cm0_r + c * EPS, cm0_c)
        sm0 = voxelmap.VoxelMoments(sm0_k, sm0_r + c * EPS, sm0_c)
        cmom = voxelmap.VoxelMoments(kc_k, kc_r, kc_c)
        smom = voxelmap.VoxelMoments(ks_k, ks_r, ks_c)
        r = p.surrounding_keyframe_search_radius
        ck, sk = _moment_group_bits(p)
        cmg = voxelmap.merge_moments(
            cm0, cmom, p.map_corner_cap, trim_center=anchor, trim_radius=r,
            leaf=p.mapping_corner_leaf_size, origin=anchor,
            group_bits=ck or 0)
        smg = voxelmap.merge_moments(
            sm0, smom, p.map_surf_cap, trim_center=anchor, trim_radius=r,
            leaf=p.mapping_surf_leaf_size, origin=anchor,
            group_bits=sk or 0)
        return (jnp.sum(cmg.rsum) + jnp.sum(smg.rsum)) * EPS

    def probe_fitmom(c, d):
        cm0_k, cm0_r, cm0_c, sm0_k, sm0_r, sm0_c = d
        cm0 = voxelmap.VoxelMoments(cm0_k, cm0_r + c * EPS, cm0_c)
        sm0 = voxelmap.VoxelMoments(sm0_k, sm0_r + c * EPS, sm0_c)
        lmap = _features_from_moments(cm0, sm0, anchor, p)
        return (jnp.sum(lmap.corner_vox.mean) + jnp.sum(lmap.surf_vox.mean)
                ) * EPS

    def probe_s2m1(c, d):
        # single GN trip: (s2m - s2m1)/(mean_iters - 1) isolates the
        # per-additional-trip cost of the dynamic while_loop (body work +
        # loop overhead); compare with `lookup` to see how much of a trip
        # is the correspondence math itself
        cx, cm, sx, sm, i6 = d
        res = registration.scan_to_map_voxel(
            cx, cm, sx, sm, lm.corner_vox, lm.surf_vox, i6 + c * EPS,
            max_iters=1,
            eig_threshold=p.degeneracy_threshold,
            plateau_rtol=p.plateau_rtol,
            plateau_min_iters=p.plateau_min_iters,
            reassoc_rot=p.s2m_reassoc_rot,
            reassoc_trans=p.s2m_reassoc_trans)
        return jnp.sum(res.pose) * EPS

    def probe_preint(c, d):
        pt, pg, pa, pm = d
        pre = imu_ops.preintegrate(pt, pg + c * EPS, pa, pm,
                                   imu_ops.ImuBias.zero(), p.imu_params)
        return jnp.sum(pre.dp) * EPS

    def probe_prep(c, d):
        # the WHOLE scan-local prepare phase (unpack + frontend + feature
        # downsample + zero-bias preintegration) — with --batch W this is
        # exactly the window program's vmapped prefix
        pts, ax = d
        i = unpack_step_input(pts + c * EPS, ax, p)
        ps = mapping.prepare_scan(i, p)
        return jnp.sum(ps.corner_xyz) * EPS

    def probe_recon(c, d):
        # the range-image upload's in-program xyz reconstruction
        # (mapping.odometry_window_flat_ri): trig + stack per pixel
        rr, az, el, tc = d
        S, H = p.n_scan, p.horizon_scan
        r = (rr + c * EPS).reshape(S, H)
        ce, se_ = jnp.cos(el), jnp.sin(el)
        ca, sa = jnp.cos(az), jnp.sin(az)
        x = r * (ce[:, None] * ca[None, :])
        y = r * (ce[:, None] * sa[None, :])
        z = r * se_[:, None]
        t = jnp.broadcast_to(tc[None, :], (S, H))
        ring = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.float32)[:, None], (S, H))
        pts5 = jnp.stack([x, y, z, t, ring], axis=-1).reshape(S * H, 5)
        return jnp.sum(pts5) * EPS

    stages = {
        "frontend": (probe_frontend, (points, aux)),
        "scan_ds": (probe_scan_ds,
                    (front.corner.xyz, front.corner.mask,
                     front.surf.xyz, front.surf.mask)),
        "lookup": (probe_lookup,
                   (corner_ds.xyz, corner_ds.mask, surf_ds.xyz, surf_ds.mask)),
        "s2m": (probe_s2m,
                (corner_ds.xyz, corner_ds.mask, surf_ds.xyz, surf_ds.mask,
                 init6)),
        "s2m1": (probe_s2m1,
                 (corner_ds.xyz, corner_ds.mask, surf_ds.xyz, surf_ds.mask,
                  init6)),
        "kf_update": (probe_kf_update,
                      (kf_c.xyz, kf_c.mask, kf_s.xyz, kf_s.mask,
                       corner_mom.key, corner_mom.rsum, corner_mom.cnt,
                       surf_mom.key, surf_mom.rsum, surf_mom.cnt)),
        "surf_ds_full": (probe_surf_ds_full, (points, aux)),
        "deskew": (probe_deskew, (points, aux)),
        "project": (probe_project, (points, aux)),
        "extract": (probe_extract, (points, aux)),      # cumulative w/ project
        "features": (probe_features, (points, aux)),    # cumulative w/ both
        "kfmom": (probe_kfmom,
                  (kf_c.xyz, kf_c.mask, kf_s.xyz, kf_s.mask)),
        "merge": (probe_merge,
                  (corner_mom.key, corner_mom.rsum, corner_mom.cnt,
                   surf_mom.key, surf_mom.rsum, surf_mom.cnt,
                   kfm_c.key, kfm_c.rsum, kfm_c.cnt,
                   kfm_s.key, kfm_s.rsum, kfm_s.cnt)),
        "fitmom": (probe_fitmom,
                   (corner_mom.key, corner_mom.rsum, corner_mom.cnt,
                    surf_mom.key, surf_mom.rsum, surf_mom.cnt)),
        "preint": (probe_preint,
                   (inp.pre_t, inp.pre_gyro, inp.pre_acc, inp.pre_mask)),
        "prep": (probe_prep, (points, aux)),
        "recon": (probe_recon,
                  (jnp.asarray(np.asarray(s0["ranges"],
                                          np.float32).reshape(-1)),
                   jnp.asarray(np.asarray(s0["azimuth"], np.float32)),
                   jnp.asarray(np.asarray(s0["elev"], np.float32)),
                   jnp.asarray(np.asarray(s0["col_time"], np.float32)))),
    }
    subset = [s for s in args.stages.split(",") if s] or list(stages)

    import functools
    results = {}
    W = args.batch
    for name in subset:
        fn, dat = stages[name]
        if W > 1:
            # vmap the stage over a W-slot batch (per-slot carry jitter keeps
            # slots from being literally identical programs+data)
            def fnb(c, dat, fn=fn):
                dW = jax.tree_util.tree_map(
                    lambda a: jnp.broadcast_to(a, (W,) + a.shape), dat)
                slots = jnp.arange(W, dtype=jnp.float32)
                return jnp.sum(jax.vmap(
                    lambda s, dd: fn(c + s * 1e-6, dd))(slots, dW))
            fn = fnb

        @functools.partial(jax.jit, static_argnums=())
        def run(reps, dat=dat, fn=fn):
            return jax.lax.fori_loop(
                0, reps, lambda i, c: fn(c, dat), jnp.float32(0.0))

        jax.block_until_ready(run(jnp.int32(1)))   # compile
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.int32(1)))
        w1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.int32(args.reps)))
        wk = time.perf_counter() - t0
        results[name] = round(1000.0 * (wk - w1) / (args.reps - 1), 3)
        print(f"  {name}: {results[name]} ms", file=sys.stderr)

    print(json.dumps({
        "stage_ms": results,
        "reps": args.reps,
        "batch": W,
        "backend": jax.devices()[0].platform,
        "note": "per-scan: frontend+scan_ds+s2m+preint; per-keyframe "
                "(~1 in 5 scans): kf_update; lookup/fitmom are components "
                "of s2m/kf_update",
    }))


if __name__ == "__main__":
    main()
