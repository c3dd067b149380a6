"""The fused LIO odometry step: one compiled program per scan.

Covers the reference's ``mapOptmization`` per-scan pipeline
(``laserCloudInfoHandler`` ``src/mapOptmization.cpp:237-271``):

* initial guess from the IMU filter / IMU attitude (``updateInitialGuess``
  :786-845),
* local map assembly from nearby keyframes (``extractSurroundingKeyFrames``
  :862-938 — KD-tree radius search becomes a masked top-k over keyframe
  positions; the transformed-cloud cache becomes a batched gather+transform,
  which on TPU is cheaper than caching),
* scan downsample (:955-967) + scan-to-map Gauss-Newton (:1282-1310),
* roll/pitch slerp fusion with the IMU attitude + z clamp
  (``transformUpdate`` :1312-1342),
* keyframe gating (``saveFrame`` :1354-1379), prior/between/GPS factors
  (:1381-1475), windowed graph optimization standing in for the iSAM2
  update (:1497-1581), pose-history rewrite (``correctPoses`` :1583-1614),
* the ESKF update that replaces the ``imuPreintegration`` process.

Everything below is shape-static and jit-compiled once per parameter set.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import graph as graph_ops
from ...ops import imu as imu_ops
from ...ops import knn, registration, se3, voxel
from ...ops.pointcloud import Cloud
from . import imu_fusion
from .frontend import ScanInput, run_frontend, run_frontend_grid
from .params import LioParams
from .state import KeyframeStore, LioState

Array = jax.Array


class StepInput(NamedTuple):
    scan: ScanInput
    # inter-scan IMU (previous scan -> this scan) for the filter/initial guess
    pre_t: Array      # (T,)
    pre_gyro: Array   # (T, 3)
    pre_acc: Array    # (T, 3)
    pre_mask: Array   # (T,)
    gps_xyz: Array    # (3,)
    gps_sigma: Array  # (3,)
    gps_valid: Array  # () bool
    # bootstrap velocity hint (pipeline dynamic init): body-frame velocity
    # for the FIRST scan's translation deskew + filter init — the one scan
    # where no estimate exists yet (the reference shares this blind spot:
    # its first cloud is deskewed rotation-only and anchors the map ~v*T/2
    # off the true start pose)
    init_vel_body: Array   # (3,)
    init_vel_valid: Array  # () bool


class StepOutput(NamedTuple):
    pose: se3.Pose
    pose_matrix: Array  # (4, 4) — computed in-step: host-side eager op chains
                        # cost ~1 ms PER OP through the device tunnel
    pose6: Array
    velocity: Array
    bias: imu_ops.ImuBias
    degenerate: Array
    is_keyframe: Array
    n_corner: Array
    n_surf: Array
    kf_count: Array
    s2m_iterations: Array
    # capped-structure telemetry (VERDICT r4 #6): occupancy fraction of the
    # (corner, surf) local-map tables and cells dropped by cap overflow
    # since the last re-bake — the pipeline warns host-side on saturation
    map_occupancy: Array   # (2,) float in [0, 1]
    map_dropped: Array     # (2,) int32 cumulative


def unpack_step_input(points: Array, aux: Array, p: LioParams) -> StepInput:
    """Rebuild a StepInput from the 2-array packed host format (see
    pipeline._make_input: each host->device transfer has fixed latency
    through the tunnel, so 13 small transfers cost more than 2 larger ones).

    points: (max_points, 5) = [x, y, z, time_rel, ring]
    aux:    (2T + 3, 8): rows [0, T)   scan-window IMU [t, gyro3, acc3, mask]
                         rows [T, 2T)  inter-scan IMU  [t, gyro3, acc3, mask]
                         row 2T   [scan_start, n_points, imu_available, rpy0..2, gps_valid, 0]
                         row 2T+1 [gps_xyz(3), gps_sigma(3), 0, 0]
                         row 2T+2 [init_vel_body(3), init_vel_valid, 0..0]
    """
    T = p.imu_window
    misc = aux[2 * T]
    gps = aux[2 * T + 1]
    boot = aux[2 * T + 2]
    n_pts = misc[1].astype(jnp.int32)
    scan = ScanInput(
        xyz=points[:, :3],
        mask=jnp.arange(p.max_points) < n_pts,
        ring=points[:, 4].astype(jnp.int32),
        time=points[:, 3],
        scan_start=misc[0],
        imu_t=aux[:T, 0], imu_gyro=aux[:T, 1:4], imu_acc=aux[:T, 4:7],
        imu_mask=aux[:T, 7] > 0.5,
        imu_rpy_init=misc[3:6],
        imu_available=misc[2] > 0.5,
    )
    return StepInput(
        scan=scan,
        pre_t=aux[T:2 * T, 0], pre_gyro=aux[T:2 * T, 1:4],
        pre_acc=aux[T:2 * T, 4:7], pre_mask=aux[T:2 * T, 7] > 0.5,
        gps_xyz=gps[:3], gps_sigma=gps[3:6], gps_valid=misc[6] > 0.5,
        init_vel_body=boot[:3], init_vel_valid=boot[3] > 0.5,
    )


@partial(jax.jit, static_argnames=("p",), donate_argnums=(0,))
def odometry_step_packed(state: LioState, points: Array, aux: Array,
                         p: LioParams):
    """Hot-path entry: packed inputs + donated state buffers (the keyframe
    store is ~100 MB; without donation every step reallocates and copies it)."""
    return odometry_step(state, unpack_step_input(points, aux, p), p)


def _passthrough_output(state: LioState, p: LioParams) -> StepOutput:
    """StepOutput for a padded (invalid) window slot: state unchanged."""
    pose = se3.Pose.from_vec6(state.pose6)
    occ, dropped = _map_telemetry(state.local_map, p)
    return StepOutput(
        pose=pose, pose_matrix=pose.to_matrix(), pose6=state.pose6,
        velocity=state.filter.nav.v, bias=state.filter.bias,
        degenerate=state.degenerate, is_keyframe=jnp.asarray(False),
        n_corner=jnp.asarray(0, jnp.int32), n_surf=jnp.asarray(0, jnp.int32),
        kf_count=state.kf.count,
        s2m_iterations=jnp.asarray(0, jnp.int32),
        map_occupancy=occ, map_dropped=dropped,
    )


@partial(jax.jit, static_argnames=("p",), donate_argnums=(0,))
def odometry_window_packed(state: LioState, points_w: Array, aux_w: Array,
                           p: LioParams):
    """W scans in ONE dispatch: batched scan preparation + ``lax.scan`` of
    the estimator core over a window of packed inputs.

    Through the tunneled-TPU runtime every dispatch pays ~25-35 ms of host
    overhead regardless of device time (measured round 1, docs/DESIGN.md), so
    feeding scans one program at a time caps throughput near 15 scans/s even
    when the device math takes 15 ms.  Batching W scans per program amortizes
    that fixed cost to overhead/W.

    The scan-local pipeline (deskew rotation, range image, feature
    extraction, feature downsample, zero-bias IMU preintegration — nothing
    that reads estimator state) is hoisted OUT of the sequential scan and
    vmapped over the window: one batch of W-fold-larger ops instead of W
    repetitions of small latency-bound ones.  The sequential body applies
    the state-dependent parts: translation deskew from the ESKF velocity
    (linear in the per-feature firing offsets carried through downsampling)
    and first-order bias correction of the preintegration (Forster
    Jacobians; see imu_fusion.propagate).  Semantics match W sequential
    ``odometry_step_packed`` calls, which route through the same
    prepare/core split.  Padded slots carry aux[2T, 7] = 0 and pass the
    state through unchanged, so a partial window reuses this same compiled
    program instead of compiling a second one (remote compiles cost
    10-50 min).

    points_w: (W, max_points, 5);  aux_w: (W, 2T+3, 8)
    """
    T = p.imu_window

    preps = jax.vmap(
        lambda pts, aux: prepare_scan(unpack_step_input(pts, aux, p), p)
    )(points_w, aux_w)
    valid_w = aux_w[:, 2 * T, 7] > 0.5
    return _window_core(state, preps, valid_w, p)


def _window_core(state: LioState, preps, valid_w: Array, p: LioParams):
    """Sequential estimator core over a window of prepared scans."""

    def body(st, pv):
        ps, valid = pv
        st, out = jax.lax.cond(
            valid,
            lambda s: odometry_core(s, ps, p),
            lambda s: (s, _passthrough_output(s, p)),
            st,
        )
        return st, out

    return jax.lax.scan(body, state, (preps, valid_w))


def odometry_window_grids(state: LioState, r: Array, az: Array, tcol: Array,
                          elev: Array, aux_w: Array, p: LioParams):
    """:func:`odometry_window_packed` fed by range-image grids directly:
    the vmapped prepare runs the grid frontend (no point-row
    reconstruction / re-projection).  az/tcol (H,) and elev (S,) may be
    window-shared (the ri2 hoisted layout) or per-scan (W, ·).

    r: (W, S*H);  aux_w: (W, 2T+3, 8)
    """
    T = p.imu_window
    W = r.shape[0]
    r3 = r.reshape(W, p.n_scan, p.horizon_scan)
    ax = 0 if az.ndim == 2 else None
    preps = jax.vmap(
        lambda rg, a, t, e, aux: prepare_scan_grid(rg, a, t, e, aux, p),
        in_axes=(0, ax, ax, ax, 0),
    )(r3, az, tcol, elev, aux_w)
    valid_w = aux_w[:, 2 * T, 7] > 0.5
    return _window_core(state, preps, valid_w, p)


POINT_QUANT = (256.0, 256.0, 256.0, 16384.0, 1.0)  # per-column int16 scales:
# xyz at 3.9 mm steps over +-128 m (rms error ~1.1 mm, an order below the
# sensor noise), time_rel at 61 us steps over +-2 s, ring verbatim.


@partial(jax.jit, static_argnames=("p",), donate_argnums=(0,))
def odometry_window_flat_q16(state: LioState, flat_w: Array, p: LioParams):
    """:func:`odometry_window_flat` fed by ONE int16 buffer — host->device
    transfers serialize against execution through the tunneled runtime
    (docs/DESIGN.md round-2 profile), so halving the window upload (9.2 MB
    f32 -> 4.6 MB at 16x1800x16) buys wall-clock directly.  Points are
    quantized per POINT_QUANT; the aux rows ride as raw f32 bit patterns
    split into int16 halves (no precision loss).

    flat_w: (W, n_pts*5 + (2T+3)*8*2) int16
    """
    W = flat_w.shape[0]
    n_pts = p.max_points
    T = p.imu_window
    n5 = n_pts * 5
    scales = jnp.asarray(POINT_QUANT, jnp.float32)
    pts_w = (flat_w[:, :n5].reshape(W, n_pts, 5).astype(jnp.float32)
             / scales[None, None, :])
    a8 = (2 * T + 3) * 8
    aux_i16 = flat_w[:, n5:n5 + 2 * a8].reshape(W, a8, 2)
    aux_w = jax.lax.bitcast_convert_type(
        aux_i16, jnp.float32).reshape(W, 2 * T + 3, 8)
    return odometry_window_packed(state, pts_w, aux_w, p)


RI_RANGE_SCALE = 250.0  # int16 range steps: 4 mm over [0, 131 m]


@partial(jax.jit, static_argnames=("p",), donate_argnums=(0,))
def odometry_window_flat_ri(state: LioState, flat_w: Array, p: LioParams):
    """Range-image upload: the window ships as per-pixel RANGES plus
    per-column azimuth/time and per-ring elevation, and xyz is reconstructed
    in-program — ``x = r (cos e cos a, cos e sin a, sin e)``.

    The ranges ARE the sensor's raw measurement (a spinning-lidar packet is
    ranges + azimuths, ``utils/packets.py``); shipping them instead of
    quantized xyz cuts the window upload ~3.9x (291 -> 74 KB/scan at
    16x1800), and host->device transfers serialize against execution through
    the tunneled runtime, so the cut is wall-clock (round-3 window probe:
    213 ms full vs 122 ms execute per 16-scan window — the gap is transfer).
    Invalid pixels carry range 0 and are culled by the frontend's
    ``lidar_min_range`` gate (``projectPointCloud`` :544-552 does the same).

    Grid-structured sources only (sim, live spinning-lidar drivers);
    unstructured clouds (KITTI) stay on the q16 xyz path.

    flat_w: (W, S*H + 2*H + 2*H + 2*S + (2T+3)*8*2) int16 —
            [ranges, az(f32 halves), col_time(f32 halves), elev(f32 halves),
             aux(f32 halves)]
    """
    W = flat_w.shape[0]
    S, H = p.n_scan, p.horizon_scan
    n_pix = S * H
    T = p.imu_window
    off = n_pix

    def f32_block(width):
        nonlocal off
        a = jax.lax.bitcast_convert_type(
            flat_w[:, off:off + 2 * width].reshape(W, width, 2), jnp.float32)
        off += 2 * width
        return a

    r = flat_w[:, :n_pix].astype(jnp.float32) / RI_RANGE_SCALE  # (W, n_pix)
    az = f32_block(H)                                           # (W, H)
    tcol = f32_block(H)                                         # (W, H)
    elev = f32_block(S)                                         # (W, S)
    aux_w = f32_block((2 * T + 3) * 8).reshape(W, 2 * T + 3, 8)

    return odometry_window_grids(state, r, az, tcol, elev, aux_w, p)


def _ri_points(r: Array, az: Array, tcol: Array, elev: Array,
               p: LioParams) -> Array:
    """Reconstruct the packed (W, max_points, 5) point rows from per-pixel
    ranges (W, S*H), per-column azimuth/time (W, H) and per-ring elevation
    (W, S) — ``x = r (cos e cos a, cos e sin a, sin e)``.  (Kept for the
    probes and the xyz-path comparison tests; the dispatch path now feeds
    the grids straight to the grid frontend, odometry_window_grids.)"""
    W = r.shape[0]
    S, H = p.n_scan, p.horizon_scan
    n_pix = S * H
    ce, se = jnp.cos(elev), jnp.sin(elev)                       # (W, S)
    ca, sa = jnp.cos(az), jnp.sin(az)                           # (W, H)
    ri = r.reshape(W, S, H)
    x = ri * (ce[:, :, None] * ca[:, None, :])
    y = ri * (ce[:, :, None] * sa[:, None, :])
    z = ri * se[:, :, None]
    t = jnp.broadcast_to(tcol[:, None, :], (W, S, H))
    ring = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.float32)[None, :, None], (W, S, H))
    pts_w = jnp.stack([x, y, z, t, ring], axis=-1).reshape(W, n_pix, 5)
    pad = p.max_points - n_pix
    if pad > 0:  # zero rows: range 0 -> culled by the min-range gate
        pts_w = jnp.concatenate(
            [pts_w, jnp.zeros((W, pad, 5), jnp.float32)], axis=1)
    return pts_w


def ri_flat_width(p: LioParams) -> int:
    """int16 row width of the range-image window buffer (see
    :func:`odometry_window_flat_ri`)."""
    S, H, T = p.n_scan, p.horizon_scan, p.imu_window
    return S * H + 2 * H + 2 * H + 2 * S + (2 * T + 3) * 8 * 2


def ri2_flat_len(p: LioParams, window: int) -> int:
    """int16 length of the grid-hoisted range-image window buffer (see
    :func:`odometry_window_flat_ri2`)."""
    S, H, T = p.n_scan, p.horizon_scan, p.imu_window
    return window * (S * H + (2 * T + 3) * 8 * 2) + 2 * H + 2 * H + 2 * S


@partial(jax.jit, static_argnames=("p",), donate_argnums=(0,))
def odometry_window_flat_ri2(state: LioState, flat_w: Array, p: LioParams):
    """:func:`odometry_window_flat_ri` with the azimuth/col_time/elevation
    grids hoisted to ONE copy per WINDOW: a fixed firing pattern makes them
    identical across the window's scans (the packer verifies equality on the
    host and falls back to the per-scan layout when a source jitters), so
    shipping them per scan was ~20% of the upload bytes for pure redundancy
    (14.5 of 74 KB/scan at 16x1800).  Transfers serialize against execution
    through the tunneled runtime, so redundant bytes are wall-clock.

    flat_w: 1-D int16 —
        [W*S*H ranges, W*(2T+3)*8*2 aux (f32 halves),
         2H az, 2H col_time, 2S elev (f32 halves)]
    """
    S, H = p.n_scan, p.horizon_scan
    T = p.imu_window
    n_pix = S * H
    a8 = (2 * T + 3) * 8
    W = (flat_w.shape[0] - 2 * (2 * H + S)) // (n_pix + 2 * a8)

    r = (flat_w[:W * n_pix].reshape(W, n_pix).astype(jnp.float32)
         / RI_RANGE_SCALE)
    off = W * n_pix
    aux_w = jax.lax.bitcast_convert_type(
        flat_w[off:off + W * 2 * a8].reshape(W, a8, 2),
        jnp.float32).reshape(W, 2 * T + 3, 8)
    off += W * 2 * a8

    def f32_block(width):
        nonlocal off
        a = jax.lax.bitcast_convert_type(
            flat_w[off:off + 2 * width].reshape(width, 2), jnp.float32)
        off += 2 * width
        return a

    az = f32_block(H)        # (H,) — window-shared, vmapped with in_axes=None
    tcol = f32_block(H)
    elev = f32_block(S)
    return odometry_window_grids(state, r, az, tcol, elev, aux_w, p)


def select_window_fn(p: LioParams, flat_w):
    """Pick the window program matching a packed buffer's layout (shared by
    the pipeline dispatch and the perf probes)."""
    if flat_w.ndim == 1:
        return odometry_window_flat_ri2
    if p.quantized_upload and flat_w.shape[1] == ri_flat_width(p):
        return odometry_window_flat_ri
    if p.quantized_upload:
        return odometry_window_flat_q16
    return odometry_window_flat


@partial(jax.jit, static_argnames=("p",), donate_argnums=(0,))
def odometry_window_flat(state: LioState, flat_w: Array, p: LioParams):
    """:func:`odometry_window_packed` fed by ONE flat (W, n_pts*5 + (2T+3)*8)
    buffer.  Each host->device transfer through the tunneled runtime pays a
    fixed post-execute stall (~30-130 ms measured) on top of bandwidth, so
    the window's two input arrays are shipped as a single upload and split
    here in-program."""
    W = flat_w.shape[0]
    n_pts = p.max_points
    T = p.imu_window
    pts_w = flat_w[:, :n_pts * 5].reshape(W, n_pts, 5)
    aux_w = flat_w[:, n_pts * 5:n_pts * 5 + (2 * T + 3) * 8].reshape(
        W, 2 * T + 3, 8)
    return odometry_window_packed(state, pts_w, aux_w, p)


# ---------------------------------------------------------------------------
# local map assembly
# ---------------------------------------------------------------------------


def _select_nearby(kf: KeyframeStore, position: Array, scan_time: Array,
                   p: LioParams):
    """Nearby-keyframe selection (``extractNearby`` :862-897: radius search +
    always the last-10s keyframes) -> (sel_idx (S,), sel_ok (S,))."""
    K = kf.pose6.shape[0]
    kmask = kf.mask
    d2 = jnp.sum((kf.positions - position) ** 2, axis=1)
    recent = (scan_time - kf.time) < 10.0
    in_radius = d2 < p.surrounding_keyframe_search_radius**2
    eligible = kmask & (in_radius | recent)
    eff = jnp.where(eligible, jnp.where(recent, 0.0, d2), jnp.inf)
    neg, sel_idx = jax.lax.top_k(-eff, min(p.near_keyframes, K))
    sel_ok = jnp.isfinite(-neg)
    return sel_idx, sel_ok


def _gather_selected(kf: KeyframeStore, sel_idx: Array, sel_ok: Array):
    """Transform the selected keyframes' feature clouds into flat masked
    world-frame arrays — no downsampling here."""

    def gather(cloud_xyz, cloud_mask):
        pts = cloud_xyz[sel_idx]                          # (S, C, 3)
        msk = cloud_mask[sel_idx] & sel_ok[:, None]
        poses = se3.Pose.from_vec6(kf.pose6[sel_idx])     # batched (S,)
        world = poses.apply(pts)                          # (S, C, 3)
        return Cloud.create(world.reshape(-1, 3), mask=msk.reshape(-1))

    return (gather(kf.corner_xyz, kf.corner_mask),
            gather(kf.surf_xyz, kf.surf_mask))


def _gather_nearby_world(kf: KeyframeStore, position: Array,
                         scan_time: Array, p: LioParams):
    sel_idx, sel_ok = _select_nearby(kf, position, scan_time, p)
    return _gather_selected(kf, sel_idx, sel_ok)


def _assemble_local_map(kf: KeyframeStore, position: Array, scan_time: Array,
                        p: LioParams):
    """Nearby keyframes fused into fixed-cap masked map arrays
    (``extractCloud`` :899-938: transform + density downsample)."""
    corner_flat, surf_flat = _gather_nearby_world(kf, position, scan_time, p)
    # packed single-key sort: the local map lives within the search radius
    # of `position`, far inside the packed +-512-cell domain
    corner_map = voxel.voxel_downsample_packed(
        corner_flat, p.mapping_corner_leaf_size, position,
        capacity=p.map_corner_cap)
    surf_map = voxel.voxel_downsample_packed(
        surf_flat, p.mapping_surf_leaf_size, position,
        capacity=p.map_surf_cap)
    return corner_map, surf_map


def _rebuild_local_map(kf: KeyframeStore, position: Array, scan_time: Array,
                       p: LioParams):
    from ...ops import voxelmap
    from .state import LocalMap

    use_vox = p.scan2map_method == "voxel"

    if use_vox:
        # Voxel path: the flat map clouds only feed the voxel-Gaussian fit,
        # so LocalMap carries tiny placeholders.  vox_source picks the fit
        # input: "downsampled" reproduces the reference's map-level centroid
        # downsample before the fit (extractCloud :899-938 semantics; the
        # centroid pass denoises overlapping keyframes and measures ~40%
        # less drift on the 16x1800 sim drive), "direct" fits from the raw
        # gathered keyframe features (skips a full sort+reduce pass over the
        # 262k-point gather; cheaper per keyframe, slightly noisier map).
        if p.vox_source == "direct":
            vc, vs = _gather_nearby_world(kf, position, scan_time, p)
        else:
            vc, vs = _assemble_local_map(kf, position, scan_time, p)
        corner_flat, surf_flat = vc, vs
        tiny = Cloud.create(jnp.zeros((8, 3), jnp.float32),
                            mask=jnp.zeros((8,), bool))
        corner_map, surf_map = tiny, tiny

        def grid(cloud, cap):
            return knn.build(jnp.zeros((8, 3), jnp.float32),
                             jnp.zeros((8,), bool), 1.0, 16)

        def vox(cloud, cap, leaf, kind):
            return voxelmap.build(cloud.xyz, cloud.mask, leaf, cap, kind,
                                  table_size=2 * cap, origin=position,
                                  plane_min_spread=p.vox_plane_min_spread)

        vox_corner, vox_surf = corner_flat, surf_flat
    else:
        corner_map, surf_map = _assemble_local_map(kf, position, scan_time, p)

        def grid(cloud, cap):
            return knn.build(cloud.xyz, cloud.mask, 1.0, p.knn_table_size)

        def vox(cloud, cap, leaf, kind):
            return voxelmap.build(jnp.zeros((8, 3), jnp.float32),
                                  jnp.zeros((8,), bool), leaf, 8, kind,
                                  table_size=16)

        vox_corner, vox_surf = corner_map, surf_map

    use_inc = use_vox and p.map_update == "incremental"
    return LocalMap(
        corner_xyz=corner_map.xyz, corner_mask=corner_map.mask,
        surf_xyz=surf_map.xyz, surf_mask=surf_map.mask,
        corner_grid=grid(corner_map, p.map_corner_cap),
        surf_grid=grid(surf_map, p.map_surf_cap),
        corner_vox=vox(vox_corner, p.vox_corner_cap, p.vox_corner_leaf,
                       "line"),
        surf_vox=vox(vox_surf, p.vox_surf_cap, p.vox_surf_leaf, "plane"),
        corner_mom=voxelmap.empty_moments(p.map_corner_cap if use_inc else 8),
        surf_mom=voxelmap.empty_moments(p.map_surf_cap if use_inc else 8),
        anchor=position,
        valid=jnp.asarray(True),
        mom_dropped=jnp.zeros(2, jnp.int32),
    )


# ---------------------------------------------------------------------------
# incremental local map (map_update="incremental")
# ---------------------------------------------------------------------------


def _tiny_cloud():
    return Cloud.create(jnp.zeros((8, 3), jnp.float32),
                        mask=jnp.zeros((8,), bool))


def _group_bits(coarse: float, fine: float) -> int | None:
    """k when coarse/fine == 2^k (k >= 0 int), else None.  With a
    power-of-two leaf ratio the moment tables use the HIERARCHICAL key
    packing (voxelmap._pack_rel(group_bits=k)): rows sorted by that key are
    grouped by coarse cell, so the coarse feature fit skips its sort
    (ops/voxelmap.build presorted).  Non-power-of-two ratios fall back to
    plain packing + a sorting fit — a plain fine key does NOT group coarse
    cells (it fragments them into duplicate voxel entries; see _pack_rel)."""
    r = coarse / fine
    if r < 1.0 or abs(r - round(r)) > 1e-6:
        return None
    r = int(round(r))
    k = r.bit_length() - 1
    return k if (1 << k) == r else None


def _features_from_moments(corner_mom, surf_mom, anchor: Array, p: LioParams,
                           mom_dropped: Array | None = None):
    """LocalMap from persistent moment tables: fine-cell centroids feed the
    coarse voxel-feature fit — identical semantics to the full rebuild's
    centroid-downsample-then-fit (``extractCloud`` :899-938 + ops/voxelmap),
    but the per-point work was already amortized into the moments.  The fit
    skips its sort when the coarse leaf is an integer multiple of the fine
    (moment) leaf: sorted fine keys are already sorted by coarse key."""
    from ...ops import voxelmap
    from .state import LocalMap

    ck, sk = _moment_group_bits(p)
    cx, cm = voxelmap.moments_centroids(corner_mom,
                                        p.mapping_corner_leaf_size, anchor,
                                        group_bits=ck or 0)
    sx, sm, s_cnt = voxelmap.moments_centroids(surf_mom,
                                               p.mapping_surf_leaf_size,
                                               anchor, group_bits=sk or 0,
                                               return_counts=True)
    tiny = _tiny_cloud()

    def grid(_cap):
        return knn.build(jnp.zeros((8, 3), jnp.float32),
                         jnp.zeros((8,), bool), 1.0, 16)

    return LocalMap(
        corner_xyz=tiny.xyz, corner_mask=tiny.mask,
        surf_xyz=tiny.xyz, surf_mask=tiny.mask,
        corner_grid=grid(8), surf_grid=grid(8),
        corner_vox=voxelmap.build(
            cx, cm, p.vox_corner_leaf, p.vox_corner_cap,
            "line", table_size=2 * p.vox_corner_cap, origin=anchor,
            presorted=ck is not None),
        surf_vox=voxelmap.build(
            sx, sm, p.vox_surf_leaf, p.vox_surf_cap,
            "plane", table_size=2 * p.vox_surf_cap, origin=anchor,
            presorted=sk is not None,
            plane_min_spread=p.vox_plane_min_spread,
            weights=s_cnt),
        corner_mom=corner_mom, surf_mom=surf_mom, anchor=anchor,
        valid=jnp.asarray(True),
        mom_dropped=(jnp.zeros(2, jnp.int32) if mom_dropped is None
                     else mom_dropped),
    )


def _moment_group_bits(p: LioParams) -> tuple[int | None, int | None]:
    """(corner_k, surf_k): hierarchical-key group bits for the two moment
    tables (None = non-power-of-two leaf ratio, plain packing + sorting
    fit).  Every producer/consumer of a moment table must agree on these."""
    return (_group_bits(p.vox_corner_leaf, p.mapping_corner_leaf_size),
            _group_bits(p.vox_surf_leaf, p.mapping_surf_leaf_size))


def _rebake_local_map(kf: KeyframeStore, position: Array, scan_time: Array,
                      p: LioParams):
    """Full re-bake: gather nearby keyframes at their CURRENT poses, rebuild
    the moment tables anchored at `position`, refit features.  Runs on the
    first keyframe, after loop closures rewrite history (``correctPoses``
    :1583-1614 clears the reference's cloud cache), when the robot travels
    beyond the anchor domain, or when graph updates moved baked poses beyond
    ``map_stale_tolerance``.  Returns (LocalMap, baked_pose6, baked)."""
    from ...ops import voxelmap

    K = kf.pose6.shape[0]
    ck, sk = _moment_group_bits(p)
    sel_idx, sel_ok = _select_nearby(kf, position, scan_time, p)
    corner_flat, surf_flat = _gather_selected(kf, sel_idx, sel_ok)
    corner_mom, c_drop = voxelmap.points_to_moments(
        corner_flat.xyz, corner_flat.mask, p.mapping_corner_leaf_size,
        position, p.map_corner_cap, group_bits=ck or 0, return_stats=True)
    surf_mom, s_drop = voxelmap.points_to_moments(
        surf_flat.xyz, surf_flat.mask, p.mapping_surf_leaf_size,
        position, p.map_surf_cap, group_bits=sk or 0, return_stats=True)
    # the re-bake rebuilds the tables from scratch, so the cumulative
    # dropped counter restarts at this bake's overflow
    lm = _features_from_moments(corner_mom, surf_mom, position, p,
                                mom_dropped=jnp.stack([c_drop, s_drop]))
    baked = jnp.zeros((K,), bool).at[sel_idx].set(sel_ok)
    return lm, kf.pose6, baked


def _kf_moments(kf: KeyframeStore, slot: Array, pose6: Array, anchor: Array,
                p: LioParams):
    """One keyframe's (corner, surf) moment contribution at `pose6`.
    Deterministic in its inputs: eviction recomputes the insertion-time
    contribution bitwise (same stored cloud, same baked pose, same anchor),
    so counts cancel exactly in ``merge_moments``."""
    from ...ops import voxelmap

    pose = se3.Pose.from_vec6(pose6)
    ck, sk = _moment_group_bits(p)
    cmom = voxelmap.points_to_moments(
        pose.apply(kf.corner_xyz[slot]), kf.corner_mask[slot],
        p.mapping_corner_leaf_size, anchor, p.kf_corner_cap,
        group_bits=ck or 0)
    smom = voxelmap.points_to_moments(
        pose.apply(kf.surf_xyz[slot]), kf.surf_mask[slot],
        p.mapping_surf_leaf_size, anchor, p.kf_surf_cap,
        group_bits=sk or 0)
    return cmom, smom


def _use_incremental(p: LioParams) -> bool:
    return p.scan2map_method == "voxel" and p.map_update == "incremental"


def _map_telemetry(lm, p: LioParams) -> tuple[Array, Array]:
    """(occupancy (2,) float in [0,1], dropped (2,) int32) of the local-map
    capped structures — the corner/surf moment tables in incremental mode,
    the voxel feature tables in rebuild mode, the flat map clouds in knn
    mode.  Cheap reductions over already-resident arrays (VERDICT r4 #6)."""
    from ...ops import voxelmap

    if _use_incremental(p):
        occ = jnp.stack([
            jnp.sum(lm.corner_mom.key < voxelmap._BIG) / p.map_corner_cap,
            jnp.sum(lm.surf_mom.key < voxelmap._BIG) / p.map_surf_cap,
        ])
    elif p.scan2map_method == "voxel":
        occ = jnp.stack([jnp.mean(lm.corner_vox.mask.astype(jnp.float32)),
                         jnp.mean(lm.surf_vox.mask.astype(jnp.float32))])
    else:
        occ = jnp.stack([jnp.mean(lm.corner_mask.astype(jnp.float32)),
                         jnp.mean(lm.surf_mask.astype(jnp.float32))])
    return occ.astype(jnp.float32), lm.mom_dropped


def _graph_optimize(graph, p: LioParams, free_mask=None, iters=2):
    """Dense-vs-CG solver auto-select (static on capacity: the dense 6Kx6K
    Cholesky of graph_ops.optimize stops fitting around 1k keyframes)."""
    use_cg = p.graph_solver == "cg" or (
        p.graph_solver == "auto" and p.max_keyframes > p.cg_threshold)
    if use_cg:
        return graph_ops.optimize_cg(graph, free_mask=free_mask, iters=iters)
    return graph_ops.optimize(graph, free_mask=free_mask, iters=iters)


# ---------------------------------------------------------------------------
# keyframe + factor insertion
# ---------------------------------------------------------------------------


def _evict_oldest_keyframe(state: LioState, p: LioParams) -> LioState:
    """Ring-buffer eviction with marginalization: drop the oldest keyframe,
    folding its information into a prior on the new oldest pose.

    The reference grows its keyframe store unboundedly
    (``mapOptmization.cpp``) but resets its preintegration graph every 100
    keys *carrying the marginal covariances forward as new priors*
    (``imuPreintegration.cpp:320-347``) — this applies the same mechanic to
    the keyframe graph so a fixed-capacity store keeps mapping forever
    instead of freezing (round-1 weak #4).

    Marginalization is the Schur complement of the factors touching slot 0
    (its prior + the 0->1 odometry chain factor + any GPS factor on slot 0,
    whose absolute-position information flows onto the successor through the
    chain coupling) onto slot 1.  Loop factors anchored on slot 0 are
    REPARENTED onto slot 1 (measurement composed with the chain-constrained
    current 0->1 relative — exact at the linearization point) instead of
    dropped, so long GPS-fused / loop-rich runs keep their constraints
    across evictions (round-3 VERDICT weak #5).  The resulting 6x6
    information is diagonalized to fit the diagonal PriorFactor."""
    kf, graph = state.kf, state.graph
    K = kf.pose6.shape[0]

    # --- incremental map: subtract the evicted keyframe's baked moments
    # (features are refreshed by the insert that follows this eviction)
    if _use_incremental(p):
        from ...ops import voxelmap

        lm = state.local_map
        cmom, smom = _kf_moments(kf, 0, kf.baked_pose6[0], lm.anchor, p)
        sub = kf.baked[0] & lm.valid
        # gate by masking the delta's counts to zero when nothing was baked
        cmom = voxelmap.scale_moments(cmom, jnp.where(sub, -1.0, 0.0))
        smom = voxelmap.scale_moments(smom, jnp.where(sub, -1.0, 0.0))
        cmom = cmom._replace(key=jnp.where(sub, cmom.key, jnp.int32(2**30)))
        smom = smom._replace(key=jnp.where(sub, smom.key, jnp.int32(2**30)))
        ck, sk = _moment_group_bits(p)
        state = state._replace(local_map=lm._replace(
            corner_mom=voxelmap.merge_moments(lm.corner_mom, cmom,
                                              p.map_corner_cap,
                                              group_bits=ck or 0),
            surf_mom=voxelmap.merge_moments(lm.surf_mom, smom,
                                            p.map_surf_cap,
                                            group_bits=sk or 0),
        ))

    # --- Schur complement H11' = H11 - H10 H00^-1 H01 over whitened blocks
    rp, Jp = graph_ops._prior_terms(graph.poses, graph.priors)
    wp = (graph.priors.mask & (graph.priors.idx == 0)).astype(jnp.float32)
    H00 = jnp.einsum("nri,n,nrj->ij", Jp, wp, Jp)
    rb, Ji, Jj = graph_ops._between_terms(graph.poses, graph.betweens)
    wb = ((graph.betweens.i == 0) & (graph.betweens.j == 1)
          & graph.betweens.mask).astype(jnp.float32)
    # a REVERSED 0<->1 factor (i==1, j==0) carries the same coupling with
    # the Jacobian roles swapped; folding it here keeps its information in
    # the marginal instead of silently dropping it in the reparent pass
    # below (which collapses it to a masked self-factor).  Loop factors are
    # currently always j<i (cand < cur), so this is defensive — but the
    # invariant is no longer load-bearing (ADVICE r4 low).
    wb2 = ((graph.betweens.i == 1) & (graph.betweens.j == 0)
           & graph.betweens.mask).astype(jnp.float32)
    H00 = H00 + jnp.einsum("nri,n,nrj->ij", Ji, wb, Ji) \
        + jnp.einsum("nri,n,nrj->ij", Jj, wb2, Jj)
    # GPS factors on the evicted pose join H00: the Schur complement then
    # transfers their absolute information onto pose 1 instead of losing it
    # (the reference's reset keeps it via the iSAM marginal,
    # ``imuPreintegration.cpp:320-347``)
    rg, Jg = graph_ops._gps_terms(graph.poses, graph.gps)
    wg = (graph.gps.mask & (graph.gps.idx == 0)).astype(jnp.float32)
    H00 = H00 + jnp.einsum("nri,n,nrj->ij", Jg, wg, Jg)
    H01 = jnp.einsum("nri,n,nrj->ij", Ji, wb, Jj) \
        + jnp.einsum("nri,n,nrj->ij", Jj, wb2, Ji)
    H11 = jnp.einsum("nri,n,nrj->ij", Jj, wb, Jj) \
        + jnp.einsum("nri,n,nrj->ij", Ji, wb2, Ji)
    M = H11 - H01.T @ jnp.linalg.solve(H00 + 1e-6 * jnp.eye(6), H01)
    marg_sqrt_info = jnp.sqrt(jnp.clip(jnp.diag(M), 1e-6, 1e8))

    # --- shift everything down one slot (slot i = i-th oldest invariant)
    def roll1(x):
        return jnp.roll(x, -1, axis=0)

    kf = kf._replace(
        pose6=roll1(kf.pose6), time=roll1(kf.time),
        corner_xyz=roll1(kf.corner_xyz), corner_mask=roll1(kf.corner_mask),
        surf_xyz=roll1(kf.surf_xyz), surf_mask=roll1(kf.surf_mask),
        count=jnp.asarray(K - 1, jnp.int32),  # insertion bumps it back to K
        baked_pose6=roll1(kf.baked_pose6),
        baked=roll1(kf.baked).at[K - 1].set(False),
    )
    poses = se3.Pose(roll1(graph.poses.q), roll1(graph.poses.t))

    # new anchor prior on the (shifted) oldest pose
    pr = graph.priors
    pr = pr._replace(
        idx=pr.idx.at[0].set(0),
        meas=se3.Pose(pr.meas.q.at[0].set(poses.q[0]),
                      pr.meas.t.at[0].set(poses.t[0])),
        sqrt_info=pr.sqrt_info.at[0].set(marg_sqrt_info),
        mask=pr.mask.at[0].set(True),
    )

    # betweens: loop factors anchored on the evicted pose 0 are reparented
    # onto pose 1 by composing their measurement with the current 0->1
    # relative (Z_1j = rel01^-1 Z_0j, Z_i1 = Z_i0 rel01) — exact at the
    # linearization point, and rel01 is tightly chain-constrained.  The
    # 0->1 chain factor itself collapses to a self-factor and is masked
    # (its information lives in the Schur marginal above).  Then indices
    # decrement and the chain region rolls so factor i->i+1 stays at row i.
    b = graph.betweens
    B = b.i.shape[0]
    p0 = jax.tree.map(lambda x: x[0], graph.poses)
    p1 = jax.tree.map(lambda x: x[1], graph.poses)
    rel01 = p0.between(p1)  # T0^-1 T1
    rel01b = se3.Pose(jnp.broadcast_to(rel01.q, (B, 4)),
                      jnp.broadcast_to(rel01.t, (B, 3)))
    m_i = rel01b.inverse().compose(b.meas)  # endpoint i: 0 -> 1
    m_j = b.meas.compose(rel01b)            # endpoint j: 0 -> 1
    re_i, re_j = b.i == 0, b.j == 0
    meas_q = jnp.where(re_i[:, None], m_i.q,
                       jnp.where(re_j[:, None], m_j.q, b.meas.q))
    meas_t = jnp.where(re_i[:, None], m_i.t,
                       jnp.where(re_j[:, None], m_j.t, b.meas.t))
    bi = jnp.where(re_i, 1, b.i)
    bj = jnp.where(re_j, 1, b.j)
    b = b._replace(i=bi, j=bj, meas=se3.Pose(meas_q, meas_t))
    keep = b.mask & (b.i != b.j)
    i2, j2 = b.i - 1, b.j - 1
    chain = K - 1  # rows [0, K-1) hold the odometry chain

    def roll_chain(x):
        return jnp.concatenate([jnp.roll(x[:chain], -1, axis=0), x[chain:]],
                               axis=0)

    b = graph_ops.BetweenFactor(
        i=roll_chain(i2), j=roll_chain(j2),
        meas=se3.Pose(roll_chain(b.meas.q), roll_chain(b.meas.t)),
        sqrt_info=roll_chain(b.sqrt_info), mask=roll_chain(keep),
    )

    gps = graph.gps
    gps = gps._replace(idx=gps.idx - 1, mask=gps.mask & (gps.idx >= 1))

    graph = graph._replace(poses=poses, priors=pr, betweens=b, gps=gps)
    return state._replace(kf=kf, graph=graph)


def _insert_keyframe(state: LioState, pose6: Array, scan_time: Array,
                     corner: Cloud, surf: Cloud, inp: "PreparedScan",
                     p: LioParams,
                     degenerate: Array | bool = False) -> LioState:
    K = state.kf.pose6.shape[0]
    # at capacity: evict the oldest keyframe with marginalization instead of
    # freezing the map (the round-1 saturation behavior)
    state = jax.lax.cond(state.kf.count >= K,
                         lambda s: _evict_oldest_keyframe(s, p),
                         lambda s: s, state)
    kf, graph = state.kf, state.graph
    slot = jnp.minimum(kf.count, K - 1)
    pose = se3.Pose.from_vec6(pose6)

    # fit the (already voxel-downsampled) scan features into the keyframe caps
    from ...ops.pointcloud import compact
    corner = compact(corner, p.kf_corner_cap)
    surf = compact(surf, p.kf_surf_cap)

    kf = kf._replace(
        pose6=kf.pose6.at[slot].set(pose6),
        time=kf.time.at[slot].set(scan_time),
        corner_xyz=kf.corner_xyz.at[slot].set(corner.xyz),
        corner_mask=kf.corner_mask.at[slot].set(corner.mask),
        surf_xyz=kf.surf_xyz.at[slot].set(surf.xyz),
        surf_mask=kf.surf_mask.at[slot].set(surf.mask),
        count=jnp.minimum(kf.count + 1, K),
    )

    # graph pose + mask
    poses = graph.poses
    poses = se3.Pose(poses.q.at[slot].set(pose.q), poses.t.at[slot].set(pose.t))
    graph = graph._replace(poses=poses,
                           pose_mask=graph.pose_mask.at[slot].set(True))

    # prior (first keyframe) — :1386-1394
    def add_prior(graph):
        f = graph.priors
        si = jnp.concatenate([jnp.full(3, 1.0 / p.prior_sigma_rot),
                              jnp.full(3, 1.0 / p.prior_sigma_trans)])
        f = f._replace(
            idx=f.idx.at[0].set(0),
            meas=se3.Pose(f.meas.q.at[0].set(pose.q), f.meas.t.at[0].set(pose.t)),
            sqrt_info=f.sqrt_info.at[0].set(si),
            mask=f.mask.at[0].set(True),
        )
        return graph._replace(priors=f)

    # odometry between factor prev -> slot — :1388-1394.  A DEGENERATE scan
    # match gets a soft translation factor: its translation is IMU
    # prediction along the unconstrained axis, and booking it at the stiff
    # odometry sigma out-muscles any absolute fix by ~1e4 info per link
    # (measured: a full-graph solve with 1 m-sigma GPS on every keyframe
    # left 63% of a corridor runaway in place at stiff sigma; x50 softening
    # leaves <2% — see docs/DESIGN.md r5 GNSS notes).  Rotation stays
    # stiff: the eigenvalue projection fires on translation axes while
    # walls/floor keep rotation observable.
    def add_between(graph):
        prev = slot - 1
        prev_pose = se3.Pose.from_vec6(kf.pose6[prev])
        meas = prev_pose.between(pose)
        b = graph.betweens
        bslot = prev  # chain factor i occupies slot i (0..K-2)
        tsig = p.odom_sigma_trans * jnp.where(
            jnp.asarray(degenerate), p.degen_between_scale, 1.0)
        si = jnp.concatenate([jnp.full(3, 1.0 / p.odom_sigma_rot),
                              jnp.full(3, 1.0) / tsig])
        b = b._replace(
            i=b.i.at[bslot].set(prev),
            j=b.j.at[bslot].set(slot),
            meas=se3.Pose(b.meas.q.at[bslot].set(meas.q),
                          b.meas.t.at[bslot].set(meas.t)),
            sqrt_info=b.sqrt_info.at[bslot].set(si),
            mask=b.mask.at[bslot].set(True),
        )
        return graph._replace(betweens=b)

    graph = jax.lax.cond(slot == 0, add_prior, add_between, graph)

    # GPS factor (addGPSFactor :1397-1475; covariance gating is host-side)
    def add_gps(args):
        graph, n_gps = args
        gslot = jnp.minimum(n_gps, graph.gps.idx.shape[0] - 1)
        # useGpsElevation=false (:1436-1441): GNSS altitude is usually worse
        # than the lidar's — pin z to the current estimate with tight noise
        gxyz, gsig = inp.gps_xyz, inp.gps_sigma
        if not p.use_gps_elevation:
            gxyz = gxyz.at[2].set(pose.t[2])
            gsig = gsig.at[2].set(0.01)
        f = graph.gps
        f = f._replace(
            idx=f.idx.at[gslot].set(slot),
            xyz=f.xyz.at[gslot].set(gxyz),
            sqrt_info=f.sqrt_info.at[gslot].set(1.0 / jnp.maximum(gsig, 1e-3)),
            mask=f.mask.at[gslot].set(True),
        )
        return graph._replace(gps=f), n_gps + 1

    # GPS gating (addGPSFactor :1420-1434): fix quality below gpsCovThreshold,
    # and only when the estimator is uncertain enough (poseCovThreshold; the
    # reference reads iSAM marginals — here the ESKF position covariance.
    # Default 0.0 = always fuse, since the scales differ; see params).
    # A DEGENERATE scan match also opens the gate: the reference's iSAM
    # marginals grow along the unconstrained axis and trip poseCovThreshold
    # there, but the ESKF's isotropic pose update keeps its covariance small
    # even when the eigenvalue projection fired (measured: the 160 m
    # corridor never fused a single fix) — the degeneracy flag is the
    # direct equivalent signal.
    gps_quality_ok = jnp.max(inp.gps_sigma**2) < p.gps_cov_threshold
    pos_cov = jnp.trace(state.filter.cov[6:9, 6:9])
    pose_uncertain = (pos_cov >= p.pose_cov_threshold) \
        | jnp.asarray(degenerate)
    graph, n_gps = jax.lax.cond(
        inp.gps_valid & gps_quality_ok & pose_uncertain,
        add_gps, lambda a: a, (graph, state.n_gps)
    )

    # windowed optimization (iSAM2-update stand-in).  With only the anchor
    # prior + odometry betweens the problem is already at its optimum by
    # construction (every factor's measurement is built from the exact poses
    # it constrains, and eviction's marginal priors are created consistent
    # and attach outside the free window), so the solve is a numerical
    # no-op (g = 0 -> dx = 0) — ~2.8 ms/keyframe on v5e for nothing.
    # graph_lazy_solve skips it until a factor that can move the solution
    # exists (GPS or loop); the reference updates iSAM2 every keyframe
    # unconditionally (saveKeyFramesAndFactor :1497-1581).
    # GPS present -> free the FULL graph: a unary fix (sqrt_info ~1/sigma)
    # cannot move a stiff odometry chain whose boundary poses are FIXED
    # outside a window — the chain translates rigidly only when every pose
    # is free (the reference's iSAM updates all poses,
    # saveKeyFramesAndFactor :1497-1581; measured: windowed solves left a
    # corridor GPS run bit-near the GPS-less trajectory while the velocity
    # error ran away).  Loop corrections go through the separate full solve.
    has_gps = jnp.sum(graph.gps.mask) > 0
    free = graph.pose_mask & ((jnp.arange(K) >= kf.count - p.graph_window)
                              | has_gps)
    if p.graph_lazy_solve:
        need_solve = has_gps | (state.n_loop > 0)
        graph = jax.lax.cond(
            need_solve,
            lambda g: _graph_optimize(g, p, free_mask=free, iters=2),
            lambda g: g, graph)
    else:
        graph = _graph_optimize(graph, p, free_mask=free, iters=2)

    # correctPoses: keyframe poses follow the graph
    opt6 = se3.Pose(graph.poses.q, graph.poses.t).to_vec6()
    kf = kf._replace(pose6=jnp.where(kf.mask[:, None], opt6, kf.pose6))

    pos = kf.pose6[slot][3:]
    if _use_incremental(p):
        from ...ops import voxelmap

        lm = state.local_map  # post-evict moments
        # re-bake triggers: no map yet, anchor domain exceeded, or baked
        # poses drifted beyond tolerance since they were merged
        drift = jnp.where(
            kf.baked,
            jnp.linalg.norm(kf.pose6[:, 3:] - kf.baked_pose6[:, 3:], axis=1)
            + 5.0 * jnp.linalg.norm(kf.pose6[:, :3] - kf.baked_pose6[:, :3],
                                    axis=1),
            0.0)
        need_rebake = (
            (~lm.valid)
            | (jnp.sum((pos - lm.anchor) ** 2) > p.map_anchor_radius**2)
            | (jnp.max(drift) > p.map_stale_tolerance))

        def do_rebake(_):
            return _rebake_local_map(kf, pos, scan_time, p)

        def do_inc(_):
            cmom, smom = _kf_moments(kf, slot, kf.pose6[slot], lm.anchor, p)
            trim_r = p.surrounding_keyframe_search_radius
            ck, sk = _moment_group_bits(p)
            cmerged, c_drop = voxelmap.merge_moments(
                lm.corner_mom, cmom, p.map_corner_cap, trim_center=pos,
                trim_radius=trim_r, leaf=p.mapping_corner_leaf_size,
                origin=lm.anchor, group_bits=ck or 0, return_stats=True)
            smerged, s_drop = voxelmap.merge_moments(
                lm.surf_mom, smom, p.map_surf_cap, trim_center=pos,
                trim_radius=trim_r, leaf=p.mapping_surf_leaf_size,
                origin=lm.anchor, group_bits=sk or 0, return_stats=True)
            lmap = _features_from_moments(
                cmerged, smerged, lm.anchor, p,
                mom_dropped=lm.mom_dropped + jnp.stack([c_drop, s_drop]))
            return (lmap, kf.baked_pose6.at[slot].set(kf.pose6[slot]),
                    kf.baked.at[slot].set(True))

        local_map, baked_pose6, baked = jax.lax.cond(
            need_rebake, do_rebake, do_inc, None)
        kf = kf._replace(baked_pose6=baked_pose6, baked=baked)
    else:
        # rebuild the cached local map around the (optimized) new keyframe
        local_map = _rebuild_local_map(kf, pos, scan_time, p)

    return state._replace(kf=kf, graph=graph, n_gps=n_gps,
                          local_map=local_map, pose6=kf.pose6[slot])


# ---------------------------------------------------------------------------
# the step
# ---------------------------------------------------------------------------


class PreparedScan(NamedTuple):
    """Everything the estimator core needs from one scan, computable without
    estimator state — the batchable prefix of the odometry step (vmapped
    over the dispatch window in ``odometry_window_packed``).

    Feature clouds are rotation-only deskewed (the reference's semantics,
    ``findPosition`` stubbed :473-487); each feature carries its mean firing
    offset ``*_dt`` so the core can add the state-dependent translation
    deskew term exactly (linear in dt — commutes with centroid averaging).
    ``pre`` is integrated at ZERO bias; the core corrects to the live bias
    via the preintegration's bias Jacobians (imu_fusion.propagate).
    """

    corner_xyz: Array   # (scan_corner_cap, 3) rotation-deskewed scan frame
    corner_dt: Array    # (scan_corner_cap,) mean firing offset from scan start
    corner_mask: Array
    surf_xyz: Array     # (scan_surf_cap, 3)
    surf_dt: Array
    surf_mask: Array
    n_corner: Array     # pre-downsample feature counts (the `enough` gates)
    n_surf: Array
    deskew_on: Array    # () bool — rotation deskew ran (imu window usable)
    f_mean: Array       # (3,) mean specific force over the scan window
    f_ok: Array         # () bool — >=2 IMU samples in the window
    rpy_init: Array     # (3,)
    imu_available: Array
    scan_start: Array
    pre: imu_ops.Preintegrated  # inter-scan preintegration at ZERO bias
    gps_xyz: Array
    gps_sigma: Array
    gps_valid: Array
    init_vel_body: Array
    init_vel_valid: Array


def prepare_scan(inp: StepInput, p: LioParams) -> PreparedScan:
    """The state-independent per-scan pipeline: frontend (rotation-only
    deskew + features, firing offsets carried as attrs), mapping-leaf
    downsample (``downsampleCurrentScan`` :955-967), zero-bias IMU
    preintegration."""
    front = run_frontend(inp.scan, p, carry_time=True)
    return _prepare_tail(front, inp, p)


def prepare_scan_grid(r_grid: Array, az: Array, tcol: Array, elev: Array,
                      aux: Array, p: LioParams) -> PreparedScan:
    """:func:`prepare_scan` for a scan shipped as a range image: the grid
    frontend (frontend.run_frontend_grid) replaces reconstruct-then-project.
    aux carries everything non-point (same layout as unpack_step_input)."""
    inp = unpack_step_input(jnp.zeros((0, 5), jnp.float32), aux, p)
    front = run_frontend_grid(
        r_grid, az, tcol, elev, inp.scan.scan_start, inp.scan.imu_t,
        inp.scan.imu_gyro, inp.scan.imu_acc, inp.scan.imu_mask,
        inp.scan.imu_available, p, carry_time=True)
    return _prepare_tail(front, inp, p)


def _prepare_tail(front, inp: StepInput, p: LioParams) -> PreparedScan:
    # overflow is impossible here (occupied voxels <= input points = the
    # output capacity), so the uniform-overflow hash key is dead weight
    corner_ds = voxel.voxel_downsample(front.corner,
                                       p.mapping_corner_leaf_size,
                                       capacity=p.scan_corner_cap,
                                       uniform_overflow=False)
    surf_ds = voxel.voxel_downsample(front.surf, p.mapping_surf_leaf_size,
                                     capacity=p.scan_surf_cap,
                                     uniform_overflow=False)
    pre = imu_ops.preintegrate(inp.pre_t, inp.pre_gyro, inp.pre_acc,
                               inp.pre_mask, imu_ops.ImuBias.zero(),
                               p.imu_params)
    n_imu = jnp.sum(inp.scan.imu_mask.astype(jnp.int32))
    w = inp.scan.imu_mask.astype(jnp.float32)
    f_mean = (jnp.sum(inp.scan.imu_acc * w[:, None], axis=0)
              / jnp.maximum(jnp.sum(w), 1.0))
    return PreparedScan(
        corner_xyz=corner_ds.xyz, corner_dt=corner_ds.attrs[:, 0],
        corner_mask=corner_ds.mask,
        surf_xyz=surf_ds.xyz, surf_dt=surf_ds.attrs[:, 0],
        surf_mask=surf_ds.mask,
        n_corner=front.n_corner, n_surf=front.n_surf,
        deskew_on=inp.scan.imu_available & (n_imu > 1),
        f_mean=f_mean, f_ok=jnp.sum(w) > 1,
        rpy_init=inp.scan.imu_rpy_init,
        imu_available=inp.scan.imu_available,
        scan_start=inp.scan.scan_start,
        pre=pre,
        gps_xyz=inp.gps_xyz, gps_sigma=inp.gps_sigma, gps_valid=inp.gps_valid,
        init_vel_body=inp.init_vel_body, init_vel_valid=inp.init_vel_valid,
    )


def odometry_core(state: LioState, ps: PreparedScan, p: LioParams):
    """The state-dependent estimator step over a prepared scan."""
    # --- filter propagation through the zero-bias preintegration, corrected
    # to the live bias via the Forster Jacobians (first, so the scan-start
    # velocity is available for translation deskew)
    fs_prop = jax.lax.cond(
        state.initialized & (ps.pre.n_used > 0),
        lambda: imu_fusion.propagate(state.filter, ps.pre, p.imu_params,
                                     bias_ref=imu_ops.ImuBias.zero()),
        lambda: state.filter,
    )

    corner_xyz, surf_xyz = ps.corner_xyz, ps.surf_xyz
    if p.deskew_translation:
        # scan-start body-frame velocity for translation deskew (DEVIATION,
        # an improvement: the reference's findPosition is stubbed to zero,
        # imageProjection.cpp:473-487; the ESKF velocity is in-program here).
        # Applied to the downsampled features (linear in their mean firing
        # offsets), gated like the rotation deskew it extends.
        q_inv = se3.quat_conj(fs_prop.nav.q)
        v_b = se3.quat_rotate(q_inv, fs_prop.nav.v)
        # first scan: no estimate exists — use the pipeline's bootstrap hint
        # (dynamic init re-feeds the first window with the converged
        # velocity; body-frame velocity is near-constant over that window)
        vel_body = jnp.where(state.initialized, v_b,
                             jnp.where(ps.init_vel_valid,
                                       ps.init_vel_body, 0.0))
        # body-frame acceleration = mean specific force over the scan window
        # + gravity rotated into the body frame (second-order deskew term)
        g_b = se3.quat_rotate(
            q_inv, jnp.array([0.0, 0.0, -p.imu_gravity], jnp.float32))
        acc_body = jnp.where(
            (state.initialized | ps.init_vel_valid) & ps.f_ok,
            ps.f_mean + g_b, 0.0)
        on = ps.deskew_on

        def shift(xyz, dt):
            d = dt[:, None]
            return xyz + jnp.where(
                on, vel_body[None, :] * d + 0.5 * acc_body[None, :] * d * d,
                0.0)

        corner_xyz = shift(corner_xyz, ps.corner_dt)
        surf_xyz = shift(surf_xyz, ps.surf_dt)

    corner_ds = Cloud.create(corner_xyz, mask=ps.corner_mask)
    surf_ds = Cloud.create(surf_xyz, mask=ps.surf_mask)

    # --- initial guess (updateInitialGuess :786-845)
    rpy_init = ps.rpy_init
    first_guess = jnp.concatenate([rpy_init, jnp.zeros(3)])
    prop_pose = se3.Pose(fs_prop.nav.q, fs_prop.nav.p)
    cont_guess = prop_pose.to_vec6()
    init6 = jnp.where(state.initialized, cont_guess, first_guess)

    # --- scan-to-map against the cached local map (rebuilt at keyframes)
    lm = state.local_map
    have_map = (state.kf.count > 0) & lm.valid
    enough = (ps.n_corner > p.edge_feature_min_valid_num) & (
        ps.n_surf > p.surf_feature_min_valid_num)

    use_pallas = (p.use_pallas == "on"
                  or (p.use_pallas == "auto"
                      and jax.default_backend() == "tpu"))

    def register():
        if p.scan2map_method == "voxel":
            res = registration.scan_to_map_voxel(
                corner_ds.xyz, corner_ds.mask, surf_ds.xyz, surf_ds.mask,
                lm.corner_vox, lm.surf_vox,
                init6, max_iters=p.scan2map_max_iters,
                eig_threshold=p.degeneracy_threshold,
                use_pallas=use_pallas,
                plateau_rtol=p.plateau_rtol,
                plateau_min_iters=p.plateau_min_iters,
                reassoc_rot=p.s2m_reassoc_rot,
                reassoc_trans=p.s2m_reassoc_trans,
            )
        else:
            res = registration.scan_to_map(
                corner_ds.xyz, corner_ds.mask, surf_ds.xyz, surf_ds.mask,
                lm.corner_grid, lm.corner_xyz, lm.surf_grid, lm.surf_xyz,
                init6, max_iters=p.scan2map_max_iters,
                candidates_per_cell=p.knn_candidates,
                eig_threshold=p.degeneracy_threshold,
                use_pallas=use_pallas,
            )
        return res.pose, res.degenerate, res.iterations

    pose6, degenerate, s2m_iters = jax.lax.cond(
        have_map & enough, register,
        lambda: (init6, jnp.asarray(False), jnp.asarray(0, jnp.int32))
    )

    # --- transformUpdate: slerp-fuse roll/pitch with IMU attitude (:1312-1342)
    def fuse_rpy(pose6):
        w = p.imu_rpy_weight
        roll = se3.slerp_angle(pose6[0], rpy_init[0], w)
        pitch = se3.slerp_angle(pose6[1], rpy_init[1], w)
        return pose6.at[0].set(roll).at[1].set(pitch)

    pose6 = jax.lax.cond(ps.imu_available, fuse_rpy, lambda x: x, pose6)
    pose6 = pose6.at[0].set(jnp.clip(pose6[0], -p.rotation_tolerance, p.rotation_tolerance))
    pose6 = pose6.at[1].set(jnp.clip(pose6[1], -p.rotation_tolerance, p.rotation_tolerance))
    pose6 = pose6.at[5].set(jnp.clip(pose6[5], -p.z_tolerance, p.z_tolerance))

    # --- keyframe gate (saveFrame :1354-1379)
    last_kf6 = state.kf.pose6[jnp.maximum(state.kf.count - 1, 0)]
    d = se3.Pose.from_vec6(last_kf6).between(se3.Pose.from_vec6(pose6))
    drpy = jnp.abs(se3.quat_to_rpy(d.q))
    dist = jnp.linalg.norm(d.t)
    small = jnp.all(drpy < p.surrounding_keyframe_adding_angle_threshold) & (
        dist < p.surrounding_keyframe_adding_dist_threshold)
    # at capacity the insert path evicts the oldest keyframe with
    # marginalization (see _evict_oldest_keyframe) — mapping never freezes
    is_kf = (state.kf.count == 0) | ~small

    state2 = jax.lax.cond(
        is_kf,
        lambda s: _insert_keyframe(s, pose6, ps.scan_start,
                                   corner_ds, surf_ds, ps, p,
                                   degenerate=degenerate),
        lambda s: s._replace(pose6=pose6),
        state,
    )
    pose6_out = state2.pose6
    pose_out = se3.Pose.from_vec6(pose6_out)

    # --- ESKF measurement update / (re)initialization.  The update only
    # applies when scan-to-map actually ran: correcting with the filter's own
    # propagated pose would shrink the covariance without information (and
    # break the GPS pose-covariance gate, which relies on covariance GROWING
    # while the estimator is blind).
    registered = have_map & enough

    def init_filter():
        v0 = jnp.where(ps.init_vel_valid,
                       se3.quat_rotate(pose_out.q, ps.init_vel_body), 0.0)
        return imu_fusion.FilterState.initial(pose_out, velocity=v0)

    def update_filter():
        fs = imu_fusion.update_with_pose(
            fs_prop, pose_out, p.odom_sigma_rot * 10, p.odom_sigma_trans * 10,
            degenerate)
        return jax.lax.cond(imu_fusion.reset_needed(fs), init_filter, lambda: fs)

    fs_new = jax.lax.cond(
        state.initialized,
        lambda: jax.lax.cond(registered, update_filter, lambda: fs_prop),
        init_filter)

    # GPS position update at the FILTER (the navsat-EKF leg of the
    # reference, module_navsat.launch:8-19): keeps velocity observable
    # along scan-matching-degenerate axes — graph factors alone yank
    # keyframe positions and alias the jolt into velocity (measured
    # +-15 m corridor oscillation; docs/DESIGN.md r5).  Same gate as the
    # graph factor; z follows use_gps_elevation (pinned = no z pull).
    def gps_filter_update():
        sig = inp.gps_sigma
        if not p.use_gps_elevation:
            sig = sig.at[2].set(1e3)
        return imu_fusion.update_with_position(fs_new, inp.gps_xyz, sig)

    gps_ok = (inp.gps_valid
              & (jnp.max(inp.gps_sigma**2) < p.gps_cov_threshold)
              & ((jnp.trace(fs_new.cov[6:9, 6:9]) >= p.pose_cov_threshold)
                 | degenerate))
    fs_new = jax.lax.cond(gps_ok & state.initialized,
                          gps_filter_update, lambda: fs_new)

    new_state = state2._replace(
        filter=fs_new,
        last_scan_time=ps.scan_start,
        initialized=jnp.asarray(True),
        degenerate=degenerate,
        loop_closed=jnp.asarray(False),
    )
    occ, dropped = _map_telemetry(new_state.local_map, p)
    out = StepOutput(
        pose=pose_out, pose_matrix=pose_out.to_matrix(),
        pose6=pose6_out, velocity=fs_new.nav.v, bias=fs_new.bias,
        degenerate=degenerate, is_keyframe=is_kf,
        n_corner=ps.n_corner, n_surf=ps.n_surf,
        kf_count=new_state.kf.count,
        s2m_iterations=s2m_iters,
        map_occupancy=occ, map_dropped=dropped,
    )
    return new_state, out


@partial(jax.jit, static_argnames=("p",))
def odometry_step(state: LioState, inp: StepInput, p: LioParams):
    """One scan through prepare + core (the single-scan entry; the windowed
    dispatch runs the same two stages with the prepare phase vmapped)."""
    return odometry_core(state, prepare_scan(inp, p), p)
