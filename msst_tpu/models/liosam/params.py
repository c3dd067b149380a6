"""LIO-SAM parameter set.

Mirrors the reference's ``config/params.yaml`` (loaded by ``ParamServer``,
``include/utility.h:63-250``), split into *static* parameters that fix
compiled shapes (sensor geometry, capacity caps) and *runtime* thresholds.
Defaults follow the canonical VLP-16 configuration
(``config/params.yaml:26-93``).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class LioParams:
    # --- Lidar sensor geometry (params.yaml:22-31) — static, fixes shapes
    # sensor: "velodyne" | "ouster" | "livox" (params.yaml:20, the SensorType
    # switch of imageProjection.cpp:207-233,544-558).  velodyne/ouster share
    # azimuth column binning; livox uses the per-ring running-counter
    # columns.  Host-side format conversion (Ouster ns->s point times etc.)
    # lives in utils/sensor_formats.py.
    sensor: str = "velodyne"
    n_scan: int = 16
    horizon_scan: int = 1800
    downsample_rate: int = 1
    lidar_min_range: float = 1.0
    lidar_max_range: float = 1000.0
    max_points: int = 65536          # input cloud capacity

    # --- IMU (params.yaml:33-44)
    imu_acc_noise: float = 3.9939570888238808e-03
    imu_gyr_noise: float = 1.5636343949698187e-03
    imu_acc_bias_noise: float = 6.4356659353532566e-05
    imu_gyr_bias_noise: float = 3.5640318696367613e-05
    imu_gravity: float = 9.80511
    imu_rpy_weight: float = 0.01
    imu_window: int = 256            # IMU samples buffered per scan — static
    imu_rate: float = 500.0

    # dynamic initializer (host-side; canonicalized out of the jit key):
    # buffer the first ~8 scans, read back the converged velocity, reset and
    # re-feed so the FIRST scan deskews with a real velocity instead of
    # anchoring the map on a motion-smeared cloud (a ~v*sweep/2 gauge offset
    # the reference shares).  See pipeline._bootstrap_refeed.
    dynamic_init: bool = True

    # translation deskew from the ESKF velocity (DEVIATION, an improvement:
    # the reference stubs position deskew to zero, imageProjection.cpp:473-487
    # — its odometry is not available in that callback; ours is in-program).
    # False restores reference-faithful rotation-only deskew.
    deskew_translation: bool = True

    # int16-quantized window uploads (windowed dispatch only): halves the
    # host->device bytes, which serialize against execution on the tunneled
    # runtime.  xyz rides at 3.9 mm steps over +-128 m (rms ~1.1 mm, an
    # order below sensor noise; points beyond 128 m clip — set False for
    # scenes past that), per-point time at 61 us steps, aux rows bit-exact.
    quantized_upload: bool = True

    # --- LOAM thresholds (params.yaml:60-64)
    edge_threshold: float = 1.0
    feature_method: str = "nms"   # "nms" (fast, default) | "exact" (reference-faithful)
    surf_threshold: float = 0.1
    edge_feature_min_valid_num: int = 10
    surf_feature_min_valid_num: int = 100

    # --- voxel leaf sizes (params.yaml:66-69)
    # Metric domain note (ADVICE r3): ops/voxel.voxel_downsample packs cell
    # coords into +-1024 cells re-centered on each cloud's first point, so a
    # single cloud may SPAN up to 2048*leaf meters (410 m at 0.2, 820 m at
    # 0.4) regardless of where it sits in the world; points beyond that span
    # collapse into boundary cells.  Long-range sensors (OS2 ~240 m radius =
    # 480 m span) fit every leaf here; shrink leaves below 0.12 m only with
    # that bound in mind.
    odometry_surf_leaf_size: float = 0.4
    mapping_corner_leaf_size: float = 0.2
    mapping_surf_leaf_size: float = 0.4

    # --- robot motion constraints (params.yaml:71-73)
    z_tolerance: float = 1000.0
    rotation_tolerance: float = 1000.0

    # --- scan-to-map / keyframing (params.yaml:75-86)
    mapping_process_interval: float = 0.15
    surrounding_keyframe_adding_dist_threshold: float = 1.0
    surrounding_keyframe_adding_angle_threshold: float = 0.2
    surrounding_keyframe_density: float = 2.0
    surrounding_keyframe_search_radius: float = 50.0
    scan2map_max_iters: int = 30
    scan2map_method: str = "voxel"   # "voxel" (VoxelMap-style, fast) | "knn" (reference-style 5-NN)
    # cost-plateau stop for the voxel GN (voxel correspondences flip-flop
    # below mm scale; the reference's exact-NN geometry converges by delta
    # gates alone, mapOptmization.cpp:1292-1310)
    plateau_rtol: float = 1e-3
    plateau_min_iters: int = 2
    # correspondence re-association policy for the voxel GN.  The reference
    # re-searches correspondences at EVERY iteration
    # (mapOptmization.cpp:1292-1310, scan2MapOptimization); with a voxel map
    # the association of a point only changes when the pose moves it across
    # a cell boundary, so later iterations (mm-scale updates) can reuse the
    # previous lookup — the lookup is ~2.1 of the ~2.1 ms GN iteration on
    # v5e, so frozen iterations are ~7x cheaper.  A new lookup happens when
    # the pose has moved more than these thresholds (rad / m) since the last
    # one; 0.0/0.0 restores the reference-faithful per-iteration search.
    s2m_reassoc_rot: float = 0.01    # ~0.57 deg
    s2m_reassoc_trans: float = 0.02  # m
    # skip the per-keyframe windowed graph solve while the graph holds only
    # the anchor prior + odometry betweens (then it is at its optimum by
    # construction; see _insert_keyframe).  False = solve every keyframe
    # like the reference's iSAM2 update (saveKeyFramesAndFactor :1497-1581).
    graph_lazy_solve: bool = True
    vox_source: str = "downsampled"  # voxel-fit input: "downsampled" (reference-style centroid pass first, lower drift) | "direct" (raw keyframe features, cheaper rebuild)
    # local-map maintenance (voxel method only):
    # "incremental": persistent per-voxel moment tables, delta insert/evict
    #   per keyframe (the reference's transformed-cloud cache semantics,
    #   mapOptmization.cpp:899-938 laserCloudMapContainer — contributions are
    #   baked at insertion pose and refreshed only on re-bake), full re-bake
    #   on loop closure / anchor travel / stale poses.  Implies "downsampled"
    #   vox_source semantics.
    # "rebuild": gather + downsample + refit the whole local map at every
    #   keyframe (round-2 behavior; ~5 ms/keyframe at 16x1800 on v5e).
    # Default incremental: measured both faster (no 262k-point regather per
    # keyframe) and lower-drift (0.140 vs 0.150 max err on the 96-scan
    # bench drive).
    map_update: str = "incremental"
    map_anchor_radius: float = 40.0   # re-bake when the newest keyframe is
    #   farther than this from the map anchor (fine-grid domain is +-512
    #   cells = +-102 m at the 0.2 m corner leaf; 40 + 50 m trim fits)
    map_stale_tolerance: float = 0.2  # re-bake when any baked keyframe pose
    #   has moved more than this (|dt| + 5|drpy|) since it was baked
    # route the per-iteration correspondence search through the VMEM-resident
    # Pallas kernels (ops/voxelmap_pallas, ops/knn_pallas):
    # "auto" = on TPU only (interpreter elsewhere is a test path, not perf).
    # Default "off": Mosaic's gather lowering only supports same-shape 2-D
    # take_along_axis (lowering.py _gather_lowering_rule), so the kernels'
    # table gathers need the dynamic_gather formulation before "auto" can
    # ship — see docs/DESIGN.md "Pallas status".
    use_pallas: str = "off"          # "auto" | "on" | "off"
    degeneracy_threshold: float = 100.0  # JtJ eigenvalue gate (LMOptimization :1244); scales with matched-point count
    # feature-voxel leaves: POWER-OF-TWO multiples of the mapping leaf sizes
    # (0.8 = 4 x 0.2 corner / 2 x 0.4 surf) so the moment tables use the
    # hierarchical key packing and both feature fits skip their input sort
    # (mapping._group_bits; non-power-of-two ratios still work, with a
    # sorting fit)
    vox_corner_leaf: float = 0.8
    vox_surf_leaf: float = 0.8
    # min sqrt(lambda_mid) of a surf voxel's point scatter for a valid plane
    # fit: planes need 2-D in-plane support.  Grazing single-ring arcs in far
    # floor cells are thin-but-degenerate; their noise-tilted normals torque
    # pitch -> gravity leaks into along-track velocity (the measured 10 m /
    # 140 m corridor x-drag, r4).  See ops/voxelmap.build(plane_min_spread).
    # r5 semantics: cells failing the spread test are RECLASSIFIED as line
    # features (point-to-line residuals — the directions an arc truly
    # observes: height + cross-arc) instead of blanked.  Measured history:
    # blanking fixed the corridor but starved z in rooms (bench z wandered
    # 1.5 m); r4's per-cell support-count softening protected rooms but
    # never fired on moving drives, silently restoring the corridor drag
    # (dumbbell loop-off 1.48 -> 5.94 m, found by bisecting the committed
    # r4 code in r5).  See ops/voxelmap.build(plane_min_spread).
    vox_plane_min_spread: float = 0.05
    vox_corner_cap: int = 8192
    vox_surf_cap: int = 16384

    # --- loop closure (params.yaml:88-96)
    loop_closure_enabled: bool = True
    loop_closure_frequency: float = 1.0
    surrounding_keyframe_size: int = 50
    history_keyframe_search_radius: float = 15.0
    history_keyframe_search_time_diff: float = 30.0
    history_keyframe_search_num: int = 25
    history_keyframe_fitness_score: float = 0.3
    loop_candidates: int = 3      # nearest eligible keyframes tried per loop
    # attempt (lax.while_loop stops at the first ICP success, so the extra
    # candidates only cost when the nearest fails); 1 = reference-faithful
    # single-nearest (detectLoopClosureDistance, mapOptmization.cpp:610-643)
    loop_leaf_size: float = 0.4   # submap downsample for loop ICP (downSizeFilterICP)

    # ICP-curvature loop gate (DEVIATION, improvement): per-axis cost
    # curvature with re-association scales the loop factor's information —
    # axes the match cannot observe (corridor-to-corridor revisits slide
    # along the corridor while PASSING the fitness gate) contribute ~zero
    # instead of an arbitrary measurement.  Ratio = observability threshold
    # vs the best axis; 0.0 restores the reference's fitness-only isotropic
    # factor (performLoopClosure, mapOptmization.cpp:575-604).
    loop_degeneracy_ratio: float = 0.05
    # loop fine-alignment stage after the coarse wide-basin point-to-point
    # ICP (see loop.try_close):
    #   "plane" (default) — per-class line/plane Gauss-Newton against voxel
    #     features of the history submap.  Point-to-plane residuals are
    #     invariant to sliding along planes, so corridor point mass cannot
    #     out-vote sparse cross-axis geometry (the measured ~0.7 m
    #     along-corridor floor of the point-to-point cost, r4) — an
    #     improvement over the reference's single p2p ICP (:559-573).
    #   "p2p" — tight point-to-point second pass gated at
    #     loop_icp_refine_dist (round-4 behavior; 0 disables the pass).
    #   "off" — coarse pass only.
    loop_fine: str = "plane"
    loop_icp_refine_dist: float = 2.0
    # leaf multiplier of the coarse wide-basin p2p stage (1 = full density,
    # the reference's single-resolution ICP; higher = quadratically cheaper
    # brute sweeps at lower correspondence fidelity)
    loop_coarse_factor: int = 2

    # --- GPS fusion (params.yaml:14-18)
    use_gps_elevation: bool = False
    gps_cov_threshold: float = 2.0
    # GPS fuses only while the estimator is uncertain (addGPSFactor,
    # mapOptmization.cpp:1420-1434, reference default 25.0 m^2 against iSAM
    # marginals).  Our gate reads the ESKF position-covariance trace, whose
    # scale differs: measured (tests/test_liosam.py) the confident steady
    # state sits at 0.007-0.03 m^2 and blind IMU-only propagation crosses
    # 0.05 within ~1 s — so 0.05 separates "tracking" from "lost".
    # Set 0.0 to always fuse quality-gated GPS.
    pose_cov_threshold: float = 0.05

    # --- static capacity caps (TPU fixed shapes; no reference analogue —
    # the reference grows dynamically, see SURVEY.md §7 "dynamic shapes")
    max_keyframes: int = 1024
    # pose-graph solver: "dense" (Cholesky normal equations), "cg"
    # (matrix-free block-Jacobi PCG, O(K*36) memory), or "auto" — dense up
    # to cg_threshold keyframes, CG beyond (the dense 6Kx6K Hessian stops
    # fitting ~1k keyframes; the iSAM2-at-scale role,
    # mapOptmization.cpp:1497-1581)
    graph_solver: str = "auto"
    # measured crossover (BENCH_r04 graph_scale, v5e): CG already beats the
    # dense Cholesky at 512 keyframes (2.24 vs 2.53 ms/iter; 3.74 vs 13.8
    # at 1024), so "auto" switches at 512 — calibrated by measurement, not
    # the round-3 guess of 768 (VERDICT r4 #8)
    cg_threshold: int = 512
    kf_corner_cap: int = 2048        # stored downsampled corners per keyframe (= scan cap: truncation would bias the map)
    kf_surf_cap: int = 8192
    scan_corner_cap: int = 2048      # downsampled features per scan
    scan_surf_cap: int = 8192
    near_keyframes: int = 32         # local-map keyframe gather count
    map_corner_cap: int = 16384      # local map after voxel downsample
    map_surf_cap: int = 49152
    loop_submap_cap: int = 49152     # loop-closure ICP submap points.  Must
    # hold ~all voxels of the ±25-keyframe submap at loop_leaf_size: the
    # fitness gate (0.3, getFitnessScore semantics) assumes the reference's
    # FULL 0.4 m-leaf density — round-3 found a 16384 cap thinned the map
    # until even perfectly-aligned ICP scored ~2.7 and no loop ever closed
    max_gps_factors: int = 256
    max_loop_factors: int = 128
    graph_window: int = 16           # free poses in windowed graph updates
    knn_table_size: int = 32768
    knn_candidates: int = 24

    # --- solver noise (gtsam sigmas in mapOptmization.cpp:1381-1495)
    prior_sigma_rot: float = 1e-2
    prior_sigma_trans: float = 1e-1
    odom_sigma_rot: float = 1e-3
    odom_sigma_trans: float = 1e-2
    # translation-sigma multiplier for between factors born from a DEGENERATE
    # scan match (their translation is partly IMU fiction along the
    # unconstrained axis; at the stiff sigma they out-vote absolute GPS
    # fixes ~1e4:1 per link and the graph cannot absorb corrections — the
    # reference's iSAM covariance would grow there instead).  50 -> 0.5 m
    # effective sigma: an absolute fix wins, real odometry still shapes the
    # chain.  Rotation sigma is never scaled.
    degen_between_scale: float = 50.0

    def __post_init__(self):
        # the per-ring surf downsample packs ring ids into a 7-bit voxel-key
        # field (ops/voxel.voxel_downsample extra_key; ADVICE r3): ring ids
        # >= 128 would silently merge rings, so refuse such sensors here,
        # where the geometry is configured, instead of corrupting downstream
        if self.n_scan > 128:
            raise ValueError(
                f"n_scan={self.n_scan} exceeds the 128-ring bound of the "
                "packed per-ring voxel key (ops/voxel.voxel_downsample "
                "extra_key is 7 bits)")

    @property
    def imu_params(self):
        from ...ops.imu import ImuParams

        return ImuParams(
            acc_noise=self.imu_acc_noise,
            gyr_noise=self.imu_gyr_noise,
            acc_bias_noise=self.imu_acc_bias_noise,
            gyr_bias_noise=self.imu_gyr_bias_noise,
            gravity=self.imu_gravity,
        )


def tiny_params(**overrides) -> LioParams:
    """Small-capacity parameter set for CPU tests."""
    base = dict(
        n_scan=16, horizon_scan=360, max_points=8192,
        imu_window=64,
        max_keyframes=64, kf_corner_cap=512, kf_surf_cap=2048,
        scan_corner_cap=512, scan_surf_cap=2048,
        near_keyframes=8, map_corner_cap=2048, map_surf_cap=8192,
        loop_submap_cap=4096, loop_leaf_size=0.8, max_gps_factors=16, max_loop_factors=16,
        knn_table_size=4096, scan2map_max_iters=10,
        degeneracy_threshold=30.0,  # caps are ~4x smaller, eigenvalues scale with them
        # the tiny profile's sparse 1-deg-azimuth maps sit at the edge of
        # the in-plane-support gate; the long-standing CPU test expectations
        # were calibrated without it (ops-level oracle tests cover the gate)
        vox_plane_min_spread=0.0,
    )
    base.update(overrides)
    return LioParams(**base)
