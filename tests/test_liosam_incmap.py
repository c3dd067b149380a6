"""Incremental local-map maintenance (LioParams.map_update="incremental"):
delta insert/evict of per-keyframe voxel moments must track the trajectory
as well as the full per-keyframe rebuild, across eviction cycles and loop
closures.  The maintained tables themselves are oracle-tested in
tests/test_voxelmap_inc.py; these are the pipeline-level contracts."""

import numpy as np
import pytest

from msst_tpu.models.liosam import LioSam
from msst_tpu.models.liosam.params import tiny_params
from msst_tpu.utils import sim


def _run(data, window=1, **over):
    lio = LioSam(tiny_params(loop_closure_enabled=False, **over),
                 window=window)
    if window == 1:
        for s in data:
            lio.process_scan(s["xyz"], s["ring"], s["time_rel"],
                             s["scan_start"], imu_t=s["imu_t"],
                             imu_gyro=s["imu_gyro"], imu_acc=s["imu_acc"],
                             imu_rpy=s["imu_rpy"])
    else:
        for i in range(0, len(data), window):
            lio.process_window([
                dict(xyz=s["xyz"], ring=s["ring"], time_rel=s["time_rel"],
                     scan_start=s["scan_start"], imu_t=s["imu_t"],
                     imu_gyro=s["imu_gyro"], imu_acc=s["imu_acc"],
                     imu_rpy=s["imu_rpy"])
                for s in data[i:i + window]
            ])
    lio.flush()
    return lio


def _errs(lio, data):
    gt0 = data[0]["gt_pose"][:3, 3]
    gt = np.stack([s["gt_pose"][:3, 3] - gt0 for s in data])
    est = lio.trajectory.as_matrices()[:, :3, 3]
    n = min(len(est), len(gt))
    return np.linalg.norm(est[:n] - gt[:n], axis=1)


@pytest.fixture(scope="module")
def dataset():
    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=10.0, speed=2.0)
    return sim.make_dataset(world, traj, n_scans=30, scan_dt=0.1,
                            n_scan=16, horizon=360, seed=5)


def test_incremental_tracks_like_rebuild(dataset):
    inc = _run(dataset, map_update="incremental")
    reb = _run(dataset, map_update="rebuild")
    e_inc, e_reb = _errs(inc, dataset), _errs(reb, dataset)
    # both accurate; incremental within 2x of rebuild and absolutely bounded
    assert e_inc.max() < max(2.0 * e_reb.max(), 0.15), (
        e_inc.max(), e_reb.max())
    # the incremental map actually took the delta path (keyframes baked)
    assert bool(inc.state.kf.baked[:int(inc.state.kf.count)].all())


def test_incremental_with_eviction_keeps_mapping():
    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=10.0, speed=2.5)
    data = sim.make_dataset(world, traj, n_scans=100, scan_dt=0.1,
                            n_scan=16, horizon=360, seed=9)
    lio = _run(data, window=8, map_update="incremental", max_keyframes=6)
    assert int(lio.state.kf.count) == 6
    err = _errs(lio, data)
    assert err.max() < 0.5, err.max()
    # moments stay consistent with the surviving keyframes: counts are
    # positive and bounded by total stored points
    cnt = np.asarray(lio.state.local_map.surf_mom.cnt)
    key = np.asarray(lio.state.local_map.surf_mom.key)
    alive = key < 2**30
    assert (cnt[alive] >= 0.5).all()
    total_pts = int(np.asarray(lio.state.kf.surf_mask).sum())
    assert cnt[alive].sum() <= total_pts + 1e-3


def test_incremental_loop_closure_rebakes():
    """A closed loop rewrites keyframe history, so the incremental map must
    re-bake (loop.py routes to _rebake_local_map; baked poses re-sync to
    the optimized kf.pose6).  Shuttle revisit (the proven loop-detection
    scenario of test_loop_closure_detects_revisit) with the incremental
    map on."""
    from msst_tpu.models.liosam.loop import loop_closure_step

    world = sim.World()
    traj = sim.SimTrajectory(kind="shuttle", speed=3.0, period=5.0)
    data = sim.make_dataset(world, traj, n_scans=50, scan_dt=0.1,
                            n_scan=16, horizon=360, seed=4)
    p = tiny_params(loop_closure_enabled=True, map_update="incremental",
                    history_keyframe_search_time_diff=3.0,
                    history_keyframe_search_num=3,
                    loop_closure_frequency=1.0)
    lio = LioSam(p)
    for s in data:
        lio.process_scan(
            s["xyz"], s["ring"], s["time_rel"], s["scan_start"],
            imu_t=s["imu_t"], imu_gyro=s["imu_gyro"], imu_acc=s["imu_acc"],
            imu_rpy=s["imu_rpy"])
    # by the end the robot is back near the start; force one loop attempt
    lio.state, loop = loop_closure_step(lio.state, p)
    found = bool(loop.found) or int(lio.state.n_loop) > 0
    assert found
    if bool(loop.found):
        # the loop path re-baked every valid keyframe at its optimized pose
        n = int(lio.state.kf.count)
        assert bool(lio.state.kf.baked[:n].any())
        np.testing.assert_allclose(
            np.asarray(lio.state.kf.baked_pose6[:n]),
            np.asarray(lio.state.kf.pose6[:n]), atol=1e-5)
    err = _errs(lio, data)
    assert err.max() < 1.0, err.max()
    assert np.isfinite(err).all()


def test_overflow_telemetry_and_warning():
    """Forced map-cap overflow must be OBSERVABLE: StepOutput carries
    occupancy/dropped telemetry, the pipeline warns host-side, and
    map_health records the saturation (VERDICT r4 #6 — the tiny profile
    once diverged silently on exactly this)."""
    import warnings

    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=8.0, speed=2.5)
    data = sim.make_dataset(world, traj, n_scans=24, scan_dt=0.1, n_scan=16,
                            horizon=360, seed=5)
    lio = LioSam(tiny_params(loop_closure_enabled=False,
                             map_corner_cap=128, map_surf_cap=256),
                 window=4)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        for i in range(0, len(data), 4):
            lio.process_window([
                dict(xyz=s["xyz"], ring=s["ring"], time_rel=s["time_rel"],
                     scan_start=s["scan_start"], imu_t=s["imu_t"],
                     imu_gyro=s["imu_gyro"], imu_acc=s["imu_acc"],
                     imu_rpy=s["imu_rpy"]) for s in data[i:i + 4]])
        lio.flush()
    h = lio.map_health
    assert h["max_occupancy"] > 0.9, h
    assert h["dropped_cells"] > 0, h
    assert any("saturated" in str(w.message) for w in rec), \
        [str(w.message) for w in rec]

    # healthy caps: no warning, sane occupancy
    lio2 = LioSam(tiny_params(loop_closure_enabled=False), window=4)
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        for i in range(0, 12, 4):
            lio2.process_window([
                dict(xyz=s["xyz"], ring=s["ring"], time_rel=s["time_rel"],
                     scan_start=s["scan_start"], imu_t=s["imu_t"],
                     imu_gyro=s["imu_gyro"], imu_acc=s["imu_acc"],
                     imu_rpy=s["imu_rpy"]) for s in data[i:i + 4]])
        lio2.flush()
    assert not any("saturated" in str(w.message) for w in rec2)
    assert 0.0 < lio2.map_health["max_occupancy"] <= 1.0
