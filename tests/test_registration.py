import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rs

from msst_tpu.ops import knn, registration as reg, se3

RNG = np.random.default_rng(7)


def make_world():
    """Two perpendicular walls + floor (surf) and 4 vertical poles (corner)."""
    surf = []
    g = np.arange(-10, 10, 0.25, dtype=np.float32)
    xx, zz = np.meshgrid(g, np.arange(0, 4, 0.25, dtype=np.float32))
    surf.append(np.stack([xx.ravel(), np.full(xx.size, 10.0), zz.ravel()], 1))  # wall y=10
    surf.append(np.stack([np.full(xx.size, 10.0), xx.ravel(), zz.ravel()], 1))  # wall x=10
    xx, yy = np.meshgrid(g, g)
    surf.append(np.stack([xx.ravel(), yy.ravel(), np.zeros(xx.size)], 1))       # floor z=0
    surf = np.concatenate(surf).astype(np.float32)

    poles = []
    for px, py in [(5, 5), (-5, 5), (5, -5), (-6, -3)]:
        z = np.arange(0, 4, 0.05, dtype=np.float32)
        poles.append(np.stack([np.full(z.size, px, np.float32),
                               np.full(z.size, py, np.float32), z], 1))
    corner = np.concatenate(poles).astype(np.float32)
    return corner, surf


def subsample(arr, n, rng):
    idx = rng.choice(len(arr), size=n, replace=False)
    return arr[idx] + rng.normal(scale=0.005, size=(n, 3)).astype(np.float32)


def pose_vec(rpy, xyz):
    return jnp.asarray(np.array(list(rpy) + list(xyz), np.float32))


def test_scan_to_map_recovers_pose():
    corner_map, surf_map = make_world()
    gt = np.array([0.02, -0.015, 0.05, 0.3, -0.2, 0.1], np.float32)
    R = Rs.from_euler("xyz", gt[:3]).as_matrix().astype(np.float32)
    t = gt[3:]

    corner_scan = subsample(corner_map, 300, RNG)
    surf_scan = subsample(surf_map, 2000, RNG)
    # scan frame: p_scan = R^-1 (p_world - t)
    corner_scan = (corner_scan - t) @ R
    surf_scan = (surf_scan - t) @ R

    cg = knn.build(jnp.asarray(corner_map), jnp.ones(len(corner_map), bool), 1.0, 4096)
    sg = knn.build(jnp.asarray(surf_map), jnp.ones(len(surf_map), bool), 1.0, 16384)

    res = reg.scan_to_map(
        jnp.asarray(corner_scan), jnp.ones(len(corner_scan), bool),
        jnp.asarray(surf_scan), jnp.ones(len(surf_scan), bool),
        cg, jnp.asarray(corner_map), sg, jnp.asarray(surf_map),
        init_pose=pose_vec([0, 0, 0], [0, 0, 0]),
        candidates_per_cell=48,
    )
    got = np.asarray(res.pose)
    np.testing.assert_allclose(got[:3], gt[:3], atol=5e-3)
    np.testing.assert_allclose(got[3:], gt[3:], atol=2e-2)
    assert not bool(res.degenerate)
    assert int(res.n_surf) > 500


def test_scan_to_map_degenerate_single_plane():
    # Only a floor: x/y translation + yaw are unobservable -> degenerate flag,
    # and the update must not move along the unobservable directions.
    g = np.arange(-10, 10, 0.2, dtype=np.float32)
    xx, yy = np.meshgrid(g, g)
    floor = np.stack([xx.ravel(), yy.ravel(), np.zeros(xx.size, np.float32)], 1)
    surf_scan = subsample(floor, 2000, RNG)
    surf_scan = surf_scan + np.array([0, 0, -0.3], np.float32)  # shifted down in z

    sg = knn.build(jnp.asarray(floor), jnp.ones(len(floor), bool), 1.0, 16384)
    # empty corner set
    cg = knn.build(jnp.zeros((8, 3), jnp.float32), jnp.zeros(8, bool), 1.0, 64)

    res = reg.scan_to_map(
        jnp.zeros((8, 3)), jnp.zeros(8, bool),
        jnp.asarray(surf_scan), jnp.ones(len(surf_scan), bool),
        cg, jnp.zeros((8, 3)), sg, jnp.asarray(floor),
        init_pose=pose_vec([0, 0, 0], [0, 0, 0]),
        candidates_per_cell=48,
    )
    assert bool(res.degenerate)
    got = np.asarray(res.pose)
    assert abs(got[5] - 0.3) < 0.02      # z recovered
    assert abs(got[3]) < 1e-3 and abs(got[4]) < 1e-3  # x/y frozen by projection


def test_icp_point2point_recovers_transform():
    pts = RNG.uniform(-5, 5, size=(1500, 3)).astype(np.float32)
    R = Rs.from_euler("xyz", [0.03, 0.02, 0.1]).as_matrix().astype(np.float32)
    t = np.array([0.3, -0.1, 0.2], np.float32)
    src = pts
    tgt = pts @ R.T + t
    grid = knn.build(jnp.asarray(tgt), jnp.ones(len(tgt), bool), 1.0, 8192)
    res = reg.icp_point2point(
        jnp.asarray(src), jnp.ones(len(src), bool), grid, jnp.asarray(tgt),
        se3.Pose.identity(), max_iters=50, max_corr_dist=2.0,
        candidates_per_cell=32,
    )
    T = np.asarray(res.pose.to_matrix())
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=5e-3)
    assert float(res.fitness) < 1e-4


def test_icp_converges_early_not_at_iteration_cap():
    # PCL DefaultConvergenceCriteria (transform similarity + relative MSE)
    # must stop a noisy alignment long before the iteration cap, at the same
    # pose the cap-bound run reaches (mapOptmization.cpp:561-563 epsilons).
    pts = RNG.uniform(-5, 5, size=(2000, 3)).astype(np.float32)
    R = Rs.from_euler("xyz", [0.02, -0.03, 0.08]).as_matrix().astype(np.float32)
    t = np.array([0.2, 0.1, -0.15], np.float32)
    tgt = (pts @ R.T + t + 0.01 * RNG.normal(size=pts.shape)).astype(np.float32)
    grid = knn.build(jnp.asarray(tgt), jnp.ones(len(tgt), bool), 1.0, 8192)
    kw = dict(max_iters=100, max_corr_dist=2.0, candidates_per_cell=32)
    src, sm = jnp.asarray(pts), jnp.ones(len(pts), bool)
    res = reg.icp_point2point(src, sm, grid, jnp.asarray(tgt),
                              se3.Pose.identity(), **kw)
    full = reg.icp_point2point(src, sm, grid, jnp.asarray(tgt),
                               se3.Pose.identity(), transformation_eps=0.0,
                               rel_mse_eps=0.0, abs_mse_eps=0.0, **kw)
    assert int(full.iters) == 100          # criteria off -> cap-bound
    assert int(res.iters) < 40             # criteria on -> early exit
    np.testing.assert_allclose(np.asarray(res.pose.to_matrix()),
                               np.asarray(full.pose.to_matrix()), atol=2e-3)
    np.testing.assert_allclose(float(res.fitness), float(full.fitness),
                               rtol=0.1, atol=1e-5)


def test_icp_fitness_reflects_mismatch():
    src = RNG.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    tgt = RNG.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    grid = knn.build(jnp.asarray(tgt), jnp.ones(500, bool), 1.0, 4096)
    res = reg.icp_point2point(
        jnp.asarray(src), jnp.ones(500, bool), grid, jnp.asarray(tgt),
        se3.Pose.identity(), max_iters=10, max_corr_dist=2.0,
        candidates_per_cell=32,
    )
    assert float(res.fitness) > 1e-3  # random clouds can't align tightly


def test_gicp_recovers_transform_planar():
    # two crossing planes with noise: plane-to-plane handles this well
    g = np.arange(-5, 5, 0.1, dtype=np.float32)
    xx, yy = np.meshgrid(g, g)
    p1 = np.stack([xx.ravel(), yy.ravel(), 0.02 * RNG.normal(size=xx.size)], 1)
    p2 = np.stack([xx.ravel(), 0.02 * RNG.normal(size=xx.size), yy.ravel()], 1)
    p3 = np.stack([0.02 * RNG.normal(size=xx.size), xx.ravel(), yy.ravel()], 1)
    tgt = np.concatenate([p1, p2, p3]).astype(np.float32)
    R = Rs.from_euler("xyz", [0.02, -0.01, 0.04]).as_matrix().astype(np.float32)
    t = np.array([0.1, 0.15, -0.1], np.float32)
    sel = RNG.choice(len(tgt), 3000, replace=False)
    src = (tgt[sel] - t) @ R  # so that R src + t == tgt

    tgt_j, src_j = jnp.asarray(tgt), jnp.asarray(src)
    tmask = jnp.ones(len(tgt), bool)
    smask = jnp.ones(len(src), bool)
    tgrid = knn.build(tgt_j, tmask, 1.0, 16384)
    sgrid = knn.build(src_j, smask, 1.0, 16384)
    tcov = reg.point_covariances(tgt_j, tmask, tgrid, k=10, candidates_per_cell=64)
    scov = reg.point_covariances(src_j, smask, sgrid, k=10, candidates_per_cell=64)
    res = reg.gicp(src_j, smask, scov, tgrid, tgt_j, tcov,
                   se3.Pose.identity(), max_iters=30, max_corr_dist=1.0,
                   candidates_per_cell=32)
    T = np.asarray(res.pose.to_matrix())
    np.testing.assert_allclose(T[:3, :3], R, atol=2e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=2e-2)


def test_ndt_recovers_transform():
    corner_map, surf_map = make_world()
    tgt = np.concatenate([surf_map, corner_map])
    R = Rs.from_euler("xyz", [0.01, 0.02, 0.05]).as_matrix().astype(np.float32)
    t = np.array([0.2, -0.3, 0.1], np.float32)
    sel = RNG.choice(len(tgt), 4000, replace=False)
    src = (tgt[sel] - t) @ R

    ndt_map = reg.build_ndt_map(jnp.asarray(tgt), jnp.ones(len(tgt), bool),
                                resolution=1.0, capacity=4096)
    res = reg.ndt(jnp.asarray(src), jnp.ones(len(src), bool), ndt_map,
                  se3.Pose.identity(), max_iters=35, resolution=1.0,
                  candidates_per_cell=8)
    T = np.asarray(res.pose.to_matrix())
    np.testing.assert_allclose(T[:3, :3], R, atol=5e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=5e-2)
    assert float(res.score) > 0.1


def test_scan_to_map_jits():
    corner_map, surf_map = make_world()
    cg = knn.build(jnp.asarray(corner_map), jnp.ones(len(corner_map), bool), 1.0, 4096)
    sg = knn.build(jnp.asarray(surf_map), jnp.ones(len(surf_map), bool), 1.0, 16384)
    corner_scan = jnp.asarray(subsample(corner_map, 100, RNG))
    surf_scan = jnp.asarray(subsample(surf_map, 500, RNG))

    f = jax.jit(
        lambda cs, ss, p0: reg.scan_to_map(
            cs, jnp.ones(cs.shape[0], bool), ss, jnp.ones(ss.shape[0], bool),
            cg, jnp.asarray(corner_map), sg, jnp.asarray(surf_map),
            p0, candidates_per_cell=48,
        ).pose
    )
    out = f(corner_scan, surf_scan, pose_vec([0, 0, 0], [0.05, 0, 0]))
    assert np.isfinite(np.asarray(out)).all()


def test_scan_to_map_voxel_recovers_pose():
    from msst_tpu.ops import voxelmap

    corner_map, surf_map = make_world()
    gt = np.array([0.02, -0.015, 0.05, 0.3, -0.2, 0.1], np.float32)
    R = Rs.from_euler("xyz", gt[:3]).as_matrix().astype(np.float32)
    t = gt[3:]
    corner_scan = subsample(corner_map, 300, RNG)
    surf_scan = subsample(surf_map, 2000, RNG)
    corner_scan = (corner_scan - t) @ R
    surf_scan = (surf_scan - t) @ R

    cvox = voxelmap.build(jnp.asarray(corner_map), jnp.ones(len(corner_map), bool),
                          1.0, 2048, "line", table_size=4096)
    svox = voxelmap.build(jnp.asarray(surf_map), jnp.ones(len(surf_map), bool),
                          1.0, 8192, "plane", table_size=16384)
    res = reg.scan_to_map_voxel(
        jnp.asarray(corner_scan), jnp.ones(len(corner_scan), bool),
        jnp.asarray(surf_scan), jnp.ones(len(surf_scan), bool),
        cvox, svox, jnp.zeros(6, jnp.float32))
    got = np.asarray(res.pose)
    np.testing.assert_allclose(got[:3], gt[:3], atol=6e-3)
    np.testing.assert_allclose(got[3:], gt[3:], atol=3e-2)
    assert not bool(res.degenerate)
    assert int(res.n_surf) > 1000


def test_scan_to_map_voxel_frozen_reassociation_matches():
    """Frozen-correspondence iterations (reassoc thresholds > 0) recover the
    same pose as per-iteration re-association (the reference's semantics) —
    associations only change when an update crosses a cell boundary, so
    sub-threshold updates must land within mm/mdeg of the faithful path."""
    from msst_tpu.ops import voxelmap

    corner_map, surf_map = make_world()
    gt = np.array([0.02, -0.015, 0.05, 0.3, -0.2, 0.1], np.float32)
    R = Rs.from_euler("xyz", gt[:3]).as_matrix().astype(np.float32)
    t = gt[3:]
    corner_scan = (subsample(corner_map, 300, RNG) - t) @ R
    surf_scan = (subsample(surf_map, 2000, RNG) - t) @ R

    cvox = voxelmap.build(jnp.asarray(corner_map),
                          jnp.ones(len(corner_map), bool),
                          1.0, 2048, "line", table_size=4096)
    svox = voxelmap.build(jnp.asarray(surf_map),
                          jnp.ones(len(surf_map), bool),
                          1.0, 8192, "plane", table_size=16384)

    def solve(**kw):
        return reg.scan_to_map_voxel(
            jnp.asarray(corner_scan), jnp.ones(len(corner_scan), bool),
            jnp.asarray(surf_scan), jnp.ones(len(surf_scan), bool),
            cvox, svox, jnp.zeros(6, jnp.float32), **kw)

    ref = solve()
    froz = solve(reassoc_rot=0.01, reassoc_trans=0.02)
    np.testing.assert_allclose(np.asarray(froz.pose)[:3],
                               np.asarray(ref.pose)[:3], atol=2e-3)
    np.testing.assert_allclose(np.asarray(froz.pose)[3:],
                               np.asarray(ref.pose)[3:], atol=5e-3)
    np.testing.assert_allclose(np.asarray(froz.pose)[:3], gt[:3], atol=6e-3)
    np.testing.assert_allclose(np.asarray(froz.pose)[3:], gt[3:], atol=3e-2)
    assert int(froz.iterations) <= int(ref.iterations) + 1


def test_scan_to_map_voxel_degenerate_single_plane():
    from msst_tpu.ops import voxelmap

    g = np.arange(-10, 10, 0.2, dtype=np.float32)
    xx, yy = np.meshgrid(g, g)
    floor = np.stack([xx.ravel(), yy.ravel(), np.zeros(xx.size, np.float32)], 1)
    surf_scan = subsample(floor, 2000, RNG) + np.array([0, 0, -0.3], np.float32)

    svox = voxelmap.build(jnp.asarray(floor), jnp.ones(len(floor), bool),
                          1.0, 8192, "plane", table_size=16384)
    cvox = voxelmap.build(jnp.zeros((8, 3), jnp.float32), jnp.zeros(8, bool),
                          1.0, 8, "line", table_size=16)
    res = reg.scan_to_map_voxel(
        jnp.zeros((8, 3)), jnp.zeros(8, bool),
        jnp.asarray(surf_scan), jnp.ones(len(surf_scan), bool),
        cvox, svox, jnp.zeros(6, jnp.float32))
    assert bool(res.degenerate)
    got = np.asarray(res.pose)
    assert abs(got[5] - 0.3) < 0.02
    assert abs(got[3]) < 1e-3 and abs(got[4]) < 1e-3


def test_icp_brute_matches_grid_path():
    # the brute-force correspondence sweep (loop-closure sizes) must agree
    # with the hash-grid path on a well-posed alignment
    pts = RNG.uniform(-5, 5, size=(1500, 3)).astype(np.float32)
    R = Rs.from_euler("xyz", [0.03, 0.02, 0.1]).as_matrix().astype(np.float32)
    t = np.array([0.3, -0.1, 0.2], np.float32)
    tgt = pts @ R.T + t
    tm = np.ones(len(tgt), bool)
    tm[::13] = False
    res = reg.icp_point2point_brute(
        jnp.asarray(pts), jnp.ones(len(pts), bool),
        jnp.asarray(tgt), jnp.asarray(tm),
        se3.Pose.identity(), max_iters=50, max_corr_dist=2.0, chunk=512,
    )
    T = np.asarray(res.pose.to_matrix())
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=5e-3)
    # 1/13 of targets are masked out, so those sources match ~0.9 m away
    # neighbors and lift the mean-square fitness; the pose is what matters
    assert float(res.fitness) < 0.2
    assert bool(res.converged)


def test_plane_min_spread_reclassifies_ring_arcs_as_lines():
    """A single grazing-incidence ring arc crossing a cell is THIN (passes
    the thickness gate) but has no 2-D in-plane support; its fitted NORMAL
    tilts with noise and, at production shapes, torques pitch every scan
    (measured r4: 10 m of along-corridor drag per 140 m).  With
    plane_min_spread the arc cell is RECLASSIFIED as a line feature
    (direction = arc tangent, scaled by LINE_DIR_SCALE so the lookup
    selects point-to-line residuals; r5 — blanking it instead starved z
    where floor arcs are the only vertical support) while true planar
    cells keep unit normals."""
    from msst_tpu.ops import voxelmap

    rng = np.random.default_rng(3)
    # one arc: a nearly-straight 1D string of points INSIDE one 0.8 m cell
    # (cell [0, 0.8) in each axis for origin 0)
    s = np.linspace(0.05, 0.75, 40, dtype=np.float32)
    arc = np.stack([s, np.full_like(s, 0.4), np.full_like(s, 0.4)], axis=1)
    arc += rng.normal(scale=0.005, size=arc.shape).astype(np.float32)
    # true plane patch: 2-D disc support inside cell (3, 0, 0)
    plane = np.stack([
        rng.uniform(2.45, 3.15, 40), rng.uniform(0.05, 0.75, 40),
        0.4 + rng.normal(scale=0.005, size=40)], axis=1).astype(np.float32)

    xyz = jnp.asarray(np.concatenate([arc, plane]))
    mask = jnp.ones(len(xyz), bool)

    def fit(spread):
        v = voxelmap.build(xyz, mask, 0.8, 64, "plane", table_size=128,
                           plane_min_spread=spread,
                           origin=jnp.zeros(3, jnp.float32))
        m = np.asarray(v.valid & v.mask)
        return (m.sum(), np.asarray(v.mean)[m], np.asarray(v.direction)[m],
                np.asarray(v.d)[m])

    n0, _, dir0, _ = fit(0.0)
    assert n0 == 2, n0                     # both fit without the gate
    np.testing.assert_allclose(np.linalg.norm(dir0, axis=1), 1.0, atol=1e-4)

    n1, means, dirs, ds = fit(0.05)
    assert n1 == 2, n1                     # both cells stay VALID
    norms = np.linalg.norm(dirs, axis=1)
    is_line = norms < voxelmap.LINE_DIR_GATE
    assert is_line.sum() == 1              # the arc cell became a line...
    arc_i, plane_i = int(np.argmax(is_line)), int(np.argmin(is_line))
    assert means[arc_i, 0] < 1.0 and means[plane_i, 0] > 2.0
    # ...whose direction is the arc tangent (x) at LINE_DIR_SCALE norm
    np.testing.assert_allclose(norms[arc_i], voxelmap.LINE_DIR_SCALE,
                               atol=1e-4)
    tangent = np.abs(dirs[arc_i] / norms[arc_i])
    assert tangent[0] > 0.99, dirs[arc_i]
    assert ds[arc_i] == 0.0
    # the disc keeps a unit plane normal (z)
    np.testing.assert_allclose(norms[plane_i], 1.0, atol=1e-4)
    assert np.abs(dirs[plane_i][2]) > 0.99


def test_icp_curvature_flags_corridor_axis():
    """Cost curvature with re-association: an infinite-corridor match must
    show near-zero curvature along the corridor axis and strong curvature
    across it — the basis of the anisotropic loop factor
    (LioParams.loop_degeneracy_ratio; the reference accepts loops on
    fitness alone, performLoopClosure mapOptmization.cpp:575-580)."""
    rng = np.random.default_rng(5)
    n = 1200
    x = rng.uniform(-12, 12, n).astype(np.float32)
    side = rng.integers(0, 2, n)
    y = np.where(side, 2.0, -2.0).astype(np.float32)
    z = rng.uniform(0, 3, n).astype(np.float32)
    wallpts = np.stack(
        [x, y + rng.normal(scale=0.01, size=n).astype(np.float32), z], axis=1)
    src = jnp.asarray(wallpts[: n // 2])
    tgt = jnp.asarray(wallpts)
    kappa, c0 = reg.icp_curvature_brute(
        src, jnp.ones(src.shape[0], bool), tgt, jnp.ones(n, bool),
        se3.Pose.identity(), max_corr_dist=2.0, chunk=512)
    k = np.asarray(kappa)
    kt = k[3:]
    # x (corridor axis) must be far below y (across) curvature
    assert kt[0] < 0.05 * kt[1], kt


def test_icp_curvature_translation_invariant():
    """Curvature must measure the MATCH's observability, not the scene's
    distance from the world origin: rotation probes are conjugated about the
    cloud centroid, so kappa(scene) == kappa(scene + offset) (ADVICE r4
    high — the un-conjugated probe swept far scenes by delta_r * |offset|,
    crushing fully-observable rotation axes to the information floor)."""
    rng = np.random.default_rng(11)
    n = 600
    # corridor walls + floor + a pillar: roll/pitch/yaw all observable
    x = rng.uniform(-10, 10, n).astype(np.float32)
    y = np.where(rng.integers(0, 2, n), 2.0, -2.0).astype(np.float32)
    z = rng.uniform(0, 3, n).astype(np.float32)
    walls = np.stack([x, y, z], axis=1)
    floor = np.stack([rng.uniform(-10, 10, n), rng.uniform(-2, 2, n),
                      np.zeros(n)], axis=1).astype(np.float32)
    th = rng.uniform(0, 2 * np.pi, 200)
    pillar = np.stack([5.0 + 0.3 * np.cos(th), 0.3 * np.sin(th),
                       rng.uniform(0, 3, 200)], axis=1).astype(np.float32)
    pts = np.concatenate([walls, floor, pillar]).astype(np.float32)

    def kappa_at(offset):
        p = pts + np.asarray(offset, np.float32)
        src = jnp.asarray(p[::2])
        tgt = jnp.asarray(p)
        k, _ = reg.icp_curvature_brute(
            src, jnp.ones(src.shape[0], bool), tgt,
            jnp.ones(tgt.shape[0], bool),
            se3.Pose.identity(), max_corr_dist=2.0, chunk=512)
        return np.asarray(k)

    k0 = kappa_at([0.0, 0.0, 0.0])
    k1 = kappa_at([400.0, -150.0, 0.0])
    assert np.all(k0[:3] > 0.0), k0      # every rotation axis observable
    np.testing.assert_allclose(k1, k0, rtol=0.35, atol=1e-4)


def test_icp_curvature_lost_correspondences_saturate():
    """A probe that destroys every correspondence must read as maximally
    sensitive (saturated cost), not kappa=0 (ADVICE r4 medium)."""
    rng = np.random.default_rng(3)
    # a tight cluster: the +-1.5 m translation probe with a small corr gate
    # loses all matches
    pts = rng.normal(scale=0.1, size=(200, 3)).astype(np.float32)
    src = jnp.asarray(pts[::2])
    tgt = jnp.asarray(pts)
    kappa, c0 = reg.icp_curvature_brute(
        src, jnp.ones(src.shape[0], bool), tgt, jnp.ones(tgt.shape[0], bool),
        se3.Pose.identity(), max_corr_dist=0.5, delta_t=1.5, chunk=256)
    k = np.asarray(kappa)
    assert float(c0) < 0.05
    # all three translation probes lost their matches -> saturated, large
    assert np.all(k[3:] > 0.05), k
