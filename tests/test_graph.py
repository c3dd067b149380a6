import jax.numpy as jnp
import numpy as np

from msst_tpu.ops import graph as G
from msst_tpu.ops import se3

RNG = np.random.default_rng(9)


def set_factor(f, k, **kw):
    """Write factor k fields (host-side test helper)."""
    upd = {}
    for name, val in kw.items():
        cur = getattr(f, name)
        if isinstance(cur, se3.Pose):
            upd[name] = se3.Pose(cur.q.at[k].set(val.q), cur.t.at[k].set(val.t))
        else:
            upd[name] = cur.at[k].set(val)
    return f._replace(**upd)


def mk_pose(rpy, t):
    return se3.Pose.from_rpy_xyz(jnp.asarray(rpy, jnp.float32), jnp.asarray(t, jnp.float32))


def test_chain_odometry_recovers_gt():
    # 5 poses along x with noisy initial guesses; prior on pose0 + exact
    # between measurements -> GN should land on ground truth.
    K = 8
    g = G.empty_graph(K, 4, 16, 4)
    gts = [mk_pose([0, 0, 0.1 * i], [i * 1.0, 0.1 * i, 0]) for i in range(5)]

    poses = g.poses
    for i, p in enumerate(gts):
        noisy_t = p.t + jnp.asarray(RNG.normal(scale=0.1, size=3).astype(np.float32))
        poses = se3.Pose(poses.q.at[i].set(p.q), poses.t.at[i].set(noisy_t))
    g = g._replace(poses=poses, pose_mask=jnp.arange(K) < 5)

    g = g._replace(priors=set_factor(
        g.priors, 0, idx=0, meas=gts[0], sqrt_info=jnp.full(6, 1e4), mask=True))
    b = g.betweens
    for i in range(4):
        meas = gts[i].between(gts[i + 1])
        b = set_factor(b, i, i=i, j=i + 1, meas=meas,
                       sqrt_info=jnp.full(6, 100.0), mask=True)
    g = g._replace(betweens=b)

    e0 = float(G.total_error(g))
    out = G.optimize(g, iters=10)
    e1 = float(G.total_error(out))
    assert e1 < e0 * 1e-4
    for i, p in enumerate(gts):
        np.testing.assert_allclose(np.asarray(out.poses.t[i]), np.asarray(p.t), atol=1e-3)
        dot = abs(float(jnp.sum(out.poses.q[i] * p.q)))
        assert dot > 1 - 1e-5


def test_gps_factor_pins_translation():
    K = 4
    g = G.empty_graph(K, 2, 4, 4)
    g = g._replace(pose_mask=jnp.arange(K) < 2)
    g = g._replace(priors=set_factor(
        g.priors, 0, idx=0, meas=se3.Pose.identity(), sqrt_info=jnp.full(6, 1e4), mask=True))
    # between says pose1 is 1m along x, GPS says it's at [1.5, 0, 0] with
    # much higher weight -> GPS wins on translation
    g = g._replace(betweens=set_factor(
        g.betweens, 0, i=0, j=1, meas=mk_pose([0, 0, 0], [1.0, 0, 0]),
        sqrt_info=jnp.full(6, 1.0), mask=True))
    g = g._replace(gps=set_factor(
        g.gps, 0, idx=1, xyz=jnp.asarray([1.5, 0, 0]), sqrt_info=jnp.full(3, 100.0), mask=True))
    out = G.optimize(g, iters=10)
    t1 = np.asarray(out.poses.t[1])
    assert abs(t1[0] - 1.5) < 0.01


def test_loop_closure_distributes_error():
    # square loop with drifted odometry; loop factor closes it
    K = 8
    gt_pts = np.array([[0, 0, 0], [10, 0, 0], [10, 10, 0], [0, 10, 0]], np.float32)
    g = G.empty_graph(K, 2, 8, 2)
    poses = g.poses
    drift = np.array([0.0, 0, 0])
    for i in range(4):
        drift = drift + RNG.normal(scale=0.3, size=3)
        poses = se3.Pose(poses.q.at[i].set(se3.quat_identity()),
                         poses.t.at[i].set(jnp.asarray(gt_pts[i] + drift, jnp.float32)))
    g = g._replace(poses=poses, pose_mask=jnp.arange(K) < 4)
    g = g._replace(priors=set_factor(
        g.priors, 0, idx=0, meas=se3.Pose.identity(), sqrt_info=jnp.full(6, 1e4), mask=True))
    b = g.betweens
    for i in range(3):
        meas = mk_pose([0, 0, 0], gt_pts[i + 1] - gt_pts[i])
        b = set_factor(b, i, i=i, j=i + 1, meas=meas, sqrt_info=jnp.full(6, 10.0), mask=True)
    # loop: 3 -> 0
    b = set_factor(b, 3, i=3, j=0, meas=mk_pose([0, 0, 0], gt_pts[0] - gt_pts[3]),
                   sqrt_info=jnp.full(6, 10.0), mask=True)
    g = g._replace(betweens=b)
    out = G.optimize(g, iters=10)
    for i in range(4):
        np.testing.assert_allclose(np.asarray(out.poses.t[i]), gt_pts[i], atol=1e-2)


def test_free_mask_freezes_history():
    K = 4
    g = G.empty_graph(K, 2, 4, 2)
    g = g._replace(pose_mask=jnp.arange(K) < 2)
    p0 = mk_pose([0, 0, 0], [5.0, 5.0, 0])  # pose0 initial (wrong wrt prior)
    poses = se3.Pose(g.poses.q.at[0].set(p0.q), g.poses.t.at[0].set(p0.t))
    g = g._replace(poses=poses)
    g = g._replace(priors=set_factor(
        g.priors, 0, idx=0, meas=se3.Pose.identity(), sqrt_info=jnp.full(6, 100.0), mask=True))
    g = g._replace(betweens=set_factor(
        g.betweens, 0, i=0, j=1, meas=mk_pose([0, 0, 0], [1.0, 0, 0]),
        sqrt_info=jnp.full(6, 10.0), mask=True))
    free = jnp.asarray([False, True, False, False])
    out = G.optimize(g, free_mask=free, iters=5)
    # pose0 frozen despite violated prior
    np.testing.assert_allclose(np.asarray(out.poses.t[0]), [5, 5, 0], atol=1e-6)
    # pose1 moved to pose0 + [1,0,0]
    np.testing.assert_allclose(np.asarray(out.poses.t[1]), [6, 5, 0], atol=1e-3)


def test_masked_factors_ignored():
    K = 4
    g = G.empty_graph(K, 2, 4, 2)
    g = g._replace(pose_mask=jnp.arange(K) < 2)
    g = g._replace(priors=set_factor(
        g.priors, 0, idx=0, meas=se3.Pose.identity(), sqrt_info=jnp.full(6, 100.0), mask=True))
    # factor 1 intentionally inconsistent but masked off
    g = g._replace(priors=set_factor(
        g.priors, 1, idx=0, meas=mk_pose([0, 0, 0], [99.0, 0, 0]),
        sqrt_info=jnp.full(6, 1e6), mask=False))
    out = G.optimize(g, iters=5)
    np.testing.assert_allclose(np.asarray(out.poses.t[0]), 0, atol=1e-4)


def test_cg_matches_dense_on_loop_graph():
    # same square-loop setup as the dense test; CG must land equally
    K = 8
    gt_pts = np.array([[0, 0, 0], [10, 0, 0], [10, 10, 0], [0, 10, 0]], np.float32)
    g = G.empty_graph(K, 2, 8, 2)
    poses = g.poses
    drift = np.array([0.0, 0, 0])
    rng = np.random.default_rng(3)
    for i in range(4):
        drift = drift + rng.normal(scale=0.3, size=3)
        poses = se3.Pose(poses.q.at[i].set(se3.quat_identity()),
                         poses.t.at[i].set(jnp.asarray(gt_pts[i] + drift, jnp.float32)))
    g = g._replace(poses=poses, pose_mask=jnp.arange(K) < 4)
    g = g._replace(priors=set_factor(
        g.priors, 0, idx=0, meas=se3.Pose.identity(), sqrt_info=jnp.full(6, 1e4), mask=True))
    b = g.betweens
    for i in range(3):
        meas = mk_pose([0, 0, 0], gt_pts[i + 1] - gt_pts[i])
        b = set_factor(b, i, i=i, j=i + 1, meas=meas, sqrt_info=jnp.full(6, 10.0), mask=True)
    b = set_factor(b, 3, i=3, j=0, meas=mk_pose([0, 0, 0], gt_pts[0] - gt_pts[3]),
                   sqrt_info=jnp.full(6, 10.0), mask=True)
    g = g._replace(betweens=b)

    dense = G.optimize(g, iters=10)
    cg = G.optimize_cg(g, iters=10, cg_iters=60)
    for i in range(4):
        np.testing.assert_allclose(np.asarray(cg.poses.t[i]), gt_pts[i], atol=2e-2)
        np.testing.assert_allclose(np.asarray(cg.poses.t[i]),
                                   np.asarray(dense.poses.t[i]), atol=2e-2)
    assert float(G.total_error(cg)) < 1e-3
