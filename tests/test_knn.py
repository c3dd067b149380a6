import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from msst_tpu.ops import knn

RNG = np.random.default_rng(3)


def test_query_matches_ckdtree():
    pts = RNG.uniform(-10, 10, size=(2000, 3)).astype(np.float32)
    queries = RNG.uniform(-9, 9, size=(300, 3)).astype(np.float32)
    grid = knn.build(jnp.asarray(pts), jnp.ones(2000, bool), cell_size=1.0, table_size=4096)
    res = knn.query(grid, jnp.asarray(queries), jnp.ones(300, bool), k=5,
                    candidates_per_cell=32, max_sqdist=1.0)

    tree = cKDTree(pts)
    d, i = tree.query(queries, k=5, distance_upper_bound=1.0)
    got_d = np.asarray(res.sqdist)
    got_v = np.asarray(res.valid)
    for qi in range(300):
        ref_valid = np.isfinite(d[qi])
        assert got_v[qi].sum() == ref_valid.sum(), qi
        np.testing.assert_allclose(
            np.sort(got_d[qi][got_v[qi]]), np.sort(d[qi][ref_valid] ** 2), rtol=1e-3, atol=1e-5
        )


def test_query_indices_point_to_original_array():
    pts = RNG.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    q = pts[:50] + 1e-3
    grid = knn.build(jnp.asarray(pts), jnp.ones(500, bool), cell_size=1.0, table_size=1024)
    res = knn.query(grid, jnp.asarray(q), jnp.ones(50, bool), k=1, candidates_per_cell=32)
    idx = np.asarray(res.idx)[:, 0]
    np.testing.assert_array_equal(idx, np.arange(50))


def test_mask_respected():
    pts = RNG.uniform(-5, 5, size=(200, 3)).astype(np.float32)
    mask = np.zeros(200, bool)
    mask[:100] = True
    grid = knn.build(jnp.asarray(pts), jnp.asarray(mask), cell_size=2.0, table_size=512)
    res = knn.query(grid, jnp.asarray(pts[100:]), jnp.ones(100, bool), k=3,
                    candidates_per_cell=64)
    idx = np.asarray(res.idx)
    valid = np.asarray(res.valid)
    assert (idx[valid] < 100).all()


def test_nearest_in_set_exact():
    pts = RNG.uniform(-5, 5, size=(300, 3)).astype(np.float32)
    q = RNG.uniform(-5, 5, size=(40, 3)).astype(np.float32)
    res = knn.nearest_in_set(jnp.asarray(pts), jnp.ones(300, bool), jnp.asarray(q), jnp.ones(40, bool), k=4)
    tree = cKDTree(pts)
    d, i = tree.query(q, k=4)
    np.testing.assert_allclose(np.sort(np.asarray(res.sqdist), axis=1), np.sort(d**2, axis=1), rtol=1e-4, atol=1e-5)


def test_radius_count():
    pts = RNG.uniform(-5, 5, size=(1000, 3)).astype(np.float32)
    q = RNG.uniform(-4, 4, size=(50, 3)).astype(np.float32)
    grid = knn.build(jnp.asarray(pts), jnp.ones(1000, bool), cell_size=1.0, table_size=2048)
    cnt = np.asarray(knn.radius_count(grid, jnp.asarray(q), jnp.ones(50, bool), radius=1.0,
                                      candidates_per_cell=64))
    tree = cKDTree(pts)
    expect = np.array([len(tree.query_ball_point(p, 1.0)) for p in q])
    np.testing.assert_array_equal(cnt, expect)


def test_pallas_query_interpret_matches_xla():
    from msst_tpu.ops.knn_pallas import query_pallas

    pts = RNG.uniform(-10, 10, size=(1500, 3)).astype(np.float32)
    q = RNG.uniform(-9, 9, size=(256, 3)).astype(np.float32)
    mask = np.ones(1500, bool)
    mask[:100] = False
    grid = knn.build(jnp.asarray(pts), jnp.asarray(mask), 1.0, 2048)
    a = knn.query(grid, jnp.asarray(q), jnp.ones(256, bool), k=5,
                  candidates_per_cell=32, max_sqdist=1.0)
    b = query_pallas(grid, jnp.asarray(q), jnp.ones(256, bool), k=5,
                     candidates_per_cell=32, max_sqdist=1.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_allclose(
        np.asarray(a.sqdist)[np.asarray(a.valid)],
        np.asarray(b.sqdist)[np.asarray(b.valid)], atol=1e-5)
    np.testing.assert_array_equal(
        np.where(np.asarray(a.valid), np.asarray(a.idx), -1),
        np.where(np.asarray(b.valid), np.asarray(b.idx), -1))


def test_nearest1_brute_matches_ckdtree():
    # exact chunked dense 1-NN (the loop-closure ICP correspondence search)
    pts = RNG.uniform(-10, 10, size=(3000, 3)).astype(np.float32)
    q = RNG.uniform(-9, 9, size=(500, 3)).astype(np.float32)
    tmask = np.ones(3000, bool)
    tmask[::7] = False
    qmask = np.ones(500, bool)
    qmask[::11] = False
    res = knn.nearest1_brute(jnp.asarray(pts), jnp.asarray(tmask),
                             jnp.asarray(q), jnp.asarray(qmask), chunk=1024)
    d, i = cKDTree(pts[tmask]).query(q, k=1)
    full_idx = np.flatnonzero(tmask)[i]
    v = np.asarray(res.valid)[:, 0]
    np.testing.assert_array_equal(v, qmask)
    np.testing.assert_array_equal(np.asarray(res.idx)[qmask, 0],
                                  full_idx[qmask])
    # |q|^2 - 2 q.x + |x|^2 expansion: ~1e-4 relative error vs the direct
    # (q - x)^2 form at coords ~10 (cancellation) — fine for NN selection
    np.testing.assert_allclose(np.asarray(res.sqdist)[qmask, 0],
                               (d[qmask] ** 2), rtol=2e-3, atol=1e-4)


def test_nearest1_brute_all_masked_target():
    pts = RNG.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    q = RNG.uniform(-1, 1, size=(16, 3)).astype(np.float32)
    res = knn.nearest1_brute(jnp.asarray(pts), jnp.zeros(64, bool),
                             jnp.asarray(q), jnp.ones(16, bool))
    assert not np.asarray(res.valid).any()
