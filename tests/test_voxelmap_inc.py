"""Incremental voxel moment tables (ops/voxelmap.py VoxelMoments):
numpy-oracle tests for points_to_moments / merge / evict / centroids, and
equivalence of the two-level (moments -> centroids -> build) path against the
direct downsample-then-build path used by the full map rebuild."""

import jax.numpy as jnp
import numpy as np
import pytest

from msst_tpu.ops import voxelmap
from msst_tpu.ops.pointcloud import Cloud
from msst_tpu.ops.voxel import voxel_downsample_packed

LEAF = 0.4
ORIGIN = np.array([1.0, -2.0, 0.5], np.float32)


def _cloud(rng, n, lo=-20.0, hi=20.0):
    xyz = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    mask = rng.uniform(size=n) < 0.9
    return xyz, mask


def _oracle_cells(xyz, mask):
    """dict cell-coord -> (sum_residual, count) in the packed grid."""
    cells = {}
    c = np.floor((xyz - ORIGIN) / LEAF).astype(np.int64)
    for i in range(len(xyz)):
        if not mask[i]:
            continue
        k = tuple(c[i])
        center = ORIGIN + (c[i] + 0.5) * LEAF
        r, n = cells.get(k, (np.zeros(3), 0))
        cells[k] = (r + (xyz[i].astype(np.float64) - center), n + 1)
    return cells


def _table_cells(m):
    """dict cell-coord -> (rsum, cnt) from a VoxelMoments table."""
    key = np.asarray(m.key)
    out = {}
    for i in range(len(key)):
        if key[i] >= 2**30:
            continue
        c = ((key[i] >> 20) & 1023 - 0, (key[i] >> 10) & 1023, key[i] & 1023)
        c = tuple(int(x) - 512 for x in c)
        out[c] = (np.asarray(m.rsum[i]), float(m.cnt[i]))
    return out


def test_points_to_moments_oracle():
    rng = np.random.default_rng(0)
    xyz, mask = _cloud(rng, 4000)
    m = voxelmap.points_to_moments(jnp.asarray(xyz), jnp.asarray(mask),
                                   LEAF, jnp.asarray(ORIGIN), 4096)
    got = _table_cells(m)
    want = _oracle_cells(xyz, mask)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k][0], want[k][0], atol=1e-4)
        assert got[k][1] == want[k][1]
    # sorted-by-key invariant
    key = np.asarray(m.key)
    assert (np.diff(key.astype(np.int64)) >= 0).all()


def test_merge_matches_union():
    rng = np.random.default_rng(1)
    xa, ma = _cloud(rng, 3000)
    xb, mb = _cloud(rng, 2000)
    A = voxelmap.points_to_moments(jnp.asarray(xa), jnp.asarray(ma), LEAF,
                                   jnp.asarray(ORIGIN), 3072)
    B = voxelmap.points_to_moments(jnp.asarray(xb), jnp.asarray(mb), LEAF,
                                   jnp.asarray(ORIGIN), 2048)
    M = voxelmap.merge_moments(A, B, 6144)
    U = voxelmap.points_to_moments(
        jnp.asarray(np.concatenate([xa, xb])),
        jnp.asarray(np.concatenate([ma, mb])), LEAF, jnp.asarray(ORIGIN),
        6144)
    got, want = _table_cells(M), _table_cells(U)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k][0], want[k][0], atol=1e-3)
        assert got[k][1] == want[k][1]


def test_evict_restores_exact_key_set():
    rng = np.random.default_rng(2)
    xa, ma = _cloud(rng, 3000)
    xb, mb = _cloud(rng, 2000)
    A = voxelmap.points_to_moments(jnp.asarray(xa), jnp.asarray(ma), LEAF,
                                   jnp.asarray(ORIGIN), 3072)
    B = voxelmap.points_to_moments(jnp.asarray(xb), jnp.asarray(mb), LEAF,
                                   jnp.asarray(ORIGIN), 2048)
    M = voxelmap.merge_moments(A, B, 6144)
    # evict B: counts cancel exactly, emptied cells die
    M2 = voxelmap.merge_moments(M, voxelmap.scale_moments(B, -1.0), 6144)
    got, want = _table_cells(M2), _table_cells(A)
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        np.testing.assert_allclose(got[k][0], want[k][0], atol=1e-3)


def test_trim_drops_far_cells():
    rng = np.random.default_rng(3)
    xa, ma = _cloud(rng, 3000)
    A = voxelmap.points_to_moments(jnp.asarray(xa), jnp.asarray(ma), LEAF,
                                   jnp.asarray(ORIGIN), 4096)
    center = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    M = voxelmap.merge_moments(A, voxelmap.empty_moments(16), 4096,
                               trim_center=center, trim_radius=10.0,
                               leaf=LEAF, origin=jnp.asarray(ORIGIN))
    for c, (r, n) in _table_cells(M).items():
        cc = ORIGIN + (np.asarray(c) + 0.5) * LEAF
        assert np.linalg.norm(cc) <= 10.0 + 1e-5
    # and every near cell survived
    want = {c for c in _oracle_cells(xa, ma)
            if np.linalg.norm(ORIGIN + (np.asarray(c) + 0.5) * LEAF) <= 10.0}
    assert set(_table_cells(M)) == want


def test_centroids_match_voxel_downsample():
    rng = np.random.default_rng(4)
    xyz, mask = _cloud(rng, 4000)
    m = voxelmap.points_to_moments(jnp.asarray(xyz), jnp.asarray(mask), LEAF,
                                   jnp.asarray(ORIGIN), 4096)
    cx, cmask = voxelmap.moments_centroids(m, LEAF, jnp.asarray(ORIGIN))
    ds = voxel_downsample_packed(
        Cloud.create(jnp.asarray(xyz), mask=jnp.asarray(mask)), LEAF,
        jnp.asarray(ORIGIN), capacity=4096)
    got = np.asarray(cx)[np.asarray(cmask)]
    want = np.asarray(ds.xyz)[np.asarray(ds.mask)]
    got = got[np.lexsort(got.T)]
    want = want[np.lexsort(want.T)]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_feature_map_from_moments_matches_rebuild():
    """build(centroids(moments)) ~= build(voxel_downsample(points)) — the
    incremental path's fit equals the full-rebuild fit."""
    rng = np.random.default_rng(5)
    # plane-ish points: a few planes plus noise
    pts = []
    for z in (0.0, 2.0, 4.0):
        p = rng.uniform(-10, 10, size=(3000, 3)).astype(np.float32)
        p[:, 2] = z + rng.normal(scale=0.02, size=3000)
        pts.append(p)
    xyz = np.concatenate(pts).astype(np.float32)
    mask = np.ones(len(xyz), bool)
    origin = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)

    m = voxelmap.points_to_moments(jnp.asarray(xyz), jnp.asarray(mask), LEAF,
                                   origin, 16384)
    cx, cmask = voxelmap.moments_centroids(m, LEAF, origin)
    via_moments = voxelmap.build(cx, cmask, 1.0, 4096, "plane",
                                 table_size=8192, origin=origin)

    ds = voxel_downsample_packed(
        Cloud.create(jnp.asarray(xyz)), LEAF, origin, capacity=16384)
    direct = voxelmap.build(ds.xyz, ds.mask, 1.0, 4096, "plane",
                            table_size=8192, origin=origin)

    # same number of valid feature voxels, and querying both maps at probe
    # points gives the same planes
    assert int(via_moments.valid.sum()) == int(direct.valid.sum())
    q = rng.uniform(-8, 8, size=(256, 3)).astype(np.float32)
    q[:, 2] = rng.choice([0.0, 2.0, 4.0], size=256)
    qm = jnp.ones(256, bool)
    h1 = voxelmap.lookup(via_moments, jnp.asarray(q), qm)
    h2 = voxelmap.lookup(direct, jnp.asarray(q), qm)
    np.testing.assert_array_equal(np.asarray(h1.found), np.asarray(h2.found))
    np.testing.assert_allclose(np.asarray(h1.mean), np.asarray(h2.mean),
                               atol=1e-3)
    dirdot = np.abs(np.sum(np.asarray(h1.direction) * np.asarray(h2.direction),
                           axis=1))
    np.testing.assert_allclose(dirdot[np.asarray(h1.found)], 1.0, atol=1e-3)


def test_merge_capacity_truncates_deterministically():
    rng = np.random.default_rng(6)
    xa, ma = _cloud(rng, 4000)
    A = voxelmap.points_to_moments(jnp.asarray(xa), jnp.asarray(ma), LEAF,
                                   jnp.asarray(ORIGIN), 4096)
    n_alive = int((np.asarray(A.key) < 2**30).sum())
    cap = n_alive // 2
    M = voxelmap.merge_moments(A, voxelmap.empty_moments(16), cap)
    key = np.asarray(M.key)
    assert (key < 2**30).sum() == cap
    # lowest keys survive (documented deterministic policy)
    np.testing.assert_array_equal(
        key, np.sort(np.asarray(A.key)[np.asarray(A.key) < 2**30])[:cap])


# ---------------------------------------------------------------------------
# hierarchical key packing (group_bits) + the presorted fit fast path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_pack_rel_roundtrip_and_sentinel_headroom(k):
    rng = np.random.default_rng(11)
    rel = rng.integers(0, 1024, size=(2000, 3)).astype(np.int32)
    key = voxelmap._pack_rel(jnp.asarray(rel), k)
    back = voxelmap._unpack_rel(key, k)
    np.testing.assert_array_equal(np.asarray(back), rel)
    assert int(jnp.max(key)) < 2**30  # sentinel stays the max


def test_hierarchical_key_groups_coarse_cells():
    """Sorting by the hierarchical fine key groups coarse cells contiguously
    (the property the presorted fit needs); the plain fine key does NOT —
    e.g. fine (0,0,2) < (0,1,0) at ratio 2 maps to coarse (0,0,1) > (0,0,0)."""
    rng = np.random.default_rng(12)
    rel = rng.integers(0, 64, size=(4000, 3)).astype(np.int32)
    for k in (1, 2):
        key = np.asarray(voxelmap._pack_rel(jnp.asarray(rel), k))
        order = np.argsort(key, kind="stable")
        coarse = rel[order] >> k
        runs = np.any(coarse != np.roll(coarse, 1, axis=0), axis=1)
        runs[0] = True
        n_runs = int(runs.sum())
        n_cells = len(np.unique([tuple(c) for c in coarse], axis=0))
        assert n_runs == n_cells  # each coarse cell = exactly one run
    # the plain packing fragments (regression for the round-3 bug)
    key0 = np.asarray(voxelmap._pack_rel(jnp.asarray(rel), 0))
    order = np.argsort(key0, kind="stable")
    coarse = rel[order] >> 1
    runs = np.any(coarse != np.roll(coarse, 1, axis=0), axis=1)
    runs[0] = True
    n_cells = len(np.unique([tuple(c) for c in coarse], axis=0))
    assert int(runs.sum()) > n_cells


@pytest.mark.parametrize("kind,ratio_k", [("plane", 1), ("plane", 2),
                                          ("line", 2)])
def test_presorted_fit_no_duplicates(kind, ratio_k):
    """build(presorted=True) on a hierarchical moment table == the sorting
    fit: same cells (no duplicate fragments), same Gaussians.  Round-3
    regression: plain-packed moment tables fragmented each coarse cell into
    many runs, saturating capacity with duplicates and dropping coverage."""
    rng = np.random.default_rng(13)
    pts = rng.uniform(-6, 6, (6000, 3)).astype(np.float32)
    mask = np.ones(len(pts), bool)
    origin = jnp.asarray(ORIGIN)
    fine = 0.2
    coarse = fine * (1 << ratio_k)

    mom = voxelmap.points_to_moments(jnp.asarray(pts), jnp.asarray(mask),
                                     fine, origin, 8192, group_bits=ratio_k)
    cx, cm = voxelmap.moments_centroids(mom, fine, origin,
                                        group_bits=ratio_k)
    pre = voxelmap.build(cx, cm, coarse, 4096, kind, table_size=8192,
                         origin=origin, presorted=True)
    ref = voxelmap.build(cx, cm, coarse, 4096, kind, table_size=8192,
                         origin=origin, presorted=False)

    def cells(vm):
        keys = np.asarray(voxelmap._coord_key(vm.coords))[np.asarray(vm.mask)]
        assert len(np.unique(keys)) == len(keys)  # no duplicates
        stats = {}
        m = np.asarray(vm.mask)
        for i in np.flatnonzero(m):
            stats[int(np.asarray(voxelmap._coord_key(vm.coords))[i])] = (
                np.asarray(vm.mean[i]), np.asarray(vm.direction[i]),
                float(vm.count[i]), bool(vm.valid[i]))
        return stats

    a, b = cells(pre), cells(ref)
    assert set(a) == set(b)
    for key in a:
        np.testing.assert_allclose(a[key][0], b[key][0], atol=1e-4)
        assert a[key][2] == b[key][2]
        assert a[key][3] == b[key][3]
        if a[key][3]:  # direction defined up to sign
            assert abs(float(np.dot(a[key][1], b[key][1]))) > 1 - 1e-4


def test_merge_union_hierarchical_keys():
    """merge_moments with group_bits: union parity + trim decode use the
    hierarchical centers."""
    rng = np.random.default_rng(14)
    xa, ma = _cloud(rng, 3000, -10, 10)
    xb, mb = _cloud(rng, 3000, -10, 10)
    k = 2
    A = voxelmap.points_to_moments(jnp.asarray(xa), jnp.asarray(ma), LEAF,
                                   jnp.asarray(ORIGIN), 4096, group_bits=k)
    B = voxelmap.points_to_moments(jnp.asarray(xb), jnp.asarray(mb), LEAF,
                                   jnp.asarray(ORIGIN), 4096, group_bits=k)
    M = voxelmap.merge_moments(A, B, 8192, group_bits=k)
    U = voxelmap.points_to_moments(
        jnp.asarray(np.concatenate([xa, xb])),
        jnp.asarray(np.concatenate([ma, mb])), LEAF, jnp.asarray(ORIGIN),
        8192, group_bits=k)
    np.testing.assert_array_equal(np.asarray(M.key), np.asarray(U.key))
    np.testing.assert_allclose(np.asarray(M.cnt), np.asarray(U.cnt))
    np.testing.assert_allclose(np.asarray(M.rsum), np.asarray(U.rsum),
                               atol=1e-4)
    # trim: centers decode with the hierarchical unpacking
    T = voxelmap.merge_moments(A, voxelmap.empty_moments(16), 4096,
                               trim_center=jnp.asarray(ORIGIN),
                               trim_radius=4.0, leaf=LEAF,
                               origin=jnp.asarray(ORIGIN), group_bits=k)
    keys = np.asarray(T.key)
    live = keys < 2**30
    centers = np.asarray(voxelmap._decode_center(
        jnp.asarray(keys[live]), LEAF, jnp.asarray(ORIGIN), group_bits=k))
    assert np.all(np.linalg.norm(centers - ORIGIN, axis=1) <= 4.0 + 1e-5)


def test_overflow_stats_counters():
    """return_stats surfaces the overflow-dropped cell count from
    points_to_moments / merge_moments / voxel_downsample (VERDICT r4 #6 —
    the silent spatially-biased drop that diverged the tiny profile)."""
    from msst_tpu.ops.voxel import voxel_downsample

    # 4x4x4 = 64 distinct cells (one point each), capacity 8
    g = np.arange(4, dtype=np.float32)
    xyz = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                   axis=-1).reshape(-1, 3) * LEAF + ORIGIN + 0.5 * LEAF
    mask = np.ones(len(xyz), bool)
    m8, dropped = voxelmap.points_to_moments(
        jnp.asarray(xyz), jnp.asarray(mask), LEAF, jnp.asarray(ORIGIN), 8,
        return_stats=True)
    assert int(dropped) == 64 - 8
    # no overflow -> zero
    m64, d0 = voxelmap.points_to_moments(
        jnp.asarray(xyz), jnp.asarray(mask), LEAF, jnp.asarray(ORIGIN), 64,
        return_stats=True)
    assert int(d0) == 0

    # merge two disjoint 8-cell tables into capacity 8 -> 8 dropped
    shift = np.asarray([16.0 * LEAF, 0, 0], np.float32)
    mb = voxelmap.points_to_moments(
        jnp.asarray(xyz[:8] + shift), jnp.asarray(mask[:8]), LEAF,
        jnp.asarray(ORIGIN), 8)
    merged, dm = voxelmap.merge_moments(m8, mb, 8, return_stats=True)
    assert int(dm) == 8
    _, dm0 = voxelmap.merge_moments(m8, mb, 16, return_stats=True)
    assert int(dm0) == 0

    # voxel_downsample: 64 occupied voxels into capacity 16
    c, dv = voxel_downsample(Cloud.create(jnp.asarray(xyz)), LEAF,
                             capacity=16, return_stats=True)
    assert int(dv) == 64 - 16
    assert int(np.asarray(c.mask).sum()) == 16
