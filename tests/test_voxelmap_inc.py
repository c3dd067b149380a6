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
