import jax.numpy as jnp
import numpy as np

from msst_tpu.ops import voxel
from msst_tpu.ops.pointcloud import Cloud

RNG = np.random.default_rng(2)


def ref_voxel_centroids(xyz, attrs, leaf):
    """NumPy oracle: centroid per occupied voxel (PCL VoxelGrid semantics)."""
    coords = np.floor(xyz / leaf).astype(np.int64)
    out = {}
    for c, p, a in zip(map(tuple, coords), xyz, attrs):
        s = out.setdefault(c, [np.zeros(3), np.zeros(attrs.shape[1]), 0])
        s[0] += p
        s[1] += a
        s[2] += 1
    return {c: (s[0] / s[2], s[1] / s[2]) for c, s in out.items()}


def test_voxel_downsample_matches_oracle():
    xyz = RNG.uniform(-3, 3, size=(500, 3)).astype(np.float32)
    attrs = RNG.uniform(size=(500, 2)).astype(np.float32)
    cloud = Cloud.create(jnp.asarray(xyz), attrs=jnp.asarray(attrs))
    out = voxel.voxel_downsample(cloud, leaf=0.5)
    expect = ref_voxel_centroids(xyz, attrs, 0.5)

    m = np.asarray(out.mask)
    assert m.sum() == len(expect)
    got_xyz = np.asarray(out.xyz)[m]
    got_attrs = np.asarray(out.attrs)[m]
    for p, a in zip(got_xyz, got_attrs):
        c = tuple(np.floor(p / 0.5).astype(np.int64))
        assert c in expect, c
        np.testing.assert_allclose(p, expect[c][0], atol=1e-4)
        np.testing.assert_allclose(a, expect[c][1], atol=1e-4)


def test_voxel_downsample_respects_mask_and_capacity():
    xyz = RNG.uniform(-3, 3, size=(300, 3)).astype(np.float32)
    mask = RNG.uniform(size=300) < 0.5
    cloud = Cloud.create(jnp.asarray(xyz), mask=jnp.asarray(mask))
    out = voxel.voxel_downsample(cloud, leaf=0.4, capacity=64)
    expect = ref_voxel_centroids(xyz[mask], np.zeros((mask.sum(), 0)), 0.4)
    n = min(len(expect), 64)
    assert int(out.count) == n


def test_voxel_downsample_extra_key_per_ring():
    # two points in the same voxel but different rings survive separately
    xyz = np.array([[0.1, 0.1, 0.1], [0.12, 0.12, 0.12]], np.float32)
    ring = jnp.asarray([0, 1], dtype=jnp.int32)
    cloud = Cloud.create(jnp.asarray(xyz))
    merged = voxel.voxel_downsample(cloud, leaf=1.0)
    assert int(merged.count) == 1
    kept = voxel.voxel_downsample(cloud, leaf=1.0, extra_key=ring)
    assert int(kept.count) == 2


def test_voxel_downsample_no_hash_matches_default_set():
    """uniform_overflow=False (no hash sort key) must produce the same voxel
    SET and centroids as the default — only the output order may differ."""
    xyz = RNG.uniform(-4, 4, size=(400, 3)).astype(np.float32)
    attrs = RNG.uniform(size=(400, 1)).astype(np.float32)
    cloud = Cloud.create(jnp.asarray(xyz), attrs=jnp.asarray(attrs))
    a = voxel.voxel_downsample(cloud, leaf=0.5)
    b = voxel.voxel_downsample(cloud, leaf=0.5, uniform_overflow=False)
    assert int(a.count) == int(b.count)

    def as_set(out):
        m = np.asarray(out.mask)
        rows = np.concatenate([np.asarray(out.xyz)[m],
                               np.asarray(out.attrs)[m]], axis=1)
        # align rows by their (noise-free) integer voxel cell, not by the
        # f32 centroids themselves (summation order differs between the
        # two sorts, so centroid-keyed ordering would misalign rows)
        cells = np.floor(rows[:, :3] / 0.5).astype(np.int64)
        return rows[np.lexsort(cells.T)]

    # the two variants sum each cell's rows in different orders -> f32
    # noise at the 1e-5 level; anything larger would mean different groups
    np.testing.assert_allclose(as_set(a), as_set(b), atol=1e-4)


def test_voxel_downsample_clamps_far_cells_to_domain_boundary():
    """Points beyond the +-1024-cell packed cx/cy domain merge into boundary
    cells instead of aliasing back into the interior."""
    xyz = np.array([[0.1, 0.1, 0.1],        # interior
                    [5000.0, 0.1, 0.1],     # far +x: clamps to cx=1023
                    [9000.0, 0.1, 0.1]],    # even farther: same boundary cell
                   np.float32)
    out = voxel.voxel_downsample(Cloud.create(jnp.asarray(xyz)), leaf=1.0)
    # the two far points merge (both clamped) and collapse onto the boundary
    # cell (residuals clip to leaf/2 so they cannot poison the prefix sums);
    # the interior point survives alone, exactly
    assert int(out.count) == 2
    got = np.asarray(out.xyz)[np.asarray(out.mask)]
    assert (np.linalg.norm(got - xyz[0], axis=1) < 1e-5).any()
    assert (np.abs(got[:, 0] - 1024.0) < 1e-2).any()  # boundary cell edge


def test_voxel_downsample_world_frame_far_from_origin():
    """A spatially-compact cloud hundreds of meters from the world origin
    (loop-closure submaps / multi-session merges / map save downsample
    world-frame keyframe clouds) must downsample EXACTLY — the packed-key
    domain is re-centered per call (round-3 advisor high finding: without
    re-centering, a cloud at 600 m collapsed onto the x=409.6 m boundary
    plane at the 0.4 m loop leaf)."""
    base = RNG.uniform(-8, 8, size=(400, 3)).astype(np.float32)
    for offset in ([600.0, -350.0, 40.0], [2000.0, 2000.0, -100.0]):
        xyz = base + np.asarray(offset, np.float32)
        out = voxel.voxel_downsample(Cloud.create(jnp.asarray(xyz)), leaf=0.4)
        expect = ref_voxel_centroids(xyz, np.zeros((len(xyz), 0)), 0.4)
        m = np.asarray(out.mask)
        assert m.sum() == len(expect), (offset, m.sum(), len(expect))
        got = np.asarray(out.xyz)[m]
        # no boundary-plane collapse: every centroid sits in its own cell
        for p in got:
            c = tuple(np.floor(p / 0.4).astype(np.int64))
            assert c in expect, (offset, c)
            np.testing.assert_allclose(p, expect[c][0], atol=2e-3)


def test_voxel_downsample_first_keeps_input_order_points():
    xyz = RNG.uniform(-2, 2, size=(200, 3)).astype(np.float32)
    cloud = Cloud.create(jnp.asarray(xyz))
    out = voxel.voxel_downsample_first(cloud, leaf=0.5)
    m = np.asarray(out.mask)
    got = np.asarray(out.xyz)[m]
    # each kept point is an actual input point
    d = np.min(np.linalg.norm(got[:, None] - xyz[None], axis=2), axis=1)
    assert d.max() == 0
    # one point per voxel
    cells = set(map(tuple, np.floor(got / 0.5).astype(np.int64)))
    assert len(cells) == len(got)


def test_voxel_downsample_packed_matches_lexsort():
    xyz = RNG.uniform(-30, 30, size=(2000, 3)).astype(np.float32)
    mask = RNG.uniform(size=2000) < 0.8
    cloud = Cloud.create(jnp.asarray(xyz), mask=jnp.asarray(mask))
    a = voxel.voxel_downsample(cloud, leaf=0.5, capacity=4096)
    origin = jnp.asarray([1.0, -2.0, 0.5])
    b = voxel.voxel_downsample_packed(cloud, 0.5, origin, capacity=4096)
    na, nb = int(a.count), int(b.count)
    assert na == nb
    # same centroid sets (order differs)
    pa = np.asarray(a.xyz)[np.asarray(a.mask)]
    pb = np.asarray(b.xyz)[np.asarray(b.mask)]
    pa = pa[np.lexsort(pa.T)]
    pb = pb[np.lexsort(pb.T)]
    np.testing.assert_allclose(pa, pb, atol=1e-5)


def test_voxel_downsample_packed_drops_out_of_range():
    xyz = np.array([[0.0, 0, 0], [1000.0, 0, 0]], np.float32)
    cloud = Cloud.create(jnp.asarray(xyz))
    out = voxel.voxel_downsample_packed(cloud, 1.0, jnp.zeros(3), capacity=8)
    assert int(out.count) == 1


def test_voxelmap_origin_grid_no_fragmentation():
    """build(origin=...) must sort, segment, and key on ONE grid: a
    non-leaf-multiple origin previously interleaved absolute cells in the
    sort and fragmented them into duplicate voxel entries (ADVICE r1)."""
    import jax.numpy as jnp
    import numpy as np

    from msst_tpu.ops import voxelmap

    rng = np.random.default_rng(0)
    leaf = 0.4
    origin = np.array([1.17, -2.31, 0.55], np.float32)  # frac(origin/leaf)!=0
    pts = (origin + rng.uniform(-5, 5, size=(600, 3))).astype(np.float32)
    m = voxelmap.build(jnp.asarray(pts), jnp.ones(len(pts), bool), leaf,
                       capacity=2048, kind="plane", table_size=4096,
                       min_points=1, origin=jnp.asarray(origin))
    occ = np.asarray(m.mask)
    coords = np.asarray(m.coords)[occ]
    # every occupied voxel coord appears exactly once
    uniq = np.unique(coords, axis=0)
    assert len(uniq) == len(coords), (len(uniq), len(coords))
    # counts match a NumPy oracle on the same origin-relative grid
    oracle_c = np.floor((pts - origin) / leaf).astype(np.int64)
    _, oracle_counts = np.unique(oracle_c, axis=0, return_counts=True)
    counts = np.sort(np.asarray(m.count)[occ].astype(np.int64))
    np.testing.assert_array_equal(counts, np.sort(oracle_counts))
    # lookup finds the containing voxel for every member point
    hit = voxelmap.lookup(m, jnp.asarray(pts), jnp.ones(len(pts), bool))
    assert bool(np.asarray(hit.found).all())


def test_voxelmap_lookup_cat_matches_separate():
    """lookup_cat (fused two-map probe, one concatenated gather) must equal
    two separate lookups field for field — different leaf sizes, origins,
    and table sizes between the two maps."""
    from msst_tpu.ops import voxelmap

    rng = np.random.default_rng(11)
    pa = rng.uniform(-8, 8, (4096, 3)).astype(np.float32)
    pa[:, 2] = 0.03 * rng.standard_normal(4096)               # planar
    pb = rng.uniform(-6, 6, (2048, 3)).astype(np.float32)
    pb[:, :2] = np.round(pb[:, :2])                           # line-ish
    va = voxelmap.build(jnp.asarray(pa), jnp.ones(4096, bool), 0.5, 1024,
                        "plane", table_size=2048,
                        origin=jnp.asarray([0.2, -0.1, 0.0]))
    vb = voxelmap.build(jnp.asarray(pb), jnp.ones(2048, bool), 1.0, 512,
                        "line", table_size=1024)

    qa = rng.uniform(-8, 8, (512, 3)).astype(np.float32)
    qb = rng.uniform(-6, 6, (768, 3)).astype(np.float32)
    ma = rng.random(512) > 0.1
    mb = rng.random(768) > 0.1
    ha = voxelmap.lookup(va, jnp.asarray(qa), jnp.asarray(ma))
    hb = voxelmap.lookup(vb, jnp.asarray(qb), jnp.asarray(mb))
    cat = voxelmap.lookup_cat(
        va, vb, jnp.asarray(np.concatenate([qa, qb])),
        jnp.asarray(np.concatenate([ma, mb])), 512)
    for field in ("idx", "found", "mean", "direction", "d"):
        want = np.concatenate([np.asarray(getattr(ha, field)),
                               np.asarray(getattr(hb, field))])
        np.testing.assert_array_equal(np.asarray(getattr(cat, field)), want,
                                      err_msg=field)


def test_voxelmap_lookup_pallas_matches_xla():
    """Pallas voxel-feature lookup (interpret mode on CPU) == XLA lookup."""
    import jax

    from msst_tpu.ops import voxelmap
    from msst_tpu.ops.voxelmap_pallas import lookup_pallas

    rng = np.random.default_rng(5)
    pts = rng.uniform(-8, 8, (4096, 3)).astype(np.float32)
    pts[:, 2] = 0.05 * rng.standard_normal(4096)  # planar world
    mask = np.ones(4096, bool)
    vm = voxelmap.build(jnp.asarray(pts), jnp.asarray(mask), 1.0, 1024,
                        "plane", table_size=2048)

    q = rng.uniform(-8, 8, (512, 3)).astype(np.float32)
    q[:, 2] = 0.3 * rng.standard_normal(512)
    qm = np.ones(512, bool)
    a = voxelmap.lookup(vm, jnp.asarray(q), jnp.asarray(qm))
    b = lookup_pallas(vm, jnp.asarray(q), jnp.asarray(qm), interpret=True)
    np.testing.assert_array_equal(np.asarray(a.found), np.asarray(b.found))
    f = np.asarray(a.found)
    np.testing.assert_allclose(np.asarray(a.mean)[f], np.asarray(b.mean)[f],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.direction)[f],
                               np.asarray(b.direction)[f], atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.d)[f], np.asarray(b.d)[f],
                               atol=1e-6)


def test_scan_to_map_voxel_pallas_matches_xla():
    """scan_to_map_voxel(use_pallas=True) (interpreted) == the XLA path."""
    import jax

    from msst_tpu.ops import registration, voxelmap

    rng = np.random.default_rng(9)
    # planar ground + two walls -> well-constrained registration
    n = 4096
    ground = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    ground[:, 2] = 0.02 * rng.standard_normal(n)
    wall = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    wall[:, 1] = 8.0 + 0.02 * rng.standard_normal(n)
    wall[:, 2] = np.abs(wall[:, 2]) % 3
    map_pts = np.concatenate([ground, wall])
    mask = np.ones(len(map_pts), bool)

    svm = voxelmap.build(jnp.asarray(map_pts), jnp.asarray(mask), 1.0, 4096,
                         "plane", table_size=8192)
    cvm = voxelmap.build(jnp.zeros((8, 3), np.float32), jnp.zeros(8, bool),
                         1.0, 8, "line", table_size=16)

    scan = map_pts[rng.choice(len(map_pts), 1024, replace=False)]
    true_pose = np.asarray([0.01, -0.02, 0.05, 0.3, -0.2, 0.1], np.float32)
    from msst_tpu.ops import se3
    T = se3.Pose.from_vec6(jnp.asarray(true_pose))
    scan_local = np.asarray(T.inverse().apply(jnp.asarray(scan)))
    cmask = np.zeros(8, bool)

    kw = dict(max_iters=10, eig_threshold=10.0)
    a = registration.scan_to_map_voxel(
        jnp.zeros((8, 3), np.float32), jnp.asarray(cmask),
        jnp.asarray(scan_local), jnp.asarray(np.ones(1024, bool)),
        cvm, svm, jnp.zeros(6, jnp.float32), use_pallas=False, **kw)
    b = registration.scan_to_map_voxel(
        jnp.zeros((8, 3), np.float32), jnp.asarray(cmask),
        jnp.asarray(scan_local), jnp.asarray(np.ones(1024, bool)),
        cvm, svm, jnp.zeros(6, jnp.float32), use_pallas=True, **kw)
    np.testing.assert_allclose(np.asarray(a.pose), np.asarray(b.pose),
                               atol=1e-5)
    # and both recover the true pose (z / roll / pitch well constrained by
    # the ground; y by the wall)
    for res in (a, b):
        pose = np.asarray(res.pose)
        assert abs(pose[5] - true_pose[5]) < 0.05
        assert abs(pose[4] - true_pose[4]) < 0.1
