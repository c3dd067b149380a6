import jax.numpy as jnp
import numpy as np

from msst_tpu.ops import pointcloud as pc
from msst_tpu.ops import se3

RNG = np.random.default_rng(1)


def make_cloud(n=100, n_attrs=2):
    xyz = RNG.normal(size=(n, 3)).astype(np.float32) * 5
    attrs = RNG.uniform(size=(n, n_attrs)).astype(np.float32)
    return pc.Cloud.create(jnp.asarray(xyz), attrs=jnp.asarray(attrs))


def test_nan_repair():
    c = make_cloud()
    xyz = np.array(c.xyz)
    xyz[3, 1] = np.nan
    xyz[7, 0] = np.inf
    c = c._replace(xyz=jnp.asarray(xyz))
    out = pc.nan_repair(c)
    m = np.asarray(out.mask)
    assert not m[3] and not m[7]
    assert m.sum() == 98
    assert np.isfinite(np.asarray(out.xyz)).all()


def test_crop_box_inside_outside():
    c = make_cloud(1000)
    inside = pc.crop_box(c, [-1, -1, -1], [1, 1, 1], keep_inside=True)
    outside = pc.crop_box(c, [-1, -1, -1], [1, 1, 1], keep_inside=False)
    mi, mo = np.asarray(inside.mask), np.asarray(outside.mask)
    assert (mi | mo).all() and not (mi & mo).any()
    xyz = np.asarray(c.xyz)
    expect = (np.abs(xyz) <= 1).all(axis=1)
    np.testing.assert_array_equal(mi, expect)


def test_compact_stable():
    c = make_cloud(50)
    mask = np.zeros(50, bool)
    keep = [3, 10, 11, 40]
    mask[keep] = True
    out = pc.compact(c.with_mask(jnp.asarray(mask)), capacity=8)
    assert int(out.count) == 4
    np.testing.assert_allclose(np.asarray(out.xyz[:4]), np.asarray(c.xyz)[keep], atol=0)
    assert not np.asarray(out.mask)[4:].any()


def test_fuse_two_lidars():
    a = make_cloud(64)
    b = make_cloud(64)
    pa = se3.Pose.identity()
    pb = se3.Pose.from_rpy_xyz(jnp.asarray([0.0, 0, np.pi / 2]), jnp.asarray([1.0, 0, 0]))
    out = pc.fuse([a, b], [pa, pb], capacity=128)
    assert int(out.count) == 128
    xb = np.asarray(pb.apply(b.xyz))
    got = np.asarray(out.xyz[64:128])
    # compacted output keeps order: first cloud then second
    np.testing.assert_allclose(got, xb, atol=1e-5)


def test_range_filter():
    c = make_cloud(200)
    out = pc.range_filter(c, 2.0, 8.0)
    r = np.linalg.norm(np.asarray(c.xyz), axis=1)
    np.testing.assert_array_equal(np.asarray(out.mask), (r >= 2) & (r <= 8))
