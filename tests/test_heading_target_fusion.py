import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rs

from msst_tpu.models.heading import HeadingConfig, HeadingState, heading_step
from msst_tpu.models.target_tracker import TargetConfig, TrackerState, track_step
from msst_tpu.models.fusion import FusionConfig, PointCloudFusion

RNG = np.random.default_rng(11)


def corridor_cloud(roll=0.0, pitch=0.0, yaw=0.0, width=4.0, n=6000):
    """Sensor-frame corridor scene: floor + two side walls, sensor tilted by
    (roll, pitch) and rotated in the corridor by yaw."""
    xs = RNG.uniform(-8, 8, n)
    # floor
    floor = np.column_stack([xs[: n // 2], RNG.uniform(-width / 2, width / 2, n // 2),
                             np.zeros(n // 2)])
    # walls at y = +-width/2, heights 0..3
    k = n // 4
    wl = np.column_stack([xs[n // 2:n // 2 + k], np.full(k, width / 2),
                          RNG.uniform(0, 3, k)])
    wr = np.column_stack([xs[n // 2 + k:n // 2 + 2 * k], np.full(k, -width / 2),
                          RNG.uniform(0, 3, k)])
    world = np.concatenate([floor, wl, wr])
    world += RNG.normal(scale=0.01, size=world.shape)
    # sensor pose in corridor: at height 1.2, attitude (roll, pitch, yaw)
    R = Rs.from_euler("xyz", [roll, pitch, yaw]).as_matrix()
    t = np.array([0.0, 0.0, 1.2])
    sensor = (world - t) @ R  # world->sensor with R as sensor->world
    return sensor.astype(np.float32)


def test_heading_flat_corridor():
    cfg = HeadingConfig(max_points=8192)
    st = HeadingState.create()
    pts = corridor_cloud()
    st, res = heading_step(st, jnp.asarray(pts), jnp.ones(len(pts), bool),
                           jnp.asarray(0.1), jax.random.PRNGKey(0), cfg)
    assert bool(res.ground_ok)
    assert bool(res.left_ok) and bool(res.right_ok)
    assert int(res.confidence) == 2
    assert abs(float(res.roll)) < 1.0 and abs(float(res.pitch)) < 1.0
    # corridor direction has an inherent 180-deg ambiguity on the first frame
    yaw_mod = ((float(res.yaw) + 90.0) % 180.0) - 90.0
    assert abs(yaw_mod) < 2.0
    d = np.asarray(res.distances)
    np.testing.assert_allclose(d, 2.0, atol=0.2)  # walls at +-2 m


def test_heading_detects_attitude_and_yaw():
    cfg = HeadingConfig(max_points=8192)
    st = HeadingState.create()
    roll, pitch, yaw = np.radians([3.0, -2.0, 10.0])
    pts = corridor_cloud(roll, pitch, yaw)
    # two frames for smoothing to settle (alpha=1 on first frame)
    st, res = heading_step(st, jnp.asarray(pts), jnp.ones(len(pts), bool),
                           jnp.asarray(0.1), jax.random.PRNGKey(1), cfg)
    assert bool(res.ground_ok)
    assert abs(float(res.roll) - 3.0) < 1.0
    assert abs(float(res.pitch) + 2.0) < 1.0
    yaw_mod = ((float(res.yaw) + 90.0) % 180.0) - 90.0
    assert abs(abs(yaw_mod) - 10.0) < 2.0


def test_heading_no_ground_falls_back():
    cfg = HeadingConfig(max_points=4096)
    st = HeadingState.create()
    # junk cloud: no plane structure
    pts = RNG.uniform(-5, 5, size=(2000, 3)).astype(np.float32)
    st2, res = heading_step(st, jnp.asarray(pts), jnp.ones(len(pts), bool),
                            jnp.asarray(0.1), jax.random.PRNGKey(2), cfg)
    assert int(res.confidence) in (0, 1)


def test_target_tracker_detects_and_tracks():
    cfg = TargetConfig(max_points=512, fit_method="algebraic")
    st = TrackerState.create()
    r_gt = 0.1
    for k in range(5):
        c_gt = np.array([5.0 + 0.2 * k, 2.0])
        theta = RNG.uniform(0, 2 * np.pi, 40)
        target = c_gt + r_gt * np.column_stack([np.cos(theta), np.sin(theta)])
        bg = RNG.uniform(-20, 20, size=(200, 2))
        xy = np.concatenate([target, bg]).astype(np.float32)
        z = np.zeros((len(xy), 1), np.float32)
        xyz = np.concatenate([xy, z], axis=1)
        inten = np.concatenate([np.full(40, 200.0), np.full(200, 20.0)]).astype(np.float32)
        n = len(xyz)
        pad = cfg.max_points - n
        xyz = np.pad(xyz, ((0, pad), (0, 0)))
        inten = np.pad(inten, (0, pad))
        mask = np.arange(cfg.max_points) < n
        st, out = track_step(st, jnp.asarray(xyz), jnp.asarray(inten),
                             jnp.asarray(mask), jnp.asarray(0.1 * (k + 1)),
                             jax.random.PRNGKey(k), cfg)
        assert bool(out.is_valid), k
        np.testing.assert_allclose([float(out.x), float(out.y)], c_gt, atol=0.05)
    assert bool(st.tracking)
    # track follows motion
    np.testing.assert_allclose([float(out.track_x), float(out.track_y)],
                               [5.8, 2.0], atol=0.2)


def test_target_tracker_coasts_on_miss():
    cfg = TargetConfig(max_points=256)
    st = TrackerState.create()
    xyz = np.zeros((256, 3), np.float32)
    inten = np.zeros(256, np.float32)
    st, out = track_step(st, jnp.asarray(xyz), jnp.asarray(inten),
                         jnp.asarray(np.zeros(256, bool)), jnp.asarray(0.1),
                         jax.random.PRNGKey(0), cfg)
    assert not bool(out.is_valid)
    assert not bool(st.tracking)


def test_fusion_two_lidars_with_ego_box():
    cfg = FusionConfig(
        n_lidars=2, capacity=2048,
        extrinsics=((0, 0, 0, 0, 0, 0), (2.0, 0, 0, 0, 0, np.pi)),
        ego_lo=(-0.5, -0.5, -0.5), ego_hi=(0.5, 0.5, 0.5),
    )
    fuser = PointCloudFusion(cfg)
    a = RNG.uniform(-3, 3, size=(500, 3)).astype(np.float32)
    b = RNG.uniform(-3, 3, size=(500, 3)).astype(np.float32)
    out = fuser.fuse_arrays([a, b])
    m = np.asarray(out.mask)
    pts = np.asarray(out.xyz)[m]
    # nothing inside the ego box
    inside = (np.abs(pts) <= 0.5).all(axis=1)
    assert not inside.any()
    # cloud b transformed: yaw pi + shift -> b' = -b + (2,0,0) for xy
    bt = np.column_stack([-b[:, 0] + 2, -b[:, 1], b[:, 2]])
    keep_b = ~((np.abs(bt) <= 0.5).all(axis=1))
    expect = 500 - (np.abs(a) <= 0.5).all(axis=1).sum() + keep_b.sum()
    assert abs(m.sum() - expect) <= 1


def test_target_tracker_modbus_output_chain():
    """Tracker output published through the Modbus-TCP register bank and read
    back by a client — the lidar_target02 output chain (registers like the
    reference's atomic bank, node.cpp:151-158)."""
    from msst_tpu.utils.modbus import (ModbusTcpClient, ModbusTcpServer,
                                       registers_to_float)

    cfg = TargetConfig(max_points=512, fit_method="algebraic")
    st = TrackerState.create()
    c_gt = np.array([5.0, 2.0])
    theta = RNG.uniform(0, 2 * np.pi, 40)
    target = c_gt + 0.1 * np.column_stack([np.cos(theta), np.sin(theta)])
    bg = RNG.uniform(-20, 20, size=(200, 2))
    xy = np.concatenate([target, bg]).astype(np.float32)
    xyz = np.concatenate([xy, np.zeros((len(xy), 1), np.float32)], axis=1)
    inten = np.concatenate([np.full(40, 200.0), np.full(200, 20.0)]).astype(np.float32)
    pad = cfg.max_points - len(xyz)
    xyz = np.pad(xyz, ((0, pad), (0, 0)))
    inten = np.pad(inten, (0, pad))
    mask = np.arange(cfg.max_points) < len(xy)

    st, out = track_step(st, jnp.asarray(xyz), jnp.asarray(inten),
                         jnp.asarray(mask), jnp.asarray(0.1),
                         jax.random.PRNGKey(0), cfg)
    assert bool(out.is_valid)

    srv = ModbusTcpServer(host="127.0.0.1", port=0)
    srv.start()
    try:
        # register map like the reference: x, y, distance as float pairs +
        # validity/count words
        srv.set_float(0, float(out.x))
        srv.set_float(2, float(out.y))
        srv.set_float(4, float(out.distance))
        srv.set_registers(6, [int(out.point_count), int(bool(out.is_valid))])
        cli = ModbusTcpClient("127.0.0.1", srv.port)
        cli.connect()
        regs = cli.read_registers(0, 8)
        assert abs(registers_to_float(regs[0], regs[1]) - c_gt[0]) < 0.05
        assert abs(registers_to_float(regs[2], regs[3]) - c_gt[1]) < 0.05
        assert regs[7] == 1
        cli.close()
    finally:
        srv.stop()
