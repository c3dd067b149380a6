import jax
import jax.numpy as jnp
import numpy as np


def test_multisession_dryrun_8_devices():
    assert len(jax.devices()) >= 8
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (6,)
    assert np.isfinite(np.asarray(out)).all()


def test_sharded_states_stay_sharded():
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from msst_tpu.parallel import make_mesh, make_batched_state, shard_batch

    p = ge._tiny_p(horizon=90)
    mesh = make_mesh(8)
    states = shard_batch(make_batched_state(p, 8), mesh)
    sh = states.kf.surf_xyz.sharding
    assert isinstance(sh, NamedSharding)
    assert sh.spec == P("session")
