"""Mid-stage checkpoint/resume round trip."""

import jax.numpy as jnp
import numpy as np
import optax

from stablekeypoints_tpu.utils.checkpoint import TrainCheckpointer





def test_checkpoint_roundtrip(tmp_path):
    ckpt = TrainCheckpointer(str(tmp_path))
    context = jnp.arange(24, dtype=jnp.float32).reshape(1, 4, 6)
    opt = optax.adam(1e-3)
    opt_state = opt.init(context)
    # advance once so mu/nu are nonzero
    g = jnp.ones_like(context)
    updates, opt_state = opt.update(g, opt_state, context)

    ckpt.save(7, context, opt_state)
    assert ckpt.latest_step() == 7
    restored = ckpt.restore()
    assert int(restored["step"]) == 7
    np.testing.assert_array_equal(restored["context"], np.asarray(context))

    # structure-preserving restore into a fresh opt_state
    import jax

    fresh = opt.init(context)
    leaves = jax.tree_util.tree_leaves(restored["opt_state"])
    rebuilt = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(fresh), leaves
    )
    for a, b in zip(jax.tree_util.tree_leaves(rebuilt), jax.tree_util.tree_leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_of_multiple(tmp_path):
    ckpt = TrainCheckpointer(str(tmp_path))
    context = jnp.zeros((1, 2, 2))
    opt_state = optax.adam(1e-3).init(context)
    ckpt.save(3, context, opt_state)
    ckpt.save(11, context, opt_state)
    assert ckpt.latest_step() == 11
    assert int(ckpt.restore(3)["step"]) == 3
