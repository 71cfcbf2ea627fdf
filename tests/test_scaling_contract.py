"""Multi-chip communication contract (compiled-HLO level).

The scaling evidence lives in tools/scaling_study.py (full mesh sweep);
this test pins its core invariant on one DP mesh so regressions that
reintroduce cross-device traffic into the training step are caught in CI:

  * a dp-sharded training step runs ONE reduction — the fused
    context-gradient + scalar-metric all-reduce (payload ~= the fp32
    context gradient) — and never an all-gather / reduce-scatter
    (nothing gathers weights), and
  * the orig/warped pairing of the equivariance loss costs at most a
    handful of hidden-sized collective-permutes. The [orig; warped]
    block concat is the committed layout: GSPMD permutes input-adjacent
    tensors, and the explicit interleaved-pair alternative measured
    -1.2% (hit) / -14% (fill) on-chip (STATUS.md round 3).

Reference analog: none (single-process nn.DataParallel with an implicit
device-0 gather, reference optimize_token.py:41-56 / optimize.py:405-406).
"""

import jax
import numpy as np
import pytest

from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.models.unet import tiny_unet_config
from stablekeypoints_tpu.models.vae import tiny_vae_config
from stablekeypoints_tpu.parallel import mesh as pmesh
from stablekeypoints_tpu.pipeline.runtime import Runtime


@pytest.mark.slow
def test_dp_step_communicates_only_the_gradient():
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from scaling_study import collective_stats

    devices = jax.devices("cpu")[:2]
    if len(devices) < 2:
        pytest.skip("needs >=2 virtual devices")
    mesh = pmesh.make_mesh(2, 1, devices=devices)
    cfg = Config(
        dataset_name="synthetic",
        image_size=64,
        num_tokens=16,
        feature_upsample_res=16,
        batch_size=4,
        furthest_point_num_samples=8,
        top_k=4,
        dtype="float32",
    )
    with jax.default_device(devices[0]):
        rt = Runtime.create(cfg, tiny_unet_config(), tiny_vae_config(), mesh=mesh)
        images = pmesh.shard_batch(
            mesh,
            np.random.default_rng(0).uniform(0, 1, (4, 64, 64, 3)).astype(np.float32),
        )
        context = rt.init_context()
        opt_state = jax.device_put(rt.optimizer.init(context), pmesh.replicated(mesh))
        key = jax.device_put(jax.random.PRNGKey(0), pmesh.replicated(mesh))
        step = rt.train_step
        hlo = step.func.lower(*step.args, context, opt_state, images, key).compile().as_text()

    stats = collective_stats(hlo)
    ctx_grad_bytes = int(np.prod(np.asarray(context).shape)) * 4
    assert stats["all-gather"]["count"] == 0, stats
    assert stats["reduce-scatter"]["count"] == 0, stats
    assert stats["collective-permute"]["count"] <= 12, (
        "DP training step grew cross-device traffic: the orig/warped "
        "pairing should cost a handful of hidden-sized permutes, not a "
        "per-layer cascade",
        stats,
    )
    assert stats["all-reduce"]["count"] == 1, stats
    assert 0 < stats["all-reduce"]["bytes"] <= 2 * ctx_grad_bytes + 4096, (
        stats, ctx_grad_bytes,
    )


@pytest.mark.slow
def test_tp_shards_conv_weights_and_memory():
    """Widened TP (VERDICT r2 weak #6): resblock convs shard over 'model',
    so per-device parameter bytes must shrink as tp grows (the SDXL
    memory-headroom motivation), while the math stays DP-identical
    (test_parallel.test_dp_tp_matches_dp_only covers the values)."""
    devices = jax.devices("cpu")[:4]
    if len(devices) < 4:
        pytest.skip("needs >=4 virtual devices")
    cfg = Config(
        dataset_name="synthetic",
        image_size=64,
        num_tokens=16,
        feature_upsample_res=16,
        batch_size=4,
        furthest_point_num_samples=8,
        top_k=4,
        dtype="float32",
    )
    arg_bytes = {}
    for n_model in (1, 4):
        mesh = pmesh.make_mesh(1, n_model, devices=devices[:n_model])
        with jax.default_device(devices[0]):
            rt = Runtime.create(cfg, tiny_unet_config(), tiny_vae_config(), mesh=mesh)
            # conv1 kernel physically sharded over out channels
            k = rt.unet_params["down_0"]["resnets_0"]["conv1"]["kernel"]
            from jax.sharding import PartitionSpec as P

            expect = P(None, None, None, "model") if n_model > 1 else P()
            assert k.sharding.spec == expect, k.sharding
            images = pmesh.shard_batch(
                mesh,
                np.random.default_rng(0).uniform(0, 1, (4, 64, 64, 3)).astype(np.float32),
            )
            context = rt.init_context()
            opt_state = jax.device_put(rt.optimizer.init(context), pmesh.replicated(mesh))
            key = jax.device_put(jax.random.PRNGKey(0), pmesh.replicated(mesh))
            step = rt.train_step
            compiled = step.func.lower(*step.args, context, opt_state, images, key).compile()
            arg_bytes[n_model] = compiled.memory_analysis().argument_size_in_bytes
    # tp=4 must carry measurably fewer parameter bytes per device than tp=1.
    # The bound is loose (images/context stay replicated-or-batch-sharded and
    # the transformer shards were already counted at round 2); the widened
    # conv rules push well past it.
    assert arg_bytes[4] < 0.75 * arg_bytes[1], arg_bytes


@pytest.mark.slow
def test_tp_resblock_groupnorm_is_shard_local():
    """The widened conv-TP claim, pinned at HLO level: a TP-sharded resblock
    forward contains exactly ONE all-reduce (conv2's row-parallel psum) and
    ZERO all-gathers — i.e. the GroupNorm between the conv pair computes its
    per-group stats shard-locally (contiguous channel sharding keeps whole
    groups on-device). An all-gather appearing here means GSPMD stopped
    propagating the channel sharding through the norm."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from scaling_study import collective_stats

    from stablekeypoints_tpu.models.layers import ResnetBlock

    devices = jax.devices("cpu")[:2]
    if len(devices) < 2:
        pytest.skip("needs >=2 virtual devices")
    mesh = pmesh.make_mesh(1, 2, devices=devices)
    blk = ResnetBlock(out_channels=64, dtype=jnp.float32)
    x = jnp.ones((2, 8, 8, 64))
    temb = jnp.ones((2, 32))
    params = blk.init(jax.random.PRNGKey(0), x, temb)["params"]
    sh = pmesh.tensor_parallel_shardings(mesh, {"resnets_0": params})["resnets_0"]
    params = jax.tree_util.tree_map(jax.device_put, params, sh)
    xr = jax.device_put(x, NamedSharding(mesh, P()))
    tr = jax.device_put(temb, NamedSharding(mesh, P()))
    f = jax.jit(lambda p, a, t: blk.apply({"params": p}, a, t))
    stats = collective_stats(f.lower(params, xr, tr).compile().as_text())
    assert stats["all-reduce"]["count"] == 1, stats
    assert stats["all-gather"]["count"] == 0, stats
    assert stats["reduce-scatter"]["count"] == 0, stats
