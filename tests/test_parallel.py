"""Sharding layout tests on the 8-virtual-device mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.models.unet import tiny_unet_config
from stablekeypoints_tpu.models.vae import tiny_vae_config
from stablekeypoints_tpu.parallel import mesh as pmesh
from stablekeypoints_tpu.pipeline.runtime import Runtime


pytestmark = pytest.mark.slow  # model-heavy: excluded from the smoke subset


def test_tensor_parallel_param_specs():
    spec = pmesh._param_spec(("up_1", "attentions_0", "blocks_0", "attn2", "to_q", "kernel"))
    assert spec == P(None, "model")
    spec = pmesh._param_spec(("up_1", "attentions_0", "blocks_0", "attn2", "to_out", "kernel"))
    assert spec == P("model", None)
    spec = pmesh._param_spec(("up_1", "attentions_0", "blocks_0", "ff", "proj_in", "kernel"))
    assert spec == P(None, "model")
    spec = pmesh._param_spec(("up_1", "attentions_0", "blocks_0", "ff", "proj_out", "kernel"))
    assert spec == P("model", None)
    # resblock convs: Megatron pair — conv1 column (out channels), conv2 row
    # (in channels); time_emb_proj matches conv1's sharded output
    assert pmesh._param_spec(("down_0", "resnets_0", "conv1", "kernel")) == P(None, None, None, "model")
    assert pmesh._param_spec(("down_0", "resnets_0", "conv1", "bias")) == P("model")
    assert pmesh._param_spec(("down_0", "resnets_0", "conv2", "kernel")) == P(None, None, "model", None)
    assert pmesh._param_spec(("down_0", "resnets_0", "conv2", "bias")) == P()
    assert pmesh._param_spec(("mid", "resnets_0", "time_emb_proj", "kernel")) == P(None, "model")
    # norm2 (between the conv pair) sees channel-sharded activations;
    # norm1 / conv_shortcut / conv_in sit at replicated points
    assert pmesh._param_spec(("down_0", "resnets_0", "norm2", "scale")) == P("model")
    assert pmesh._param_spec(("down_0", "resnets_0", "norm2", "bias")) == P("model")
    assert pmesh._param_spec(("down_0", "resnets_0", "norm1", "scale")) == P()
    assert pmesh._param_spec(("down_0", "resnets_0", "conv_shortcut", "kernel")) == P()
    assert pmesh._param_spec(("conv_in", "kernel")) == P()
    # the transformer blocks' LayerNorm 'norm2' must NOT match the resblock rule
    assert pmesh._param_spec(("up_1", "attentions_0", "blocks_0", "norm2", "scale")) == P()


def test_dp_tp_train_step_runs():
    """data=4 x model=2 mesh: one full step with TP'd transformer weights."""
    mesh = pmesh.make_mesh(4, 2)
    cfg = Config(
        dataset_name="synthetic", image_size=64, num_tokens=16,
        feature_upsample_res=16, batch_size=4, furthest_point_num_samples=8,
        top_k=4, dtype="float32",
    )
    rt = Runtime.create(cfg, tiny_unet_config(), tiny_vae_config(), mesh=mesh)
    # qkv kernels actually sharded over 'model'
    leaf = rt.unet_params["up_1"]["attentions_0"]["blocks_0"]["attn2"]["to_q"]["kernel"]
    assert leaf.sharding.spec == P(None, "model")

    images = pmesh.shard_batch(mesh, np.random.default_rng(0).uniform(0, 1, (4, 64, 64, 3)).astype(np.float32))
    ctx = rt.init_context()
    opt_state = jax.device_put(rt.optimizer.init(ctx), pmesh.replicated(mesh))
    ctx, opt_state, _, m = rt.train_step(ctx, opt_state, images, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_dp_tp_matches_dp_only():
    """TP must not change the math: compare losses across mesh layouts."""
    cfg = Config(
        dataset_name="synthetic", image_size=64, num_tokens=16,
        feature_upsample_res=16, batch_size=4, furthest_point_num_samples=8,
        top_k=4, dtype="float32",
    )
    losses, contexts = [], []
    for (nd, nm) in ((4, 1), (2, 2)):
        mesh = pmesh.make_mesh(nd, nm)
        rt = Runtime.create(cfg, tiny_unet_config(), tiny_vae_config(), mesh=mesh)
        images = pmesh.shard_batch(mesh, np.ones((4, 64, 64, 3), np.float32) * 0.4)
        ctx = rt.init_context()
        opt_state = jax.device_put(rt.optimizer.init(ctx), pmesh.replicated(mesh))
        ctx, _, _, m = rt.train_step(ctx, opt_state, images, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
        contexts.append(np.asarray(ctx))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-4)
    # the full gradient path too: the post-Adam context must match across
    # layouts (TP reductions — conv psums, capture head-mean psum — only
    # reorder floating-point sums)
    np.testing.assert_allclose(contexts[0], contexts[1], rtol=2e-3, atol=2e-5)


def test_dp_tp_sdxl_matches_dp_only():
    """The widened TP's stated motivation is SDXL: verify the full train
    step on the SDXL topology (3 blocks, depth-2 transformers, fixed-dim
    heads, micro-conditioning) gives identical losses and post-Adam context
    across a DP-only and a TP mesh — conv pairs, fixed-head-dim attention
    shards, and the add_embedding path all under 'model'."""
    from stablekeypoints_tpu.models.unet import sdxl_tiny_config

    cfg = Config(
        dataset_name="synthetic", model_type="sdxl", image_size=64,
        num_tokens=16, feature_upsample_res=16, batch_size=2,
        furthest_point_num_samples=8, top_k=4, dtype="float32",
    )
    losses, contexts = [], []
    for (nd, nm) in ((2, 1), (1, 2)):
        mesh = pmesh.make_mesh(nd, nm)
        rt = Runtime.create(cfg, sdxl_tiny_config(), tiny_vae_config(), mesh=mesh)
        if nm > 1:  # resblock conv1 physically sharded over out channels
            k = rt.unet_params["down_1"]["resnets_0"]["conv1"]["kernel"]
            assert k.sharding.spec == P(None, None, None, "model"), k.sharding
        images = pmesh.shard_batch(mesh, np.ones((2, 64, 64, 3), np.float32) * 0.4)
        ctx = rt.init_context()
        opt_state = jax.device_put(rt.optimizer.init(ctx), pmesh.replicated(mesh))
        ctx, _, _, m = rt.train_step(ctx, opt_state, images, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
        contexts.append(np.asarray(ctx))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-4)
    np.testing.assert_allclose(contexts[0], contexts[1], rtol=2e-3, atol=2e-5)
