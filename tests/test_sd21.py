"""SD-2.x backbone: dispatch, head layout, capture, conversion coverage.

The reference hardcodes SD-1.5 (reference main.py:26-31); SD-2.1 shares the
4-block topology but uses fixed 64-dim heads (attention_head_dim
[5, 10, 20, 20]), a 1024-dim OpenCLIP context, and linear transformer
projections. Everything downstream (capture rule, conversion, runtime) is
config-driven, which these tests pin.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablekeypoints_tpu.models import weights
from stablekeypoints_tpu.models.unet import SD21_CONFIG, UNet, sd21_tiny_config


pytestmark = pytest.mark.slow  # model-heavy: excluded from the smoke subset


def test_sd21_config_head_dims():
    # diffusers attention_head_dim [5, 10, 20, 20] == channels / 64
    assert SD21_CONFIG.heads_for(320) == (5, 64)
    assert SD21_CONFIG.heads_for(640) == (10, 64)
    assert SD21_CONFIG.heads_for(1280) == (20, 64)
    assert SD21_CONFIG.context_dim == 1024
    assert SD21_CONFIG.linear_projection


def test_runtime_dispatches_sd21():
    from stablekeypoints_tpu.models.unet import SD15_CONFIG, SDXL_CONFIG
    from stablekeypoints_tpu.pipeline.runtime import unet_config_for_model_type as pick

    # 768 checkpoints are v-prediction; -base variants are epsilon
    v21 = pick("stabilityai/stable-diffusion-2-1")
    assert v21 == dataclasses.replace(SD21_CONFIG, prediction_type="v_prediction")
    assert pick("stabilityai/stable-diffusion-2").prediction_type == "v_prediction"
    assert pick("stabilityai/stable-diffusion-2-1-base") is SD21_CONFIG
    assert pick("stabilityai/stable-diffusion-2-base") is SD21_CONFIG
    assert SD21_CONFIG.prediction_type == "epsilon"
    assert pick("sd-legacy/stable-diffusion-v1-5") is SD15_CONFIG
    assert pick("runwayml/stable-diffusion-v1-5") is SD15_CONFIG
    assert pick("stabilityai/stable-diffusion-xl-base-1.0") is SDXL_CONFIG
    assert pick("sdxl") is SDXL_CONFIG


def test_sd21_tiny_forward_and_capture():
    """4-block topology with fixed-dim heads: 512^2-equivalent shapes give
    the SD-1.5 capture rule (4 up-path maps, truncated forward)."""
    cfg = sd21_tiny_config()
    model = UNet(cfg, dtype=jnp.float32)
    params = weights.init_unet_params(jax.random.PRNGKey(0), cfg, sample_hw=32)
    lat = jnp.ones((1, 32, 32, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.ones((1, 10, cfg.context_dim))
    eps, caps = model.apply(
        {"params": params}, lat, t, ctx, capture_res=16, truncate=True
    )
    assert eps is None  # truncation: the tail is never computed
    assert len(caps) == 4
    for c in caps:
        assert c.shape == (1, 256, 10) and np.isfinite(np.asarray(c)).all()


def test_sd21_conversion_covers_every_param():
    """Round-trip every Flax param through the diffusers-layout rules
    (incl. the dense1x1 linear-projection path SD-2.x uses)."""
    cfg = sd21_tiny_config()
    params = weights.init_unet_params(jax.random.PRNGKey(0), cfg, sample_hw=32)
    rules = weights.unet_conversion_rules(cfg)
    flat = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            flat[".".join(path)] = np.asarray(node)

    walk(params, ())
    inv = {
        "raw": lambda x: x,
        "conv": lambda x: np.transpose(x, (3, 2, 0, 1)),
        "dense": np.transpose,
        "dense1x1": lambda x: np.transpose(x[0, 0]),
    }
    sd, covered = {}, set()
    for src, dst, kind in rules:
        if dst in flat:
            sd[src] = inv[kind](flat[dst])
            covered.add(dst)
    assert not set(flat) - covered, sorted(set(flat) - covered)[:10]
    out = weights.convert_unet_state_dict(sd, cfg)
    flat_out = {}
    walk2 = lambda node, path: (
        [walk2(v, path + (k,)) for k, v in node.items()]
        if isinstance(node, dict)
        else flat_out.__setitem__(".".join(path), np.asarray(node))
    )
    walk2(out, ())
    assert set(flat_out) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(flat_out[k], flat[k], err_msg=k)


def test_sd21_stage12_pipeline():
    """Stages 1-2 run end-to-end on the SD-2.x topology (v-prediction does
    not matter here — training consumes attention maps only)."""
    from stablekeypoints_tpu.config import Config
    from stablekeypoints_tpu.data.synthetic import SyntheticBlobs
    from stablekeypoints_tpu.models.vae import tiny_vae_config
    from stablekeypoints_tpu.parallel import mesh as pmesh
    from stablekeypoints_tpu.pipeline.indices import find_best_indices
    from stablekeypoints_tpu.pipeline.optimize import optimize_embedding
    from stablekeypoints_tpu.pipeline.runtime import Runtime

    cfg = Config(
        dataset_name="synthetic", model_type="sd21", image_size=64,
        num_tokens=16, feature_upsample_res=16, batch_size=8, num_steps=2,
        num_indices=4, furthest_point_num_samples=8, top_k=4,
        dtype="float32",
    )
    rt = Runtime.create(cfg, sd21_tiny_config(), tiny_vae_config(), mesh=pmesh.make_mesh())
    assert rt.unet.config.head_dim_fixed == 16  # the SD2-style head layout
    ds = SyntheticBlobs(length=16, image_size=64, num_kpts=4, seed=3)
    ctx = optimize_embedding(rt, ds)
    assert ctx.shape == (1, 16, 48) and np.isfinite(np.asarray(ctx)).all()
    indices = find_best_indices(rt, ds, ctx)
    assert indices.shape == (4,) and len(set(indices.tolist())) == 4
