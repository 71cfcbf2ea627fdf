"""Generation path on tiny models."""

import numpy as np
import pytest

from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.models.unet import tiny_unet_config
from stablekeypoints_tpu.models.vae import tiny_vae_config
from stablekeypoints_tpu.parallel import mesh as pmesh
from stablekeypoints_tpu.pipeline.generate import generate_images
from stablekeypoints_tpu.pipeline.runtime import Runtime


pytestmark = pytest.mark.slow  # model-heavy: excluded from the smoke subset


def test_generate_images_shapes():
    cfg = Config(
        dataset_name="synthetic", image_size=64, num_tokens=8,
        feature_upsample_res=16, dtype="float32",
    )
    rt = Runtime.create(cfg, tiny_unet_config(), tiny_vae_config(), mesh=pmesh.make_mesh(1))
    ctx = rt.init_context()
    imgs, maps = generate_images(rt, ctx, num_images=2, capture_final_maps=True)
    assert imgs.shape == (2, 64, 64, 3)
    assert np.isfinite(imgs).all()
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    assert maps.shape == (2, 8, 16, 16)


def test_cfg_guidance_scale_one_equals_text_only():
    """guidance_scale=1 must reproduce the text-only path exactly (the CFG
    combine u + 1*(c-u) = c; reference latent_step low_resource semantics,
    ptp_utils.py:337-349)."""
    import jax

    cfg = Config(
        dataset_name="synthetic", image_size=64, num_tokens=8,
        feature_upsample_res=16, dtype="float32",
    )
    rt = Runtime.create(cfg, tiny_unet_config(), tiny_vae_config(), mesh=pmesh.make_mesh(1))
    ctx = rt.init_context()
    key = jax.random.PRNGKey(5)
    a, _ = generate_images(rt, ctx, num_images=1, key=key)
    b, _ = generate_images(rt, ctx, num_images=1, key=key, guidance_scale=1.0)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_cfg_uncond_equals_cond_collapses():
    """With uncond == cond, any guidance scale reduces to the text-only
    path: u + s*(c-u) = c."""
    import jax
    import jax.numpy as jnp

    cfg = Config(
        dataset_name="synthetic", image_size=64, num_tokens=8,
        feature_upsample_res=16, dtype="float32",
    )
    rt = Runtime.create(cfg, tiny_unet_config(), tiny_vae_config(), mesh=pmesh.make_mesh(1))
    ctx = rt.init_context()
    key = jax.random.PRNGKey(6)
    a, _ = generate_images(rt, ctx, num_images=1, key=key)
    b, _ = generate_images(
        rt, ctx, num_images=1, key=key, guidance_scale=3.0, uncond_context=jnp.asarray(ctx)
    )
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_cfg_changes_output():
    """A different uncond embedding at scale > 1 must steer the sample."""
    import jax

    cfg = Config(
        dataset_name="synthetic", image_size=64, num_tokens=8,
        feature_upsample_res=16, dtype="float32",
    )
    rt = Runtime.create(cfg, tiny_unet_config(), tiny_vae_config(), mesh=pmesh.make_mesh(1))
    ctx = rt.init_context()
    key = jax.random.PRNGKey(7)
    a, _ = generate_images(rt, ctx, num_images=1, key=key)
    b, _ = generate_images(rt, ctx, num_images=1, key=key, guidance_scale=7.5)
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-4
