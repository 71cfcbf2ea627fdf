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


def test_v_to_eps_identity():
    """v_to_eps inverts the v parameterization exactly: with
    lat = sqrt(a) x0 + sqrt(1-a) eps and v = sqrt(a) eps - sqrt(1-a) x0,
    sqrt(a) v + sqrt(1-a) lat == eps (SD-2.x 768 checkpoints)."""
    import jax.numpy as jnp

    from stablekeypoints_tpu.pipeline.generate import v_to_eps

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    for a in (0.02, 0.5, 0.98):
        lat = np.sqrt(a) * x0 + np.sqrt(1 - a) * eps
        v = np.sqrt(a) * eps - np.sqrt(1 - a) * x0
        np.testing.assert_allclose(
            np.asarray(v_to_eps(v, lat, a)), np.asarray(eps), rtol=2e-5, atol=2e-6
        )


def test_generate_v_prediction_differs_and_is_finite():
    """A v-prediction backbone must sample through the eps conversion:
    same weights + same key, flipping only prediction_type, changes the
    samples (a silent no-op here would mean 768-checkpoint garbage)."""
    import dataclasses

    import jax

    key = jax.random.PRNGKey(3)
    outs = {}
    for pred in ("epsilon", "v_prediction"):
        cfg = Config(
            dataset_name="synthetic", image_size=64, num_tokens=8,
            feature_upsample_res=16, dtype="float32",
        )
        ucfg = dataclasses.replace(tiny_unet_config(), prediction_type=pred)
        rt = Runtime.create(cfg, ucfg, tiny_vae_config(), mesh=pmesh.make_mesh(1, 1))
        ctx = rt.init_context()
        imgs, _ = generate_images(rt, ctx, num_images=1, key=key)
        outs[pred] = np.asarray(imgs)
        assert np.isfinite(outs[pred]).all()
    assert np.abs(outs["epsilon"] - outs["v_prediction"]).max() > 1e-4
