"""SDXL backbone: topology, capture, micro-conditioning, conversion rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablekeypoints_tpu.models import weights
from stablekeypoints_tpu.models.unet import SDXL_CONFIG, UNet, sdxl_tiny_config


pytestmark = pytest.mark.slow  # model-heavy: excluded from the smoke subset


def _init(cfg, hw=32):
    model = UNet(cfg, dtype=jnp.float32)
    params = weights.init_unet_params(jax.random.PRNGKey(0), cfg, sample_hw=hw)
    return model, params


def test_sdxl_config_head_dims():
    assert SDXL_CONFIG.heads_for(1280) == (20, 64)
    assert SDXL_CONFIG.heads_for(640) == (10, 64)


def test_sdxl_tiny_forward_and_capture():
    cfg = sdxl_tiny_config()
    model, params = _init(cfg)
    lat = jnp.ones((1, 32, 32, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.ones((1, 10, cfg.context_dim))
    eps, caps = model.apply({"params": params}, lat, t, ctx, capture_res=16)
    assert eps.shape == (1, 32, 32, 4)
    # 3-block topology: up path 8^2 (no attn at first rev block? rev order:
    # 128ch attn, 64ch attn, 32ch none). All attn seqs <= 1024 here; cap 4.
    assert len(caps) == 4
    for c in caps:
        assert c.shape == (1, 256, 10)


def test_sdxl_added_cond_changes_output():
    cfg = sdxl_tiny_config()
    model, params = _init(cfg)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 10, cfg.context_dim))
    eps0, _ = model.apply({"params": params}, lat, t, ctx)
    cond = {
        "text_embeds": jnp.ones((1, cfg.addition_emb_dim)),
        "time_ids": jnp.asarray([[32.0, 32.0, 0.0, 0.0, 32.0, 32.0]]),
    }
    eps1, _ = model.apply({"params": params}, lat, t, ctx, added_cond=cond)
    assert np.abs(np.asarray(eps0 - eps1)).max() > 1e-6


def test_runtime_supplies_diffusers_standard_time_ids():
    """Runtime._added_cond must supply diffusers' (orig_h, orig_w, crop_top,
    crop_left, target_h, target_w) — not the hardwired zeros of round 2 —
    for SDXL backbones, and None for SD1.x."""
    from stablekeypoints_tpu.config import Config
    from stablekeypoints_tpu.models.vae import tiny_vae_config
    from stablekeypoints_tpu.parallel import mesh as pmesh
    from stablekeypoints_tpu.pipeline.runtime import Runtime

    cfg = Config(
        dataset_name="synthetic", model_type="sdxl", image_size=64,
        num_tokens=10, feature_upsample_res=8, dtype="float32",
    )
    rt = Runtime.create(cfg, sdxl_tiny_config(), tiny_vae_config(), mesh=pmesh.make_mesh())
    cond = rt._added_cond(3)
    assert cond is not None and set(cond) == {"time_ids"}
    np.testing.assert_array_equal(
        np.asarray(cond["time_ids"]),
        np.asarray([[64.0, 64.0, 0.0, 0.0, 64.0, 64.0]] * 3, np.float32),
    )
    # generation at a different size conditions on that size
    np.testing.assert_array_equal(
        np.asarray(rt._added_cond(1, target_size=128)["time_ids"]),
        np.asarray([[128.0, 128.0, 0.0, 0.0, 128.0, 128.0]], np.float32),
    )

    from stablekeypoints_tpu.models.unet import tiny_unet_config

    cfg15 = Config(
        dataset_name="synthetic", image_size=64, num_tokens=10,
        feature_upsample_res=8, dtype="float32",
    )
    rt15 = Runtime.create(cfg15, tiny_unet_config(), tiny_vae_config(), mesh=pmesh.make_mesh())
    assert rt15._added_cond(2) is None


def test_sdxl_generation():
    """SDXL DDIM sampling end-to-end on the tiny topology (micro-cond
    plumbed through eps_fn and the final-step capture)."""
    import jax

    from stablekeypoints_tpu.config import Config
    from stablekeypoints_tpu.models.vae import tiny_vae_config
    from stablekeypoints_tpu.parallel import mesh as pmesh
    from stablekeypoints_tpu.pipeline.generate import generate_images
    from stablekeypoints_tpu.pipeline.runtime import Runtime

    cfg = Config(
        dataset_name="synthetic", model_type="sdxl", image_size=64,
        num_tokens=10, feature_upsample_res=8, dtype="float32",
    )
    rt = Runtime.create(cfg, sdxl_tiny_config(), tiny_vae_config(), mesh=pmesh.make_mesh())
    ctx = jax.random.normal(
        jax.random.PRNGKey(0), (1, 10, rt.unet.config.context_dim), jnp.float32
    )
    images, maps = generate_images(rt, ctx, num_images=1, latent_hw=8, capture_final_maps=True)
    assert images.shape == (1, 64, 64, 3)
    assert np.isfinite(images).all() and (images >= 0).all() and (images <= 1).all()
    assert maps is not None and maps.shape == (1, 10, 8, 8)
    assert np.isfinite(maps).all()


def test_sdxl_conversion_covers_every_param():
    from stablekeypoints_tpu.models.weights import (
        convert_unet_state_dict,
        unet_conversion_rules,
    )

    cfg = sdxl_tiny_config()
    # force linear_projection to exercise the dense1x1 path
    import dataclasses

    cfg = dataclasses.replace(cfg, linear_projection=True)
    _, params = _init(cfg)
    rules = unet_conversion_rules(cfg)
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
    missing = set(flat) - covered
    assert not missing, f"uncovered params: {sorted(missing)[:10]}"
    out = convert_unet_state_dict(sd, cfg)
    flat_out = {}

    def walk2(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk2(v, path + (k,))
        else:
            flat_out[".".join(path)] = np.asarray(node)

    walk2(out, ())
    assert set(flat_out) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(flat_out[k], flat[k], err_msg=k)


def test_sdxl_1024_capture_rule_pins_three_layers():
    """At SDXL's 1024^2 production shape, the <=32^2-seq capture rule
    qualifies ONLY the deepest up block's 3 transformer stacks (the 64^2
    up block exceeds the seq cap), so 3 maps are captured, the 4-map
    truncation never fires, and eps IS produced. Pinned here on the tiny
    SDXL topology with the seq cap scaled to the same relative position
    (replaces the broken reference intent, sdxl_monkey_patch.py:89-214)."""
    import dataclasses

    cfg = sdxl_tiny_config()
    # latents 16^2 -> up path resolutions 4^2 then 8^2; cap at 4^2 mirrors
    # 1024^2 production (up path 32^2 then 64^2; cap at 32^2)
    cfg = dataclasses.replace(cfg, capture_max_seq=16)
    model, params = _init(cfg, hw=16)
    lat = jnp.ones((1, 16, 16, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.ones((1, 10, cfg.context_dim))
    eps, caps = model.apply(
        {"params": params}, lat, t, ctx, capture_res=8, truncate=True
    )
    assert len(caps) == 3              # only the deepest block captures
    assert eps is not None             # truncation never fired
    for c in caps:
        assert c.shape == (1, 64, 10)  # all maps at capture_res^2


def test_sdxl_512_capture_rule_pins_four_layers_and_truncates():
    """At 512^2 (latents 64^2) the up path hits 16^2 (3 stacks) then 32^2
    (first stack) under the seq cap -> exactly 4 captures + truncation."""
    cfg = sdxl_tiny_config()  # default cap 32^2 = 1024
    model, params = _init(cfg, hw=64)
    lat = jnp.ones((1, 64, 64, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.ones((1, 10, cfg.context_dim))
    eps, caps = model.apply(
        {"params": params}, lat, t, ctx, capture_res=16, truncate=True
    )
    assert len(caps) == 4
    assert eps is None  # truncated after the 4th captured map
    for c in caps:
        assert c.shape == (1, 256, 10)


def test_sdxl_vae_scaling_factor():
    """SDXL's retrained VAE scales latents by 0.13025, not SD's 0.18215
    (diffusers vae/config.json) — using the SD constant feeds the UNet
    latents ~1.4x off the distribution the checkpoint was trained on."""
    from stablekeypoints_tpu.config import Config
    from stablekeypoints_tpu.models.vae import (
        SD_VAE_CONFIG,
        SDXL_VAE_CONFIG,
        VAE,
        tiny_vae_config,
    )
    from stablekeypoints_tpu.pipeline.runtime import Runtime
    from stablekeypoints_tpu.parallel import mesh as pmesh

    assert SD_VAE_CONFIG.scaling_factor == pytest.approx(0.18215)
    assert SDXL_VAE_CONFIG.scaling_factor == pytest.approx(0.13025)

    # Runtime dispatch: sdxl model_type picks the SDXL VAE scale
    cfg = Config(
        dataset_name="synthetic", model_type="sdxl", image_size=64,
        num_tokens=8, feature_upsample_res=16, dtype="float32",
    )
    rt = Runtime.create(cfg, sdxl_tiny_config(), mesh=pmesh.make_mesh(1, 1))
    assert rt.vae.config.scaling_factor == pytest.approx(0.13025)

    # encode_mean actually applies the config's scale
    import dataclasses

    import jax.numpy as jnp

    base = tiny_vae_config()
    va = VAE(dataclasses.replace(base, scaling_factor=0.18215), dtype=jnp.float32)
    vb = VAE(dataclasses.replace(base, scaling_factor=0.13025), dtype=jnp.float32)
    img = jnp.ones((1, 32, 32, 3)) * 0.3
    params = va.init(jax.random.PRNGKey(0), img)["params"]
    la = va.apply({"params": params}, img, method=VAE.encode_mean)
    lb = vb.apply({"params": params}, img, method=VAE.encode_mean)
    np.testing.assert_allclose(
        np.asarray(la) / 0.18215, np.asarray(lb) / 0.13025, rtol=1e-6
    )
