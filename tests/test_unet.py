"""UNet forward, functional capture, truncation, and weight-mapping tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablekeypoints_tpu.models import weights
from stablekeypoints_tpu.models.unet import UNet, tiny_unet_config
from stablekeypoints_tpu.models.vae import VAE, tiny_vae_config


pytestmark = pytest.mark.slow  # model-heavy: excluded from the smoke subset


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = tiny_unet_config()
    model = UNet(cfg, dtype=jnp.float32)
    params = weights.init_unet_params(jax.random.PRNGKey(0), cfg, sample_hw=32)
    return model, params, cfg


def test_forward_shapes(tiny_unet):
    model, params, cfg = tiny_unet
    lat = jnp.ones((2, 32, 32, 4))
    t = jnp.full((2,), 10, jnp.int32)
    ctx = jnp.ones((2, 12, cfg.context_dim))
    eps, caps = model.apply({"params": params}, lat, t, ctx)
    assert eps.shape == (2, 32, 32, 4)
    assert caps == []


def test_capture_layer_selection(tiny_unet):
    """First 4 eligible up-path cross layers captured, [B, R^2, T] fp32."""
    model, params, cfg = tiny_unet
    lat = jnp.ones((1, 32, 32, 4))  # up path: 4^2, 8^2, 16^2, 32^2
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.ones((1, 12, cfg.context_dim))
    eps, caps = model.apply({"params": params}, lat, t, ctx, capture_res=24)
    assert len(caps) == 4
    for c in caps:
        assert c.shape == (1, 24 * 24, 12)
        assert c.dtype == jnp.float32
    # softmax over tokens: rows sum to 1
    np.testing.assert_allclose(np.asarray(caps[0].sum(-1)), 1.0, atol=1e-5)


def test_truncation_matches_full_forward(tiny_unet):
    model, params, cfg = tiny_unet
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 12, cfg.context_dim))
    _, caps_full = model.apply({"params": params}, lat, t, ctx, capture_res=16)
    eps_tr, caps_tr = model.apply(
        {"params": params}, lat, t, ctx, capture_res=16, truncate=True
    )
    assert eps_tr is None
    assert len(caps_full) == len(caps_tr) == 4
    for a, b in zip(caps_full, caps_tr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_grad_flows_to_context(tiny_unet):
    model, params, cfg = tiny_unet
    lat = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(4), (1, 12, cfg.context_dim))

    def loss_fn(c):
        _, caps = model.apply(
            {"params": params}, lat, t, c, capture_res=8, truncate=True
        )
        return sum(jnp.sum(m**2) for m in caps)

    g = jax.grad(loss_fn)(ctx)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def _fake_diffusers_sd_from_tree(tree, rules):
    """Invert our conversion rules to build a fake diffusers state dict."""
    flat = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            flat[".".join(path)] = np.asarray(node)

    walk(tree, ())
    inv = {"raw": lambda x: x, "conv": lambda x: np.transpose(x, (3, 2, 0, 1)),
           "dense": np.transpose}
    sd = {}
    covered = set()
    for src, dst, kind in rules:
        if dst in flat:
            sd[src] = inv[kind](flat[dst])
            covered.add(dst)
    return sd, covered, set(flat)


def test_unet_conversion_covers_every_param(tiny_unet):
    """Round trip: rules cover the full tree and reproduce it exactly."""
    _, params, cfg = tiny_unet
    from stablekeypoints_tpu.models.weights import (
        convert_unet_state_dict,
        unet_conversion_rules,
    )

    rules = unet_conversion_rules(cfg)
    sd, covered, all_params = _fake_diffusers_sd_from_tree(params, rules)
    missing = all_params - covered
    assert not missing, f"params not covered by conversion rules: {sorted(missing)[:10]}"
    out = convert_unet_state_dict(sd, cfg)
    flat_out, flat_ref = {}, {}

    def walk(node, path, store):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,), store)
        else:
            store[".".join(path)] = np.asarray(node)

    walk(out, (), flat_out)
    walk(params, (), flat_ref)
    assert set(flat_out) == set(flat_ref)
    for k in flat_ref:
        np.testing.assert_array_equal(flat_out[k], flat_ref[k], err_msg=k)


def test_vae_conversion_covers_every_param():
    from stablekeypoints_tpu.models.weights import (
        convert_vae_state_dict,
        vae_conversion_rules,
    )

    cfg = tiny_vae_config()
    params = weights.init_vae_params(jax.random.PRNGKey(0), cfg, sample_hw=32)
    rules = vae_conversion_rules(cfg)
    sd, covered, all_params = _fake_diffusers_sd_from_tree(params, rules)
    missing = all_params - covered
    assert not missing, f"params not covered: {sorted(missing)[:10]}"
    out = convert_vae_state_dict(sd, cfg)
    flat_out, flat_ref = {}, {}

    def walk(node, path, store):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,), store)
        else:
            store[".".join(path)] = np.asarray(node)

    walk(out, (), flat_out)
    walk(params, (), flat_ref)
    assert set(flat_out) == set(flat_ref)


def test_remat_gradients_match():
    """remat=True must give identical outputs and context gradients."""
    lat = jax.random.normal(jax.random.PRNGKey(5), (1, 32, 32, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(6), (1, 12, 32))
    results = []
    for remat in (False, True):
        cfg = tiny_unet_config(remat=remat)
        model = UNet(cfg, dtype=jnp.float32)
        params = weights.init_unet_params(jax.random.PRNGKey(0), cfg, sample_hw=32)

        def loss_fn(c):
            _, caps = model.apply(
                {"params": params}, lat, t, c, capture_res=8, truncate=True
            )
            return sum(jnp.sum(m**2) for m in caps)

        results.append((loss_fn(ctx), jax.grad(loss_fn)(ctx)))
    np.testing.assert_allclose(
        np.asarray(results[0][0]), np.asarray(results[1][0]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(results[0][1]), np.asarray(results[1][1]), rtol=1e-4, atol=1e-6
    )


def test_vae_encode_decode_shapes():
    cfg = tiny_vae_config()
    model = VAE(cfg, dtype=jnp.float32)
    params = weights.init_vae_params(jax.random.PRNGKey(0), cfg, sample_hw=64)
    img = jnp.ones((1, 64, 64, 3))
    lat = model.apply({"params": params}, img, method=VAE.encode_mean)
    assert lat.shape == (1, 8, 8, 4)
    dec = model.apply({"params": params}, lat, method=VAE.decode)
    assert dec.shape == (1, 64, 64, 3)


def test_pallas_capture_matches_einsum_path():
    """UNet with the fused Pallas capture (interpret mode on CPU) must match."""
    import dataclasses

    lat = jax.random.normal(jax.random.PRNGKey(7), (1, 32, 32, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(8), (1, 12, 32))
    cfg0 = tiny_unet_config()
    cfg1 = dataclasses.replace(cfg0, pallas_capture=True, pallas_interpret=True)
    params = weights.init_unet_params(jax.random.PRNGKey(0), cfg0, sample_hw=32)
    caps = []
    for cfg in (cfg0, cfg1):
        model = UNet(cfg, dtype=jnp.float32)
        _, c = model.apply({"params": params}, lat, t, ctx, capture_res=16, truncate=True)
        caps.append(c)
    for a, b in zip(*caps):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
