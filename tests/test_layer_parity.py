"""Torch-parity tests for layer primitives.

Metric parity with the reference hinges on these matching torch exactly
(SURVEY.md §7 "hard parts"): GroupNorm, LayerNorm, stride-2 conv padding,
GEGLU, attention softmax scaling, and the timestep embedding layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from stablekeypoints_tpu.models import layers as L

pytestmark = pytest.mark.oracle  # torch-oracle A/B: -m "not oracle" skips


def test_group_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 32)).astype(np.float32)
    scale = rng.standard_normal(32).astype(np.float32)
    bias = rng.standard_normal(32).astype(np.float32)
    ours = np.asarray(
        L._group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), groups=8, eps=1e-5)
    )
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.group_norm(t, 8, torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    ln = L.LayerNorm32()
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    scale = rng.standard_normal(16).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)
    params = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    ours = np.asarray(ln.apply({"params": params}, jnp.asarray(x)))
    ref = F.layer_norm(
        torch.from_numpy(x), (16,), torch.from_numpy(scale), torch.from_numpy(bias)
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_stride2_conv_padding_matches_torch():
    """UNet downsample: conv(k3, s2, p1) alignment."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 8)).astype(np.float32) * 0.1
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    ref = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w).permute(3, 2, 0, 1), stride=2, padding=1,
    ).permute(0, 2, 3, 1).numpy()
    assert ours.shape == ref.shape == (1, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_vae_asymmetric_downsample_matches_torch():
    """VAE downsample: F.pad (0,1,0,1) + conv(k3, s2, p0)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 4)).astype(np.float32) * 0.1
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (2, 2), [(0, 1), (0, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    t = F.pad(torch.from_numpy(x).permute(0, 3, 1, 2), (0, 1, 0, 1))
    ref = F.conv2d(t, torch.from_numpy(w).permute(3, 2, 0, 1), stride=2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_geglu_matches_torch():
    rng = np.random.default_rng(4)
    h = rng.standard_normal((2, 5, 8)).astype(np.float32)
    a, g = np.split(h, 2, axis=-1)
    ours = a * np.asarray(
        jax.nn.gelu(jnp.asarray(g), approximate=False)
    )
    ref = (torch.from_numpy(a) * F.gelu(torch.from_numpy(g))).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_timestep_embedding_layout():
    """[cos, sin] halves, identical to the diffusers SD layout."""
    t = jnp.asarray([0.0, 100.0])
    emb = np.asarray(L.timestep_embedding(t, 320))
    # t=0: cos(0)=1 for the first half, sin(0)=0 for the second
    np.testing.assert_allclose(emb[0, :160], 1.0)
    np.testing.assert_allclose(emb[0, 160:], 0.0)
    # frequency ladder: first cos column is cos(t * 1.0)
    np.testing.assert_allclose(emb[1, 0], np.cos(100.0), rtol=1e-5)
    half = 160
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    np.testing.assert_allclose(emb[1, :half], np.cos(100.0 * freqs), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(emb[1, half:], np.sin(100.0 * freqs), rtol=2e-4, atol=2e-5)


def test_attention_scale_matches_torch_softmax():
    """softmax(q k^T / sqrt(d)) over tokens, fp32, like the reference hook."""
    rng = np.random.default_rng(5)
    q = rng.standard_normal((6, 16)).astype(np.float32)
    k = rng.standard_normal((9, 16)).astype(np.float32)
    scale = 1.0 / np.sqrt(16)
    ours = np.asarray(jax.nn.softmax(jnp.asarray(q) @ jnp.asarray(k).T * scale, axis=-1))
    ref = torch.softmax(torch.from_numpy(q) @ torch.from_numpy(k).T * scale, dim=-1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)
