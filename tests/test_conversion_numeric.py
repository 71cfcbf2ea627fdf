"""Numeric parity of diffusers-checkpoint conversion, without real weights.

Fabricates a tiny random state dict in the exact diffusers naming/layout
scheme, converts it with models/weights.py, and asserts the Flax forward
matches a minimal hand-built torch forward implementing the diffusers
semantics (UNet2DConditionModel / AutoencoderKL as pinned by the
reference, optimize_token.py:37-39) on the same inputs. Catches
transpose/naming/topology bugs before real weights ever arrive
(VERDICT round 1, next-round #6).

The torch oracle is written directly against the state dict with
torch.nn.functional ops, so it shares no code with the Flax model.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from stablekeypoints_tpu.models.unet import UNet, tiny_unet_config
from stablekeypoints_tpu.models.vae import VAE, tiny_vae_config
from stablekeypoints_tpu.models import weights as W


# ---------------------------------------------------------------------------
# state-dict fabrication: random values in the diffusers layout, with shapes
# derived by INVERTING the conversion rules against the Flax shape tree


pytestmark = [pytest.mark.slow, pytest.mark.oracle]  # model-heavy torch-oracle A/B


# the fabricator lives in the package now (models/weights.py) — it also
# powers the disk-load tests and `tools/validate_real_weights.py --selftest`
_fabricate = W.fabricate_state_dict


# ---------------------------------------------------------------------------
# torch oracle (diffusers semantics)


def _w(sd, name):
    return torch.from_numpy(sd[name])


def _gn(x, sd, p, eps=1e-5):
    groups = math.gcd(32, x.shape[1])  # diffusers uses 32; tiny channels<32 use gcd
    return F.group_norm(x, groups, _w(sd, p + ".weight"), _w(sd, p + ".bias"), eps)


def _conv(x, sd, p, stride=1, pad=1):
    return F.conv2d(x, _w(sd, p + ".weight"), _w(sd, p + ".bias"), stride=stride, padding=pad)


def _resnet(x, temb, sd, p, eps=1e-5):
    h = _conv(F.silu(_gn(x, sd, p + ".norm1", eps)), sd, p + ".conv1")
    if temb is not None:
        t = F.linear(F.silu(temb), _w(sd, p + ".time_emb_proj.weight"), _w(sd, p + ".time_emb_proj.bias"))
        h = h + t[:, :, None, None]
    h = _conv(F.silu(_gn(h, sd, p + ".norm2", eps)), sd, p + ".conv2")
    if p + ".conv_shortcut.weight" in sd:
        x = F.conv2d(x, _w(sd, p + ".conv_shortcut.weight"), _w(sd, p + ".conv_shortcut.bias"))
    return x + h


def _ln(x, sd, p):
    return F.layer_norm(x, (x.shape[-1],), _w(sd, p + ".weight"), _w(sd, p + ".bias"), 1e-5)


def _mha(x, sd, p, heads, ctx=None):
    src = x if ctx is None else ctx
    q = F.linear(x, _w(sd, p + ".to_q.weight"))
    k = F.linear(src, _w(sd, p + ".to_k.weight"))
    v = F.linear(src, _w(sd, p + ".to_v.weight"))
    b, n, inner = q.shape
    m, dh = k.shape[1], inner // heads
    q = q.view(b, n, heads, dh).transpose(1, 2)
    k = k.view(b, m, heads, dh).transpose(1, 2)
    v = v.view(b, m, heads, dh).transpose(1, 2)
    attn = ((q @ k.transpose(-1, -2)) * dh**-0.5).softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, n, inner)
    return F.linear(out, _w(sd, p + ".to_out.0.weight"), _w(sd, p + ".to_out.0.bias"))


def _tblock(x, sd, p, heads, ctx):
    x = x + _mha(_ln(x, sd, p + ".norm1"), sd, p + ".attn1", heads)
    x = x + _mha(_ln(x, sd, p + ".norm2"), sd, p + ".attn2", heads, ctx)
    h = F.linear(_ln(x, sd, p + ".norm3"), _w(sd, p + ".ff.net.0.proj.weight"), _w(sd, p + ".ff.net.0.proj.bias"))
    a, g = h.chunk(2, dim=-1)
    return x + F.linear(a * F.gelu(g), _w(sd, p + ".ff.net.2.weight"), _w(sd, p + ".ff.net.2.bias"))


def _transformer(x, sd, p, heads, ctx, depth):
    b, c, hh, ww = x.shape
    res = x
    h = _gn(x, sd, p + ".norm", 1e-6)
    h = F.conv2d(h, _w(sd, p + ".proj_in.weight"), _w(sd, p + ".proj_in.bias"))
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, -1)
    for d in range(depth):
        h = _tblock(h, sd, f"{p}.transformer_blocks.{d}", heads, ctx)
    h = h.reshape(b, hh, ww, -1).permute(0, 3, 1, 2)
    return F.conv2d(h, _w(sd, p + ".proj_out.weight"), _w(sd, p + ".proj_out.bias")) + res


def _timestep_embedding(t, dim):
    # diffusers get_timestep_embedding, flip_sin_to_cos=True, freq_shift=0
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def torch_unet_forward(sd, cfg, latents_nchw, t, ctx, added=None):
    temb = _timestep_embedding(t, cfg.block_channels[0])
    temb = F.linear(temb, _w(sd, "time_embedding.linear_1.weight"), _w(sd, "time_embedding.linear_1.bias"))
    temb = F.linear(F.silu(temb), _w(sd, "time_embedding.linear_2.weight"), _w(sd, "time_embedding.linear_2.bias"))
    if cfg.addition_emb_dim > 0:
        # diffusers SDXL add_embedding: fourier-embed each of the 6 time_ids
        # with get_timestep_embedding (flip_sin_to_cos=True), flatten, concat
        # with the pooled text_embeds, two linears with silu between
        b = latents_nchw.shape[0]
        added = added or {}
        text_embeds = added.get("text_embeds", torch.zeros(b, cfg.addition_emb_dim))
        time_ids = added.get("time_ids", torch.zeros(b, 6))
        tid = _timestep_embedding(time_ids.reshape(-1), cfg.addition_time_dim)
        aug = torch.cat([text_embeds, tid.reshape(b, -1)], dim=-1)
        aug = F.linear(aug, _w(sd, "add_embedding.linear_1.weight"), _w(sd, "add_embedding.linear_1.bias"))
        aug = F.linear(F.silu(aug), _w(sd, "add_embedding.linear_2.weight"), _w(sd, "add_embedding.linear_2.bias"))
        temb = temb + aug

    x = _conv(latents_nchw, sd, "conv_in")
    n = len(cfg.block_channels)
    skips = [x]
    for b in range(n):
        depth = cfg.transformer_depth[b]
        heads, _ = cfg.heads_for(cfg.block_channels[b])
        for i in range(cfg.layers_per_block):
            x = _resnet(x, temb, sd, f"down_blocks.{b}.resnets.{i}")
            if cfg.attn_blocks[b]:
                x = _transformer(x, sd, f"down_blocks.{b}.attentions.{i}", heads, ctx, depth)
            skips.append(x)
        if b < n - 1:
            x = _conv(x, sd, f"down_blocks.{b}.downsamplers.0.conv", stride=2, pad=1)
            skips.append(x)

    heads, _ = cfg.heads_for(cfg.block_channels[-1])
    mid_depth = cfg.transformer_depth[-1] if cfg.attn_blocks[-1] else 1
    x = _resnet(x, temb, sd, "mid_block.resnets.0")
    x = _transformer(x, sd, "mid_block.attentions.0", heads, ctx, mid_depth)
    x = _resnet(x, temb, sd, "mid_block.resnets.1")

    rev_ch = tuple(reversed(cfg.block_channels))
    rev_attn = tuple(reversed(cfg.attn_blocks))
    rev_depth = tuple(reversed(cfg.transformer_depth))
    for b in range(n):
        heads, _ = cfg.heads_for(rev_ch[b])
        for i in range(cfg.layers_per_block + 1):
            x = torch.cat([x, skips.pop()], dim=1)
            x = _resnet(x, temb, sd, f"up_blocks.{b}.resnets.{i}")
            if rev_attn[b]:
                x = _transformer(x, sd, f"up_blocks.{b}.attentions.{i}", heads, ctx, rev_depth[b])
        if b < n - 1:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = _conv(x, sd, f"up_blocks.{b}.upsamplers.0.conv")
    x = F.silu(_gn(x, sd, "conv_norm_out"))
    return _conv(x, sd, "conv_out")


def _vae_attn(x, sd, p):
    b, c, hh, ww = x.shape
    res = x
    h = _gn(x, sd, p + ".group_norm", 1e-6)
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    q = F.linear(h, _w(sd, p + ".to_q.weight"), _w(sd, p + ".to_q.bias"))
    k = F.linear(h, _w(sd, p + ".to_k.weight"), _w(sd, p + ".to_k.bias"))
    v = F.linear(h, _w(sd, p + ".to_v.weight"), _w(sd, p + ".to_v.bias"))
    attn = ((q @ k.transpose(-1, -2)) / math.sqrt(c)).softmax(dim=-1)
    out = F.linear(attn @ v, _w(sd, p + ".to_out.0.weight"), _w(sd, p + ".to_out.0.bias"))
    return res + out.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


def torch_vae_encode_mean(sd, cfg, img_nchw):
    x = _conv(img_nchw, sd, "encoder.conv_in")
    n = len(cfg.block_channels)
    for b in range(n):
        for i in range(cfg.layers_per_block):
            x = _resnet(x, None, sd, f"encoder.down_blocks.{b}.resnets.{i}", eps=1e-6)
        if b < n - 1:
            x = F.pad(x, (0, 1, 0, 1))  # diffusers VAE asymmetric downsample pad
            x = _conv(x, sd, f"encoder.down_blocks.{b}.downsamplers.0.conv", stride=2, pad=0)
    x = _resnet(x, None, sd, "encoder.mid_block.resnets.0", eps=1e-6)
    x = _vae_attn(x, sd, "encoder.mid_block.attentions.0")
    x = _resnet(x, None, sd, "encoder.mid_block.resnets.1", eps=1e-6)
    x = F.silu(_gn(x, sd, "encoder.conv_norm_out", 1e-6))
    moments = _conv(x, sd, "encoder.conv_out")
    moments = F.conv2d(moments, _w(sd, "quant_conv.weight"), _w(sd, "quant_conv.bias"))
    return moments[:, : cfg.latent_channels] * 0.18215


def torch_vae_decode(sd, cfg, lat_nchw):
    z = lat_nchw / 0.18215
    z = F.conv2d(z, _w(sd, "post_quant_conv.weight"), _w(sd, "post_quant_conv.bias"))
    x = _conv(z, sd, "decoder.conv_in")
    x = _resnet(x, None, sd, "decoder.mid_block.resnets.0", eps=1e-6)
    x = _vae_attn(x, sd, "decoder.mid_block.attentions.0")
    x = _resnet(x, None, sd, "decoder.mid_block.resnets.1", eps=1e-6)
    n = len(cfg.block_channels)
    for b in range(n):
        for i in range(cfg.layers_per_block + 1):
            x = _resnet(x, None, sd, f"decoder.up_blocks.{b}.resnets.{i}", eps=1e-6)
        if b < n - 1:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = _conv(x, sd, f"decoder.up_blocks.{b}.upsamplers.0.conv")
    x = F.silu(_gn(x, sd, "decoder.conv_norm_out", 1e-6))
    return _conv(x, sd, "decoder.conv_out")


# ---------------------------------------------------------------------------
# tests


def _unet_shapes(cfg):
    import jax

    model = UNet(cfg, dtype=jnp.float32)
    latents = jnp.zeros((1, 16, 16, cfg.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 6, cfg.context_dim))
    return jax.eval_shape(
        model.init, jax.random.PRNGKey(0), latents, t, ctx
    )["params"], model


def test_unet_conversion_matches_torch_forward():
    cfg = tiny_unet_config()
    shapes, model = _unet_shapes(cfg)
    rules = W.unet_conversion_rules(cfg)
    sd = _fabricate(rules, shapes, seed=0)
    params = W.convert_unet_state_dict(sd, cfg)

    rng = np.random.default_rng(1)
    lat = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    ts = np.asarray([500, 10], np.int64)
    ctx = rng.standard_normal((2, 6, cfg.context_dim)).astype(np.float32)

    eps, _ = model.apply(
        {"params": params}, jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx)
    )
    got = np.asarray(eps).transpose(0, 3, 1, 2)
    want = torch_unet_forward(
        sd, cfg, torch.from_numpy(lat.transpose(0, 3, 1, 2)),
        torch.from_numpy(ts), torch.from_numpy(ctx),
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sdxl_added_cond_conversion_matches_torch_forward():
    """SDXL micro-conditioning path: the converted add_embedding_linear_{1,2}
    must reproduce diffusers' add_embedding on real (orig, crop, target)
    time_ids — the values Runtime._added_cond now supplies (the reference's
    SDXL intent, sdxl_monkey_patch.py:89-214, never had this plumbing)."""
    from stablekeypoints_tpu.models.unet import sdxl_tiny_config

    cfg = sdxl_tiny_config()
    shapes, model = _unet_shapes(cfg)
    rules = W.unet_conversion_rules(cfg)
    sd = _fabricate(rules, shapes, seed=6)
    params = W.convert_unet_state_dict(sd, cfg)

    rng = np.random.default_rng(7)
    lat = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    ts = np.asarray([400, 3], np.int64)
    ctx = rng.standard_normal((2, 6, cfg.context_dim)).astype(np.float32)
    text_embeds = rng.standard_normal((2, cfg.addition_emb_dim)).astype(np.float32)
    time_ids = np.asarray([[512.0, 512.0, 0.0, 0.0, 512.0, 512.0]] * 2, np.float32)

    eps, _ = model.apply(
        {"params": params}, jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx),
        added_cond={
            "text_embeds": jnp.asarray(text_embeds),
            "time_ids": jnp.asarray(time_ids),
        },
    )
    got = np.asarray(eps).transpose(0, 3, 1, 2)
    want = torch_unet_forward(
        sd, cfg, torch.from_numpy(lat.transpose(0, 3, 1, 2)),
        torch.from_numpy(ts), torch.from_numpy(ctx),
        added={
            "text_embeds": torch.from_numpy(text_embeds),
            "time_ids": torch.from_numpy(time_ids),
        },
    ).numpy()
    # 1e-3, not the 1e-4 of the shallower tests: the tiny-SDXL topology is
    # depth (1,2,10) (~40 matmul/norm layers), and fp32 accumulation order
    # on CPU depends on how Eigen/XLA carve matmuls across the threads
    # available at run time — under a loaded machine the same weights
    # drift ~5e-4 from the torch oracle. A conversion bug is O(1).
    np.testing.assert_allclose(got, want, atol=1e-3)
    # and the zeros default (no added_cond) must equal explicit zeros —
    # i.e. the add-embedding branch is active, not skipped, by default
    eps_default, _ = model.apply(
        {"params": params}, jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx)
    )
    want_default = torch_unet_forward(
        sd, cfg, torch.from_numpy(lat.transpose(0, 3, 1, 2)),
        torch.from_numpy(ts), torch.from_numpy(ctx),
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(eps_default).transpose(0, 3, 1, 2), want_default, atol=1e-3
    )


def test_unet_conversion_covers_all_params():
    """Every Flax param leaf must be produced by the conversion (a missing
    rule would silently leave random init in a real load)."""
    import jax

    cfg = tiny_unet_config()
    shapes, _ = _unet_shapes(cfg)
    params = W.convert_unet_state_dict(
        _fabricate(W.unet_conversion_rules(cfg), shapes, seed=2), cfg
    )
    want = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(shapes)[0]}
    got = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert got == want


@pytest.fixture(scope="module")
def vae_setup():
    import jax

    cfg = tiny_vae_config()
    model = VAE(cfg, dtype=jnp.float32)
    images = jnp.zeros((1, 32, 32, cfg.in_channels))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), images)["params"]
    sd = _fabricate(W.vae_conversion_rules(cfg), shapes, seed=3)
    # rescale conv weights down: the tiny VAE stacks ~15 convs and f32
    # activations blow up with 0.2-std weights
    sd = {k: v * (0.3 if v.ndim == 4 else 1.0) for k, v in sd.items()}
    return cfg, model, sd, W.convert_vae_state_dict(sd, cfg)


def test_vae_encode_conversion_matches_torch(vae_setup):
    cfg, model, sd, params = vae_setup
    rng = np.random.default_rng(4)
    img = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(img), method=VAE.encode_mean)
    ).transpose(0, 3, 1, 2)
    want = torch_vae_encode_mean(sd, cfg, torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_vae_decode_conversion_matches_torch(vae_setup):
    cfg, model, sd, params = vae_setup
    rng = np.random.default_rng(5)
    lat = rng.standard_normal((2, 4, 4, cfg.latent_channels)).astype(np.float32) * 0.2
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(lat), method=VAE.decode)
    ).transpose(0, 3, 1, 2)
    want = torch_vae_decode(sd, cfg, torch.from_numpy(lat.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_vae_conversion_accepts_legacy_attention_names(vae_setup):
    """diffusers<=0.8-era checkpoints name the VAE mid attention
    query/key/value/proj_attn instead of to_q/to_k/to_v/to_out.0; the
    converter must accept both (the reference pins diffusers==0.8.0)."""
    cfg, model, sd, params = vae_setup
    legacy = {}
    for k, v in sd.items():
        k = (
            k.replace(".to_q.", ".query.")
            .replace(".to_k.", ".key.")
            .replace(".to_v.", ".value.")
            .replace(".to_out.0.", ".proj_attn.")
        )
        legacy[k] = v
    import jax

    params2 = W.convert_vae_state_dict(legacy, cfg)
    jax.tree_util.tree_map(np.testing.assert_array_equal, params, params2)
