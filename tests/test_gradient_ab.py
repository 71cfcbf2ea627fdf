"""Gradient + optimization-trajectory A/B vs the torch oracle.

Round 2 A/B-tested every op's FORWARD against the reference's executed
code; this file closes the remaining offline gap (VERDICT round 2, next #1):
the BACKWARD through the capture path + losses, and the composition of
backward + Adam over several steps.

  1. d(loss)/d(context) through [UNet capture forward -> collect_maps ->
     selection -> sharpening + equivariance losses] must agree between
     jax.grad on the repo's model and torch autograd on a from-scratch
     torch oracle of the diffusers/reference semantics, on a fabricated
     tiny SD-topology checkpoint (reference backward: optimize.py:422;
     capture recompute: ptp_utils.py:508-538).
  2. ~5 identical Adam steps (shared noise/theta injected into both
     frameworks) must produce tracking loss trajectories and contexts
     (reference optimizer: optimize.py:320, step at optimize.py:420-425).

The torch capture forward implements the REFERENCE's operation order —
bicubic-upsample the post-norm2 hidden states, then re-project to queries
(ptp_utils.py:519-526) — while the repo's layer projects first and
upsamples the queries (a linear-ops commute); agreement here validates the
commute through the backward as well. The losses on the torch side are the
reference's own executed functions (via tests/reference_loader.py).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

import test_conversion_numeric as C
from reference_loader import load_reference

from stablekeypoints_tpu.models.unet import UNet, tiny_unet_config
from stablekeypoints_tpu.models import weights as W
from stablekeypoints_tpu.models.scheduler import DDIMSchedule
from stablekeypoints_tpu.ops.losses import equivariance_loss, sharpening_loss
from stablekeypoints_tpu.ops.selection import furthest_point_sampling, select_candidates
from stablekeypoints_tpu.ops.transforms import AffineParams, apply_affine, make_theta
from stablekeypoints_tpu.pipeline.runtime import collect_maps

pytestmark = [pytest.mark.slow, pytest.mark.oracle]  # model-heavy torch-oracle A/B


ref = load_reference()

CAPTURE_RES = 16
NUM_TOKENS = 12
N_CANDS = 8
TOP_K = 4
SIGMA = 2.0
W_SHARP = 100.0
W_EQUI = 1000.0


# ---------------------------------------------------------------------------
# torch oracle: UNet forward with reference-semantics capture


def _capture_map(h_ln, sd, p_attn, heads, ctx, res):
    """Reference capture recompute (ptp_utils.py:508-538): bicubic-upsample
    the post-norm2 hidden states, project to q, softmax(q k^T / sqrt(d))
    over tokens, mean over heads -> [b, res^2, T]."""
    b, n, c = h_ln.shape
    s = int(round(math.sqrt(n)))
    sp = h_ln.reshape(b, s, s, c).permute(0, 3, 1, 2)
    up = F.interpolate(sp, size=(res, res), mode="bicubic", align_corners=False)
    up = up.permute(0, 2, 3, 1).reshape(b, res * res, c)
    q = F.linear(up, C._w(sd, p_attn + ".to_q.weight"))
    k = F.linear(ctx, C._w(sd, p_attn + ".to_k.weight"))
    dh = q.shape[-1] // heads
    q = q.view(b, -1, heads, dh).transpose(1, 2)
    k = k.view(b, -1, heads, dh).transpose(1, 2)
    attn = ((q @ k.transpose(-1, -2)) * dh**-0.5).softmax(dim=-1)
    return attn.mean(dim=1)


def _tblock_capture(x, sd, p, heads, ctx, res):
    x = x + C._mha(C._ln(x, sd, p + ".norm1"), sd, p + ".attn1", heads)
    h_ln = C._ln(x, sd, p + ".norm2")
    cap = _capture_map(h_ln, sd, p + ".attn2", heads, ctx, res)
    x = x + C._mha(h_ln, sd, p + ".attn2", heads, ctx)
    h = F.linear(
        C._ln(x, sd, p + ".norm3"),
        C._w(sd, p + ".ff.net.0.proj.weight"),
        C._w(sd, p + ".ff.net.0.proj.bias"),
    )
    a, g = h.chunk(2, dim=-1)
    x = x + F.linear(
        a * F.gelu(g), C._w(sd, p + ".ff.net.2.weight"), C._w(sd, p + ".ff.net.2.bias")
    )
    return x, cap


def _transformer_capture(x, sd, p, heads, ctx, depth, res):
    b, c, hh, ww = x.shape
    resd = x
    h = C._gn(x, sd, p + ".norm", 1e-6)
    h = F.conv2d(h, C._w(sd, p + ".proj_in.weight"), C._w(sd, p + ".proj_in.bias"))
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, -1)
    cap = None
    for d in range(depth):
        if d == 0:
            h, cap = _tblock_capture(h, sd, f"{p}.transformer_blocks.{d}", heads, ctx, res)
        else:
            h = C._tblock(h, sd, f"{p}.transformer_blocks.{d}", heads, ctx)
    h = h.reshape(b, hh, ww, -1).permute(0, 3, 1, 2)
    out = F.conv2d(h, C._w(sd, p + ".proj_out.weight"), C._w(sd, p + ".proj_out.bias")) + resd
    return out, cap


def torch_capture_forward(sd, cfg, latents_nchw, t, ctx, res, max_layers=4):
    """Truncated forward returning the first `max_layers` up-path capture
    maps in execution order (the repo's truncate=True semantics; capture
    rule: up-block cross-attn layers with seq <= capture_max_seq)."""
    temb = C._timestep_embedding(t, cfg.block_channels[0])
    temb = F.linear(temb, C._w(sd, "time_embedding.linear_1.weight"), C._w(sd, "time_embedding.linear_1.bias"))
    temb = F.linear(F.silu(temb), C._w(sd, "time_embedding.linear_2.weight"), C._w(sd, "time_embedding.linear_2.bias"))

    x = C._conv(latents_nchw, sd, "conv_in")
    n = len(cfg.block_channels)
    skips = [x]
    for b in range(n):
        depth = cfg.transformer_depth[b]
        heads, _ = cfg.heads_for(cfg.block_channels[b])
        for i in range(cfg.layers_per_block):
            x = C._resnet(x, temb, sd, f"down_blocks.{b}.resnets.{i}")
            if cfg.attn_blocks[b]:
                x = C._transformer(x, sd, f"down_blocks.{b}.attentions.{i}", heads, ctx, depth)
            skips.append(x)
        if b < n - 1:
            x = C._conv(x, sd, f"down_blocks.{b}.downsamplers.0.conv", stride=2, pad=1)
            skips.append(x)

    heads, _ = cfg.heads_for(cfg.block_channels[-1])
    mid_depth = cfg.transformer_depth[-1] if cfg.attn_blocks[-1] else 1
    x = C._resnet(x, temb, sd, "mid_block.resnets.0")
    x = C._transformer(x, sd, "mid_block.attentions.0", heads, ctx, mid_depth)
    x = C._resnet(x, temb, sd, "mid_block.resnets.1")

    rev_ch = tuple(reversed(cfg.block_channels))
    rev_attn = tuple(reversed(cfg.attn_blocks))
    rev_depth = tuple(reversed(cfg.transformer_depth))
    captures = []
    for b in range(n):
        heads, _ = cfg.heads_for(rev_ch[b])
        for i in range(cfg.layers_per_block + 1):
            x = torch.cat([x, skips.pop()], dim=1)
            x = C._resnet(x, temb, sd, f"up_blocks.{b}.resnets.{i}")
            if rev_attn[b]:
                seq = x.shape[2] * x.shape[3]
                if seq <= cfg.capture_max_seq and len(captures) < max_layers:
                    x, cap = _transformer_capture(
                        x, sd, f"up_blocks.{b}.attentions.{i}", heads, ctx,
                        rev_depth[b], res,
                    )
                    captures.append(cap)
                    if len(captures) >= max_layers:
                        return captures
                else:
                    x = C._transformer(x, sd, f"up_blocks.{b}.attentions.{i}", heads, ctx, rev_depth[b])
        if b < n - 1:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = C._conv(x, sd, f"up_blocks.{b}.upsamplers.0.conv")
    return captures


def torch_collect(captures):
    """collect_maps semantics (optimize.py:27-79): mean over layers+heads
    (heads already reduced), [b, r^2, T] -> [b, T, r, r]."""
    maps = torch.stack(captures, dim=0).mean(0)
    b, rr, t = maps.shape
    r = int(round(math.sqrt(rr)))
    return maps.transpose(1, 2).reshape(b, t, r, r)


def torch_loss(sd, cfg, noisy_nchw, ts, ctx_param, theta_np):
    """The reference per-image chain (optimize.py:380-414) on the oracle:
    candidates from ORIGINAL maps, FPS on TRANSFORMED maps, both losses,
    weighted sum. noisy_nchw: [2, C, h, w] = [orig; warped]."""
    ctx = ctx_param.expand(2, -1, -1)
    caps = torch_capture_forward(sd, cfg, noisy_nchw, ts, ctx, CAPTURE_RES)
    maps_all = torch_collect(caps)
    m, mt = maps_all[0], maps_all[1]
    cands = ref.ptp_utils.find_top_k_gaussian(m.detach(), N_CANDS, sigma=SIGMA)
    idx = ref.ptp_utils.furthest_point_sampling(mt.detach(), TOP_K, cands)
    sl = ref.optimize.sharpening_loss(m[idx], sigma=SIGMA, device="cpu")
    tr = ref.invertable_transform.RandomAffineWithInverse()
    tr.last_params = {"theta": torch.from_numpy(theta_np[None])}
    el = ref.optimize.equivariance_loss(m[idx], mt[idx][None], tr, 0)
    return sl * W_SHARP + el * W_EQUI, idx


# ---------------------------------------------------------------------------
# jax side: the repo's own composition (mirrors Runtime._train_step loss_fn)


def _setup():
    cfg = tiny_unet_config()
    shapes, model = C._unet_shapes(cfg)
    rules = W.unet_conversion_rules(cfg)
    sd = C._fabricate(rules, shapes, seed=7)
    params = W.convert_unet_state_dict(sd, cfg)

    rng = np.random.default_rng(8)
    latents = rng.standard_normal((1, 16, 16, 4)).astype(np.float32) * 0.3
    theta = np.asarray(make_theta(9.0, 0.9, 0.12, -0.08), np.float32)
    aff = AffineParams()
    latents_t = np.asarray(apply_affine(jnp.asarray(latents), jnp.asarray(theta)[None], params=aff))
    ctx0 = (0.1 * rng.standard_normal((1, NUM_TOKENS, cfg.context_dim))).astype(np.float32)
    schedule = DDIMSchedule.create()
    t = schedule.timestep_at(-1)
    return cfg, sd, params, model, latents, latents_t, theta, aff, ctx0, schedule, t


def jax_loss_fn(model, params, aff):
    def loss_fn(ctx, noisy, theta):
        ctxb = jnp.broadcast_to(ctx, (2, *ctx.shape[1:]))
        ts = jnp.full((2,), TS_VALUE, jnp.int32)
        _, caps = model.apply(
            {"params": params}, noisy, ts, ctxb, capture_res=CAPTURE_RES, truncate=True
        )
        maps_all = collect_maps(caps, (0, 1, 2, 3), -1, None)
        m, mt = maps_all[0], maps_all[1]
        cands = select_candidates(jax.lax.stop_gradient(m), "gaussian", N_CANDS, sigma=SIGMA)
        idx = furthest_point_sampling(jax.lax.stop_gradient(mt), TOP_K, cands)
        sl = sharpening_loss(m[idx], sigma=SIGMA)
        el = equivariance_loss(m[idx], mt[idx], theta, params=aff)
        return sl * W_SHARP + el * W_EQUI, idx

    return loss_fn


TS_VALUE = None  # set in _setup-dependent tests (static for jit friendliness)


def _noisy_pair(schedule, latents, latents_t, t, noise):
    both = np.concatenate([latents, latents_t], axis=0)
    return np.asarray(
        schedule.add_noise(jnp.asarray(both), jnp.asarray(noise), t), np.float32
    )


def test_context_gradient_matches_torch_oracle():
    global TS_VALUE
    cfg, sd, params, model, latents, latents_t, theta, aff, ctx0, schedule, t = _setup()
    TS_VALUE = t
    rng = np.random.default_rng(9)
    noise = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    noisy = _noisy_pair(schedule, latents, latents_t, t, noise)

    loss_fn = jax_loss_fn(model, params, aff)
    (jl, jidx), jg = jax.value_and_grad(loss_fn, has_aux=True)(
        jnp.asarray(ctx0), jnp.asarray(noisy), jnp.asarray(theta)
    )

    ctx_t = torch.from_numpy(ctx0.copy()).requires_grad_(True)
    tl, tidx = torch_loss(
        sd, cfg, torch.from_numpy(noisy.transpose(0, 3, 1, 2)),
        torch.tensor([t, t]), ctx_t, theta,
    )
    tl.backward()

    np.testing.assert_array_equal(np.asarray(jidx), tidx.numpy())
    assert abs(float(jl) - float(tl)) < 1e-4 * max(1.0, abs(float(tl)))
    jg = np.asarray(jg)
    tg = ctx_t.grad.numpy()
    scale = np.abs(tg).max()
    assert scale > 0
    np.testing.assert_allclose(jg / scale, tg / scale, atol=1e-4)


def test_adam_trajectory_tracks_torch_oracle():
    """5 shared-noise Adam steps: the loss trajectories and the optimized
    contexts must track across frameworks (optimize.py:320, 420-425; both
    sides use Adam(lr=5e-3, betas=(0.9, 0.999), eps=1e-8))."""
    import optax

    global TS_VALUE
    cfg, sd, params, model, latents, latents_t, theta, aff, ctx0, schedule, t = _setup()
    TS_VALUE = t
    lr = 5e-3
    steps = 5
    rng = np.random.default_rng(10)
    noises = [rng.standard_normal((2, 16, 16, 4)).astype(np.float32) for _ in range(steps)]

    # jax: the repo's optimizer (optax.adam matches torch defaults)
    loss_fn = jax_loss_fn(model, params, aff)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    opt = optax.adam(lr)
    jctx = jnp.asarray(ctx0)
    jstate = opt.init(jctx)
    jlosses = []
    for i in range(steps):
        noisy = _noisy_pair(schedule, latents, latents_t, t, noises[i])
        (jl, _), jg = grad_fn(jctx, jnp.asarray(noisy), jnp.asarray(theta))
        updates, jstate = opt.update(jg, jstate, jctx)
        jctx = optax.apply_updates(jctx, updates)
        jlosses.append(float(jl))

    # torch: same steps on the oracle
    tctx = torch.from_numpy(ctx0.copy()).requires_grad_(True)
    topt = torch.optim.Adam([tctx], lr=lr)
    tlosses = []
    for i in range(steps):
        noisy = _noisy_pair(schedule, latents, latents_t, t, noises[i])
        topt.zero_grad()
        tl, _ = torch_loss(
            sd, cfg, torch.from_numpy(noisy.transpose(0, 3, 1, 2)),
            torch.tensor([t, t]), tctx, theta,
        )
        tl.backward()
        topt.step()
        tlosses.append(float(tl))

    np.testing.assert_allclose(jlosses, tlosses, rtol=1e-3)
    jc = np.asarray(jctx)
    tc = tctx.detach().numpy()
    drift = np.linalg.norm(jc - tc) / max(np.linalg.norm(tc - ctx0), 1e-12)
    assert drift < 1e-2, f"context trajectories diverged: rel drift {drift:.2e}"
    # and the optimization is actually doing something
    assert np.linalg.norm(tc - ctx0) > 0
