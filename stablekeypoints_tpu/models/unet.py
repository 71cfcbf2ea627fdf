"""Stable Diffusion UNet (Flax, NHWC) with functional attention capture.

Replaces the reference's L0/L1 stack (diffusers UNet + monkey-patched
`CrossAttention.forward` + per-device `AttentionStore`,
ptp_utils.py:472-573, optimize_token.py:24-78) with a single functional
forward: cross-attention layers in the up path *return* their
upsampled-query token attention maps, so there is no hook/controller state
and the whole step jits cleanly.

Capture rule (matches the reference): up-path cross-attention layers whose
query sequence length is <= 32^2, first 4 in execution order
(ptp_utils.py:508-511). With 512^2 inputs that is the three 16^2 layers of
the second up block and the first 32^2 layer of the third.

TPU-first extra: `truncate=True` stops the forward as soon as the last
captured map is produced — the remaining up-path compute (including the
whole 64^2 block, the most conv-heavy part of the UNet) contributes nothing
to the keypoint losses, which only read the captured maps.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from stablekeypoints_tpu.models.layers import (
    Downsample,
    GroupNorm,
    ResnetBlock,
    TimestepEmbedder,
    Transformer2D,
    Upsample,
)

# remat-wrapped variants: backward recomputes block activations instead of
# storing them (the capture path's per-head attention tensors are the big
# win — [B, heads, res^2, T] never survives the forward)
ResnetBlockR = nn.remat(ResnetBlock)
Transformer2DR = nn.remat(Transformer2D)


def _blocks(cfg):
    res = ResnetBlockR if (cfg.remat and cfg.remat_resnets) else ResnetBlock
    tfm = Transformer2DR if cfg.remat else Transformer2D
    return res, tfm

__all__ = [
    "UNetConfig", "UNet", "SD15_CONFIG", "SD21_CONFIG", "SDXL_CONFIG",
    "tiny_unet_config", "sdxl_tiny_config", "sd21_tiny_config",
]


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # which down blocks have cross-attention transformers (mirrored in up path)
    attn_blocks: tuple[bool, ...] = (True, True, True, False)
    # transformer depth per block (SD1.5: all 1; SDXL: (0, 2, 10))
    transformer_depth: tuple[int, ...] = (1, 1, 1, 1)
    num_heads: int = 8  # SD1.x: fixed 8 heads, head dim = channels / 8
    # rematerialization: transformers must remat (their self-attention
    # softmax tensors at 64^2 are GBs); resnet conv activations are small
    # enough to store, and storing them skips recomputing the conv trunk in
    # the backward pass
    remat: bool = True  # transformers
    remat_resnets: bool = False
    head_dim_fixed: Optional[int] = None  # SDXL: fixed 64-dim heads instead
    context_dim: int = 768
    time_embed_dim_mult: int = 4
    # additional conditioning (SDXL micro-conditioning); 0 = disabled
    addition_emb_dim: int = 0
    addition_time_dim: int = 256
    # diffusers SDXL uses nn.Linear for transformer proj_in/out; we always
    # use 1x1 convs (identical math) — this flag only affects checkpoint
    # weight conversion
    linear_projection: bool = False
    # what the UNet output parameterizes: "epsilon" (SD-1.x, SD-2.x-base,
    # SDXL) or "v_prediction" (SD-2.x 768 checkpoints). Only generation
    # consumes eps — the keypoint pipeline uses attention maps only — but a
    # v-pred checkpoint sampled as epsilon produces garbage, so the sampler
    # converts (pipeline/generate.py:v_to_eps)
    prediction_type: str = "epsilon"
    max_capture_layers: int = 4
    capture_max_seq: int = 32 * 32
    # fused Pallas kernel for the capture softmax/head-mean (TPU);
    # interpret-mode fallback keeps CPU tests working
    pallas_capture: bool = False
    pallas_interpret: bool = False
    # keep the capture backward's dsim contraction in fp32 (strict parity
    # with the einsum fallback's rounding) instead of bf16 MXU-rate matmuls
    capture_fp32_bwd: bool = False
    # emit captured maps bf16 (halved HBM traffic on the [B, res^2, T]
    # tensors; fp32 head-mean accumulation). Flag-gated approximation
    capture_bf16: bool = False
    # Pallas flash attention for the long (>=1024-query) self-attention
    # layers: never materializes the [B, heads, seq, seq] similarity (4.3 GB
    # at 64^2/batch 8) — TPU only, einsum path elsewhere
    flash_attention: bool = False

    def heads_for(self, channels: int) -> tuple[int, int]:
        if self.head_dim_fixed is not None:
            return channels // self.head_dim_fixed, self.head_dim_fixed
        return self.num_heads, channels // self.num_heads


SD15_CONFIG = UNetConfig()

# SD-2.x topology (diffusers stabilityai/stable-diffusion-2-1[-base]):
# SD-1.5's 4-block layout with FIXED 64-dim heads (attention_head_dim
# [5, 10, 20, 20] = channels/64), 1024-dim OpenCLIP context, and linear
# transformer projections (use_linear_projection=True — conversion-only
# here, the math is identical 1x1 convs). The reference hardcodes SD-1.5
# (its main.py:26-31); this widens the supported checkpoint families.
SD21_CONFIG = UNetConfig(
    num_heads=0,
    head_dim_fixed=64,
    context_dim=1024,
    linear_projection=True,
)

# SDXL-base topology: 3 blocks, no attention at 128^2/64^2 extremes of the
# down path's first block, transformer depths (0, 2, 10), 64-dim heads,
# 2048-dim context, micro-conditioning via pooled-embed + time_ids. The
# reference's SDXL path (sdxl_monkey_patch.py) is vestigial/broken; this is
# the working equivalent under the same functional-capture design.
SDXL_CONFIG = UNetConfig(
    block_channels=(320, 640, 1280),
    attn_blocks=(False, True, True),
    transformer_depth=(1, 2, 10),
    num_heads=0,
    head_dim_fixed=64,
    context_dim=2048,
    addition_emb_dim=1280,
    linear_projection=True,
)


def sdxl_tiny_config() -> UNetConfig:
    """Scaled-down SDXL topology for tests."""
    return UNetConfig(
        block_channels=(32, 64, 128),
        attn_blocks=(False, True, True),
        transformer_depth=(1, 2, 2),
        num_heads=0,
        head_dim_fixed=16,
        context_dim=48,
        addition_emb_dim=32,
        addition_time_dim=8,
        remat=False,
    )


def sd21_tiny_config() -> UNetConfig:
    """Scaled-down SD-2.x topology for tests: 4 blocks, fixed head dim,
    linear transformer projections (SD21_CONFIG's distinguishing traits)."""
    import dataclasses as _dc

    return _dc.replace(
        tiny_unet_config(context_dim=48),
        num_heads=0,
        head_dim_fixed=16,
        linear_projection=True,
    )


def tiny_unet_config(context_dim: int = 32, remat: bool = False) -> UNetConfig:
    """A scaled-down config with the same topology, for tests.

    remat defaults off for test speed; test_remat_gradients_match covers
    the remat path explicitly.
    """
    return UNetConfig(
        block_channels=(32, 64, 128, 128),
        num_heads=4,
        context_dim=context_dim,
        remat=remat,
    )


class DownBlock(nn.Module):
    config: UNetConfig
    block_idx: int
    dtype: jnp.dtype
    mesh: "object" = None

    @nn.compact
    def __call__(self, x, temb, context):
        cfg = self.config
        ch = cfg.block_channels[self.block_idx]
        has_attn = cfg.attn_blocks[self.block_idx]
        heads, dim_head = cfg.heads_for(ch)
        Res, Tfm = _blocks(cfg)
        skips = []
        for i in range(cfg.layers_per_block):
            x = Res(ch, dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            if has_attn:
                x, _ = Tfm(
                    heads,
                    dim_head,
                    depth=cfg.transformer_depth[self.block_idx],
                    dtype=self.dtype,
                    flash=cfg.flash_attention,
                    mesh=self.mesh,
                    name=f"attentions_{i}",
                )(x, context)
            skips.append(x)
        if self.block_idx < len(cfg.block_channels) - 1:
            x = Downsample(ch, dtype=self.dtype, name="downsample")(x)
            skips.append(x)
        return x, skips


class MidBlock(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype
    mesh: "object" = None

    @nn.compact
    def __call__(self, x, temb, context):
        cfg = self.config
        ch = cfg.block_channels[-1]
        heads, dim_head = cfg.heads_for(ch)
        Res, Tfm = _blocks(cfg)
        x = Res(ch, dtype=self.dtype, name="resnets_0")(x, temb)
        x, _ = Tfm(
            heads,
            dim_head,
            depth=cfg.transformer_depth[-1] if cfg.attn_blocks[-1] else 1,
            dtype=self.dtype,
            flash=cfg.flash_attention,
            mesh=self.mesh,
            name="attentions_0",
        )(x, context)
        x = Res(ch, dtype=self.dtype, name="resnets_1")(x, temb)
        return x


class UpBlock(nn.Module):
    """One up block; returns early if truncation hits inside it."""

    config: UNetConfig
    block_idx: int  # index into the *reversed* channel list
    dtype: jnp.dtype
    mesh: "object" = None

    @nn.compact
    def __call__(self, x, skips, temb, context, capture_state):
        cfg = self.config
        rev_channels = tuple(reversed(cfg.block_channels))
        rev_attn = tuple(reversed(cfg.attn_blocks))
        rev_depth = tuple(reversed(cfg.transformer_depth))
        ch = rev_channels[self.block_idx]
        has_attn = rev_attn[self.block_idx]
        heads, dim_head = cfg.heads_for(ch)
        capture_res, truncate, captures = capture_state
        Res, Tfm = _blocks(cfg)

        n_layers = cfg.layers_per_block + 1
        for i in range(n_layers):
            skip = skips.pop()
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = Res(ch, dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            if has_attn:
                seq = x.shape[1] * x.shape[2]
                do_capture = (
                    capture_res is not None
                    and seq <= cfg.capture_max_seq
                    and len(captures) < cfg.max_capture_layers
                )
                x, cap = Tfm(
                    heads,
                    dim_head,
                    depth=rev_depth[self.block_idx],
                    dtype=self.dtype,
                    capture_res=capture_res if do_capture else None,
                    pallas_capture=cfg.pallas_capture,
                    pallas_interpret=cfg.pallas_interpret,
                    capture_fp32_bwd=cfg.capture_fp32_bwd,
                    capture_bf16=cfg.capture_bf16,
                    flash=cfg.flash_attention,
                    mesh=self.mesh,
                    name=f"attentions_{i}",
                )(x, context)
                if cap is not None:
                    captures.append(cap)
                    if truncate and len(captures) >= cfg.max_capture_layers:
                        return x, captures, True
        if self.block_idx < len(rev_channels) - 1:
            x = Upsample(ch, dtype=self.dtype, name="upsample")(x)
        return x, captures, False


class UNet(nn.Module):
    """SD UNet. __call__ returns (eps_prediction, [captured maps]).

    captured maps: list of [B, capture_res^2, T] fp32 arrays, execution
    order. When `truncate=True` and capture is active, eps is None.
    """

    config: UNetConfig = SD15_CONFIG
    dtype: jnp.dtype = jnp.bfloat16
    # multi-device mesh: routes the Pallas kernels through shard_map
    mesh: "object" = None

    @nn.compact
    def __call__(
        self,
        latents: jnp.ndarray,  # [B, H, W, C] noisy latents (NHWC)
        timesteps: jnp.ndarray,  # [B]
        context: jnp.ndarray,  # [B, T, context_dim]
        capture_res: Optional[int] = None,
        truncate: bool = False,
        added_cond: Optional[dict] = None,  # SDXL: {'text_embeds', 'time_ids'}
    ):
        cfg = self.config
        model_dim = cfg.block_channels[0]
        temb_dim = model_dim * cfg.time_embed_dim_mult

        temb = TimestepEmbedder(model_dim, temb_dim, dtype=self.dtype, name="time_embedding")(
            timesteps
        )
        if cfg.addition_emb_dim > 0:
            # SDXL micro-conditioning: fourier-embedded time_ids + pooled
            # text embedding, projected and added to the time embedding.
            # With the learned context replacing the text encoders, the
            # pooled embedding defaults to zeros (it can also be learned).
            b = latents.shape[0]
            if added_cond is None:
                added_cond = {}
            text_embeds = added_cond.get(
                "text_embeds",
                jnp.zeros((b, cfg.addition_emb_dim), jnp.float32),
            )
            time_ids = added_cond.get("time_ids", jnp.zeros((b, 6), jnp.float32))
            from stablekeypoints_tpu.models.layers import timestep_embedding

            tid = timestep_embedding(time_ids.reshape(-1), cfg.addition_time_dim)
            tid = tid.reshape(b, -1)
            aug = jnp.concatenate([text_embeds, tid], axis=-1).astype(self.dtype)
            aug = nn.Dense(temb_dim, dtype=self.dtype, name="add_embedding_linear_1")(aug)
            aug = nn.silu(aug)
            aug = nn.Dense(temb_dim, dtype=self.dtype, name="add_embedding_linear_2")(aug)
            temb = temb + aug
        x = latents.astype(self.dtype)
        context = context.astype(self.dtype)
        x = nn.Conv(model_dim, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)

        skips = [x]
        for b in range(len(cfg.block_channels)):
            x, block_skips = DownBlock(cfg, b, self.dtype, self.mesh, name=f"down_{b}")(
                x, temb, context
            )
            skips.extend(block_skips)

        x = MidBlock(cfg, self.dtype, self.mesh, name="mid")(x, temb, context)

        captures: list[jnp.ndarray] = []
        for b in range(len(cfg.block_channels)):
            x, captures, truncated = UpBlock(cfg, b, self.dtype, self.mesh, name=f"up_{b}")(
                x, skips, temb, context, (capture_res, truncate, captures)
            )
            if truncated:
                return None, captures

        x = GroupNorm(act="silu", name="conv_norm_out")(x)
        eps = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return eps.astype(jnp.float32), captures
