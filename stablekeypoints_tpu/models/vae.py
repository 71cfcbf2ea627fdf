"""AutoencoderKL (SD VAE), Flax NHWC.

The pipeline only needs the encoder's posterior mean (`image2latent`,
ptp_utils.py:289-304, x0.18215 scaling) and — for generation — the decoder
(ptp_utils.py:315-321). Frozen; wrapped in stop_gradient by callers.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from stablekeypoints_tpu.models.layers import (
    Conv3x3Split,
    Downsample,
    GroupNorm,
    ResnetBlock,
    Upsample,
)

__all__ = [
    "VAEConfig", "Encoder", "Decoder", "VAE", "SD_VAE_CONFIG",
    "SDXL_VAE_CONFIG", "SCALING_FACTOR",
]

SCALING_FACTOR = 0.18215  # ptp_utils.py:303 (SD-1.x / SD-2.x)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    # diffusers vae config scaling_factor: latents entering the UNet are
    # mean * this. SD-1.x/2.x checkpoints: 0.18215 (reference
    # ptp_utils.py:303); SDXL's retrained VAE: 0.13025 — using the SD value
    # with an SDXL checkpoint feeds the UNet latents ~1.4x off the scale it
    # was trained at, a silent numeric divergence.
    scaling_factor: float = SCALING_FACTOR


SD_VAE_CONFIG = VAEConfig()

# same topology as SD's VAE, retrained for SDXL with a different scale
SDXL_VAE_CONFIG = VAEConfig(scaling_factor=0.13025)


def tiny_vae_config() -> VAEConfig:
    return VAEConfig(block_channels=(16, 32, 32, 32), layers_per_block=1)


class AttnBlock(nn.Module):
    """Single-head self-attention over spatial positions (VAE mid block)."""

    dtype: jnp.dtype = jnp.bfloat16
    flash: bool = False  # flash kernel at long seq (4096 at 512^2 inputs)
    mesh: "object" = None  # shard_map the kernel on multi-device meshes
    fused_gn: bool = False  # Pallas GroupNorm kernel (kernels/groupnorm.py)
    fused_gn_interpret: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(eps=1e-6, name="norm", fused=self.fused_gn,
                      fused_interpret=self.fused_gn_interpret, mesh=self.mesh)(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)

        from stablekeypoints_tpu.kernels.flash import (
            flash_self_attention,
            flash_supported,
        )

        n = h * w
        if self.flash and flash_supported(n, n, c):
            out = flash_self_attention(
                q[:, :, None, :], k[:, :, None, :], v[:, :, None, :],
                1.0 / math.sqrt(c), mesh=self.mesh,
            )[:, :, 0, :]
        else:
            sim = jnp.einsum("bnc,bmc->bnm", q, k, preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(sim / math.sqrt(c), axis=-1)
            out = jnp.einsum(
                "bnm,bmc->bnc", attn.astype(v.dtype), v, preferred_element_type=jnp.float32
            ).astype(x.dtype)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out.astype(x.dtype))
        return residual + out.reshape(b, h, w, c)


class Encoder(nn.Module):
    config: VAEConfig = SD_VAE_CONFIG
    dtype: jnp.dtype = jnp.bfloat16
    flash: bool = False
    mesh: "object" = None
    fused_gn: bool = False
    fused_gn_interpret: bool = False
    fused_gn_conv: bool = False  # one-HBM-pass GN+SiLU+conv (kernels/gn_conv.py)

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        fused = dict(fused_norm=self.fused_gn,
                     fused_interpret=self.fused_gn_interpret, mesh=self.mesh,
                     split_conv=True, fused_gn_conv=self.fused_gn_conv)
        x = x.astype(self.dtype)
        x = Conv3x3Split(cfg.block_channels[0], dtype=self.dtype, name="conv_in")(x)
        for b, ch in enumerate(cfg.block_channels):
            for i in range(cfg.layers_per_block):
                x = ResnetBlock(
                    ch, use_time_emb=False, eps=1e-6, dtype=self.dtype,
                    name=f"down_{b}_resnets_{i}", **fused,
                )(x)
            if b < len(cfg.block_channels) - 1:
                x = Downsample(
                    ch, asymmetric_pad=True, dtype=self.dtype, split_conv=True,
                    name=f"down_{b}_downsample",
                )(x)
        ch = cfg.block_channels[-1]
        x = ResnetBlock(ch, use_time_emb=False, eps=1e-6, dtype=self.dtype, name="mid_resnets_0", **fused)(x)
        x = AttnBlock(dtype=self.dtype, flash=self.flash, mesh=self.mesh, fused_gn=self.fused_gn, fused_gn_interpret=self.fused_gn_interpret, name="mid_attn")(x)
        x = ResnetBlock(ch, use_time_emb=False, eps=1e-6, dtype=self.dtype, name="mid_resnets_1", **fused)(x)
        x = GroupNorm(eps=1e-6, act="silu", name="conv_norm_out",
                      fused=self.fused_gn,
                      fused_interpret=self.fused_gn_interpret, mesh=self.mesh)(x)
        moments = nn.Conv(
            cfg.latent_channels * 2, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(x)
        moments = nn.Conv(
            cfg.latent_channels * 2, (1, 1), dtype=self.dtype, name="quant_conv"
        )(moments)
        return moments.astype(jnp.float32)  # [B, h/8, w/8, 2*latent]


class Decoder(nn.Module):
    config: VAEConfig = SD_VAE_CONFIG
    dtype: jnp.dtype = jnp.bfloat16
    flash: bool = False
    mesh: "object" = None
    fused_gn: bool = False
    fused_gn_interpret: bool = False
    fused_gn_conv: bool = False

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        fused = dict(fused_norm=self.fused_gn,
                     fused_interpret=self.fused_gn_interpret, mesh=self.mesh,
                     split_conv=True, fused_gn_conv=self.fused_gn_conv)
        z = z.astype(self.dtype)
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv")(z)
        ch = cfg.block_channels[-1]
        x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = ResnetBlock(ch, use_time_emb=False, eps=1e-6, dtype=self.dtype, name="mid_resnets_0", **fused)(x)
        x = AttnBlock(dtype=self.dtype, flash=self.flash, mesh=self.mesh, fused_gn=self.fused_gn, fused_gn_interpret=self.fused_gn_interpret, name="mid_attn")(x)
        x = ResnetBlock(ch, use_time_emb=False, eps=1e-6, dtype=self.dtype, name="mid_resnets_1", **fused)(x)
        for b, ch in enumerate(reversed(cfg.block_channels)):
            for i in range(cfg.layers_per_block + 1):
                x = ResnetBlock(
                    ch, use_time_emb=False, eps=1e-6, dtype=self.dtype,
                    name=f"up_{b}_resnets_{i}", **fused,
                )(x)
            if b < len(cfg.block_channels) - 1:
                x = Upsample(ch, dtype=self.dtype, split_conv=True, name=f"up_{b}_upsample")(x)
        x = GroupNorm(eps=1e-6, act="silu", name="conv_norm_out",
                      fused=self.fused_gn,
                      fused_interpret=self.fused_gn_interpret, mesh=self.mesh)(x)
        x = Conv3x3Split(cfg.in_channels, dtype=self.dtype, name="conv_out")(x)
        return x.astype(jnp.float32)


class VAE(nn.Module):
    """Encode/decode wrapper. `encode_mean` returns the posterior mean."""

    config: VAEConfig = SD_VAE_CONFIG
    dtype: jnp.dtype = jnp.bfloat16

    flash: bool = False
    mesh: "object" = None
    fused_gn: bool = False
    fused_gn_interpret: bool = False
    fused_gn_conv: bool = False

    def setup(self):
        self.encoder = Encoder(
            self.config, self.dtype, self.flash, self.mesh,
            self.fused_gn, self.fused_gn_interpret, self.fused_gn_conv,
        )
        self.decoder = Decoder(
            self.config, self.dtype, self.flash, self.mesh,
            self.fused_gn, self.fused_gn_interpret, self.fused_gn_conv,
        )

    def encode_mean(self, images: jnp.ndarray) -> jnp.ndarray:
        """images in [-1, 1], NHWC -> scaled latent mean [B, H/8, W/8, 4]."""
        moments = self.encoder(images)
        mean = moments[..., : self.config.latent_channels]
        return mean * self.config.scaling_factor

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(latents / self.config.scaling_factor)

    def __call__(self, images):
        # full autoencode; used for initialization so both halves get params
        return self.decode(self.encode_mean(images))
