"""Shared Flax building blocks for the SD UNet and VAE (NHWC, TPU-first).

Architecture follows Stable Diffusion 1.x (the reference's frozen backbone,
loaded via diffusers in optimize_token.py:24-78); implementation is
independent and idiomatic JAX: NHWC layout, bf16 compute with fp32 norms and
fp32 attention softmax, explicit functional state.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from stablekeypoints_tpu.ops.resize import upsample_bicubic_headmajor

__all__ = [
    "timestep_embedding",
    "TimestepEmbedder",
    "ResnetBlock",
    "Downsample",
    "Upsample",
    "CrossAttention",
    "BasicTransformerBlock",
    "Transformer2D",
]


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [cos, sin] order (SD convention).

    t: [B] float/int timesteps -> [B, dim].
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimestepEmbedder(nn.Module):
    """Two-layer MLP on the sinusoidal embedding."""

    model_dim: int
    emb_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        x = timestep_embedding(t, self.model_dim)
        x = nn.Dense(self.emb_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.emb_dim, dtype=self.dtype, name="linear_2")(x)
        return x


def _group_norm(
    x: jnp.ndarray,
    scale,
    bias,
    groups: int = 32,
    eps: float = 1e-5,
    act: Optional[str] = None,
):
    """GroupNorm (fp32 math) over NHWC, optionally fused with SiLU.

    HBM-bandwidth-shaped: statistics come from fp32-accumulated reductions on
    the (bf16) input and the normalization is folded into per-(batch,channel)
    affine coefficients, so the activation tensor is read twice and written
    once — never materialized in fp32 (the former fp32 upcast dominated the
    512^2 VAE-encoder stages). `act="silu"` applies SiLU inside the same
    fused elementwise pass (fp32, then a single downcast).

    Channel counts that 32 doesn't divide (tiny test configs) fall back to
    gcd(groups, channels); real SD channel counts are all multiples of 32.
    """
    dtype = x.dtype
    b, h, w, c = x.shape
    groups = math.gcd(groups, c)
    xg = x.reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)  # [b, g]
    var = jnp.mean(
        jnp.square(xg.astype(jnp.float32) - mean[:, None, :, None]), axis=(1, 3)
    )  # [b, g] — two-pass variance: stable, and XLA fuses the subtract into
    #    the reduction (no fp32 copy of x)
    inv = jax.lax.rsqrt(var + eps)
    inv_c = jnp.repeat(inv, c // groups, axis=1)  # [b, c]
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    a = inv_c * scale.astype(jnp.float32)[None]
    b_coef = bias.astype(jnp.float32)[None] - mean_c * a
    y = x.astype(jnp.float32) * a[:, None, None, :] + b_coef[:, None, None, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(dtype)


def _group_norm_coeffs(x, scale, bias, groups: int = 32, eps: float = 1e-5):
    """jnp fallback for kernels.groupnorm.gn_affine_coeffs: GroupNorm folded
    into per-(batch, channel) affine coefficients (m_q, a, b_comp), with the
    same compensated center-first x.dtype rounding. Consumers apply
    `(x - m_q)*a + b_comp` in x.dtype (the fused-GN apply numerics)."""
    b, h, w, c = x.shape
    groups = math.gcd(groups, c)
    xg = x.reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)  # [b, g]
    var = jnp.mean(
        jnp.square(xg.astype(jnp.float32) - mean[:, None, :, None]), axis=(1, 3)
    )
    inv = jax.lax.rsqrt(var + eps)
    inv_c = jnp.repeat(inv, c // groups, axis=1)  # [b, c]
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    a = inv_c * scale.astype(jnp.float32)[None]
    m_q = mean_c.astype(x.dtype).astype(jnp.float32)
    b_comp = bias.astype(jnp.float32)[None] + (m_q - mean_c) * a
    return m_q, a, b_comp


class GroupNorm(nn.Module):
    groups: int = 32
    eps: float = 1e-5
    act: Optional[str] = None  # "silu" fuses the following activation
    # two-pass Pallas kernel (kernels/groupnorm.py) for bandwidth-bound
    # never-differentiated stages (the VAE): ~3 bf16 HBM passes instead of
    # XLA's materialized-fp32 lowering
    fused: bool = False
    fused_interpret: bool = False
    mesh: "object" = None
    # return (m_q, a, b_comp) affine coefficients instead of applying them —
    # the fused GN+SiLU+conv kernel (kernels/gn_conv.py) consumes these and
    # applies norm+act inside the conv's HBM pass. Same param tree.
    coeffs_only: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.coeffs_only:
            # the only consumer (fused_gn_silu_conv3x3) applies SiLU
            # unconditionally — make that contract explicit
            assert self.act == "silu", (
                f"coeffs_only implies a SiLU-fused consumer; act={self.act!r}"
            )
            from stablekeypoints_tpu.kernels.groupnorm import (
                fused_group_norm_supported,
                gn_affine_coeffs,
            )

            groups = math.gcd(self.groups, c)
            if self.fused and fused_group_norm_supported(
                x.shape[1] * x.shape[2], c, groups, self.fused_interpret
            ):
                return gn_affine_coeffs(
                    x, scale, bias, groups, self.eps, self.fused_interpret, self.mesh
                )
            return _group_norm_coeffs(x, scale, bias, self.groups, self.eps)
        if self.fused:
            from stablekeypoints_tpu.kernels.groupnorm import (
                fused_group_norm,
                fused_group_norm_supported,
            )

            groups = math.gcd(self.groups, c)
            if fused_group_norm_supported(
                x.shape[1] * x.shape[2], c, groups, self.fused_interpret
            ):
                return fused_group_norm(
                    x, scale, bias, groups, self.eps, self.act,
                    self.fused_interpret, self.mesh,
                )
        return _group_norm(x, scale, bias, self.groups, self.eps, self.act)


class Conv3x3Split(nn.Module):
    """nn.Conv(3x3)-compatible conv that folds H-slabs into the batch axis
    at small-batch x large-spatial shapes (ops/convsplit.py; bit-exact, ~7x
    on the batch-1 1024^2 VAE shapes). Same param tree as nn.Conv, so
    checkpoint conversion is unchanged; identical to nn.Conv when the auto
    gate picks parts=1."""

    out_channels: int
    stride: int = 1
    asymmetric_pad: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    fused_interpret: bool = False
    mesh: "object" = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        gn: Optional[tuple] = None,
        residual: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        from stablekeypoints_tpu.ops.convsplit import conv3x3_spatial_split

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.out_channels),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.out_channels,), jnp.float32
        )
        if gn is not None:
            # fused GN-affine+SiLU+conv(+residual) single-HBM-pass kernel;
            # callers gate on fused_gn_conv_supported (stride 1, symmetric
            # padding only — the kernel has no other geometry)
            assert self.stride == 1 and not self.asymmetric_pad
            from stablekeypoints_tpu.kernels.gn_conv import fused_gn_silu_conv3x3

            m, a, b_comp = gn
            return fused_gn_silu_conv3x3(
                x.astype(self.dtype), m, a, b_comp, kernel, bias,
                residual=residual, interpret=self.fused_interpret, mesh=self.mesh,
            )
        pad = (0, 1) if self.asymmetric_pad else (1, 1)
        y = conv3x3_spatial_split(
            x.astype(self.dtype), kernel.astype(self.dtype), self.stride, pad, pad,
            preferred_element_type=None,  # nn.Conv semantics: accumulate per
        )  # XLA's bf16-conv default (f32 internally), emit in compute dtype
        return y.astype(self.dtype) + bias.astype(self.dtype)


class ResnetBlock(nn.Module):
    """GN -> SiLU -> conv -> (+time) -> GN -> SiLU -> conv, residual add."""

    out_channels: int
    use_time_emb: bool = True
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    fused_norm: bool = False  # Pallas GroupNorm+SiLU (VAE-only, see GroupNorm)
    fused_interpret: bool = False
    mesh: "object" = None
    split_conv: bool = False  # Conv3x3Split instead of nn.Conv (VAE-only)
    # collapse GN+SiLU+conv(+residual) into ONE HBM pass per conv via the
    # Pallas kernel (kernels/gn_conv.py) — gated per layer on
    # fused_gn_conv_supported; falls back to the unfused path otherwise.
    # Parameter tree is identical either way (VAE-only, never-differentiated
    # path; the kernel's custom_vjp recomputes so it is safe regardless).
    fused_gn_conv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        fused = dict(
            fused=self.fused_norm, fused_interpret=self.fused_interpret, mesh=self.mesh
        )
        if self.split_conv:
            conv3 = lambda name: Conv3x3Split(
                self.out_channels, dtype=self.dtype, name=name,
                fused_interpret=self.fused_interpret, mesh=self.mesh,
            )
        else:
            conv3 = lambda name: nn.Conv(
                self.out_channels, (3, 3), padding=1, dtype=self.dtype, name=name
            )
        if self.fused_gn_conv and self.split_conv and not self.use_time_emb:
            from stablekeypoints_tpu.kernels.gn_conv import fused_gn_conv_supported

            bsz, hh, ww, cin = x.shape
            cout = self.out_channels
            # the two convs gate INDEPENDENTLY (e.g. sd21's 192^2 block:
            # conv1 (256->512) is a measured win while conv2 (512->512) is
            # skip-listed — an all-or-nothing gate would forfeit conv1)
            sup1 = fused_gn_conv_supported(
                hh, ww, cin, cout, 1, self.fused_interpret, has_res=False
            )
            sup2 = fused_gn_conv_supported(
                hh, ww, cout, cout, 1, self.fused_interpret, has_res=True
            )
            if sup1 or sup2:
                # normalize the CAST activation: coefficients must be
                # rounded/compensated in the dtype the kernel applies them in
                xc = x.astype(self.dtype)
                residual = x
                if cin != cout:
                    residual = nn.Conv(
                        cout, (1, 1), dtype=self.dtype, name="conv_shortcut"
                    )(x)
                residual = residual.astype(self.dtype)
                if sup1:
                    gn1 = GroupNorm(eps=self.eps, act="silu", name="norm1",
                                    coeffs_only=True, **fused)(xc)
                    h = conv3("conv1")(xc, gn=gn1)
                else:
                    h = GroupNorm(eps=self.eps, act="silu", name="norm1", **fused)(xc)
                    h = conv3("conv1")(h)
                if sup2:
                    gn2 = GroupNorm(eps=self.eps, act="silu", name="norm2",
                                    coeffs_only=True, **fused)(h)
                    return conv3("conv2")(h, gn=gn2, residual=residual)
                h = GroupNorm(eps=self.eps, act="silu", name="norm2", **fused)(h)
                return residual + conv3("conv2")(h)
        residual = x
        h = GroupNorm(eps=self.eps, act="silu", name="norm1", **fused)(x)
        h = conv3("conv1")(h)
        if self.use_time_emb:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = GroupNorm(eps=self.eps, act="silu", name="norm2", **fused)(h)
        h = conv3("conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(residual)
        return residual + h


class Downsample(nn.Module):
    """Stride-2 3x3 conv. `asymmetric_pad` matches the VAE encoder variant."""

    out_channels: int
    asymmetric_pad: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    split_conv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.split_conv:
            return Conv3x3Split(
                self.out_channels, stride=2, asymmetric_pad=self.asymmetric_pad,
                dtype=self.dtype, name="conv",
            )(x)
        pad = ((0, 1), (0, 1)) if self.asymmetric_pad else ((1, 1), (1, 1))
        return nn.Conv(
            self.out_channels, (3, 3), strides=2, padding=pad, dtype=self.dtype, name="conv"
        )(x)


class Upsample(nn.Module):
    """Nearest-neighbor 2x then 3x3 conv."""

    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    split_conv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.split_conv:
            return Conv3x3Split(self.out_channels, dtype=self.dtype, name="conv")(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when no context is given.

    When the `capture_res` field is set, additionally computes the
    upsampled-query token attention map of the reference's patched forward
    (ptp_utils.py:508-538): hidden states are bicubically upsampled to
    capture_res^2, re-projected to queries, and softmax(q k^T / sqrt(d))
    over the text tokens is averaged over heads -> [B, res^2, T].
    `capture_res` is a module field (not a call arg) so the module can be
    wrapped in nn.remat with array-only call signatures.
    """

    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.bfloat16
    capture_res: Optional[int] = None
    pallas_capture: bool = False  # fused Pallas kernel for the capture path
    pallas_interpret: bool = False  # interpret mode (non-TPU meshes)
    capture_fp32_bwd: bool = False  # fp32 dsim contraction in the kernel bwd
    # emit captured maps in bf16 (halves their HBM write + cotangent read;
    # head-mean still accumulates fp32). Flag-gated approximation — maps are
    # ~1/num_tokens in magnitude, so bf16 costs ~0.4% relative per value
    capture_bf16: bool = False
    flash: bool = False  # Pallas flash attention for long self-attention
    # device mesh for multi-chip runs: Pallas kernels are opaque to GSPMD,
    # so on >1-device meshes they run under shard_map (batch over 'data',
    # heads over 'model')
    mesh: "object" = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
    ):
        capture_res = self.capture_res
        b, n, _ = x.shape
        inner = self.heads * self.dim_head
        scale = 1.0 / math.sqrt(self.dim_head)
        ctx = x if context is None else context
        m = ctx.shape[1]

        to_q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")
        q = to_q(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, m, self.heads, self.dim_head)
        v = v.reshape(b, m, self.heads, self.dim_head)

        from stablekeypoints_tpu.kernels.cross_attn import (
            cross_attention_resident,
            cross_resident_supported,
        )
        from stablekeypoints_tpu.kernels.flash import (
            flash_cross_attention,
            flash_self_attention,
            flash_supported,
        )

        if self.flash and context is None and flash_supported(n, m, self.dim_head):
            out = flash_self_attention(q, k, v, scale, mesh=self.mesh)
        elif (
            self.flash
            and context is not None
            and cross_resident_supported(n, m, self.dim_head)
        ):
            # long-seq cross-attention over the learned tokens: kv is ONE
            # padded 128-lane tile, fully VMEM-resident — dedicated kernel,
            # no segment ids / l/m/di broadcasts (see kernels/cross_attn.py)
            out = cross_attention_resident(
                q, k, v, scale, mesh=self.mesh, interpret=self.pallas_interpret
            )
        elif self.flash and context is not None and flash_supported(n, n, self.dim_head):
            # mid band (seq 1024): stock flash wins on per-invocation
            # overhead; kv padded to the lane tile, masked via segment ids
            out = flash_cross_attention(q, k, v, scale, mesh=self.mesh)
        else:
            sim = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(sim * scale, axis=-1)
            out = jnp.einsum(
                "bhnm,bmhd->bnhd", attn.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
        out = out.reshape(b, n, inner).astype(x.dtype)
        out = nn.Dense(inner, dtype=self.dtype, name="to_out")(out)

        capture = None
        if capture_res is not None:
            # The reference upsamples hidden states then re-projects
            # (ptp_utils.py:519-526: q = to_q(bicubic(x))); both ops are
            # linear, so they commute: q_up = bicubic(to_q(x)) — and to_q(x)
            # is already computed for the layer's own attention. This
            # deletes the [res^2, C] x [C, C] re-projection (~430 GFLOP per
            # 1280-channel layer at 128^2) and its backward; identical math
            # up to fp order.
            s = int(round(math.sqrt(n)))
            q5 = q.reshape(b, s, s, self.heads, self.dim_head)
            from stablekeypoints_tpu.kernels.attn_capture import (
                capture_attention,
                capture_attention_fused,
                fused_capture_ok,
            )

            cap_dtype = jnp.bfloat16 if self.capture_bf16 else jnp.float32
            if self.pallas_capture and fused_capture_ok(capture_res, capture_res):
                # row-resize to [B, H, O, X, D] (42 MB at 128^2/1280ch); the
                # column resize runs INSIDE the kernel, so the upsampled
                # [B, H, O*P, D] queries (336 MB + a full relayout each
                # direction) are never materialized — same taps/weights as
                # upsample_bicubic_headmajor, fp-order only
                from stablekeypoints_tpu.ops.resize import resize_matrix

                # square capture grid: one [O, X] matrix serves both the
                # row resize (here) and the in-kernel column resize
                ww = resize_matrix(s, capture_res, "bicubic").astype(q.dtype)
                t = jnp.einsum("Oy,byxkd->bkOxd", ww, q5)
                capture = capture_attention_fused(
                    t, ww, k, scale, self.pallas_interpret, mesh=self.mesh,
                    precise_bwd=self.capture_fp32_bwd, out_dtype=cap_dtype,
                )
            elif self.pallas_capture:
                q_up = upsample_bicubic_headmajor(q5, capture_res, capture_res)
                capture = capture_attention(
                    q_up, k, scale, self.pallas_interpret, mesh=self.mesh,
                    precise_bwd=self.capture_fp32_bwd, out_dtype=cap_dtype,
                )
            else:
                q_up = upsample_bicubic_headmajor(q5, capture_res, capture_res)
                sim_up = jnp.einsum(
                    "bhnd,bmhd->bhnm", q_up, k, preferred_element_type=jnp.float32
                )
                attn_up = jax.nn.softmax(sim_up * scale, axis=-1)
                capture = attn_up.mean(axis=1).astype(cap_dtype)  # [B, res^2, T]

        return out, capture


class FeedForward(nn.Module):
    """GEGLU feed-forward (project to 2*4*dim, gate with GELU)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * self.mult * 2, dtype=self.dtype, name="proj_in")(x)
        a, g = jnp.split(h, 2, axis=-1)
        h = a * nn.gelu(g.astype(jnp.float32), approximate=False).astype(a.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class LayerNorm32(nn.Module):
    """LayerNorm computed in fp32, cast back."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x = x.astype(jnp.float32)
        mean = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return x.astype(dtype)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU FF, pre-LN, residual."""

    dim: int
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.bfloat16
    capture_res: Optional[int] = None
    pallas_capture: bool = False
    pallas_interpret: bool = False
    capture_fp32_bwd: bool = False
    flash: bool = False
    mesh: "object" = None
    capture_bf16: bool = False

    @nn.compact
    def __call__(self, x, context):
        h, _ = CrossAttention(
            self.heads, self.dim_head, self.dtype, flash=self.flash,
            mesh=self.mesh, name="attn1"
        )(LayerNorm32(name="norm1")(x))
        x = x + h
        h, capture = CrossAttention(
            self.heads, self.dim_head, self.dtype, self.capture_res,
            self.pallas_capture, self.pallas_interpret, self.capture_fp32_bwd,
            flash=self.flash, mesh=self.mesh, capture_bf16=self.capture_bf16,
            name="attn2"
        )(LayerNorm32(name="norm2")(x), context)
        x = x + h
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(
            LayerNorm32(name="norm3")(x)
        )
        return x, capture


class Transformer2D(nn.Module):
    """GN -> 1x1 proj_in -> transformer blocks -> 1x1 proj_out, residual."""

    heads: int
    dim_head: int
    depth: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    capture_res: Optional[int] = None
    pallas_capture: bool = False
    pallas_interpret: bool = False
    capture_fp32_bwd: bool = False
    flash: bool = False
    mesh: "object" = None
    capture_bf16: bool = False

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        x = GroupNorm(eps=1e-6, name="norm")(x)
        x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, inner)
        captures = []
        for i in range(self.depth):
            # only the first block of a transformer stack captures (depth>1
            # stacks only exist in SDXL; SD1.5 always has depth 1)
            res = self.capture_res if i == 0 else None
            x, cap = BasicTransformerBlock(
                inner, self.heads, self.dim_head, self.dtype, res,
                self.pallas_capture, self.pallas_interpret,
                self.capture_fp32_bwd, self.flash,
                self.mesh, capture_bf16=self.capture_bf16, name=f"blocks_{i}"
            )(x, context)
            if cap is not None:
                captures.append(cap)
        x = x.reshape(b, h, w, inner)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        capture = captures[0] if captures else None
        return x + residual, capture
