"""Pallas TPU kernel: fused capture attention (QK^T -> softmax -> head-mean).

The capture path computes, per eligible cross-attention layer,

    out[b, n, t] = mean_h softmax_t( q[b, n, h, :] . k[b, t, h, :] * scale )

with n up to 128^2 = 16384 queries and t = num_tokens (500). The XLA
lowering materializes the [B, H, N, T] similarity + softmax tensors in HBM
(~0.5-2 GB per layer per forward) and pays three HBM passes over them; this
kernel keeps a [BN, T] tile per head in VMEM, writing only the [B, N, T]
head-averaged output. Backward is a second kernel that recomputes the
per-head softmax tile and accumulates dQ and dK (softmax VJP), wrapped as a
jax.custom_vjp.

Token count is padded to a lane multiple; padded key columns are masked to
-inf before the softmax so results match the unpadded einsum path exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["capture_attention", "capture_attention_reference"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def capture_attention_reference(q: jnp.ndarray, k: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Unfused reference: q [B, N, H, D], k [B, T, H, D] -> [B, N, T] fp32."""
    sim = jnp.einsum("bnhd,bthd->bhnt", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim * scale, axis=-1)
    return attn.mean(axis=1)


def _fwd_kernel(q_ref, k_ref, out_ref, *, heads: int, dim_head: int, t_true: int, scale: float):
    bn = q_ref.shape[1]
    t_pad = k_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (bn, t_pad), 1)
    valid = col < t_true
    acc = jnp.zeros((bn, t_pad), jnp.float32)
    for h in range(heads):
        qh = q_ref[0, :, h * dim_head : (h + 1) * dim_head]
        kh = k_ref[0, :, h * dim_head : (h + 1) * dim_head]
        sim = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        sim = jnp.where(valid, sim, -jnp.inf)
        acc = acc + jax.nn.softmax(sim, axis=-1)
    out_ref[0] = acc * (1.0 / heads)


def _bwd_kernel(
    q_ref, k_ref, g_ref, dq_ref, dk_ref, *, heads: int, dim_head: int, t_true: int, scale: float
):
    bn = q_ref.shape[1]
    t_pad = k_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (bn, t_pad), 1)
    valid = col < t_true
    g = g_ref[0] * (1.0 / heads)  # d(out)/d(per-head softmax)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])

    for h in range(heads):
        sl = slice(h * dim_head, (h + 1) * dim_head)
        qh = q_ref[0, :, sl]
        kh = k_ref[0, :, sl]
        sim = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        sim = jnp.where(valid, sim, -jnp.inf)
        p = jax.nn.softmax(sim, axis=-1)
        t1 = g * p
        dsim = (t1 - p * jnp.sum(t1, axis=-1, keepdims=True)) * scale
        dsim = jnp.where(valid, dsim, 0.0)
        dq_ref[0, :, sl] = jax.lax.dot_general(
            dsim, kh.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dk_ref[0, :, sl] += jax.lax.dot_general(
            dsim, qh.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


def _pad_tokens(k: jnp.ndarray, t_pad: int) -> jnp.ndarray:
    t = k.shape[1]
    if t == t_pad:
        return k
    return jnp.pad(k, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))


def _block_n(n: int) -> int:
    for bn in (1024, 512, 256, 128, 8):
        if n % bn == 0:
            return bn
    return n


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def capture_attention(q: jnp.ndarray, k: jnp.ndarray, scale: float, interpret: bool = False):
    """q: [B, N, H, D], k: [B, T, H, D] -> [B, N, T] fp32 head-mean softmax."""
    return _capture_fwd_impl(q, k, scale, interpret)


def _capture_fwd_impl(q, k, scale, interpret):
    b, n, h, d = q.shape
    t = k.shape[1]
    t_pad = _round_up(t, 128)
    bn = _block_n(n)
    kp = _pad_tokens(k, t_pad).reshape(b, t_pad, h * d)
    q2 = q.reshape(b, n, h * d)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=h, dim_head=d, t_true=t, scale=scale),
        grid=(b, n // bn),
        in_specs=[
            pl.BlockSpec((1, bn, h * d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, h * d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn, t_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, t_pad), jnp.float32),
        interpret=interpret,
    )(q2, kp)
    return out[:, :, :t]


def _capture_fwd(q, k, scale, interpret):
    out = _capture_fwd_impl(q, k, scale, interpret)
    return out, (q, k)


def _capture_bwd(scale, interpret, res, g):
    q, k = res
    b, n, h, d = q.shape
    t = k.shape[1]
    t_pad = _round_up(t, 128)
    bn = _block_n(n)
    kp = _pad_tokens(k, t_pad).reshape(b, t_pad, h * d)
    q2 = q.reshape(b, n, h * d)
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, t_pad - t))).astype(jnp.float32)

    dq, dk = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=h, dim_head=d, t_true=t, scale=scale),
        grid=(b, n // bn),
        in_specs=[
            pl.BlockSpec((1, bn, h * d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, h * d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, t_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bn, h * d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            # dk block revisited across the n-grid: accumulated sequentially
            pl.BlockSpec((1, t_pad, h * d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, h * d), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, h * d), jnp.float32),
        ],
        interpret=interpret,
    )(q2, kp, gp)

    dq = dq.reshape(b, n, h, d).astype(q.dtype)
    dk = dk[:, :t].reshape(b, t, h, d).astype(k.dtype)
    return dq, dk


capture_attention.defvjp(_capture_fwd, _capture_bwd)
