"""Pallas TPU kernel: fused capture attention (QK^T -> softmax -> head-mean).

The capture path computes, per eligible cross-attention layer,

    out[b, n, t] = mean_h softmax_t( q[b, h, n, :] . k[b, h, t, :] * scale )

with n up to 128^2 = 16384 queries and t = num_tokens (500). The XLA
lowering materializes the [B, H, N, T] similarity + softmax tensors in HBM
and pays multiple HBM passes over them; this kernel keeps one (head, query
block) [BN, T] tile in VMEM and accumulates the head-mean directly into the
[B, N, T] output block.

Layout notes (TPU): q arrives HEAD-MAJOR [B, H, N, D] (the upsample that
produces it emits this layout directly, `upsample_bicubic_headmajor`), so
neither the forward nor the backward relayouts the 16384-query tensor; heads
live on a *grid* dimension, never sliced out of the lane axis (offset
slicing at d_head=40 would force relayouts). The forward grid is
(B, N/BN, H) with H innermost so the output block stays resident in VMEM
across the head accumulation; the backward grid is (B, H, N/BN) with the
query-block dim innermost so the dK block stays resident across its
accumulation. Backward matmuls run in the input dtype (bf16 on the real
path -> MXU rate; fp32 accumulate via preferred_element_type), and dq is
written in the input dtype and layout, feeding the upsample VJP with no
relayout.

Token count is padded to a lane multiple; padded key columns are masked to
-inf before the softmax so results match the unpadded einsum path exactly.
Wrapped in jax.custom_vjp (the backward kernel recomputes the softmax tile
and applies the softmax VJP). Replaces the recomputed-attention hot spot of
the reference (ptp_utils.py:508-538).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "capture_attention",
    "capture_attention_fused",
    "capture_attention_reference",
    "fused_capture_ok",
]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def capture_attention_reference(q: jnp.ndarray, k: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Unfused reference: q [B, H, N, D], k [B, T, H, D] -> [B, N, T] fp32."""
    sim = jnp.einsum("bhnd,bthd->bhnt", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim * scale, axis=-1)
    return attn.mean(axis=1)


def _softmax_tile(qh, kh, valid, scale):
    sim = jax.lax.dot_general(
        qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    sim = jnp.where(valid, sim, -jnp.inf)
    return jax.nn.softmax(sim, axis=-1)


def _accumulate_headmean(p, out_ref, acc, heads: int):
    """Accumulate p/heads into the output block across the head grid dim.

    fp32 outputs accumulate directly in the resident out block. Narrow
    (bf16) outputs accumulate in an fp32 VMEM scratch and round ONCE at the
    last head — per-head rounding would compound across the 8-head sum on
    values that are only ~1/num_tokens to begin with."""
    if not acc:
        @pl.when(pl.program_id(2) == 0)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        out_ref[0] += p * (1.0 / heads)
        return

    acc_ref = acc[0]

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += p * (1.0 / heads)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _fwd_kernel(q_ref, k_ref, out_ref, *acc, heads: int, t_true: int, scale: float):
    bn, t_pad = out_ref.shape[1], out_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (bn, t_pad), 1)
    p = _softmax_tile(q_ref[0, 0], k_ref[0, 0], col < t_true, scale)
    _accumulate_headmean(p, out_ref, acc, heads)


def _bwd_kernel(
    q_ref, k_ref, g_ref, dq_ref, dk_ref, *, heads: int, t_true: int, scale: float,
    precise: bool,
):
    bn, t_pad = g_ref.shape[1], g_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (bn, t_pad), 1)
    valid = col < t_true
    qh = q_ref[0, 0]
    kh = k_ref[0, 0]
    p = _softmax_tile(qh, kh, valid, scale)
    g = g_ref[0].astype(jnp.float32) * (1.0 / heads)  # g may arrive bf16
    t1 = g * p
    dsim = (t1 - p * jnp.sum(t1, axis=-1, keepdims=True)) * scale
    dsim = jnp.where(valid, dsim, 0.0)
    # default path: matmuls in the input dtype (bf16 -> MXU), fp32
    # accumulation. One extra bf16 rounding of dsim vs the XLA einsum
    # fallback (which contracts dsim in fp32); ~1-ulp-relative gradient
    # noise on the learned context, far below the per-step fresh-noise
    # variance. precise=True keeps dsim fp32 through the contractions
    # (mixed fp32 x bf16, rounding once at the dq write — matching the
    # fallback einsum's rounding) for strict kernel/fallback parity,
    # at a lower MXU rate.
    if not precise:
        dsim = dsim.astype(kh.dtype)

    dq_ref[0, 0] = jax.lax.dot_general(
        dsim, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)

    @pl.when(pl.program_id(2) == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])

    dk_ref[0, 0] += jax.lax.dot_general(
        dsim, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _block_n(n: int) -> int:
    for bn in (1024, 512, 256, 128, 8):
        if n % bn == 0:
            return bn
    return n


# ---------------------------------------------------------------------------
# fused-upsample variant: the column resize matmul runs inside the kernel
#
# The unfused path materializes the upsampled queries [B, H, N=O*P, D]
# (336 MB bf16 per 1280-channel layer at 128^2) in HBM, and XLA's lowering
# of the second resize einsum inserts a full relayout of that tensor in
# each direction (~1.5 ms/layer/step measured). Here the kernel receives
# the ROW-resized tensor t = einsum('Oy,byxkd->bkOxd') (42 MB) plus the
# [P, X] column-resize matrix, and builds each [bn, d] query tile in VMEM
# with bo = bn/P tiny [P, X] @ [X, d] matmuls — the big tensor never
# exists. Backward emits dt in the same layout (the row-resize VJP is
# XLA's). Identical math to resize-then-project up to fp order.


def _build_q(t_tile, ww, out_dtype):
    """t_tile [bo, X, d], ww [P, X] -> q [bo*P, d] in (o-major, P) order."""
    bo = t_tile.shape[0]
    rows = [
        jax.lax.dot_general(
            ww, t_tile[o], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)
        for o in range(bo)
    ]
    return jnp.concatenate(rows, axis=0)


def _fwd_kernel_fused(t_ref, ww_ref, k_ref, out_ref, *acc, heads, t_true, scale):
    bn, t_pad = out_ref.shape[1], out_ref.shape[2]
    qh = _build_q(t_ref[0, 0], ww_ref[...], k_ref.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (bn, t_pad), 1)
    p = _softmax_tile(qh, k_ref[0, 0], col < t_true, scale)
    _accumulate_headmean(p, out_ref, acc, heads)


def _bwd_kernel_fused(
    t_ref, ww_ref, k_ref, g_ref, dt_ref, dk_ref, *, heads, t_true, scale, precise
):
    bn, t_pad = g_ref.shape[1], g_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (bn, t_pad), 1)
    valid = col < t_true
    kh = k_ref[0, 0]
    qh = _build_q(t_ref[0, 0], ww_ref[...], kh.dtype)
    p = _softmax_tile(qh, kh, valid, scale)
    g = g_ref[0].astype(jnp.float32) * (1.0 / heads)  # g may arrive bf16
    t1 = g * p
    dsim = (t1 - p * jnp.sum(t1, axis=-1, keepdims=True)) * scale
    dsim = jnp.where(valid, dsim, 0.0)
    if not precise:
        dsim = dsim.astype(kh.dtype)

    dq = jax.lax.dot_general(
        dsim, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # column-resize VJP: dt_o = ww^T @ dq_o, emitted in t's own layout
    ww = ww_ref[...]
    bo = dt_ref.shape[2]
    P = ww.shape[0]
    for o in range(bo):
        dt_ref[0, 0, o] = jax.lax.dot_general(
            ww, dq[o * P : (o + 1) * P].astype(ww.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt_ref.dtype)

    @pl.when(pl.program_id(2) == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])

    dk_ref[0, 0] += jax.lax.dot_general(
        dsim, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _prep_k(k):
    """[B, T, H, D] -> head-major padded [B, H, T_pad, D] (k is tiny)."""
    t = k.shape[1]
    t_pad = _round_up(t, 128)
    kh = k.transpose(0, 2, 1, 3)
    if t_pad != t:
        kh = jnp.pad(kh, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
    return kh, t_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _capture_core(
    q: jnp.ndarray, k: jnp.ndarray, scale: float, interpret: bool, total_heads: int,
    precise_bwd: bool = False, out_dtype=jnp.float32,
):
    """q: [B, H, N, D], k: [B, T, H, D] -> [B, N, T] out_dtype; sums the
    local heads' softmaxes scaled by 1/total_heads (the full head-mean when
    total_heads == H; a partial sum to be psum'ed under tensor parallelism).
    out_dtype=bf16 halves the HBM write of the [B, N, T] maps (and the read
    of their cotangent); the head-mean still accumulates in fp32 and rounds
    once at the output write."""
    out, _ = _capture_fwd(q, k, scale, interpret, total_heads, precise_bwd, out_dtype)
    return out


def _run_fwd(qh, kh, t, t_pad, scale, interpret, total_heads, out_dtype=jnp.float32):
    b, h, n, d = qh.shape
    bn = _block_n(n)
    narrow = jnp.dtype(out_dtype) != jnp.dtype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=total_heads, t_true=t, scale=scale),
        grid=(b, n // bn, h),  # h innermost: out block accumulates in VMEM
        in_specs=[
            pl.BlockSpec((1, 1, bn, d), lambda i, j, hh: (i, hh, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d), lambda i, j, hh: (i, hh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn, t_pad), lambda i, j, hh: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, t_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bn, t_pad), jnp.float32)] if narrow else [],
        interpret=interpret,
    )(qh, kh)
    return out[:, :, :t]


def _capture_fwd(q, k, scale, interpret, total_heads, precise_bwd=False, out_dtype=jnp.float32):
    t = k.shape[1]
    kh, t_pad = _prep_k(k)
    out = _run_fwd(q, kh, t, t_pad, scale, interpret, total_heads, out_dtype)
    # residuals are already kernel-layout: no relayout in the backward
    return out, (q, kh, t)


def _capture_bwd(scale, interpret, total_heads, precise_bwd, out_dtype, res, g):
    qh, kh, t = res
    b, h, n, d = qh.shape
    t_pad = kh.shape[2]
    bn = _block_n(n)
    # g keeps its own dtype (bf16 when out_dtype is bf16 — half the HBM
    # read); the kernel widens it to fp32 before the softmax VJP
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, t_pad - t)))

    dq, dk = pl.pallas_call(
        functools.partial(
            _bwd_kernel, heads=total_heads, t_true=t, scale=scale,
            precise=precise_bwd,
        ),
        grid=(b, h, n // bn),  # n-block innermost: dk block accumulates in VMEM
        in_specs=[
            pl.BlockSpec((1, 1, bn, d), lambda i, hh, j: (i, hh, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d), lambda i, hh, j: (i, hh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, t_pad), lambda i, hh, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bn, d), lambda i, hh, j: (i, hh, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d), lambda i, hh, j: (i, hh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n, d), qh.dtype),  # head-major, no relayout
            jax.ShapeDtypeStruct((b, h, t_pad, d), jnp.float32),  # accumulated fp32
        ],
        interpret=interpret,
    )(qh, kh, gp)

    dk = dk[:, :, :t].transpose(0, 2, 1, 3).astype(kh.dtype)
    return dq, dk


_capture_core.defvjp(_capture_fwd, _capture_bwd)


def fused_capture_ok(out_h: int, out_w: int) -> bool:
    """Query tiles must cover whole output rows: block_n % P == 0."""
    n = out_h * out_w
    return n >= out_w and _block_n(n) % out_w == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _capture_core_fused(
    t: jnp.ndarray, ww: jnp.ndarray, k: jnp.ndarray, scale: float,
    interpret: bool, total_heads: int, precise_bwd: bool = False,
    out_dtype=jnp.float32,
):
    """t: [B, H, O, X, D] row-resized queries, ww: [P, X] column-resize
    matrix, k: [B, T, H, D] -> [B, O*P, T] out_dtype (see fused-upsample
    note; fp32 head-mean accumulation, one rounding at the write)."""
    out, _ = _capture_fused_fwd(t, ww, k, scale, interpret, total_heads, precise_bwd, out_dtype)
    return out


def _capture_fused_fwd(t, ww, k, scale, interpret, total_heads, precise_bwd=False, out_dtype=jnp.float32):
    tt = k.shape[1]
    kh, t_pad = _prep_k(k)
    b, h, O, X, d = t.shape
    P = ww.shape[0]
    n = O * P
    bn = _block_n(n)
    bo = bn // P
    narrow = jnp.dtype(out_dtype) != jnp.dtype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_fused, heads=total_heads, t_true=tt, scale=scale),
        grid=(b, n // bn, h),  # h innermost: out block accumulates in VMEM
        in_specs=[
            pl.BlockSpec((1, 1, bo, X, d), lambda i, j, hh: (i, hh, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, X), lambda i, j, hh: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d), lambda i, j, hh: (i, hh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn, t_pad), lambda i, j, hh: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, t_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bn, t_pad), jnp.float32)] if narrow else [],
        interpret=interpret,
    )(t, ww, kh)
    return out[:, :, :tt], (t, ww, kh, tt)


def _capture_fused_bwd(scale, interpret, total_heads, precise_bwd, out_dtype, res, g):
    t, ww, kh, tt = res
    b, h, O, X, d = t.shape
    P = ww.shape[0]
    n = O * P
    t_pad = kh.shape[2]
    bn = _block_n(n)
    bo = bn // P
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, t_pad - tt)))  # widened in-kernel

    dt, dk = pl.pallas_call(
        functools.partial(
            _bwd_kernel_fused, heads=total_heads, t_true=tt, scale=scale,
            precise=precise_bwd,
        ),
        grid=(b, h, n // bn),  # n-block innermost: dk block accumulates in VMEM
        in_specs=[
            pl.BlockSpec((1, 1, bo, X, d), lambda i, hh, j: (i, hh, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, X), lambda i, hh, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d), lambda i, hh, j: (i, hh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, t_pad), lambda i, hh, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bo, X, d), lambda i, hh, j: (i, hh, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d), lambda i, hh, j: (i, hh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, O, X, d), t.dtype),  # t's own layout
            jax.ShapeDtypeStruct((b, h, t_pad, d), jnp.float32),  # accumulated
        ],
        interpret=interpret,
    )(t, ww, kh, gp)

    dk = dk[:, :, :tt].transpose(0, 2, 1, 3).astype(kh.dtype)
    return dt, jnp.zeros_like(ww), dk


_capture_core_fused.defvjp(_capture_fused_fwd, _capture_fused_bwd)


def capture_attention_fused(
    t: jnp.ndarray,
    ww: jnp.ndarray,
    k: jnp.ndarray,
    scale: float,
    interpret: bool = False,
    mesh=None,
    precise_bwd: bool = False,
    out_dtype=jnp.float32,
):
    """Fused-upsample capture: t [B, H, O, X, D] (row-resized queries),
    ww [P, X] (column-resize matrix), k [B, T, H, D] -> [B, O*P, T]
    out_dtype head-mean softmax. Same shard_map strategy as
    `capture_attention`."""
    b, h, O, X, d = t.shape
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import PartitionSpec as P_

        n_data = mesh.shape.get("data", 1)
        n_model = mesh.shape.get("model", 1)
        if b % n_data == 0 and h % n_model == 0:
            def local(ts, wws, ks):
                part = _capture_core_fused(ts, wws, ks, scale, interpret, h, precise_bwd, out_dtype)
                if n_model > 1:
                    part = jax.lax.psum(part, "model")
                return part

            return jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(
                    P_("data", "model", None, None, None),
                    P_(None, None),
                    P_("data", None, "model", None),
                ),
                out_specs=P_("data", None, None),
                check_vma=False,
            )(t, ww, k)
    return _capture_core_fused(t, ww, k, scale, interpret, h, precise_bwd, out_dtype)


def capture_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    scale: float,
    interpret: bool = False,
    mesh=None,
    precise_bwd: bool = False,
    out_dtype=jnp.float32,
):
    """q: [B, H, N, D] (head-major), k: [B, T, H, D] -> [B, N, T] out_dtype
    head-mean softmax.

    mesh: the runtime's (data, model) device mesh. Pallas calls are opaque
    to GSPMD (a bare pallas_call under jit gets replicated, all-gathering
    its operands), so on multi-device meshes the kernel runs under
    shard_map: batch stays sharded over 'data', heads over 'model' (the
    column-parallel to_q/to_k shard the head axis), and the head-mean
    completes with one [B, N, T] psum over 'model' — the only collective.
    """
    b, h, n, d = q.shape
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import PartitionSpec as P

        n_data = mesh.shape.get("data", 1)
        n_model = mesh.shape.get("model", 1)
        if b % n_data == 0 and h % n_model == 0:
            def local(qs, ks):
                part = _capture_core(qs, ks, scale, interpret, h, precise_bwd, out_dtype)
                if n_model > 1:
                    part = jax.lax.psum(part, "model")
                return part

            return jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(
                    P("data", "model", None, None),
                    P("data", None, "model", None),
                ),
                out_specs=P("data", None, None),
                # pallas_call out_shapes carry no vma metadata (jax 0.9)
                check_vma=False,
            )(q, k)
        # uneven batch/heads (e.g. eval view counts): replicated fallback
    return _capture_core(q, k, scale, interpret, h, precise_bwd, out_dtype)
