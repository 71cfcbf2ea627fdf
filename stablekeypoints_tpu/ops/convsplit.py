"""Spatial-split 3x3 convolution: fold H-slabs into the batch axis.

XLA:TPU's conv emitter draws most of its parallel grid from the batch
dimension: measured on v5e, the same 310-GFLOP 3x3 conv runs at ~188 TFLOP/s
at batch 4 x 512^2 but ~25 TFLOP/s at batch 1-2 x 1024^2 (the SDXL VAE
shape). Splitting the height into `parts` halo'd slabs and stacking them on
the batch axis recovers the batched rate; results are index-exact (the halo rows reproduce
the padding/overlap the full conv sees — asserted in tests to float
rounding, since backends may reassociate the 3x3xC contraction per shape).

The slab gather is a single concatenate of (overlapping) H-slices taken
directly from the unpadded input — one HBM pass; no materialized full-tensor
pad. At batch 1 the output reassembly is a pure reshape (free).

Used by the VAE encoder/decoder at large spatial, small batch. Pure jnp
(slice/concat + one conv), so autodiff and GSPMD work as usual.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["conv3x3_spatial_split", "auto_split_parts"]


def auto_split_parts(batch: int, h_out: int, stride: int = 1) -> int:
    """Parts targeting an effective conv batch of 8 (>=4 at small spatial),
    slabs >= 32 rows, h_out % parts == 0. Returns 1 when the batch is
    already at the batched rate or spatial < 128.

    Stride-2 convs are batch-starved up to batch 4 (v5e sweep, bf16: the
    512^2/C128 downsample runs 4.37 ms at B4/parts1 vs 3.13 at parts4, and
    256^2/C256 3.06 -> 2.21), but splitting at B8 makes them slower
    (3.07 -> 5.7); stride-1 convs already hit the batched rate at B4. Hence
    the per-stride batch threshold."""
    batched_rate_at = 8 if stride == 2 else 4
    target = 16 if stride == 2 else 8  # B4/parts4 edged out parts2 at 512^2
    if batch >= batched_rate_at or h_out < 128:
        return 1
    best = 1
    for cand in (2, 4, 8):
        if h_out % cand == 0 and h_out // cand >= 32 and batch * cand <= 16:
            best = cand
            if batch * cand >= target:
                break
    return best


def conv3x3_spatial_split(
    x: jnp.ndarray,  # [B, H, W, Cin]
    kernel: jnp.ndarray,  # [3, 3, Cin, Cout] (HWIO)
    stride: int = 1,
    pad_h: tuple[int, int] = (1, 1),
    pad_w: tuple[int, int] = (1, 1),
    parts: int | None = None,
    preferred_element_type=jnp.float32,
) -> jnp.ndarray:
    """3x3 conv == lax.conv_general_dilated(..., NHWC/HWIO), computed as
    `parts` H-slabs folded into batch. parts=None picks automatically;
    parts==1 falls through to the plain conv."""
    b, h, w, cin = x.shape
    pt, pb = pad_h
    h_out = (h + pt + pb - 3) // stride + 1
    if parts is None:
        parts = auto_split_parts(b, h_out, stride)
    if cin < 64:
        # few-channel arrays are lane-padded on TPU (3 -> 128): the slab
        # slice/concat would move 43x the logical bytes; the conv itself is
        # input-bound there anyway, so splitting cannot help
        parts = 1
    if parts <= 1 or h_out % parts != 0:
        return jax.lax.conv_general_dilated(
            x, kernel, (stride, stride), [pad_h, pad_w],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=preferred_element_type,
        )
    os_ = h_out // parts
    slab = (os_ - 1) * stride + 3
    # one concatenate of overlapping slices straight from x (single HBM
    # pass); only the first/last slab carry explicit pad strips
    pieces = []
    for p in range(parts):
        start = p * os_ * stride - pt  # in unpadded input coordinates
        end = start + slab
        piece = x[:, max(start, 0) : min(end, h)]
        strips = (max(-start, 0), max(end - h, 0))
        if strips != (0, 0):
            piece = jnp.pad(piece, ((0, 0), strips, (0, 0), (0, 0)))
        pieces.append(piece)
    xb = jnp.concatenate(pieces, axis=0)  # [parts*B, slab, W, Cin], part-major
    y = jax.lax.conv_general_dilated(
        xb, kernel, (stride, stride), [(0, 0), pad_w],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type,
    )  # [parts*B, os, W_out, Cout]
    w_out, cout = y.shape[2], y.shape[3]
    y = y.reshape(parts, b, os_, w_out, cout).transpose(1, 0, 2, 3, 4)
    return y.reshape(b, parts * os_, w_out, cout)
