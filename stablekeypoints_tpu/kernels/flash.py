"""Flash (online-softmax) attention for the UNet/VAE self-attention layers.

The SD UNet's 64^2/32^2 self-attention materializes [B, heads, seq, seq]
f32 similarity tensors (seq=4096 at 64^2: ~4.3 GB per transformer block at
batch 8) — pure HBM traffic, recomputed again under remat in the backward.
This routes those layers through the Pallas TPU flash-attention kernel
(jax.experimental.pallas.ops.tpu.flash_attention: tiled online softmax,
f32 accumulators, custom VJP), which never materializes the seq x seq
matrix. Numerics match the einsum path to bf16 tolerance: both compute
logits and softmax in f32 from bf16 q/k/v.

Replaces nothing in the reference (torch SDP at diffusers 0.8 also
materialized attention); this is the TPU speed-of-light path for the
capture forward's trunk (SURVEY.md §7 perf work).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["flash_self_attention", "flash_cross_attention", "flash_supported"]


def _divisor_block(n: int, cap: int) -> int:
    """Largest lane-aligned (multiple-of-128) block size <= cap that DIVIDES
    n (the stock flash kernel asserts seq % block == 0). Power-of-two images
    give power-of-two sequences where this equals min(cap, n), but non-power
    shapes exist in production (SD-2.1-native 768^2 -> 48^2 = 2304 queries):
    searching all x128 divisors instead of only powers of two lifts those
    layers from 256-wide blocks to 768/1152 under the same caps (measured
    on-chip: sd21 768^2 train step 3.449 -> 3.583 steps/s/chip hit,
    3.165 -> 3.271 fill; BENCH_MATRIX.md). 128 is the lane tile,
    guaranteed to divide by flash_supported."""
    if n <= cap:
        return n
    for b in range(cap - cap % 128, 127, -128):
        if n % b == 0:
            return b
    return n  # unreachable when flash_supported gated (n % 128 == 0)


def flash_supported(seq: int, kv_seq: int, dim_head: int) -> bool:
    """Static shape test for the Pallas flash kernel: sequence lengths must
    tile by the 128-lane MIN_BLOCK_SIZE and head_dim must be <=128 or a
    multiple of 128 (kernel constraint)."""
    if seq % 128 != 0 or kv_seq % 128 != 0:
        return False
    if dim_head > 128 and dim_head % 128 != 0:
        return False
    # below this the materialized path is already tiny and faster
    return seq >= 1024


def _shard_map_heads(fn, mesh, q, k, v):
    """Run an attention fn under shard_map: batch over 'data', heads over
    'model' (attention is head-local, so no collective is needed). Pallas
    calls are opaque to GSPMD — without this a bare kernel under jit on a
    multi-device mesh would all-gather its operands. Returns None when the
    shapes don't tile the mesh (caller falls back)."""
    import jax
    from jax.sharding import PartitionSpec as P

    b, _, h, _ = q.shape
    n_data = mesh.shape.get("data", 1)
    n_model = mesh.shape.get("model", 1)
    if b % n_data or h % n_model:
        return None
    spec = P("data", None, "model", None)
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        # pallas_call out_shapes carry no vma metadata (jax 0.9)
        check_vma=False,
    )(q, k, v)


def flash_self_attention(
    q: jnp.ndarray,  # [B, N, heads, d]
    k: jnp.ndarray,  # [B, M, heads, d]
    v: jnp.ndarray,  # [B, M, heads, d]
    scale: float,
    mesh=None,
) -> jnp.ndarray:
    """Returns [B, N, heads, d] in q's dtype; f32 softmax/accumulation."""
    if mesh is not None and mesh.devices.size > 1:
        out = _shard_map_heads(
            lambda qs, ks, vs: flash_self_attention(qs, ks, vs, scale), mesh, q, k, v
        )
        if out is not None:
            return out
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    n, m = qt.shape[2], kt.shape[2]
    # On-chip sweep (v5e, B8/H8, bf16, fwd+bwd): 1024 fwd blocks beat 512 at
    # both live shapes (N4096/D40: 22.1 -> 20.0 ms; N1024/D80: 3.22 -> 3.15);
    # in the backward, large dq/dkv *query* blocks pay only at long seq
    # (dkvq1024 won at N4096, lost at N1024) and dkv *key* blocks at 512
    # always won. 2048 blocks fail to compile (VMEM). Blocks must DIVIDE the
    # sequence (the kernel asserts) — power-of-two images give power-of-two
    # seqs, but e.g. 768^2 (SD-2.1-native) has 48^2 = 2304 = 1024 + cap.
    bq = _divisor_block(n, 1024)
    bk = _divisor_block(m, 1024)
    bqd = _divisor_block(n, 1024 if n >= 4096 else 512)
    bkd = _divisor_block(m, 512)
    sizes = BlockSizes(
        block_q=bq,
        block_k_major=bk,
        block_k=bk,
        block_b=1,
        block_q_major_dkv=bqd,
        block_k_major_dkv=bkd,
        block_k_dkv=bkd,
        block_q_dkv=bqd,
        block_k_major_dq=bkd,
        block_k_dq=bkd,
        block_q_dq=bqd,
    )
    out = flash_attention(qt, kt, vt, sm_scale=scale, block_sizes=sizes)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def flash_cross_attention(
    q: jnp.ndarray,  # [B, N, heads, d]
    k: jnp.ndarray,  # [B, M, heads, d] — M arbitrary (e.g. 500 learned tokens)
    v: jnp.ndarray,
    scale: float,
    mesh=None,
) -> jnp.ndarray:
    """Flash attention with the kv sequence zero-padded to the 128-lane
    tile and masked out via segment ids (padded keys never contribute:
    the kernel applies the segment mask pre-softmax). Covers the capture
    forward's [B, heads, seq, num_tokens] cross-attention sims (524 MB f32
    per 64^2 layer at batch 8) without materializing them."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    if mesh is not None and mesh.devices.size > 1:
        out = _shard_map_heads(
            lambda qs, ks, vs: flash_cross_attention(qs, ks, vs, scale), mesh, q, k, v
        )
        if out is not None:
            return out
    b, n, h, d = q.shape
    m = k.shape[1]
    m_pad = -(-m // 128) * 128
    if m_pad != m:
        pad = [(0, 0), (0, m_pad - m), (0, 0), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    seg = SegmentIds(
        q=jnp.ones((b, n), jnp.int32),
        kv=(jnp.arange(m_pad, dtype=jnp.int32) < m).astype(jnp.int32)[None].repeat(b, 0),
    )
    # On-chip sweep (B8/H8, kv 500->512, bf16, fwd+bwd): big query blocks win
    # when kv is one tile — N4096/D40: 6.03 (bq512) -> 5.75 ms (bq2048);
    # N1024/D80: 2.66 -> 2.62 (bq1024). kv-side blocks stay at the padded
    # tile. Blocks must divide the (padded) sequence — see _divisor_block.
    bq = _divisor_block(n, 2048)
    bk = _divisor_block(m_pad, 512)
    sizes = BlockSizes(
        block_q=bq,
        block_k_major=bk,
        block_k=bk,
        block_b=1,
        block_q_major_dkv=bq,
        block_k_major_dkv=bk,
        block_k_dkv=bk,
        block_q_dkv=bq,
        block_k_major_dq=bk,
        block_k_dq=bk,
        block_q_dq=bq,
    )
    out = flash_attention(qt, kt, vt, segment_ids=seg, sm_scale=scale, block_sizes=sizes)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)
