"""Fused capture-attention kernel vs unfused reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablekeypoints_tpu.kernels.attn_capture import (
    capture_attention,
    capture_attention_reference,
)


def _make(b=1, n=256, h=4, d=32, t=37, seed=0):
    kq, kk = jax.random.split(jax.random.PRNGKey(seed))
    q = jax.random.normal(kq, (b, h, n, d), jnp.float32)  # head-major
    k = jax.random.normal(kk, (b, t, h, d), jnp.float32)
    return q, k


@pytest.mark.parametrize("t", [37, 128, 500])
def test_forward_matches_reference(t):
    q, k = _make(t=t)
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = capture_attention(q, k, scale, True)
    ref = capture_attention_reference(q, k, scale)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_forward_batched():
    q, k = _make(b=3, n=128, t=50)
    scale = 0.1
    out = capture_attention(q, k, scale, True)
    ref = capture_attention_reference(q, k, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_backward_matches_reference():
    q, k = _make(b=2, n=128, h=2, d=16, t=45)
    scale = 1.0 / np.sqrt(16)

    def loss_fused(q, k):
        out = capture_attention(q, k, scale, True)
        return jnp.sum(jnp.sin(out * 3.0))

    def loss_ref(q, k):
        out = capture_attention_reference(q, k, scale)
        return jnp.sum(jnp.sin(out * 3.0))

    gq1, gk1 = jax.grad(loss_fused, argnums=(0, 1))(q, k)
    gq2, gk2 = jax.grad(loss_ref, argnums=(0, 1))(q, k)
    np.testing.assert_allclose(np.asarray(gq1), np.asarray(gq2), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), atol=1e-4, rtol=1e-4)


def test_bf16_inputs():
    q, k = _make(n=128, t=64)
    q, k = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16)
    out = capture_attention(q, k, 0.125, True)
    ref = capture_attention_reference(q, k, 0.125)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_capture_attention_shard_map_matches_replicated():
    """Under a dp x tp mesh the kernel runs via shard_map (heads on 'model',
    batch on 'data', one psum) — must equal the single-device path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from stablekeypoints_tpu.kernels.attn_capture import capture_attention
    from stablekeypoints_tpu.parallel import mesh as pmesh

    rng = np.random.default_rng(0)
    b, n, h, d, t = 8, 64, 4, 16, 20
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)  # head-major
    k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    mesh = pmesh.make_mesh(4, 2)
    a = np.asarray(capture_attention(q, k, 0.25, True))
    bb = np.asarray(
        jax.jit(lambda q, k: capture_attention(q, k, 0.25, True, mesh=mesh))(q, k)
    )
    np.testing.assert_allclose(a, bb, atol=1e-5)


def test_capture_attention_shard_map_gradients():
    """dk (the context gradient path) through shard_map + psum."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from stablekeypoints_tpu.kernels.attn_capture import capture_attention
    from stablekeypoints_tpu.parallel import mesh as pmesh

    rng = np.random.default_rng(1)
    b, n, h, d, t = 8, 64, 4, 16, 20
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)  # head-major
    k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, n, t)), jnp.float32)
    mesh = pmesh.make_mesh(4, 2)

    g_ref = jax.grad(lambda k: jnp.sum(capture_attention(q, k, 0.25, True) * cot))(k)
    g_smap = jax.jit(
        jax.grad(lambda k: jnp.sum(capture_attention(q, k, 0.25, True, mesh=mesh) * cot))
    )(k)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_smap), atol=1e-5)


def test_backward_bf16_close_to_reference():
    """bf16 backward (MXU-dtype matmuls) vs fp32 reference: the one extra
    bf16 rounding of dsim must stay at ulp scale."""
    q, k = _make(b=1, n=128, h=2, d=16, t=45)
    qb, kb = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16)
    scale = 0.25
    cot = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 45), jnp.float32)

    gq_ref, gk_ref = jax.grad(
        lambda q, k: jnp.sum(capture_attention_reference(q, k, scale) * cot),
        argnums=(0, 1),
    )(q, k)
    gq, gk = jax.grad(
        lambda q, k: jnp.sum(capture_attention(q, k, scale, True) * cot),
        argnums=(0, 1),
    )(qb, kb)
    for a, b in ((gq, gq_ref), (gk, gk_ref)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.abs(b).max()
        np.testing.assert_allclose(a / denom, b / denom, atol=2e-2)


def _fused_inputs(b=1, s=4, res=16, h=2, d=16, t=20, seed=3):
    """Row-resized t + column matrix + k, and the equivalent upsampled q."""
    from stablekeypoints_tpu.ops.resize import resize_matrix, upsample_bicubic_headmajor

    kq, kk = jax.random.split(jax.random.PRNGKey(seed))
    q5 = jax.random.normal(kq, (b, s, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, t, h, d), jnp.float32)
    wh = resize_matrix(s, res, "bicubic")
    tt = jnp.einsum("Oy,byxkd->bkOxd", wh, q5)
    q_up = upsample_bicubic_headmajor(q5, res, res)
    return tt, wh, k, q_up


def test_fused_forward_matches_unfused():
    """The in-kernel column resize must reproduce resize-then-capture."""
    from stablekeypoints_tpu.kernels.attn_capture import (
        capture_attention_fused,
        fused_capture_ok,
    )

    assert fused_capture_ok(128, 128) and fused_capture_ok(16, 16)
    tt, ww, k, q_up = _fused_inputs()
    scale = 0.25
    got = capture_attention_fused(tt, ww, k, scale, interpret=True)
    want = capture_attention(q_up, k, scale, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_fused_backward_matches_unfused():
    """d(loss)/d(t) and d(loss)/d(k) through the fused kernel must equal
    the unfused path's gradients chained through the column resize."""
    from stablekeypoints_tpu.kernels.attn_capture import capture_attention_fused

    tt, ww, k, _ = _fused_inputs()
    scale = 0.25
    cot = jax.random.normal(jax.random.PRNGKey(4), (1, 256, 20), jnp.float32)

    def loss_fused(tt, k):
        return jnp.sum(capture_attention_fused(tt, ww, k, scale, interpret=True) * cot)

    def loss_unfused(tt, k):
        # column resize outside the kernel (o-major order matches _build_q)
        q = jnp.einsum("Px,bkOxd->bkOPd", ww, tt)
        q = q.reshape(tt.shape[0], tt.shape[1], -1, tt.shape[-1])
        return jnp.sum(capture_attention(q, k, scale, True) * cot)

    gt1, gk1 = jax.grad(loss_fused, argnums=(0, 1))(tt, k)
    gt2, gk2 = jax.grad(loss_unfused, argnums=(0, 1))(tt, k)
    np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt2), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), atol=1e-4, rtol=1e-4)


def test_fused_shard_map_matches_replicated():
    from stablekeypoints_tpu.kernels.attn_capture import capture_attention_fused
    from stablekeypoints_tpu.parallel import mesh as pmesh

    tt, ww, k, _ = _fused_inputs(b=8, h=2)
    mesh = pmesh.make_mesh(4, 2)
    a = np.asarray(capture_attention_fused(tt, ww, k, 0.25, interpret=True))
    bb = np.asarray(
        jax.jit(
            lambda tt, k: capture_attention_fused(tt, ww, k, 0.25, True, mesh=mesh)
        )(tt, k)
    )
    np.testing.assert_allclose(a, bb, atol=1e-5)


def test_backward_precise_bwd_tight_parity():
    """precise_bwd=True keeps dsim fp32 through the backward contractions —
    with bf16 inputs the kernel must match the einsum fallback on the same
    bf16 inputs to near machine precision (same rounding points), much
    tighter than the default bf16-dsim path's 2e-2 envelope."""
    q, k = _make(b=1, n=128, h=2, d=16, t=45)
    qb, kb = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16)
    scale = 0.25
    cot = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 45), jnp.float32)

    # fallback on the SAME bf16 inputs (isolates the kernel's own rounding)
    gq_ref, gk_ref = jax.grad(
        lambda q, k: jnp.sum(capture_attention_reference(q, k, scale) * cot),
        argnums=(0, 1),
    )(qb, kb)
    gq, gk = jax.grad(
        lambda q, k: jnp.sum(
            capture_attention(q, k, scale, True, precise_bwd=True) * cot
        ),
        argnums=(0, 1),
    )(qb, kb)
    for a, b in ((gq, gq_ref), (gk, gk_ref)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.abs(b).max()
        np.testing.assert_allclose(a / denom, b / denom, atol=2e-3)


def test_bf16_out_close_to_fp32():
    """capture_dtype=bf16: maps within one bf16 ulp of the fp32 output
    (head-mean must accumulate fp32 and round ONCE at the write — per-head
    bf16 accumulation would compound across the head sum)."""
    q, k = _make(b=2, n=256, h=8, d=16, t=100)
    out32 = np.asarray(capture_attention(q, k, 0.25, True))
    out16 = capture_attention(q, k, 0.25, True, out_dtype=jnp.bfloat16)
    assert out16.dtype == jnp.bfloat16
    rel = np.abs(np.asarray(out16, np.float32) - out32) / (out32 + 1e-9)
    assert rel.max() < 2 ** -8  # single bf16 rounding, not sqrt(heads) of them


def test_bf16_out_gradients_close():
    q, k = _make(b=1, n=128, h=4, d=16, t=45)
    cot = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 45), jnp.float32)

    def loss(out_dtype):
        def f(q, k):
            m = capture_attention(q, k, 0.25, True, out_dtype=out_dtype)
            return jnp.sum(m.astype(jnp.float32) * cot)
        return f

    gq16, gk16 = jax.grad(loss(jnp.bfloat16), argnums=(0, 1))(q, k)
    gq32, gk32 = jax.grad(loss(jnp.float32), argnums=(0, 1))(q, k)
    for a, b in ((gq16, gq32), (gk16, gk32)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = np.abs(b).max()
        np.testing.assert_allclose(a / denom, b / denom, atol=1e-2)


def test_bf16_out_fused_variant():
    from stablekeypoints_tpu.kernels.attn_capture import capture_attention_fused

    tt, ww, k, _ = _fused_inputs()
    got32 = np.asarray(capture_attention_fused(tt, ww, k, 0.25, interpret=True))
    got16 = capture_attention_fused(
        tt, ww, k, 0.25, interpret=True, out_dtype=jnp.bfloat16
    )
    assert got16.dtype == jnp.bfloat16
    rel = np.abs(np.asarray(got16, np.float32) - got32) / (np.abs(got32) + 1e-9)
    assert rel.max() < 2 ** -8
