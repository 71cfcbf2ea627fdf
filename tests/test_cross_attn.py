"""KV-resident cross-attention kernel vs the einsum path (interpret mode)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablekeypoints_tpu.kernels.cross_attn import (
    cross_attention_resident,
    cross_resident_supported,
)


def _einsum_attention(q, k, v, scale):
    sim = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim * scale, axis=-1)
    return jnp.einsum(
        "bhnm,bmhd->bnhd", attn.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def test_cross_resident_supported_rules():
    assert cross_resident_supported(4096, 500, 40)   # 64^2 x learned tokens
    assert cross_resident_supported(2304, 512, 80)   # 48^2 (768px) x128 seq
    assert not cross_resident_supported(1024, 500, 160)  # mid band: flash wins
    assert not cross_resident_supported(256, 500, 40)    # short: einsum is fine
    assert not cross_resident_supported(4096, 4096, 40)  # kv > one resident tile
    assert not cross_resident_supported(4100, 500, 40)   # seq not lane-aligned


@pytest.mark.parametrize("m", [500, 512, 77])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_cross_resident_matches_einsum(m, dtype):
    rng = np.random.default_rng(0)
    b, n, h, d = 2, 1024, 2, 40
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, m, h, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, m, h, d)), dtype)
    scale = 1.0 / math.sqrt(d)
    want = np.asarray(_einsum_attention(q, k, v, scale), np.float32)
    got = np.asarray(cross_attention_resident(q, k, v, scale, interpret=True), np.float32)
    atol = 5e-6 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(got, want, atol=atol)


def test_cross_resident_gradients_match_einsum():
    """dq plus dk/dv (the learned context's gradient path) through the
    recompute backward: one softmax rebuild per tile, in-kernel di."""
    rng = np.random.default_rng(1)
    b, n, h, d, m = 1, 1024, 2, 16, 60
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, m, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, m, h, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    scale = 1.0 / math.sqrt(d)

    ge = jax.grad(
        lambda q, k, v: jnp.sum(_einsum_attention(q, k, v, scale) * cot), (0, 1, 2)
    )(q, k, v)
    gf = jax.grad(
        lambda q, k, v: jnp.sum(
            cross_attention_resident(q, k, v, scale, interpret=True) * cot
        ),
        (0, 1, 2),
    )(q, k, v)
    for a, b_ in zip(ge, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_cross_resident_multiblock_dk_accumulation():
    """n spanning several query blocks: dk/dv must accumulate across the
    innermost grid loop without double-zeroing between heads."""
    rng = np.random.default_rng(2)
    b, n, h, d, m = 1, 2048, 3, 8, 130  # 2 blocks of 1024; t_pad = 256
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, m, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, m, h, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    scale = 1.0 / math.sqrt(d)

    got = np.asarray(cross_attention_resident(q, k, v, scale, interpret=True), np.float32)
    want = np.asarray(_einsum_attention(q, k, v, scale), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-6)

    ge = jax.grad(lambda k, v: jnp.sum(_einsum_attention(q, k, v, scale) * cot), (0, 1))(k, v)
    gf = jax.grad(
        lambda k, v: jnp.sum(cross_attention_resident(q, k, v, scale, interpret=True) * cot),
        (0, 1),
    )(k, v)
    for a, b_ in zip(ge, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_cross_resident_shard_map_matches_replicated():
    """Multi-device path: batch over 'data', heads over 'model'."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    rng = np.random.default_rng(3)
    b, n, h, d, m = 4, 1024, 2, 8, 70
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, m, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, m, h, d)), jnp.float32)
    a = np.asarray(cross_attention_resident(q, k, v, 0.25, interpret=True))
    bb = np.asarray(
        jax.jit(lambda q, k, v: cross_attention_resident(q, k, v, 0.25, mesh=mesh, interpret=True))(
            q, k, v
        )
    )
    np.testing.assert_allclose(a, bb, atol=1e-5)
