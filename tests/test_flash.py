"""Flash self-attention kernel vs the einsum path (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablekeypoints_tpu.kernels.flash import flash_self_attention, flash_supported


def _einsum_attention(q, k, v, scale):
    sim = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim * scale, axis=-1)
    return jnp.einsum(
        "bhnm,bmhd->bnhd", attn.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def test_flash_supported_rules():
    assert flash_supported(4096, 4096, 40)      # 64^2 self-attn, d=320/8
    assert flash_supported(1024, 1024, 80)      # 32^2 self-attn
    assert flash_supported(4096, 4096, 512)     # VAE mid attention
    assert not flash_supported(256, 256, 160)   # too short: einsum is fine
    assert not flash_supported(4096, 500, 40)   # kv not lane-aligned
    assert not flash_supported(4096, 4096, 160) # >128 and not a multiple


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_flash_matches_einsum(dtype):
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    b, n, h, d = 2, 1024, 2, 40
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), dtype)
    scale = 1.0 / math.sqrt(d)
    want = np.asarray(_einsum_attention(q, k, v, scale), np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_self_attention(q, k, v, scale), np.float32)
    atol = 5e-6 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(got, want, atol=atol)


def test_flash_gradients_match_einsum():
    """The kernel's custom VJP must agree with autodiff through the einsum
    path — gradients flow into k/v (and hence the learned context) through
    self-attention layers downstream of the first cross-attention."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    b, n, h, d = 1, 1024, 2, 16
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    scale = 1.0 / math.sqrt(d)

    def loss_e(q, k, v):
        return jnp.sum(_einsum_attention(q, k, v, scale) * cot)

    def loss_f(q, k, v):
        return jnp.sum(flash_self_attention(q, k, v, scale) * cot)

    ge = jax.grad(loss_e, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(ge, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


@pytest.mark.parametrize("m", [500, 512, 77])
def test_flash_cross_matches_einsum(m):
    """Padded-kv flash cross-attention: padded keys must not contribute."""
    from jax.experimental.pallas import tpu as pltpu
    from stablekeypoints_tpu.kernels.flash import flash_cross_attention

    rng = np.random.default_rng(2)
    b, n, h, d = 1, 1024, 2, 40
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, m, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, m, h, d)), jnp.float32)
    scale = 1.0 / math.sqrt(d)
    want = np.asarray(_einsum_attention(q, k, v, scale), np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_cross_attention(q, k, v, scale), np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_flash_cross_gradients_match_einsum():
    """dk/dv through the padded kernel (the context's gradient path)."""
    from jax.experimental.pallas import tpu as pltpu
    from stablekeypoints_tpu.kernels.flash import flash_cross_attention

    rng = np.random.default_rng(3)
    b, n, h, d, m = 1, 1024, 1, 16, 60
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, m, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, m, h, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    scale = 1.0 / math.sqrt(d)

    ge = jax.grad(lambda k, v: jnp.sum(_einsum_attention(q, k, v, scale) * cot), (0, 1))(k, v)
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(
            lambda k, v: jnp.sum(flash_cross_attention(q, k, v, scale) * cot), (0, 1)
        )(k, v)
    for a, b_ in zip(ge, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_divisor_block_non_power_of_two_seqs():
    from stablekeypoints_tpu.kernels.flash import _divisor_block

    assert _divisor_block(4096, 1024) == 1024   # power-of-two: unchanged
    assert _divisor_block(512, 1024) == 512     # n <= cap: whole seq
    # non-power shapes pick the largest x128 divisor <= cap (not just
    # powers of two): 48^2 (768px) = 2304 = 128*18
    assert _divisor_block(2304, 1024) == 768
    assert _divisor_block(2304, 2048) == 1152
    assert _divisor_block(2304, 512) == 384
    assert _divisor_block(9216, 2048) == 1536   # 96^2 = 128*72
    assert _divisor_block(25600, 1024) == 1024  # 160^2 (1280px)
    # 640 = 128*5: no x128 divisor between 128 and 512 (320 isn't x128)
    assert _divisor_block(640, 512) == 128


def test_flash_non_power_of_two_seq_matches_einsum():
    """768px-native shapes (SD-2.1): 48^2 = 2304 queries is divisible by 128
    but not by the 1024 block cap — the block picker must fall back to a
    divisor instead of crashing the kernel's divisibility assert."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(5)
    b, n, h, d = 1, 2304, 2, 8
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    scale = 0.3
    sim = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    ref = jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(sim, -1), v)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_self_attention(q, k, v, scale), np.float32)
    np.testing.assert_allclose(got, np.asarray(ref, np.float32), atol=2e-5)


def test_flash_cross_non_power_of_two_seq_matches_einsum():
    from jax.experimental.pallas import tpu as pltpu

    from stablekeypoints_tpu.kernels.flash import flash_cross_attention

    rng = np.random.default_rng(6)
    b, n, h, d, m = 1, 2304, 2, 8, 20
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, m, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, m, h, d)), jnp.float32)
    scale = 0.25
    sim = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    ref = jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(sim, -1), v)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_cross_attention(q, k, v, scale), np.float32)
    np.testing.assert_allclose(got, np.asarray(ref, np.float32), atol=2e-5)
