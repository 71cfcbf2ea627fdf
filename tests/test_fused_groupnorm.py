"""Fused GroupNorm(+SiLU) Pallas kernel vs the exact jnp formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablekeypoints_tpu.kernels.groupnorm import (
    fused_group_norm,
    fused_group_norm_supported,
)
from stablekeypoints_tpu.models.layers import _group_norm


def _make(b=2, h=16, w=16, c=128, seed=0, mean=0.0, std=1.0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(mean, std, (b, h, w, c)), dtype)
    scale = jnp.asarray(rng.normal(1.0, 0.2, (c,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0.0, 0.2, (c,)), jnp.float32)
    return x, scale, bias


@pytest.mark.parametrize("act", [None, "silu"])
def test_matches_exact(act):
    x, scale, bias = _make()
    out = fused_group_norm(x, scale, bias, 32, 1e-6, act, interpret=True)
    ref = _group_norm(x, scale, bias, 32, 1e-6, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_bf16_matches_exact_to_output_quantum():
    x, scale, bias = _make(dtype=jnp.bfloat16)
    out = fused_group_norm(x, scale, bias, 32, 1e-6, "silu", interpret=True)
    ref = _group_norm(x, scale, bias, 32, 1e-6, "silu")
    assert out.dtype == jnp.bfloat16
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert d.max() <= 0.0625  # within ~2 bf16 ulps at O(4) values


def test_shifted_distribution():
    """Sum-of-squares variance must stay accurate at large mean/std ratios."""
    x, scale, bias = _make(mean=30.0, std=0.5)
    out = fused_group_norm(x, scale, bias, 32, 1e-6, None, interpret=True)
    ref = _group_norm(x, scale, bias, 32, 1e-6, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_bf16_shifted_distribution():
    """The input-dtype apply (round 3) in the regime it actually degrades:
    bf16 x with a large per-channel mean. The bf16 `x*a` product adds one
    rounding of order (|mean|/std)*2^-9 on top of the input quantization —
    this pins that the accumulated drift stays within a few output ulps of
    the exact fp32 formulation (normalized outputs are O(1) after affine)."""
    x, scale, bias = _make(mean=30.0, std=0.5, dtype=jnp.bfloat16)
    out = fused_group_norm(x, scale, bias, 32, 1e-6, "silu", interpret=True)
    ref = _group_norm(
        x.astype(jnp.float32), scale, bias, 32, 1e-6, "silu"
    )
    assert out.dtype == jnp.bfloat16
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    # output values are O(4); bf16 quantum there is 0.03125. Allow ~4 ulps
    # for input quantization at mean 30 + the bf16 apply rounding.
    assert d.max() <= 0.125, d.max()


def test_supported_predicate():
    assert fused_group_norm_supported(64 * 64, 128, 32)
    assert not fused_group_norm_supported(64 * 64, 96, 32)  # lanes
    assert not fused_group_norm_supported(64 * 64, 128, 48)  # groups


def test_gradients_via_reference_vjp():
    x, scale, bias = _make(b=1, h=8, w=8, c=128)

    def f_fused(x, s, b):
        return jnp.sum(fused_group_norm(x, s, b, 32, 1e-6, "silu", interpret=True) ** 2)

    def f_ref(x, s, b):
        return jnp.sum(_group_norm(x, s, b, 32, 1e-6, "silu") ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)


def test_shard_map_matches_single_device():
    from stablekeypoints_tpu.parallel import mesh as pmesh

    x, scale, bias = _make(b=8, h=8, w=8, c=128)
    mesh = pmesh.make_mesh(4, 2)
    a = np.asarray(fused_group_norm(x, scale, bias, 32, 1e-6, "silu", interpret=True))
    b = np.asarray(
        jax.jit(
            lambda x, s, bb: fused_group_norm(
                x, s, bb, 32, 1e-6, "silu", interpret=True, mesh=mesh
            )
        )(x, scale, bias)
    )
    np.testing.assert_allclose(a, b, atol=1e-5)
