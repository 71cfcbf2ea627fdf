"""Spatial-split conv vs plain lax conv: bit-exactness and module parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablekeypoints_tpu.ops.convsplit import auto_split_parts, conv3x3_spatial_split


def _conv_ref(x, k, stride, pad_h, pad_w):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [pad_h, pad_w],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


@pytest.mark.parametrize(
    "stride,pad,parts",
    [(1, (1, 1), 2), (1, (1, 1), 4), (2, (0, 1), 2), (2, (0, 1), 4)],
)
def test_split_exact(stride, pad, parts):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 16)), jnp.float32)
    ref = _conv_ref(x, k, stride, pad, pad)
    out = conv3x3_spatial_split(x, k, stride, pad, pad, parts=parts)
    assert out.shape == ref.shape
    # index-exact; the backend may reassociate the 3x3xC contraction per
    # shape, so allow float rounding
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-2)


def test_split_exact_batch2():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 24, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 4)), jnp.float32)
    ref = _conv_ref(x, k, 1, (1, 1), (1, 1))
    out = conv3x3_spatial_split(x, k, 1, (1, 1), (1, 1), parts=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-2)


def test_auto_parts_gate():
    assert auto_split_parts(4, 1024) == 1  # batched enough already
    assert auto_split_parts(1, 64) == 1  # too small spatially
    assert auto_split_parts(1, 128) == 4  # slab floor keeps parts at 4
    assert auto_split_parts(1, 1024) == 8
    assert auto_split_parts(2, 1024) == 4
    assert auto_split_parts(1, 512) == 8
    # stride-2 convs are batch-starved up to B4 (measured; see docstring)
    assert auto_split_parts(4, 256, stride=2) == 4
    assert auto_split_parts(4, 512, stride=2) == 4
    assert auto_split_parts(8, 256, stride=2) == 1
    assert auto_split_parts(4, 256, stride=1) == 1


def test_gradients_match_plain_conv():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 4)), jnp.float32)

    def f_split(k):
        return jnp.sum(conv3x3_spatial_split(x, k, 1, (1, 1), (1, 1), parts=4) ** 2)

    def f_ref(k):
        return jnp.sum(_conv_ref(x, k, 1, (1, 1), (1, 1)) ** 2)

    a, b = np.asarray(jax.grad(f_split)(k)), np.asarray(jax.grad(f_ref)(k))
    np.testing.assert_allclose(a / np.abs(b).max(), b / np.abs(b).max(), atol=1e-5)


def test_module_matches_nn_conv():
    """Conv3x3Split == nn.Conv on the same params (stride 1 and 2)."""
    import flax.linen as nn

    from stablekeypoints_tpu.models.layers import Conv3x3Split

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 512, 64, 64)), jnp.float32)  # parts>1
    for stride, asym in [(1, False), (2, True)]:
        split = Conv3x3Split(8, stride=stride, asymmetric_pad=asym, dtype=jnp.float32)
        params = split.init(jax.random.PRNGKey(0), x)
        pad = ((0, 1), (0, 1)) if asym else ((1, 1), (1, 1))
        plain = nn.Conv(8, (3, 3), strides=stride, padding=pad, dtype=jnp.float32)
        a = np.asarray(split.apply(params, x))
        b = np.asarray(plain.apply(params, x))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-5)
