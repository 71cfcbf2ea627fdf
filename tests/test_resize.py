"""Parity of matmul-based resize vs torch F.interpolate (align_corners=False)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from stablekeypoints_tpu.ops import resize


def _torch_resize(x_nhwc, out_h, out_w, mode):
    t = torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)
    y = F.interpolate(t, size=(out_h, out_w), mode=mode, align_corners=False)
    return y.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("in_hw,out_hw", [((16, 16), (128, 128)), ((32, 32), (128, 128)), ((13, 17), (40, 56)), ((128, 128), (512, 512))])
def test_upsample_matches_torch(mode, in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = resize.resize_nhwc(jnp.asarray(x), *out_hw, mode)
    ref = _torch_resize(x, *out_hw, mode)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear"])
def test_downsample_matches_torch(mode):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 64, 64, 2), dtype=np.float32)
    ours = resize.resize_nhwc(jnp.asarray(x), 16, 16, mode)
    ref = _torch_resize(x, 16, 16, mode)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-5)


def test_resize_hw_channelfirst_maps():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((5, 16, 16), dtype=np.float32)  # [T, H, W]
    ours = resize.resize_hw(jnp.asarray(x), 64, 64, "bilinear")
    ref = _torch_resize(x[..., None], 64, 64, "bilinear")[..., 0]
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-5)


def test_resize_matrix_rows_sum_to_one():
    for m in ("bilinear", "bicubic"):
        w = np.asarray(resize.resize_matrix(16, 128, m))
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)


def test_upsample_bicubic_headmajor_matches_nhwc():
    """Head-major emission is the same resample, different output layout."""
    import jax.numpy as jnp
    import numpy as np
    from stablekeypoints_tpu.ops.resize import (
        upsample_bicubic,
        upsample_bicubic_headmajor,
    )

    rng = np.random.default_rng(0)
    b, s, h, d, r = 2, 8, 3, 5, 24
    x5 = jnp.asarray(rng.standard_normal((b, s, s, h, d)), jnp.float32)
    hm = np.asarray(upsample_bicubic_headmajor(x5, r, r))  # [b, h, r*r, d]
    ref = np.asarray(
        upsample_bicubic(x5.reshape(b, s, s, h * d), r, r)
    ).reshape(b, r * r, h, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(hm, ref, atol=1e-5)
