"""Native image-IO core: build, decode, and resize parity."""

import io

import numpy as np
import pytest
from PIL import Image

from stablekeypoints_tpu.utils import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain/libjpeg unavailable"
)


def _jpeg_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def test_decode_resize_jpeg_roundtrip():
    rng = np.random.default_rng(0)
    # smooth image so JPEG loss is small
    ys, xs = np.mgrid[0:64, 0:48].astype(np.float32)
    img = np.stack(
        [127 + 100 * np.sin(ys / 9), 127 + 100 * np.cos(xs / 7), np.full_like(ys, 60)],
        axis=-1,
    ).astype(np.uint8)
    out = native.decode_resize_jpeg(_jpeg_bytes(img), 64, 48)
    assert out is not None and out.shape == (64, 48, 3)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=0.05)


def test_resize_matches_torch_bilinear():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(37, 53, 3), dtype=np.uint8)
    out = native.resize_normalize(img, 64, 64)
    assert out is not None
    t = torch.from_numpy(img.astype(np.float32) / 255.0).permute(2, 0, 1)[None]
    ref = F.interpolate(t, size=(64, 64), mode="bilinear", align_corners=False)
    ref = ref[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_decode_invalid_returns_none():
    assert native.decode_resize_jpeg(b"not a jpeg", 8, 8) is None


def test_load_image_rgb_fast_jpeg(tmp_path):
    from stablekeypoints_tpu.data.base import load_image_rgb_fast

    img = np.full((40, 40, 3), 128, np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(img).save(p, quality=95)
    out = load_image_rgb_fast(p, 32)
    assert out.shape == (32, 32, 3)
    np.testing.assert_allclose(out, 128 / 255.0, atol=0.02)


def test_native_io_auto_bit_equal_to_pil(tmp_path):
    """auto mode routes target-sized JPEGs through the native decoder, which
    must be BIT-identical to the PIL path (same libjpeg output, same /255)."""
    from stablekeypoints_tpu.data import base

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    p = str(tmp_path / "at_size.jpg")
    Image.fromarray(img).save(p, quality=90)
    try:
        base.set_native_io("off")
        pil = base.load_image_rgb(p, 64)
        base.set_native_io("auto")
        nat = base.load_image_rgb(p, 64)
    finally:
        base.set_native_io("auto")
    assert np.array_equal(pil, nat)


def test_native_io_auto_resize_uses_pil(tmp_path):
    """auto mode keeps the PIL antialiased resize when the file is not at
    target size (exactness over speed)."""
    from stablekeypoints_tpu.data import base

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(96, 96, 3), dtype=np.uint8)
    p = str(tmp_path / "resize.jpg")
    Image.fromarray(img).save(p, quality=90)
    try:
        base.set_native_io("auto")
        auto = base.load_image_rgb(p, 64)
        base.set_native_io("off")
        pil = base.load_image_rgb(p, 64)
    finally:
        base.set_native_io("auto")
    assert np.array_equal(auto, pil)


def test_native_io_mode_validation():
    from stablekeypoints_tpu.data import base

    with pytest.raises(ValueError):
        base.set_native_io("fast")


def test_load_image_rgb_fast_png_falls_back(tmp_path):
    from stablekeypoints_tpu.data.base import load_image_rgb_fast

    img = np.full((40, 40, 3), 64, np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(img).save(p)
    out = load_image_rgb_fast(p, 32)
    assert out.shape == (32, 32, 3)
    np.testing.assert_allclose(out, 64 / 255.0, atol=0.01)
