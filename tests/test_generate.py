"""Generation path on tiny models."""

import numpy as np

from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.models.unet import tiny_unet_config
from stablekeypoints_tpu.models.vae import tiny_vae_config
from stablekeypoints_tpu.parallel import mesh as pmesh
from stablekeypoints_tpu.pipeline.generate import generate_images
from stablekeypoints_tpu.pipeline.runtime import Runtime


def test_generate_images_shapes():
    cfg = Config(
        dataset_name="synthetic", image_size=64, num_tokens=8,
        feature_upsample_res=16, dtype="float32",
    )
    rt = Runtime.create(cfg, tiny_unet_config(), tiny_vae_config(), mesh=pmesh.make_mesh(1))
    ctx = rt.init_context()
    imgs, maps = generate_images(rt, ctx, num_images=2, capture_final_maps=True)
    assert imgs.shape == (2, 64, 64, 3)
    assert np.isfinite(imgs).all()
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    assert maps.shape == (2, 8, 16, 16)
