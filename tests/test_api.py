"""High-level API smoke test (tiny models, synthetic data)."""

import numpy as np
import pytest

from stablekeypoints_tpu.api import KeypointModel, learn_keypoints
from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.data.synthetic import SyntheticBlobs
from stablekeypoints_tpu.models.unet import tiny_unet_config
from stablekeypoints_tpu.models.vae import tiny_vae_config
from stablekeypoints_tpu.parallel import mesh as pmesh
from stablekeypoints_tpu.pipeline.runtime import Runtime


pytestmark = pytest.mark.slow  # model-heavy: excluded from the smoke subset


def test_learn_and_detect(tmp_path):
    cfg = Config(
        dataset_name="synthetic", image_size=64, num_tokens=16,
        feature_upsample_res=16, batch_size=8, num_steps=2, num_indices=8,
        furthest_point_num_samples=8, top_k=4, augmentation_iterations=8,
        dtype="float32",
    )
    rt = Runtime.create(cfg, tiny_unet_config(), tiny_vae_config(), mesh=pmesh.make_mesh())
    ds = SyntheticBlobs(length=16, image_size=64, num_kpts=4)
    model = learn_keypoints(ds, cfg=cfg, runtime=rt)
    assert model.context.shape == (1, 16, 32)
    assert model.indices.shape == (4,)

    img = ds[0]["img"]
    kpts = model.detect(img)
    assert kpts.shape == (4, 2)
    assert (kpts >= 0).all() and (kpts <= 1).all()

    batch = model.detect_batch(np.stack([ds[0]["img"], ds[1]["img"]]))
    assert batch.shape == (2, 4, 2)

    hm = model.heatmaps(img)
    assert hm.shape == (4, 64, 64)

    model.save(str(tmp_path))
    back = KeypointModel.load(str(tmp_path), cfg=cfg, runtime=rt)
    np.testing.assert_array_equal(back.indices, model.indices)
    np.testing.assert_allclose(back.context, model.context)
