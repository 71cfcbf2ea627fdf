"""Full 5-stage pipeline on tiny models + synthetic data (integration test).

Mirrors the reference's CPU-runnable config ("custom dataset, ~20 images" —
SURVEY.md §4) as the designated integration test, plus stages 3-5 which the
reference only runs on annotated datasets.
"""

import numpy as np
import pytest

from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.data.synthetic import SyntheticBlobs
from stablekeypoints_tpu.models.unet import tiny_unet_config
from stablekeypoints_tpu.models.vae import tiny_vae_config
from stablekeypoints_tpu.parallel import mesh as pmesh
from stablekeypoints_tpu.pipeline.evaluate import evaluate
from stablekeypoints_tpu.pipeline.indices import find_best_indices
from stablekeypoints_tpu.pipeline.optimize import optimize_embedding
from stablekeypoints_tpu.pipeline.regressor import (
    fit_regressor,
    precompute_all_keypoints,
    return_regressor,
    return_regressor_visible,
)
from stablekeypoints_tpu.pipeline.runtime import Runtime


pytestmark = pytest.mark.slow  # model-heavy: excluded from the smoke subset


@pytest.fixture(scope="module")
def pipeline_outputs(tmp_path_factory):
    cfg = Config(
        dataset_name="synthetic",
        image_size=64,
        num_tokens=16,
        feature_upsample_res=16,
        batch_size=8,
        num_steps=2,
        num_indices=8,
        furthest_point_num_samples=8,
        top_k=4,
        augmentation_iterations=8,
        max_num_points=6,
        dtype="float32",
        save_folder=str(tmp_path_factory.mktemp("outputs")),
        visualize=True,  # stage 5 must emit the augmentation debug panel
    )
    rt = Runtime.create(cfg, tiny_unet_config(), tiny_vae_config(), mesh=pmesh.make_mesh())
    train = SyntheticBlobs(length=16, image_size=64, num_kpts=4, seed=0)
    test = SyntheticBlobs(length=4, image_size=64, num_kpts=4, seed=1)

    ctx = optimize_embedding(rt, train)
    indices = find_best_indices(rt, train, ctx)
    source, target, vis = precompute_all_keypoints(rt, train, ctx, indices)
    regressor = fit_regressor(cfg, source, target, vis)
    mean_dist, all_vals = evaluate(rt, test, ctx, indices, regressor)
    return cfg, ctx, indices, source, target, vis, regressor, mean_dist, all_vals, rt


def test_stage2_indices(pipeline_outputs):
    cfg, _, indices, *_ = pipeline_outputs
    assert indices.shape == (cfg.top_k,)
    assert len(set(indices.tolist())) == cfg.top_k  # distinct tokens
    assert (indices >= 0).all() and (indices < cfg.num_tokens).all()


def test_stage3_keypoints(pipeline_outputs):
    cfg, _, _, source, target, vis, *_ = pipeline_outputs
    assert source.shape == (6, cfg.top_k, 2)
    assert target.shape == (6, 4, 2)
    assert vis.shape == (6, 4)
    assert (source >= 0).all() and (source <= 1).all()


def test_stage4_regressor_shape(pipeline_outputs):
    cfg, regressor = pipeline_outputs[0], pipeline_outputs[6]
    assert regressor.shape == (cfg.top_k * 2, 4 * 2)


def test_stage5_metric(pipeline_outputs):
    mean_dist, all_vals = pipeline_outputs[7], pipeline_outputs[8]
    assert np.isfinite(mean_dist)
    assert all_vals.shape == (4,)


def test_create_vid_tracks_frames(pipeline_outputs):
    """Video keypoint tracking (reference visualize.py:250-374): per ordered
    frame, ensemble maps -> keypoints (+ optional regressor), per-frame
    panels, and the keypoints/saved_maps artifact pair."""
    import os

    import jax.numpy as jnp

    from stablekeypoints_tpu.pipeline.visualize import create_vid
    from stablekeypoints_tpu.utils.artifacts import load_artifact

    cfg, ctx, indices = pipeline_outputs[0], pipeline_outputs[1], pipeline_outputs[2]
    regressor, rt = pipeline_outputs[6], pipeline_outputs[9]
    frames = SyntheticBlobs(length=3, image_size=64, num_kpts=4, seed=2)
    kpts = create_vid(rt, frames, jnp.asarray(ctx), indices, regressor=regressor)
    assert kpts.shape == (3, 4, 2) and np.isfinite(kpts).all()
    assert load_artifact(cfg.save_folder, "keypoints").shape == kpts.shape
    maps = load_artifact(cfg.save_folder, "saved_maps")
    assert maps.shape[0] == 3 and np.isfinite(maps).all()
    for fi in range(3):
        assert os.path.exists(os.path.join(cfg.save_folder, "frames", f"frame_{fi:05d}.png"))


def test_stage5_augmentation_panel(pipeline_outputs):
    """--visualize writes the test-time-ensemble debug panel for the first
    evaluated image (reference eval.py:268-353, call site eval.py:443-444)."""
    import os

    from PIL import Image

    cfg, *_ = pipeline_outputs
    path = os.path.join(cfg.save_folder, "augmentation.png")
    assert os.path.exists(path)
    w, h = Image.open(path).size
    assert w > 0 and h > 0


def test_artifact_roundtrip(pipeline_outputs):
    cfg, *_ = pipeline_outputs
    from stablekeypoints_tpu.utils.artifacts import load_artifact, save_artifact

    save_artifact(cfg.save_folder, "embedding", np.ones((1, 4, 8), np.float32))
    back = load_artifact(cfg.save_folder, "embedding")
    assert back.shape == (1, 4, 8)
    # torch-compatible .pt export exists too
    import os, torch

    pt = torch.load(os.path.join(cfg.save_folder, "embedding.pt"), weights_only=True)
    assert tuple(pt.shape) == (1, 4, 8)


def test_load_reference_saved_embedding(tmp_path):
    """A user migrating from the reference drops its torch.saved artifacts
    (e.g. the published precomputed learned tokens) into --save_folder: the
    reference saves the LEAF embedding with requires_grad=True
    (reference main.py:218), which must load cleanly."""
    import torch

    from stablekeypoints_tpu.utils.artifacts import load_artifact

    emb = torch.randn(1, 8, 16, requires_grad=True)
    torch.save(emb, tmp_path / "embedding.pt")
    back = load_artifact(str(tmp_path), "embedding")
    np.testing.assert_allclose(back, emb.detach().numpy())


def test_regressor_recovers_linear_map():
    """Closed-form LS recovers a known linear relation exactly."""
    rng = np.random.default_rng(0)
    x = rng.uniform(0.2, 0.8, size=(200, 8))
    w_true = rng.standard_normal((8, 6)) * 0.3
    y = (x - 0.5) @ w_true + 0.5
    w = return_regressor(x, y)
    np.testing.assert_allclose(w, w_true, atol=1e-8)

    vis = np.ones_like(y)
    w2 = return_regressor_visible(x, y, vis)
    np.testing.assert_allclose(w2, w_true, atol=1e-8)


def test_regressor_visible_ignores_invisible_rows():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, size=(100, 4))
    w_true = rng.standard_normal((4, 2))
    y = (x - 0.5) @ w_true + 0.5
    # corrupt half the rows of column 0, mark them invisible
    y_bad = y.copy()
    y_bad[:50, 0] += 10.0
    vis = np.ones_like(y)
    vis[:50, 0] = 0
    w = return_regressor_visible(x, y_bad, vis)
    np.testing.assert_allclose(w, w_true, atol=1e-8)


def test_iteration_time_is_per_step():
    """Logged 'iteration time' must be per-optimizer-step seconds (reference
    optimize.py:427-443), not the whole inter-log window."""
    from stablekeypoints_tpu.pipeline.optimize import iteration_time

    # 10 steps elapsed since the last log event, 5 seconds wall
    assert iteration_time(now=105.0, window_start=100.0, step=19, last_logged_step=9) == 0.5
    # first log event after start (window of exactly one step)
    assert iteration_time(now=101.0, window_start=100.0, step=0, last_logged_step=-1) == 1.0
    # resume case: first log at start_step
    assert iteration_time(now=102.0, window_start=100.0, step=50, last_logged_step=49) == 2.0
