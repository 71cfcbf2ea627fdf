"""`main.run()` orchestration end-to-end under pytest (VERDICT r3 #3).

Drives the public CLI surface — argv parsing via build_parser,
config_from_args (presets applied), then cli.run — through all five stages
on a fabricated CelebA-layout dataset with --visualize on, asserting the
reference artifact set (reference main.py:218-292, eval.py:523) and the
visualization artifacts (reference visualize.py:140-247) land on disk;
then a --resume re-invocation that reuses the stage 1-3 artifacts.

This is the pytest analog of `python -m stablekeypoints_tpu.main ...`; the
only non-CLI ingredient is the tiny model topology injected through
cli.run's unet_config/vae_config overrides (the same hook the north-star
selftest uses), since the production SD-1.5 graph is too large for CI.
"""

import json
import os
import sys

import numpy as np
import pytest

from stablekeypoints_tpu import main as cli
from stablekeypoints_tpu.models.unet import tiny_unet_config
from stablekeypoints_tpu.models.vae import tiny_vae_config

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))
from make_synthetic_celeba import make_synthetic_celeba  # noqa: E402

pytestmark = pytest.mark.slow  # model-heavy: excluded from the smoke subset

# the reference's stage artifact set (main.py:218, 228, 259-262, 292;
# all_errors at eval.py:523)
STAGE_ARTIFACTS = (
    "embedding", "indices", "source_keypoints", "target_keypoints",
    "visible", "regressor", "all_errors",
)


def _argv(data: str, out: str, resume: bool = False) -> list[str]:
    argv = [
        "--dataset_name", "celeba_aligned",
        "--dataset_loc", data,
        "--save_folder", out,
        "--visualize",
        # tiny-scale overrides (CLI-visible flags, same names as reference)
        "--image_size", "64",
        "--num_tokens", "16",
        "--feature_upsample_res", "16",
        "--batch_size", "8",
        "--num_steps", "3",
        "--num_indices", "8",
        "--furthest_point_num_samples", "8",
        "--top_k", "4",
        "--augmentation_iterations", "8",
        "--max_num_points", "8",
        "--dtype", "float32",
    ]
    if resume:
        argv.append("--resume")
    return argv


def _run_cli(argv: list[str]) -> dict:
    args = cli.build_parser().parse_args(argv)
    cfg = cli.config_from_args(args)
    # presets must have applied from the dataset name, like the real CLI
    assert cfg.evaluation_method == "inter_eye_distance"
    return cli.run(cfg, tiny_unet_config(), tiny_vae_config())


@pytest.fixture(scope="module")
def e2e(tmp_path_factory):
    data = str(tmp_path_factory.mktemp("celeba_data"))
    out = str(tmp_path_factory.mktemp("celeba_out"))
    make_synthetic_celeba(data, n=16, image_size=64)
    results = _run_cli(_argv(data, out))
    return data, out, results


def test_stages_1_to_5_complete(e2e):
    _, _, results = e2e
    assert results["embedding"].shape == (1, 16, 32)  # tiny context_dim=32
    assert results["indices"].shape == (4,)
    assert np.isfinite(results["mean_distance"])


def test_reference_artifact_set_on_disk(e2e):
    """Every artifact the reference torch.saves exists as .npy AND .pt."""
    _, out, _ = e2e
    for name in STAGE_ARTIFACTS:
        assert os.path.exists(os.path.join(out, f"{name}.npy")), name
        assert os.path.exists(os.path.join(out, f"{name}.pt")), name


def test_visualize_artifacts_on_disk(e2e):
    """--visualize produces the reference's headline artifacts
    (visualize.py:225-247): unsupervised_keypoints.pdf, per-keypoint
    heatmap grids, and (post-regressor) estimated/gt keypoint PDFs, plus
    stage 5's augmentation.png debug panel (eval.py:268-353)."""
    _, out, _ = e2e
    for f in (
        "unsupervised_keypoints.pdf",
        "estimated_keypoints.pdf",
        "gt_keypoints.pdf",
        "augmentation.png",
    ):
        path = os.path.join(out, f)
        assert os.path.exists(path) and os.path.getsize(path) > 0, f
    for j in range(4):  # one heatmap grid per selected keypoint (top_k=4)
        assert os.path.exists(os.path.join(out, f"keypoint_{j:03d}.png"))


def test_resume_reuses_stage_artifacts(e2e):
    """--resume re-invocation skips stages 1-3 by loading their artifacts
    (stage-level resume; the reference has no load path at all —
    SURVEY.md §5 checkpoint/resume)."""
    data, out, first = e2e
    emb_mtime = os.path.getmtime(os.path.join(out, "embedding.npy"))
    jsonl = os.path.join(out, "metrics.jsonl")
    n_lines_before = sum(1 for _ in open(jsonl))

    results = _run_cli(_argv(data, out, resume=True))

    # stage 1-3 artifacts were loaded, not recomputed
    reused = set()
    with open(jsonl) as f:
        for i, line in enumerate(f):
            if i < n_lines_before:
                continue
            rec = json.loads(line)
            if rec.get("event") == "stage_artifact_reused":
                reused.add(rec["artifact"])
    assert reused == {"embedding", "indices", "keypoints"}
    assert os.path.getmtime(os.path.join(out, "embedding.npy")) == emb_mtime
    np.testing.assert_array_equal(results["embedding"], first["embedding"])
    np.testing.assert_array_equal(results["indices"], first["indices"])
    assert np.isfinite(results["mean_distance"])
