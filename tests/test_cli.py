"""CLI flag-surface parity and config construction."""

import dataclasses

from stablekeypoints_tpu.config import Config, apply_preset
from stablekeypoints_tpu.main import build_parser, config_from_args

# the reference's public flag names (main.py:23-195)
REFERENCE_FLAGS = [
    "--model_type", "--my_token", "--dataset_loc", "--save_folder",
    "--wandb_name", "--dataset_name", "--max_len", "--wandb", "--lr",
    "--num_steps", "--num_tokens", "--feature_upsample_res", "--batch_size",
    "--top_k_strategy", "--max_loc_strategy", "--evaluation_method",
    "--min_dist", "--furthest_point_num_samples", "--num_indices",
    "--num_subjects", "--sharpening_loss_weight",
    "--equivariance_attn_loss_weight", "--layers", "--noise_level",
    "--max_num_points", "--sigma", "--augment_degrees", "--augment_scale",
    "--augment_translate", "--augmentation_iterations", "--visualize",
    "--validation", "--top_k",
]


def test_all_reference_flags_accepted():
    parser = build_parser()
    opts = {o for a in parser._actions for o in a.option_strings}
    missing = [f for f in REFERENCE_FLAGS if f not in opts]
    assert not missing, f"missing reference flags: {missing}"


def test_defaults_match_reference():
    args = build_parser().parse_args(["--dataset_name", "celeba_aligned"])
    cfg = config_from_args(args)
    assert cfg.lr == 5e-3
    assert cfg.num_steps == 500
    assert cfg.num_tokens == 500
    assert cfg.feature_upsample_res == 128
    assert cfg.batch_size == 4
    assert cfg.top_k == 10
    assert cfg.furthest_point_num_samples == 25
    assert cfg.num_indices == 100
    assert cfg.sigma == 2.0
    assert cfg.sharpening_loss_weight == 100.0
    assert cfg.equivariance_attn_loss_weight == 1000.0
    assert cfg.layers == (0, 1, 2, 3)
    assert cfg.noise_level == -1
    assert cfg.augment_degrees == 15.0
    assert cfg.augment_scale == (0.8, 1.0)
    assert cfg.augment_translate == (0.25, 0.25)
    assert cfg.augmentation_iterations == 10
    assert cfg.max_num_points == 50_000


def test_presets_fill_untouched_fields():
    cfg = apply_preset(Config(dataset_name="deepfashion"))
    assert cfg.evaluation_method == "pck"
    assert cfg.num_steps == 10_000
    # explicit user value wins over preset
    cfg2 = apply_preset(Config(dataset_name="deepfashion", num_steps=42))
    assert cfg2.num_steps == 42


def test_cli_overrides():
    args = build_parser().parse_args(
        ["--num_tokens", "100", "--layers", "0", "1", "--dtype", "float32"]
    )
    cfg = config_from_args(args)
    assert cfg.num_tokens == 100
    assert cfg.layers == (0, 1)
    assert cfg.dtype == "float32"
