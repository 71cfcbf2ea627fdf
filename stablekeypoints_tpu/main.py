"""CLI entry point: run stages 1-5 sequentially.

Flag surface matches the reference (main.py:23-195, same names/defaults) so
users can switch frameworks without changing launch commands; TPU-specific
flags are additive. Usage:

    python -m stablekeypoints_tpu.main --dataset_name celeba_aligned \
        --dataset_loc /data/celeba --model_path /ckpts/sd15 [...]

Stage artifacts (embedding/indices/source_keypoints/target_keypoints/
visible/regressor/all_errors) are saved to --save_folder as .npy + .pt,
like the reference's torch.save flow (main.py:218-292).
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np

from stablekeypoints_tpu.config import Config, DATASET_PRESETS, apply_preset
from stablekeypoints_tpu.data.registry import DATASET_NAMES, build_dataset
from stablekeypoints_tpu.pipeline.evaluate import evaluate
from stablekeypoints_tpu.pipeline.indices import find_best_indices
from stablekeypoints_tpu.pipeline.optimize import optimize_embedding
from stablekeypoints_tpu.pipeline.regressor import fit_regressor, precompute_all_keypoints
from stablekeypoints_tpu.pipeline.runtime import Runtime
from stablekeypoints_tpu.utils.artifacts import save_artifact
from stablekeypoints_tpu.utils.logging import MetricsLogger

__all__ = ["build_parser", "run", "main"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="optimize a class embedding (TPU-native)")
    d = Config()
    # network
    p.add_argument("--model_type", type=str, default=d.model_type)
    p.add_argument("--model_path", type=str, default=None,
                   help="local diffusers-layout checkpoint dir; omit for random init")
    p.add_argument("--my_token", type=str, default=None,
                   help="accepted for reference-CLI parity; unused offline")
    p.add_argument("--device", type=str, default=None,
                   help="accepted for reference-CLI parity (reference main.py:71 "
                   "takes 'cuda:0'); device placement here is the jax mesh")
    # dataset
    p.add_argument("--dataset_loc", type=str, default=d.dataset_loc)
    p.add_argument("--dataset_name", type=str, default=d.dataset_name, choices=DATASET_NAMES)
    p.add_argument("--max_len", type=int, default=d.max_len)
    p.add_argument("--validation", action="store_true")
    # output
    p.add_argument("--save_folder", type=str, default=d.save_folder)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--wandb_name", type=str, default=d.wandb_name)
    p.add_argument("--visualize", action="store_true")
    # optimization
    p.add_argument("--lr", type=float, default=d.lr)
    p.add_argument("--num_steps", type=int, default=d.num_steps)
    p.add_argument("--num_tokens", type=int, default=d.num_tokens)
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--sharpening_loss_weight", type=float, default=d.sharpening_loss_weight)
    p.add_argument("--equivariance_attn_loss_weight", type=float, default=d.equivariance_attn_loss_weight)
    p.add_argument("--sigma", type=float, default=d.sigma)
    p.add_argument("--num_subjects", type=int, default=d.num_subjects)
    # capture
    p.add_argument("--feature_upsample_res", type=int, default=d.feature_upsample_res)
    p.add_argument("--layers", type=int, nargs="+", default=list(d.layers))
    p.add_argument("--noise_level", type=int, default=d.noise_level)
    # selection
    p.add_argument("--top_k_strategy", type=str, default=d.top_k_strategy,
                   choices=["entropy", "gaussian", "consistent"])
    p.add_argument("--furthest_point_num_samples", type=int, default=d.furthest_point_num_samples)
    p.add_argument("--top_k", type=int, default=d.top_k)
    p.add_argument("--num_indices", type=int, default=d.num_indices)
    p.add_argument("--min_dist", type=float, default=d.min_dist)
    # extraction / eval
    p.add_argument("--max_loc_strategy", type=str, default=d.max_loc_strategy,
                   choices=["argmax", "weighted_avg"])
    p.add_argument("--evaluation_method", type=str, default=d.evaluation_method,
                   choices=["inter_eye_distance", "visible", "mean_average_error",
                            "pck", "orientation_invariant"])
    p.add_argument("--max_num_points", type=int, default=d.max_num_points)
    # augmentation
    p.add_argument("--augment_degrees", type=float, default=d.augment_degrees)
    p.add_argument("--augment_scale", type=float, nargs="+", default=list(d.augment_scale))
    p.add_argument("--augment_translate", type=float, nargs="+", default=list(d.augment_translate))
    p.add_argument("--augmentation_iterations", type=int, default=d.augmentation_iterations)
    # TPU-specific
    p.add_argument("--image_size", type=int, default=d.image_size)
    p.add_argument("--dtype", type=str, default=d.dtype, choices=["bfloat16", "float32"])
    p.add_argument("--data_parallel", type=int, default=d.data_parallel)
    p.add_argument("--no_truncate_unet", dest="truncate_unet", action="store_false")
    p.add_argument("--pallas_capture", type=str, default=d.pallas_capture,
                   choices=["auto", "on", "off"],
                   help="fused Pallas capture-attention kernel")
    p.add_argument("--capture_dtype", type=str, default=d.capture_dtype,
                   choices=["fp32", "bf16"],
                   help="dtype of captured attention maps; bf16 halves their "
                        "HBM traffic (~0.4%% relative per value, fp32 head-mean "
                        "accumulation) — measured approximation, fp32 default")
    p.add_argument("--capture_fp32_bwd", action="store_true",
                   help="strict kernel/fallback gradient parity: fp32 dsim "
                        "contraction in the capture kernel backward")
    p.add_argument("--fused_groupnorm", type=str, default=d.fused_groupnorm,
                   choices=["auto", "on", "off"],
                   help="fused Pallas VAE GroupNorm+SiLU kernel")
    p.add_argument("--fused_gn_conv", type=str, default=d.fused_gn_conv,
                   choices=["auto", "on", "off"],
                   help="single-HBM-pass GN+SiLU+3x3conv(+residual) Pallas "
                        "kernel in the VAE resblocks")
    p.add_argument("--flash_attention", type=str, default=d.flash_attention,
                   choices=["auto", "on", "off"],
                   help="Pallas flash kernel for long self-attention")
    p.add_argument("--remat", type=str, default=d.remat,
                   choices=["auto", "on", "off"],
                   help="rematerialize transformer blocks in the backward")
    p.add_argument("--no_cache_latents", dest="cache_latents", action="store_false",
                   help="disable the per-index VAE latent cache")
    p.add_argument("--latent_cache_entries", type=int, default=d.latent_cache_entries)
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--checkpoint_every", type=int, default=d.checkpoint_every)
    p.add_argument("--resume", action="store_true",
                   help="resume from mid-stage checkpoints / stage artifacts")
    p.add_argument("--log_every", type=int, default=d.log_every)
    p.add_argument("--profile_steps", type=int, default=d.profile_steps,
                   help="capture a jax.profiler trace of N stage-1 steps")
    p.add_argument("--eval_batch_images", type=int, default=d.eval_batch_images)
    p.add_argument("--steps_per_call", type=int, default=d.steps_per_call,
                   help="group N cache-hit training steps into one jitted "
                        "lax.scan call (bit-identical math; amortizes "
                        "per-dispatch host overhead). 1 disables")
    p.add_argument("--native_io", type=str, default=d.native_io,
                   choices=["auto", "on", "off"],
                   help="route adapter image loads through the native "
                        "libjpeg core (auto = only when bit-identical to PIL)")
    p.add_argument("--eval_ensemble_res", type=int, default=d.eval_ensemble_res,
                   help="-1 = warp the test-time ensemble at image resolution (reference-exact); lower = faster eval")
    p.add_argument("--jax_cache_dir", type=str, default=d.jax_cache_dir,
                   help="persistent XLA compilation cache ('' disables; "
                        "JAX_COMPILATION_CACHE_DIR env overrides)")
    p.add_argument("--latent_warp", action="store_true",
                   help="APPROXIMATION: warp cached VAE latents instead of "
                        "encoding warped images (cache-hit train steps + "
                        "eval ensemble); validate metrics per-dataset")
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    fields = {f.name for f in dataclasses.fields(Config)}
    kw = {k: v for k, v in vars(args).items() if k in fields}
    for t in ("layers", "augment_scale", "augment_translate"):
        kw[t] = tuple(kw[t])
    return apply_preset(Config(**kw))


def run(cfg: Config, unet_config=None, vae_config=None) -> dict:
    """Stages 1-5. `unet_config`/`vae_config` override the model topology
    (tiny fabricated-checkpoint selftests, tools/validate_real_weights.py
    --selftest); None = the production configs chosen from cfg.model_type."""
    logger = MetricsLogger(
        cfg.save_folder, cfg.wandb, cfg.wandb_name, config=dataclasses.asdict(cfg)
    )
    extra = {}
    if unet_config is not None:
        extra["unet_config"] = unet_config
    if vae_config is not None:
        extra["vae_config"] = vae_config
    runtime = Runtime.create(cfg, **extra)
    results: dict = {}

    def artifact_or(name, compute):
        """Stage-level resume: reuse an existing artifact when --resume."""
        if cfg.resume:
            try:
                from stablekeypoints_tpu.utils.artifacts import load_artifact

                value = load_artifact(cfg.save_folder, name)
                logger.log({"event": "stage_artifact_reused", "artifact": name})
                return value, True
            except FileNotFoundError:
                pass
        return compute(), False

    # Stage 1
    train_ds = build_dataset(cfg, "train")
    checkpointer = None
    if cfg.checkpoint_every or cfg.resume:
        from stablekeypoints_tpu.utils.checkpoint import TrainCheckpointer

        checkpointer = TrainCheckpointer(cfg.save_folder)
    context, reused = artifact_or(
        "embedding",
        lambda: optimize_embedding(
            runtime, train_ds, logger, checkpointer=checkpointer
        ),
    )
    if not reused:
        save_artifact(cfg.save_folder, "embedding", np.asarray(context))
    context = np.asarray(context)
    results["embedding"] = context

    # Stage 2
    indices, reused = artifact_or(
        "indices", lambda: find_best_indices(runtime, train_ds, context, logger)
    )
    if not reused:
        save_artifact(cfg.save_folder, "indices", indices)
    results["indices"] = indices

    if cfg.visualize:
        from stablekeypoints_tpu.pipeline.visualize import visualize_attn_maps

        visualize_attn_maps(runtime, train_ds, context, indices, logger=logger)

    if cfg.dataset_name in ("custom", "synthetic"):
        print("Dataset has no annotations; stopping after stage 2 (+visualization).")
        logger.close()
        return results

    # Stage 3
    reg_ds = build_dataset(cfg, "train_reg")

    def stage3():
        source, target, visible = precompute_all_keypoints(
            runtime, reg_ds, context, indices, logger
        )
        save_artifact(cfg.save_folder, "source_keypoints", source)
        save_artifact(cfg.save_folder, "target_keypoints", target)
        if visible is not None:
            save_artifact(cfg.save_folder, "visible", visible)
        return source, target, visible

    if cfg.resume:
        try:
            from stablekeypoints_tpu.utils.artifacts import load_artifact

            source = load_artifact(cfg.save_folder, "source_keypoints")
            target = load_artifact(cfg.save_folder, "target_keypoints")
            try:
                visible = load_artifact(cfg.save_folder, "visible")
            except FileNotFoundError:
                visible = None
            logger.log({"event": "stage_artifact_reused", "artifact": "keypoints"})
        except FileNotFoundError:
            source, target, visible = stage3()
    else:
        source, target, visible = stage3()

    # Stage 4
    regressor = fit_regressor(cfg, source, target, visible)
    save_artifact(cfg.save_folder, "regressor", regressor)
    results["regressor"] = regressor

    if cfg.visualize:
        from stablekeypoints_tpu.pipeline.visualize import visualize_attn_maps

        visualize_attn_maps(
            runtime, reg_ds, context, indices, regressor=regressor, logger=logger
        )

    # Stage 5
    test_ds = build_dataset(cfg, "test")
    mean_distance, _ = evaluate(runtime, test_ds, context, indices, regressor, logger)
    results["mean_distance"] = mean_distance
    print(f"mean distance: {mean_distance}")
    logger.close()
    return results


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    return run(cfg)


if __name__ == "__main__":
    main()
