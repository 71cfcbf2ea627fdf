"""Framework configuration.

One dataclass mirroring the reference CLI surface (main.py:23-195, same flag
names) plus TPU-specific knobs (dtype, mesh shape, truncated forward). Flat
argparse in the reference; validated dataclass with per-dataset presets here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

__all__ = ["Config", "DATASET_PRESETS", "apply_preset"]


@dataclasses.dataclass
class Config:
    # network / checkpoint
    model_type: str = "sd-legacy/stable-diffusion-v1-5"
    model_path: Optional[str] = None  # local diffusers-layout dir; None = random init
    my_token: Optional[str] = None  # accepted for CLI parity; unused offline

    # dataset
    dataset_loc: str = "~"
    dataset_name: str = "celeba_aligned"
    max_len: int = -1
    validation: bool = False

    # output
    save_folder: str = "outputs"
    wandb: bool = False
    wandb_name: str = "temp"
    visualize: bool = False

    # optimization (stage 1)
    lr: float = 5e-3
    num_steps: int = 500
    num_tokens: int = 500
    batch_size: int = 4
    sharpening_loss_weight: float = 100.0
    equivariance_attn_loss_weight: float = 1000.0
    sigma: float = 2.0
    num_subjects: int = 1

    # attention capture
    feature_upsample_res: int = 128
    layers: tuple[int, ...] = (0, 1, 2, 3)
    noise_level: int = -1

    # token selection
    top_k_strategy: str = "gaussian"  # gaussian | entropy | consistent
    furthest_point_num_samples: int = 25
    top_k: int = 10
    num_indices: int = 100
    min_dist: float = 0.1

    # keypoint extraction / eval
    max_loc_strategy: str = "argmax"  # argmax | weighted_avg
    evaluation_method: str = "inter_eye_distance"
    max_num_points: int = 50_000

    # augmentation
    augment_degrees: float = 15.0
    augment_scale: tuple[float, float] = (0.8, 1.0)
    augment_translate: tuple[float, float] = (0.25, 0.25)
    augmentation_iterations: int = 10

    # TPU-specific
    image_size: int = 512
    dtype: str = "bfloat16"  # compute dtype for the UNet/VAE
    # cache posterior-mean VAE latents per dataset index (deterministic, so
    # steady-state steps skip the original-image encode — identical math);
    # auto-disabled for adapters with per-access augmentation randomness
    cache_latents: bool = True
    latent_cache_entries: int = 50_000  # max cached latents (64KB each at 512^2)
    data_parallel: int = -1  # -1 = all available devices
    truncate_unet: bool = True  # stop the forward after the last captured map
    pallas_capture: str = "auto"  # auto|on|off: fused capture-attention kernel
    # strict kernel/fallback gradient parity: keep the capture backward's
    # dsim contraction in fp32 (one rounding, matching the einsum fallback)
    # instead of the default bf16 MXU-rate matmuls (~1-ulp gradient noise)
    capture_fp32_bwd: bool = False
    # dtype of the captured [B, res^2, T] attention maps. bf16 halves their
    # HBM write + cotangent read (the head-mean still accumulates in fp32 and
    # rounds once); ~0.4% relative per map value. Measured approximation —
    # default stays fp32 (reference-exact); validate per-checkpoint via
    # tools/validate_real_weights.py before enabling for training
    capture_dtype: str = "fp32"  # fp32|bf16
    flash_attention: str = "auto"  # auto|on|off: flash kernel for long self-attn
    fused_groupnorm: str = "auto"  # auto|on|off: fused VAE GroupNorm+SiLU kernel
    # auto|on|off: single-HBM-pass GN+SiLU+3x3conv(+residual) Pallas kernel
    # in the VAE resblocks (kernels/gn_conv.py); per-layer shape gate, falls
    # back to fused_groupnorm/XLA where unsupported
    fused_gn_conv: str = "auto"
    # rematerialization of transformer blocks in the backward. auto = off
    # while the activation footprint (per-device merged batch x image area)
    # fits HBM — flash attention removed the seq^2 tensors, so storing
    # activations skips the backward's forward recompute (+12% SD1.5, +14%
    # SDXL measured); on above ~8 batch-at-512^2 units
    remat: str = "auto"  # auto|on|off
    # test images folded into one sharded batch in stages 3/5 (detect_batch);
    # HBM stays bounded regardless via eval_views_per_pass chunking
    eval_batch_images: int = 4
    # dispatch amortization: group this many consecutive latent-cache-HIT
    # training steps into ONE jitted lax.scan call. The scan body IS the
    # per-step program, so the math and PRNG stream are identical to
    # per-step dispatch (floating-point trajectories agree to compiler
    # fusion differences); +6.6% steps/s measured on v5e, where each
    # dispatch costs ~9 ms of host/RPC gap. The stage-1 loop falls back to
    # per-step dispatch for cache misses, checkpoint boundaries, the tail,
    # and profiling runs. 1 disables grouping
    steps_per_call: int = 10
    # max augmented views per forward pass in the test-time ensemble: more
    # images per call chunk through the UNet sequentially (lax.map) so HBM
    # stays bounded while per-call overheads amortize
    eval_views_per_pass: int = 16
    # resolution at which the test-time ensemble is warped/averaged:
    # -1 = image resolution (reference-exact, eval.py:253-266); lower values
    # (e.g. 128) warp at capture resolution and upsample the average,
    # trading exact argmax parity for ~3x faster evaluation
    eval_ensemble_res: int = -1
    # APPROXIMATION (off by default): warp the original image's VAE latent
    # with the step's affine instead of encoding the warped image (the VAE
    # is only approximately affine-equivariant; borders are filled with
    # the black-image latent). Applies to every training step (cache-hit:
    # warp the cached latent; cache-miss: encode the original once, warp
    # its latent) and to the stage-3/5 test-time ensemble (one encode per
    # image instead of one per view). Validate per-dataset before relying
    # on metrics.
    latent_warp: bool = False
    # adapter image loads: off = PIL (reference-exact resizes); auto = native
    # libjpeg decode only when bit-identical (file already target-sized);
    # on = native fused decode+resize for all JPEGs (torch-bilinear, no
    # antialias — measured ~1.3x per loader thread and GIL-free)
    native_io: str = "auto"
    # persistent XLA compilation cache (cold production-step compiles take
    # minutes; warm runs skip them). "" disables; the
    # JAX_COMPILATION_CACHE_DIR env var / an already-set jax config wins
    jax_cache_dir: str = "~/.cache/stablekeypoints_tpu/jax"
    seed: int = 0
    checkpoint_every: int = 0  # 0 = only stage-end artifacts
    resume: bool = False  # resume from checkpoints / stage artifacts
    log_every: int = 10
    profile_steps: int = 0  # capture a jax.profiler trace of N stage-1 steps


# README.md:50-56 guidance: 500 steps for humans/faces, 10k for others
DATASET_PRESETS: dict[str, dict] = {
    "celeba_aligned": {"evaluation_method": "inter_eye_distance"},
    "celeba_wild": {"evaluation_method": "inter_eye_distance"},
    "cub_aligned": {"evaluation_method": "visible", "num_steps": 10_000},
    "cub_001": {"evaluation_method": "visible", "num_steps": 10_000},
    "cub_002": {"evaluation_method": "visible", "num_steps": 10_000},
    "cub_003": {"evaluation_method": "visible", "num_steps": 10_000},
    "cub_all": {"evaluation_method": "visible", "num_steps": 10_000},
    "deepfashion": {"evaluation_method": "pck", "num_steps": 10_000},
    "taichi": {"evaluation_method": "mean_average_error", "num_steps": 10_000},
    "human3.6m": {"evaluation_method": "orientation_invariant"},
    "unaligned_human3.6m": {"evaluation_method": "orientation_invariant"},
    "custom": {},
}


def apply_preset(cfg: Config) -> Config:
    """Fill dataset-appropriate defaults the user did not override."""
    preset = DATASET_PRESETS.get(cfg.dataset_name, {})
    defaults = Config()
    updates = {
        k: v
        for k, v in preset.items()
        if getattr(cfg, k) == getattr(defaults, k)  # only untouched fields
    }
    return dataclasses.replace(cfg, **updates)
