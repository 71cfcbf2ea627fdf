"""latent_warp end-to-end metric study (companion to ensemble_res_study).

`--latent_warp` replaces encode(warp(image)) with warp(encode(image)) on
latent-cache-hit training steps and in the stage-3/5 test-time ensemble.
This script measures what that approximation does to the END metric at
the tiny scale this container can train end-to-end: for each seed it runs
the full pipeline (stages 1-5 on SyntheticBlobs) twice — exact and
latent_warp — plus a mixed setting (exact-trained embedding, latent_warp
eval) that isolates the eval-side effect, and reports metric deltas and
test-keypoint displacement.

IMPORTANT caveat, also in tests/test_latent_warp.py: a random-init tiny
VAE is much less affine-equivariant than a trained one (measured corr
0.72 warped vs 0.28 unwarped at 128^2), so these numbers are a PESSIMISTIC
bound on the real-checkpoint behavior; the per-checkpoint closeness check
lives in tools/validate_real_weights.py (phase latent_warp).

Usage: JAX_PLATFORMS=cpu python tools/latent_warp_study.py [--seeds 3]
Results are committed to STATUS.md.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def run_seed(seed: int):
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
    )
    from stablekeypoints_tpu.pipeline.runtime import Runtime

    def make_cfg(warp: bool, folder: str) -> Config:
        return Config(
            dataset_name="synthetic",
            image_size=64,
            num_tokens=16,
            feature_upsample_res=16,
            batch_size=8,
            num_steps=40,
            num_indices=8,
            furthest_point_num_samples=8,
            top_k=4,
            augmentation_iterations=8,
            max_num_points=12,
            dtype="float32",
            seed=seed,
            latent_warp=warp,
            save_folder=folder,
        )

    train = SyntheticBlobs(length=16, image_size=64, num_kpts=4, seed=seed)
    test = SyntheticBlobs(length=6, image_size=64, num_kpts=4, seed=seed + 100)
    base = f"/tmp/lw_study/s{seed}"

    def full_pipeline(warp: bool, tag: str):
        folder = f"{base}/{tag}"
        os.makedirs(folder, exist_ok=True)
        rt = Runtime.create(
            make_cfg(warp, folder), tiny_unet_config(), tiny_vae_config(),
            mesh=pmesh.make_mesh(),
        )
        ctx = optimize_embedding(rt, train)
        indices = find_best_indices(rt, train, ctx)
        src, tgt, vis = precompute_all_keypoints(rt, train, ctx, indices)
        reg = fit_regressor(rt.cfg, src, tgt, vis)
        mean_dist, _ = evaluate(rt, test, ctx, indices, reg)
        return rt, ctx, indices, reg, float(mean_dist)

    rt_e, ctx_e, idx_e, reg_e, metric_exact = full_pipeline(False, "exact")
    _, _, _, _, metric_warp = full_pipeline(True, "warp")

    # mixed: exact-trained embedding, latent_warp EVAL only
    rt_m = Runtime.create(
        make_cfg(True, f"{base}/mixed"), tiny_unet_config(), tiny_vae_config(),
        mesh=pmesh.make_mesh(),
    )
    object.__setattr__(rt_m, "unet_params", rt_e.unet_params)
    object.__setattr__(rt_m, "vae_params", rt_e.vae_params)
    # black_latent was eagerly cached at create time from rt_m's OWN
    # create-time VAE params (latent_warp=True); drop it so the border fill
    # rebinds to the swapped-in params (identical today only because both
    # runtimes share cfg.seed — do not rely on that)
    rt_m.__dict__.pop("black_latent", None)
    rt_m.black_latent  # eager re-precompute (must not be first-touched in-trace)
    os.makedirs(f"{base}/mixed", exist_ok=True)
    metric_mixed, _ = evaluate(rt_m, test, ctx_e, idx_e, reg_e)

    # eval-side keypoint displacement on identical inputs/views
    images = np.stack(
        [np.asarray(test[i]["img"], np.float32) for i in range(len(test))]
    )
    key = jax.random.PRNGKey(seed + 5)
    kp_exact = np.asarray(
        rt_e.augmented_keypoints_fn(ctx_e, images, np.asarray(idx_e, np.int32), key)
    )
    kp_warp = np.asarray(
        rt_m.augmented_keypoints_fn(ctx_e, images, np.asarray(idx_e, np.int32), key)
    )
    disp = np.linalg.norm(kp_warp - kp_exact, axis=-1)
    return {
        "metric_exact": metric_exact,
        "metric_warp_full": metric_warp,
        "metric_warp_eval_only": float(metric_mixed),
        "kp_disp_px": float(disp.mean() * 64),
        "kp_disp_px_max": float(disp.max() * 64),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()

    keys = [
        "metric_exact", "metric_warp_full", "metric_warp_eval_only",
        "kp_disp_px", "kp_disp_px_max",
    ]
    acc = {k: [] for k in keys}
    for seed in range(args.seeds):
        res = run_seed(seed)
        print(f"seed {seed}: {json.dumps(res)}")
        for k in keys:
            acc[k].append(res[k])

    print("\n| setting | metric (mean over seeds) |")
    print("|---|---|")
    print(f"| exact (default) | {np.mean(acc['metric_exact']):.4f} |")
    print(f"| latent_warp train+eval | {np.mean(acc['metric_warp_full']):.4f} |")
    print(f"| latent_warp eval only | {np.mean(acc['metric_warp_eval_only']):.4f} |")
    print(
        f"\neval keypoint displacement vs exact: mean "
        f"{np.mean(acc['kp_disp_px']):.3f} px/64, max "
        f"{np.max(acc['kp_disp_px_max']):.3f} px/64 (random-init VAE = "
        "pessimistic bound; see module docstring)"
    )


if __name__ == "__main__":
    main()
