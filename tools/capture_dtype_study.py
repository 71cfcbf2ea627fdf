"""capture_dtype=bf16 end-to-end metric study (companion to latent_warp_study).

`--capture_dtype bf16` stores the captured [B, R^2, T] attention maps in
bfloat16 (halving their HBM footprint and bandwidth — they are the
largest per-step tensor: 33 MB/device at the reference shape) while the
layer/head mean still accumulates in fp32 (runtime.collect_maps). The
profile-backed ceiling analysis (STATUS.md) names this the one remaining
exact-path perf lever; it is OFF by default because it perturbs both the
loss forward and d(loss)/d(context).

This script measures what that rounding does END TO END at the tiny scale
this container can train: for each seed it runs the full 5-stage pipeline
(SyntheticBlobs) in fp32-capture and bf16-capture, plus a mixed setting
(fp32-trained embedding, bf16 eval), and additionally compares one-step
gradients d(loss)/d(context) on identical inputs (cosine similarity +
relative L2), the quantity that accumulates over the 500-step optimization.

Caveat mirrors the latent_warp study: random-init tiny models produce
flatter, noisier maps than a trained SD UNet, so the metric deltas here
are a noisy bound, not a parity proof; per-checkpoint validation belongs
in tools/validate_real_weights.py once real weights land.

Usage: JAX_PLATFORMS=cpu python tools/capture_dtype_study.py [--seeds 3]
Record the printed table in STATUS.md next to the latent_warp study.
"""

from __future__ import annotations

import argparse
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

    def make_cfg(capture_dtype: str, folder: str) -> Config:
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
            capture_dtype=capture_dtype,
            save_folder=folder,
        )

    train = SyntheticBlobs(length=16, image_size=64, num_kpts=4, seed=seed)
    test = SyntheticBlobs(length=6, image_size=64, num_kpts=4, seed=seed + 100)
    base = f"/tmp/capdtype_study/s{seed}"

    def full_pipeline(capture_dtype: str, tag: str):
        folder = f"{base}/{tag}"
        os.makedirs(folder, exist_ok=True)
        rt = Runtime.create(
            make_cfg(capture_dtype, folder), tiny_unet_config(), tiny_vae_config(),
            mesh=pmesh.make_mesh(),
        )
        ctx = optimize_embedding(rt, train)
        indices = find_best_indices(rt, train, ctx)
        src, tgt, vis = precompute_all_keypoints(rt, train, ctx, indices)
        reg = fit_regressor(rt.cfg, src, tgt, vis)
        mean_dist, _ = evaluate(rt, test, ctx, indices, reg)
        return rt, ctx, indices, reg, float(mean_dist)

    rt_f, ctx_f, idx_f, reg_f, metric_fp32 = full_pipeline("fp32", "fp32")
    _, _, _, _, metric_bf16 = full_pipeline("bf16", "bf16")

    # mixed: fp32-trained embedding, bf16 EVAL only (same weights: Runtime
    # params are seeded by cfg.seed which both cfgs share, but swap anyway
    # to make the comparison explicit rather than seed-coincidental)
    rt_m = Runtime.create(
        make_cfg("bf16", f"{base}/mixed"), tiny_unet_config(), tiny_vae_config(),
        mesh=pmesh.make_mesh(),
    )
    # IMPORTANT: this param swap must happen BEFORE any of rt_m's
    # cached_property jitted functions (augmented_keypoints_fn, attn_maps_fn,
    # ...) are first accessed — those close over the params at first access,
    # so a reorder would silently bind the pre-swap random init.
    object.__setattr__(rt_m, "unet_params", rt_f.unet_params)
    object.__setattr__(rt_m, "vae_params", rt_f.vae_params)
    os.makedirs(f"{base}/mixed", exist_ok=True)
    metric_mixed, _ = evaluate(rt_m, test, ctx_f, idx_f, reg_f)

    # one-step gradient comparison on identical inputs: d(loss)/d(context)
    # through capture + selection + both losses, fp32 vs bf16 capture
    # (same noise/thetas injected into both runtimes)
    import jax.numpy as jnp

    from stablekeypoints_tpu.ops.transforms import (
        AffineParams,
        apply_affine,
        sample_thetas,
    )

    cfg = rt_f.cfg
    images = jnp.asarray(
        np.stack(
            [np.asarray(train[i]["img"], np.float32) for i in range(cfg.batch_size)]
        )
    )
    aff = AffineParams(
        cfg.augment_degrees, tuple(cfg.augment_scale), tuple(cfg.augment_translate)
    )
    b = images.shape[0]
    k_noise, k_theta = jax.random.split(jax.random.PRNGKey(seed + 7))
    thetas = sample_thetas(k_theta, b, aff)
    both = jnp.concatenate([images, apply_affine(images, thetas, params=aff)], axis=0)

    def grad_of(rt):
        def loss_fn(ctx):
            maps_all = rt._attn_maps(
                rt.unet_params, rt.vae_params, both, ctx, k_noise, -1, None,
                cfg.truncate_unet,
            )
            maps, maps_t = maps_all[:b], maps_all[b:]
            sls, els = jax.vmap(rt._per_sample_losses)(maps, maps_t, thetas)
            return (
                jnp.mean(sls) * cfg.sharpening_loss_weight
                + jnp.mean(els) * cfg.equivariance_attn_loss_weight
            )

        return np.asarray(jax.grad(loss_fn)(jnp.asarray(ctx_f)), np.float64)

    g_f, g_b = grad_of(rt_f), grad_of(rt_m)
    cos = float(
        (g_f * g_b).sum() / (np.linalg.norm(g_f) * np.linalg.norm(g_b) + 1e-30)
    )
    rel = float(np.linalg.norm(g_b - g_f) / (np.linalg.norm(g_f) + 1e-30))

    # eval-side keypoint displacement on identical inputs/views
    timgs = np.stack(
        [np.asarray(test[i]["img"], np.float32) for i in range(len(test))]
    )
    kkey = jax.random.PRNGKey(seed + 5)
    kp_f = np.asarray(
        rt_f.augmented_keypoints_fn(ctx_f, timgs, np.asarray(idx_f, np.int32), kkey)
    )
    kp_b = np.asarray(
        rt_m.augmented_keypoints_fn(ctx_f, timgs, np.asarray(idx_f, np.int32), kkey)
    )
    disp = np.linalg.norm(kp_b - kp_f, axis=-1) * rt_f.cfg.image_size
    return {
        "metric_fp32": metric_fp32,
        "metric_bf16_full": metric_bf16,
        "metric_bf16_eval_only": float(metric_mixed),
        "grad_cosine": cos,
        "grad_rel_l2": rel,
        "kp_disp_px": float(disp.mean()),
        "kp_disp_px_max": float(disp.max()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()

    keys = [
        "metric_fp32", "metric_bf16_full", "metric_bf16_eval_only",
        "grad_cosine", "grad_rel_l2", "kp_disp_px", "kp_disp_px_max",
    ]
    acc = {k: [] for k in keys}
    for seed in range(args.seeds):
        res = run_seed(seed)
        print(f"seed {seed}: {json.dumps(res)}")
        for k in keys:
            acc[k].append(res[k])
    print("means:", json.dumps({k: float(np.mean(v)) for k, v in acc.items()}))


if __name__ == "__main__":
    main()
