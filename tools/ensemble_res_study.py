"""eval_ensemble_res trade study (VERDICT r2 weak #7 / next #8).

The test-time ensemble can be inverse-warped and averaged at a resolution
below the image size, upsampling only the average (`Config.eval_ensemble_res`;
-1 = image resolution = reference-exact, eval.py:253-266). This script
quantifies what the approximation trades, at the tiny scale this container
can train end-to-end:

For each seed: train stages 1-4 on SyntheticBlobs (tiny UNet/VAE, 64^2
images, 16^2 capture), then run stage 5 with eval_ensemble_res in
{-1 (exact=64), 32, 16} — the scaled analogs of {512, 256, 128} at the
production shape — and record (a) mean keypoint displacement vs the exact
setting, in pixels at image resolution, and (b) the metric delta.

Usage: JAX_PLATFORMS=cpu python tools/ensemble_res_study.py [--seeds 3]
Results are committed to STATUS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def run_seed(seed: int, res_values: tuple[int, ...]):
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

    def cfg_for(res: int, folder: str) -> Config:
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
            eval_ensemble_res=res,
            save_folder=folder,
        )

    train = SyntheticBlobs(length=16, image_size=64, num_kpts=4, seed=seed)
    test = SyntheticBlobs(length=6, image_size=64, num_kpts=4, seed=seed + 100)

    # train once at the exact setting (training never uses eval_ensemble_res)
    base = f"/tmp/ens_study/s{seed}"
    os.makedirs(base, exist_ok=True)
    rt = Runtime.create(
        cfg_for(-1, base), tiny_unet_config(), tiny_vae_config(), mesh=pmesh.make_mesh()
    )
    ctx = optimize_embedding(rt, train)
    indices = find_best_indices(rt, train, ctx)
    source, target, vis = precompute_all_keypoints(rt, train, ctx, indices)
    regressor = fit_regressor(rt.cfg, source, target, vis)

    out = {}
    kp_by_res = {}
    for res in res_values:
        folder = f"{base}/r{res}"
        os.makedirs(folder, exist_ok=True)
        rt_r = Runtime.create(
            cfg_for(res, folder), tiny_unet_config(), tiny_vae_config(),
            mesh=pmesh.make_mesh(),
        )
        # keypoint displacement: ensembled keypoints on the test images
        key = jax.random.PRNGKey(seed + 5)  # same views for all settings
        images = np.stack([np.asarray(test[i]["img"], np.float32) for i in range(len(test))])
        t0 = time.time()
        kps = np.asarray(
            rt_r.augmented_keypoints_fn(ctx, images, np.asarray(indices, np.int32), key)
        )
        dt = time.time() - t0
        kp_by_res[res] = kps
        mean_dist, _ = evaluate(rt_r, test, ctx, indices, regressor)
        out[res] = {"metric": float(mean_dist), "eval_s": dt}

    exact = kp_by_res[res_values[0]]
    for res in res_values:
        disp = np.linalg.norm(kp_by_res[res] - exact, axis=-1)  # normalized
        out[res]["kp_disp_px"] = float(disp.mean() * 64)
        out[res]["kp_disp_px_max"] = float(disp.max() * 64)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()
    res_values = (-1, 32, 16)  # exact(=64), /2, /4 — analogs of 512/256/128

    rows = {r: {"metric": [], "kp_disp_px": [], "kp_disp_px_max": []} for r in res_values}
    for seed in range(args.seeds):
        res = run_seed(seed, res_values)
        print(f"seed {seed}: {json.dumps(res)}")
        for r, v in res.items():
            for k in rows[r]:
                rows[r][k].append(v[k])

    print("\n| eval_ensemble_res | metric (mean over seeds) | mean kp displacement vs exact (px/64) | max |")
    print("|---|---|---|---|")
    for r in res_values:
        m = np.mean(rows[r]["metric"])
        d = np.mean(rows[r]["kp_disp_px"])
        dm = np.max(rows[r]["kp_disp_px_max"])
        label = "exact (-1)" if r == -1 else f"{r} (= image/{64 // r})"
        print(f"| {label} | {m:.4f} | {d:.3f} | {dm:.3f} |")


if __name__ == "__main__":
    main()
