"""Time the detect/eval ensemble path (10-view 512^2, reference-exact warp).

Usage: python tools/bench_detect.py [--m 4] [--iters 5]
Prints s/image for the batched ensembled-keypoints function (stage 3/5 inner
loop; eval.py:197-355 equivalent).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.pipeline.runtime import Runtime


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=4, help="images per batch")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--latent_warp", action="store_true",
                    help="APPROXIMATION ablation: one encode per image, "
                    "views warped in latent space")
    args = ap.parse_args()

    cfg = Config(dataset_name="synthetic", image_size=512, num_tokens=500,
                 eval_batch_images=args.m, dtype="bfloat16",
                 latent_warp=args.latent_warp)
    rt = Runtime.create(cfg)
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (args.m, 512, 512, 3)).astype(np.float32)
    context = rt.init_context()
    idx = np.arange(cfg.top_k, dtype=np.int32)
    key = jax.random.PRNGKey(0)

    pts = rt.augmented_keypoints_fn(context, images, idx, key)  # compile
    _ = np.asarray(pts)
    t0 = time.perf_counter()
    for i in range(args.iters):
        pts = rt.augmented_keypoints_fn(context, images, idx, jax.random.fold_in(key, i))
    _ = np.asarray(pts)
    dt = (time.perf_counter() - t0) / (args.iters * args.m)
    print(f"detect_batch: {dt:.3f} s/image (M={args.m}, "
          f"{cfg.augmentation_iterations} views, 512^2, ensemble_res="
          f"{cfg.eval_ensemble_res}, latent_warp={cfg.latent_warp})")


if __name__ == "__main__":
    main()
