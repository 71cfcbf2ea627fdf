"""Capture an on-chip profile of the stage-1 train step and print top ops.

Runs the same workload as bench.py (SD-1.5, 512^2, 500 tokens, 128^2 capture,
batch 4, latent cache on — or SD-2.1 768^2 batch 2 / SDXL 1024^2 batch 1
via --model) under jax.profiler, then parses the xplane trace with
tensorflow's profiler protos and prints the top-k ops by self time.

Usage: python tools/profile_step.py [--steps 5] [--top 40]
       [--model sd15|sd21|sdxl] [--cache 0] [--latent_warp]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.parallel import mesh as pmesh
from stablekeypoints_tpu.pipeline.runtime import Runtime


def summarize_xplane(logdir: str, top: int) -> None:
    """Delegates to tools/parse_profile.py (single xplane parser)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parse_profile import summarize

    summarize(logdir, top)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/skt_profile")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--cache", type=int, default=1)
    ap.add_argument("--model", default="sd15", choices=("sd15", "sd21", "sdxl"))
    ap.add_argument("--latent_warp", action="store_true")
    args = ap.parse_args()

    defaults = {"sd15": (4, 512), "sd21": (2, 768), "sdxl": (1, 1024)}
    if args.batch is None:
        args.batch = defaults[args.model][0]
    image_size = defaults[args.model][1]
    cfg = Config(
        dataset_name="synthetic",
        model_type=Config.model_type if args.model == "sd15" else args.model,
        image_size=image_size,
        num_tokens=500,
        batch_size=args.batch,
        dtype="bfloat16",
        latent_warp=args.latent_warp,
    )
    runtime = Runtime.create(cfg)
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, size=(args.batch, image_size, image_size, 3)).astype(np.float32)
    images = pmesh.shard_batch(runtime.mesh, images)
    context = runtime.init_context()
    opt_state = jax.device_put(
        runtime.optimizer.init(context), pmesh.replicated(runtime.mesh)
    )
    latents = runtime.encode_images_fn(images) if args.cache else None

    def step(context, opt_state, key):
        if args.cache:
            return runtime.train_step_cached(context, opt_state, latents, images, key)
        return runtime.train_step(context, opt_state, images, key)

    key = jax.device_put(jax.random.PRNGKey(0), pmesh.replicated(runtime.mesh))
    for _ in range(2):  # compile + settle
        context, opt_state, key, metrics = step(context, opt_state, key)
    float(metrics["loss"])

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            context, opt_state, key, metrics = step(context, opt_state, key)
        float(metrics["loss"])

    summarize_xplane(args.logdir, args.top)


if __name__ == "__main__":
    main()
