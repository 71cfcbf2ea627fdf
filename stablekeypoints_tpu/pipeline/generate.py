"""Image generation with the learned embedding (generate_image.py parity).

Semantics of generate_image.py:20-39 + ptp_utils.text2image_ldm_stable
(ptp_utils.py:420-461): 50-step DDIM sampling conditioned on the learned
context only (low_resource=True drops the unconditional/CFG branch),
starting from seeded Gaussian latents, then VAE decode. The reference's
register_attention_control_generation machinery (ptp_utils.py:351-416)
existed to *read* attention during sampling; here maps can simply be
captured functionally on any step if requested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stablekeypoints_tpu.models.vae import VAE
from stablekeypoints_tpu.pipeline.runtime import Runtime, collect_maps

__all__ = ["generate_images", "v_to_eps"]


def v_to_eps(v, lat, alpha_t):
    """Convert a v-prediction model output to epsilon at timestep t.

    With lat = sqrt(a)·x0 + sqrt(1-a)·eps and v ≡ sqrt(a)·eps - sqrt(1-a)·x0
    (the SD-2.x 768 checkpoints' parameterization):
    sqrt(a)·v + sqrt(1-a)·lat = eps exactly (identity unit-tested)."""
    return jnp.sqrt(alpha_t) * v + jnp.sqrt(1.0 - alpha_t) * lat


def generate_images(
    runtime: Runtime,
    context,
    num_images: int = 1,
    key=None,
    latent_hw: int | None = None,
    capture_final_maps: bool = False,
    guidance_scale: float = 1.0,
    uncond_context=None,
):
    """Sample images; optionally also return the final step's token maps.

    guidance_scale > 1 enables classifier-free guidance: eps = eps_uncond +
    s * (eps_text - eps_uncond), the reference's low_resource=False branch
    (ptp_utils.py:337-349). The reference's uncond embedding is CLIP("")
    (ptp_utils.py:431-435); with the learned context replacing the text
    encoder entirely, `uncond_context` defaults to zeros [1, 77, 768] (pass
    a real CLIP("") embedding to reproduce checkpoint-faithful CFG). At
    scale 1.0 the uncond forward is skipped — the reference's executed
    low_resource=True path.
    """
    cfg = runtime.cfg
    sched = runtime.schedule
    key = key if key is not None else jax.random.PRNGKey(cfg.seed + 8)
    hw = latent_hw if latent_hw is not None else cfg.image_size // 8
    use_cfg = guidance_scale != 1.0
    if uncond_context is None:
        uncond_context = jnp.zeros((1, 77, context.shape[-1]), jnp.float32)

    # params are explicit args: closed-over trees become HLO constants and
    # ship the full weights to the compiler
    @functools.partial(jax.jit, static_argnums=(5,))
    def sample(unet_params, vae_params, context, uncond, key, capture: bool):
        latents = jax.random.normal(
            key, (num_images, hw, hw, runtime.unet.config.in_channels), jnp.float32
        )
        ctx = jnp.broadcast_to(context, (num_images, *context.shape[1:]))
        uctx = jnp.broadcast_to(uncond, (num_images, *uncond.shape[1:]))
        n_steps = len(sched.timesteps)

        # SDXL: condition on diffusers-standard time_ids for the generated
        # size (None for SD1.x)
        added = runtime._added_cond(num_images, target_size=hw * 8)

        def eps_fn(lat, ts, c):
            eps, _ = runtime.unet.apply(
                {"params": unet_params}, lat, ts, c, added_cond=added
            )
            return eps

        def body(i, lat):
            t = jnp.asarray(sched.timesteps)[i]
            ts = jnp.full((num_images,), t, jnp.int32)
            eps = eps_fn(lat, ts, ctx)
            if use_cfg:
                # two forwards (the learned context's token count differs
                # from the uncond's, so the reference's cat-by-2 batching
                # does not apply); same math as ptp_utils.py:344-348
                eps_u = eps_fn(lat, ts, uctx)
                eps = eps_u + guidance_scale * (eps - eps_u)
            # DDIM update (unrolled indexing done via gather on tables)
            acp = jnp.asarray(sched.alphas_cumprod)
            step_ratio = sched.num_train_timesteps // n_steps
            prev_t = t - step_ratio
            alpha_t = acp[t]
            if runtime.unet.config.prediction_type == "v_prediction":
                # guidance combines in model-output space (diffusers order),
                # then the combined v converts to epsilon
                eps = v_to_eps(eps, lat, alpha_t)
            alpha_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)], acp[0])
            x0 = (lat - jnp.sqrt(1 - alpha_t) * eps) / jnp.sqrt(alpha_t)
            return jnp.sqrt(alpha_prev) * x0 + jnp.sqrt(1 - alpha_prev) * eps

        latents = jax.lax.fori_loop(0, n_steps, body, latents)

        maps = None
        if capture:
            _, captures = runtime.unet.apply(
                {"params": unet_params},
                latents,
                jnp.full((num_images,), int(sched.timesteps[-1]), jnp.int32),
                ctx,
                capture_res=cfg.feature_upsample_res,
                truncate=True,
                added_cond=added,
            )
            maps = collect_maps(captures, cfg.layers, -1, None)
        images = runtime.vae.apply(
            {"params": vae_params}, latents, method=VAE.decode
        )
        images = jnp.clip(images / 2.0 + 0.5, 0.0, 1.0)
        return images, maps

    images, maps = sample(
        runtime.unet_params, runtime.vae_params, context, uncond_context, key,
        capture_final_maps,
    )
    return (np.asarray(images), None if maps is None else np.asarray(maps))


def main(argv=None):
    """Standalone generation CLI (generate_image.py:20-39 parity): load the
    learned embedding from --save_folder and sample images with it."""
    import argparse
    import os

    from PIL import Image

    from stablekeypoints_tpu.config import Config
    from stablekeypoints_tpu.utils.artifacts import load_artifact

    p = argparse.ArgumentParser(description="generate images with a learned embedding")
    p.add_argument("--save_folder", type=str, default="outputs")
    p.add_argument("--model_type", type=str, default=Config.model_type)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--num_images", type=int, default=1)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--guidance_scale", type=float, default=1.0,
        help="classifier-free guidance scale; 1.0 = text-only "
        "(the reference's executed low_resource=True path)",
    )
    p.add_argument(
        "--uncond_path", type=str, default=None,
        help="optional .npy/.pt embedding for the CFG unconditional branch "
        "(e.g. a saved CLIP('') encoding, the reference's uncond at "
        "ptp_utils.py:431-435); default zeros",
    )
    args = p.parse_args(argv)

    embedding = load_artifact(args.save_folder, "embedding")
    uncond = None
    if args.uncond_path:
        d, f = os.path.split(args.uncond_path)
        uncond = jnp.asarray(load_artifact(d or ".", os.path.splitext(f)[0]))
    cfg = Config(
        model_type=args.model_type, model_path=args.model_path,
        image_size=args.image_size, num_tokens=embedding.shape[1], seed=args.seed,
    )
    runtime = Runtime.create(cfg)
    images, _ = generate_images(
        runtime, jnp.asarray(embedding), args.num_images,
        guidance_scale=args.guidance_scale, uncond_context=uncond,
    )
    for i, img in enumerate(images):
        out = os.path.join(args.save_folder, f"generated_{i:03d}.png")
        Image.fromarray((img * 255).astype(np.uint8)).save(out)
        print(f"saved {out}")


if __name__ == "__main__":
    main()
