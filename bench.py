"""Benchmark: stage-1 token-optimization steps/sec on the flagship model.

Measures the reference workload shape (BASELINE.md): SD-1.5 UNet, 512^2
images, 500 learned tokens, 128^2 attention capture, effective batch 4 =
2 capture forwards + 1 backward into the embedding per step, Adam update —
all as one jitted program on the available device(s).

Two steady states are measured and both are reported (VERDICT r2 weak #1):

  value (headline)   — latent-cache HIT steady state: the original-image
                       VAE latents are cached per dataset index, so each
                       step encodes only the per-step random affine view.
                       This is the multi-epoch steady state (any dataset
                       that fits latent_cache_entries, e.g. the 10k-step
                       non-human presets after epoch 1).
  fill_steps_per_sec — cache MISS/fill path: both images encoded in-step.
                       This is the single-epoch regime (the 500-step CelebA
                       flagship draws 2,000 unique images from ~160k, so
                       virtually every step is a miss).

MFU is computed from the compiled step's own XLA cost analysis against the
chip's peak (v5e: 197 bf16 TFLOP/s), so the headline does not rest on the
cross-hardware ratio. vs_baseline divides by a SAME-SHAPE derived A100
estimate of the reference per (backbone, mode) — baseline_derivation.json,
produced by tools/derive_baseline.py, full methodology in BASELINE.md; the
reference repo publishes no numbers of its own.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compilation cache: the SD-1.5 train-step compile is expensive;
# cache it across bench invocations
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.parallel import mesh as pmesh
from stablekeypoints_tpu.pipeline.runtime import Runtime

# Derived A100 denominators (BASELINE.md "A100 reference derivation" +
# "same-shape sd21/sdxl extension"): per-(backbone, mode) estimates of the
# reference's torch code at the SAME shape — matmuls at true fp32
# (torch>=1.12 defaults allow_tf32=False and the reference sets no
# precision flags), convs TF32, 30-40% eager utilization, host-synced
# per-micro-step overhead. tools/derive_baseline.py recomputes these from
# the XLA cost analysis + HLO conv/dot split of our own compiled
# reference-math programs; baseline_derivation.json (committed) is the
# authority, these literals are its rendered values (used if the JSON is
# missing).
_FALLBACK_TRAIN_DENOM = {"sd15": 0.46, "sd21": 0.62, "sdxl": 0.31}
_FALLBACK_DETECT_DENOM = {"sd15": 1.98, "sd21": 4.02, "sdxl": 11.87}


def _derivation():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "baseline_derivation.json")
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return {}


def _train_denominator(model: str) -> float:
    d = _derivation().get(model, {}).get("derived", {}).get("train", {})
    return float(d.get("denominator_steps_per_sec", _FALLBACK_TRAIN_DENOM[model]))


def _detect_denominator(model: str) -> float:
    d = _derivation().get(model, {}).get("derived", {}).get("detect", {})
    return float(d.get("denominator_seconds_per_image", _FALLBACK_DETECT_DENOM[model]))


def _denominator_note(model: str) -> str:
    same_shape = model in _derivation()
    if same_shape:
        return (
            f"A100 ref derived SAME-SHAPE for {model} (baseline_derivation.json, "
            "BASELINE.md); reference publishes no numbers"
            + (
                ""
                if model == "sd15"
                else f" and has no working {model} path — this prices its "
                "algorithm at this shape"
            )
        )
    return (
        "A100 ref derived for SD-1.5 (BASELINE.md); reference publishes no "
        "numbers" + ("" if model == "sd15" else "; denominator is the SD-1.5 analog")
    )

PEAK_TFLOPS = {  # bf16 peak per chip, by device-kind substring
    "v5 lite": 197.0, "v5e": 197.0, "v4": 275.0, "v5p": 459.0, "v6": 918.0,
}


def _peak_tflops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for k, v in PEAK_TFLOPS.items():
        if k in kind:
            return v
    return None


def _flops(step_partial, *args) -> float | None:
    """Per-step FLOPs from the compiled executable's XLA cost analysis."""
    try:
        lowered = step_partial.func.lower(*step_partial.args, *args)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def _time_steps(step_fn, context, opt_state, key, steps):
    # warmup (compile + first run); float() forces a device->host transfer,
    # the only reliable sync on every backend (block_until_ready has been
    # observed returning early on tunneled platforms)
    for _ in range(2):
        context, opt_state, key, metrics = step_fn(context, opt_state, key)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        context, opt_state, key, metrics = step_fn(context, opt_state, key)
    float(metrics["loss"])  # steps chain through (context, opt_state, key)
    return steps / (time.perf_counter() - t0)


def bench_detect():
    """BENCH_MODE=detect: stage-3/5 inference cost — seconds per image for
    the 10-view 512^2 test-time ensemble (reference eval.py:197-355 runs
    the views serially per image; here they batch through one jitted fn).
    Same one-line JSON contract; vs_baseline uses the reference's measured
    ~1.1 s/image A100 analog derived the same way as the train denominator.
    """
    model = os.environ.get("BENCH_MODEL", "sd15").lower()
    defaults = {"sd15": ("4", "512"), "sd21": ("2", "768"), "sdxl": ("1", "1024")}
    if model not in defaults:
        sys.exit(f"BENCH_MODEL={model!r}: expected one of {sorted(defaults)}")
    batch = int(os.environ.get("BENCH_BATCH", defaults[model][0]))  # eval_batch_images
    steps = int(os.environ.get("BENCH_STEPS", "5"))
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", defaults[model][1]))
    cfg = Config(
        dataset_name="synthetic",
        model_type=Config.model_type if model == "sd15" else model,
        image_size=image_size,
        num_tokens=int(os.environ.get("BENCH_NUM_TOKENS", "500")),
        dtype="bfloat16",
        eval_batch_images=batch,
        eval_views_per_pass=int(
            os.environ.get("BENCH_VIEWS_PER_PASS", Config.eval_views_per_pass)
        ),
        latent_warp=os.environ.get("BENCH_LATENT_WARP", "0") == "1",
    )
    runtime = Runtime.create(cfg)
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, size=(batch, image_size, image_size, 3)).astype(np.float32)
    context = runtime.init_context()
    indices = jax.device_put(
        np.arange(cfg.top_k, dtype=np.int32), pmesh.replicated(runtime.mesh)
    )
    key = jax.random.PRNGKey(0)
    pts = runtime.augmented_keypoints_fn(context, images, indices, key)  # compile
    float(np.asarray(pts)[0, 0, 0])
    t0 = time.perf_counter()
    for i in range(steps):
        pts = runtime.augmented_keypoints_fn(
            context, images, indices, jax.random.PRNGKey(i + 1)
        )
    float(np.asarray(pts)[0, 0, 0])
    sec_per_image = (time.perf_counter() - t0) / (steps * batch)
    print(
        json.dumps(
            {
                "metric": f"{model}_detect_seconds_per_image",
                "value": round(sec_per_image, 4),
                "unit": f"s/image ({cfg.augmentation_iterations}-view {image_size}^2 "
                f"ensemble, batch {batch}"
                + (", latent_warp" if cfg.latent_warp else ", reference-exact") + ")",
                "vs_baseline": round(_detect_denominator(model) / sec_per_image, 2),
                "baseline_note": _denominator_note(model),
            }
        )
    )


def bench_serving():
    """BENCH_MODE=serving: on-chip latency + parity of the EXPORTED detector
    artifact (stablekeypoints_tpu.serving). Exports the sd15 detector at
    BENCH_BATCH (default 1 and 4), loads it back through ServedDetector —
    the consumer path that needs only jax — and measures s/image on the
    attached device, asserting the artifact's keypoints match the live
    `augmented_keypoints_fn` on identical inputs (the TPU twin of the CPU
    roundtrip test). vs_baseline uses the same-shape derived detect
    denominator (BASELINE.md) — the artifact freezes exactly the
    eval.py:197-355,447-453 semantics.
    """
    import tempfile

    from stablekeypoints_tpu.serving import ServedDetector, export_detector

    model = os.environ.get("BENCH_MODEL", "sd15").lower()
    defaults = {"sd15": ("4", "512"), "sd21": ("2", "768"), "sdxl": ("1", "1024")}
    if model not in defaults:
        sys.exit(f"BENCH_MODEL={model!r}: expected one of {sorted(defaults)}")
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", defaults[model][1]))
    steps = int(os.environ.get("BENCH_STEPS", "5"))
    batches = sorted(
        int(s)
        for s in os.environ.get("BENCH_BATCH", "1," + defaults[model][0]).split(",")
        if s
    )
    cfg = Config(
        dataset_name="synthetic",
        model_type=Config.model_type if model == "sd15" else model,
        image_size=image_size,
        num_tokens=int(os.environ.get("BENCH_NUM_TOKENS", "500")),
        dtype="bfloat16",
        eval_views_per_pass=int(
            os.environ.get("BENCH_VIEWS_PER_PASS", Config.eval_views_per_pass)
        ),
    )
    runtime = Runtime.create(cfg)
    rng = np.random.default_rng(0)
    context = rng.normal(size=(1, cfg.num_tokens, runtime.unet.config.context_dim))
    context = context.astype(np.float32)
    indices = np.arange(cfg.top_k, dtype=np.int32)

    out_dir = os.environ.get("BENCH_SERVING_DIR") or tempfile.mkdtemp(prefix="skt_serving_")
    manifest = export_detector(runtime, context, indices, out_dir, batch=batches)
    blob_bytes = sum(info["bytes"] for info in manifest["blobs"].values())
    det = ServedDetector.load(out_dir)

    import jax.numpy as jnp

    results = {}
    max_diff = 0.0
    for b in batches:
        imgs = rng.uniform(0, 1, (b, image_size, image_size, 3)).astype(np.float32)
        served = det.detect(imgs, seed=3)["keypoints"]  # warmup + parity input
        live = np.asarray(
            runtime.augmented_keypoints_fn(
                jnp.asarray(context, jnp.float32), imgs,
                jnp.asarray(indices, jnp.int32), jax.random.PRNGKey(np.uint32(3)),
            )
        )
        max_diff = max(max_diff, float(np.abs(served - live).max()))
        t0 = time.perf_counter()
        for i in range(steps):
            out = det.detect(imgs, seed=i)
        float(out["keypoints"][0, 0, 0])
        results[b] = (time.perf_counter() - t0) / (steps * b)

    headline = results[max(results)]
    print(
        json.dumps(
            {
                "metric": f"{model}_serving_seconds_per_image",
                "value": round(headline, 4),
                "unit": f"s/image (exported jax.export artifact, "
                f"{cfg.augmentation_iterations}-view {image_size}^2 ensemble, "
                f"batch {max(results)})",
                "vs_baseline": round(
                    _detect_denominator(model) / headline, 2
                ),
                "per_batch": {str(b): round(v, 4) for b, v in results.items()},
                "parity_max_abs_diff_vs_live": max_diff,
                "artifact_bytes": blob_bytes,
                "baseline_note": _denominator_note(model),
            }
        )
    )


def main():
    mode = os.environ.get("BENCH_MODE", "train").lower()
    if mode == "detect":
        bench_detect()
        return
    if mode == "serving":
        bench_serving()
        return
    # BENCH_MODEL=sdxl (1024^2, batch 1) or sd21 (768^2-native, batch 2)
    # bench those backbones instead of the headline SD-1.5 workload; same
    # one-line contract.
    model = os.environ.get("BENCH_MODEL", "sd15").lower()
    defaults = {"sd15": ("4", "512"), "sd21": ("2", "768"), "sdxl": ("1", "1024")}
    if model not in defaults:
        sys.exit(f"BENCH_MODEL={model!r}: expected one of {sorted(defaults)}")
    batch = int(os.environ.get("BENCH_BATCH", defaults[model][0]))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", defaults[model][1]))
    num_tokens = int(os.environ.get("BENCH_NUM_TOKENS", "500"))
    # BENCH_CACHE: 'both' (default) measures hit + fill; '1' / '0' restrict
    # to one variant (ablations)
    cache_mode = os.environ.get("BENCH_CACHE", "both")
    if cache_mode not in ("both", "1", "0"):
        sys.exit(f"BENCH_CACHE={cache_mode!r}: expected 'both', '1' or '0'")

    cfg = Config(
        dataset_name="synthetic",
        model_type=Config.model_type if model == "sd15" else model,
        image_size=image_size,
        num_tokens=num_tokens,
        batch_size=batch,
        dtype="bfloat16",
        remat=os.environ.get("BENCH_REMAT", "auto"),  # ablation knob
        fused_groupnorm=os.environ.get("BENCH_FUSED_GN", "auto"),  # ablation knob
        capture_dtype=os.environ.get("BENCH_CAPTURE_DTYPE", "fp32"),  # ablation knob
        # APPROXIMATION ablation (never the headline): warp cached latents
        # instead of encoding warped images on cache-hit steps
        latent_warp=os.environ.get("BENCH_LATENT_WARP", "0") == "1",
    )
    runtime = Runtime.create(cfg)

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, size=(batch, image_size, image_size, 3)).astype(np.float32)
    images = pmesh.shard_batch(runtime.mesh, images)
    n_chips = runtime.mesh.devices.size
    peak = _peak_tflops(runtime.mesh.devices.flat[0])

    def fresh_inputs():
        # the train steps donate (context, opt_state, key): each timed
        # variant needs its own buffers
        context = runtime.init_context()
        opt_state = jax.device_put(
            runtime.optimizer.init(context), pmesh.replicated(runtime.mesh)
        )
        # committed replicated so the chained key's sharding matches from
        # step one
        key = jax.device_put(jax.random.PRNGKey(0), pmesh.replicated(runtime.mesh))
        return context, opt_state, key

    results = {}
    if cache_mode in ("both", "1"):
        latents = runtime.encode_images_fn(images)

        def step_hit(context, opt_state, key):
            return runtime.train_step_cached(context, opt_state, latents, images, key)

        # time FIRST: the jit dispatch compiles and populates the persistent
        # cache, so _flops' separate AOT lower().compile() for cost_analysis
        # is a disk-cache hit instead of a second cold 5-20 min build
        c, o, k = fresh_inputs()
        sps = _time_steps(step_hit, c, o, k, steps)
        c, o, k = fresh_inputs()  # donated during timing
        fl = _flops(runtime.train_step_cached, c, o, latents, images, k)
        results["hit"] = (sps / n_chips, fl)
    if cache_mode in ("both", "0"):
        def step_fill(context, opt_state, key):
            return runtime.train_step(context, opt_state, images, key)

        c, o, k = fresh_inputs()
        sps = _time_steps(step_fill, c, o, k, steps)
        c, o, k = fresh_inputs()  # donated during timing
        fl = _flops(runtime.train_step, c, o, images, k)
        results["fill"] = (sps / n_chips, fl)

    headline = results.get("hit", results.get("fill"))
    per_chip = headline[0]
    name = model
    steady = (
        "latent-cache-hit steady state = multi-epoch workloads"
        if "hit" in results
        else "cache-miss/fill path = single-epoch workloads"
    )

    def mfu(entry):
        sps, fl = entry
        if fl is None or peak is None:
            return None
        return round(sps * fl / (peak * 1e12), 4)

    out = {
        "metric": f"{name}_token_optimization_steps_per_sec_per_chip",
        "value": round(per_chip, 4),
        "unit": f"steps/s/chip (batch {batch}, {num_tokens} tokens, "
        f"{cfg.feature_upsample_res}^2 capture, {image_size}^2 images; "
        f"{steady})",
        "vs_baseline": round(per_chip / _train_denominator(model), 2),
        "baseline_note": _denominator_note(model),
    }
    if "fill" in results and "hit" in results:
        out["fill_steps_per_sec_per_chip"] = round(results["fill"][0], 4)
        out["fill_note"] = "cache-miss path (single-epoch workloads, e.g. 500-step CelebA)"
    if mfu(headline) is not None:
        out["mfu"] = mfu(headline)
        out["flops_per_step"] = headline[1]
        if "fill" in results and "hit" in results and mfu(results["fill"]) is not None:
            out["mfu_fill"] = mfu(results["fill"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
