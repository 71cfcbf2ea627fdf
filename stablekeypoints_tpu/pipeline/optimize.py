"""Stage 1: optimize the token embedding (reference optimize.py:269-452).

One jitted step = two capture forwards (original + affine-transformed
image), per-image token selection, sharpening + equivariance losses, grad
w.r.t. the context only, Adam update. The reference's gradient accumulation
over `batch_size // num_gpus` micro-steps collapses into a real sharded
batch axis: its accumulated loss is the mean over all `batch_size` images,
which is exactly what one batched step computes (optimize.py:420-425).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.data.base import Loader
from stablekeypoints_tpu.parallel import mesh as pmesh
from stablekeypoints_tpu.pipeline.runtime import Runtime
from stablekeypoints_tpu.utils.artifacts import save_artifact
from stablekeypoints_tpu.utils.logging import MetricsLogger

__all__ = ["optimize_embedding", "iteration_time"]


def iteration_time(now: float, window_start: float, step: int, last_logged_step: int) -> float:
    """Per-optimizer-step seconds over the window since the last log event
    (reference optimize.py:427-443 prints the time of ONE optimizer step;
    we log every `log_every` steps, so divide the window by the number of
    steps it covered)."""
    return (now - window_start) / max(step - last_logged_step, 1)


def optimize_embedding(
    runtime: Runtime,
    dataset,
    logger: MetricsLogger | None = None,
    context=None,
    checkpointer=None,
):
    cfg = runtime.cfg
    loader = Loader(
        dataset, batch_size=cfg.batch_size, shuffle=True, seed=cfg.seed, infinite=True
    )
    it = iter(loader)

    if context is None:
        context = runtime.init_context()
    opt_state = jax.device_put(
        runtime.optimizer.init(context), pmesh.replicated(runtime.mesh)
    )
    start_step = 0
    if checkpointer is not None:
        restored = checkpointer.restore()
        if restored is not None:
            start_step = int(restored["step"]) + 1
            repl = pmesh.replicated(runtime.mesh)
            context = jax.device_put(jnp.asarray(np.asarray(restored["context"])), repl)
            leaves = jax.tree_util.tree_leaves(restored["opt_state"])
            opt_state = jax.device_put(
                jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(opt_state), leaves
                ),
                repl,
            )
            if logger is not None:
                logger.log({"stage": 1, "event": "resumed", "step": start_step})
    # the PRNG key is device state chained through the jitted step (no
    # host-side split per step); resume alignment comes from folding in the
    # start step once
    key = jax.device_put(
        jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 1), start_step),
        pmesh.replicated(runtime.mesh),
    )

    # index-keyed cache of posterior-mean VAE latents: deterministic per
    # image, so cache-hit steps skip the original-image encode entirely
    # (identical math; the per-step random affine view is always encoded
    # fresh). Gated on the adapter having no per-access randomness.
    from stablekeypoints_tpu.data.base import is_deterministic

    # (small-batch encodes stay fast because the VAE folds H-slabs into the
    # conv batch axis — ops/convsplit.py — so the cache-hit batch-1 encode
    # is not the XLA batch-1 conv pathology it would otherwise be)
    lat_cache: dict[int, np.ndarray] | None = (
        {} if cfg.cache_latents and is_deterministic(dataset) else None
    )

    profiling = False
    start = time.time()
    it_start = start
    last_logged_step = start_step - 1
    step = start_step
    pending: list = []  # batches pulled for a scan group but not consumed

    def next_batch():
        return pending.pop(0) if pending else next(it)

    def maybe_log(s, metrics):
        """metrics: dict of scalars (device or stacked-slice) for step s."""
        nonlocal it_start, last_logged_step
        if logger is not None and (s % cfg.log_every == 0 or s == cfg.num_steps - 1):
            now = time.time()
            logger.log(
                {
                    "stage": 1,
                    "step": s,
                    # field names match the reference's wandb schema
                    # (optimize.py:427-435)
                    "loss": float(metrics["loss"]),
                    "running_sharpening_loss": float(metrics["sharpening"]) * cfg.sharpening_loss_weight,
                    "running_equivariance_attn_loss": float(metrics["equivariance"]) * cfg.equivariance_attn_loss_weight,
                    "iteration time": iteration_time(now, it_start, s, last_logged_step),
                }
            )
            it_start = now
            last_logged_step = s

    def maybe_checkpoint(s):
        if cfg.checkpoint_every and s and s % cfg.checkpoint_every == 0:
            save_artifact(cfg.save_folder, "embedding", np.asarray(context))
            if checkpointer is not None:
                checkpointer.save(s, context, opt_state)

    # dispatch amortization (cfg.steps_per_call): K consecutive cache-hit
    # steps as ONE jitted lax.scan call — same math and PRNG stream as
    # per-step dispatch (the scan body IS the per-step program).
    # Inactive while profiling (per-step traces), near checkpoint boundaries
    # (the saved step index must match the saved context), for the tail, and
    # whenever any of the next K batches misses the latent cache (the group
    # is then consumed per-step via `pending`, so no batch is dropped).
    scan_k = max(int(cfg.steps_per_call), 1)
    stacked_sh = pmesh.stacked_batch_sharding(runtime.mesh)

    while step < cfg.num_steps:
        if cfg.profile_steps and step == start_step + 1:  # skip compile step
            jax.profiler.start_trace(f"{cfg.save_folder}/profile")
            profiling = True
        if (
            scan_k > 1
            and lat_cache is not None
            and not cfg.profile_steps
            and step + scan_k <= cfg.num_steps
            and not any(
                cfg.checkpoint_every and s and s % cfg.checkpoint_every == 0
                # a boundary at the group's LAST step checkpoints correctly
                # after the group; one strictly inside would not
                for s in range(step, step + scan_k - 1)
            )
        ):
            batches = [next_batch() for _ in range(scan_k)]
            idx_groups = [[int(i) for i in b.get("_idx", ())] for b in batches]
            if all(g and all(i in lat_cache for i in g) for g in idx_groups):
                lat_stack = jax.device_put(
                    np.stack([np.stack([lat_cache[i] for i in g]) for g in idx_groups]),
                    stacked_sh,
                )
                img_stack = jax.device_put(
                    np.stack([np.asarray(b["img"]) for b in batches]), stacked_sh
                )
                context, opt_state, key, mstack = runtime.train_step_scan(
                    context, opt_state, lat_stack, img_stack, key
                )
                for j in range(scan_k):
                    maybe_log(step + j, {k: v[j] for k, v in mstack.items()})
                maybe_checkpoint(step + scan_k - 1)
                step += scan_k
                continue
            pending.extend(batches)  # >=1 miss: consume the group per-step
        batch = next_batch()
        images = pmesh.shard_batch(runtime.mesh, batch["img"])
        idx = [int(i) for i in batch.get("_idx", ())]
        if lat_cache is not None and idx and all(i in lat_cache for i in idx):
            latents = pmesh.shard_batch(
                runtime.mesh, np.stack([lat_cache[i] for i in idx])
            )
            context, opt_state, key, metrics = runtime.train_step_cached(
                context, opt_state, latents, images, key
            )
        elif lat_cache is not None and idx:
            context, opt_state, key, metrics, latents = runtime.train_step_fill(
                context, opt_state, images, key
            )
            if len(lat_cache) < cfg.latent_cache_entries:
                for i, lat in zip(idx, np.asarray(latents)):
                    lat_cache[i] = lat
        else:
            context, opt_state, key, metrics = runtime.train_step(
                context, opt_state, images, key
            )
        if profiling and step == start_step + cfg.profile_steps:
            float(metrics["loss"])  # sync before closing the trace
            jax.profiler.stop_trace()
            profiling = False
        maybe_log(step, metrics)
        maybe_checkpoint(step)
        step += 1

    if logger is not None:
        logger.log({"stage": 1, "event": "done", "seconds": time.time() - start})
    return context
