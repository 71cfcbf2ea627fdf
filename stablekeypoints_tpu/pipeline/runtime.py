"""SD keypoint runtime: frozen models + jitted compute functions.

The functional replacement for the reference's (ldm, controllers, num_gpus)
triple (optimize_token.py:24-78). Holds the UNet/VAE modules, their frozen
parameters, the DDIM schedule and the device mesh, and exposes the two core
computations:

  * `attn_maps`       — semantics of `run_and_find_attn` + `collect_maps`
                        (ptp_utils.py:234-272, optimize.py:27-79): one UNet
                        forward on lightly-noised VAE latents, returning the
                        layer/head-averaged token attention maps.
  * `train_step`      — one full optimization step of stage 1
                        (optimize.py:339-425): two capture forwards, token
                        selection, sharpening + equivariance losses, grad
                        w.r.t. the context embedding only, Adam update.

Everything is one compiled program per call; batches are sharded over the
mesh's data axis and gradients are reduced by XLA (vs. the reference's
per-device stores, `.to('cuda:0')` gathers and host-side FPS loops).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.models.scheduler import DDIMSchedule
from stablekeypoints_tpu.models.unet import SD15_CONFIG, UNet, UNetConfig
from stablekeypoints_tpu.models.vae import SD_VAE_CONFIG, VAE, VAEConfig
from stablekeypoints_tpu.models import weights as W
from stablekeypoints_tpu.ops.losses import equivariance_loss, sharpening_loss
from stablekeypoints_tpu.ops.resize import resize_hw
from stablekeypoints_tpu.ops.selection import furthest_point_sampling, select_candidates
from stablekeypoints_tpu.ops.transforms import AffineParams, apply_affine, sample_thetas
from stablekeypoints_tpu.parallel import mesh as pmesh

__all__ = ["Runtime", "collect_maps"]


def unet_config_for_model_type(model_type: str) -> UNetConfig:
    """Backbone topology from the --model_type string (an HF-repo-style
    name, reference main.py:26-31): SDXL, SD-2.x (fixed 64-dim heads,
    1024-dim context, linear projections), else SD-1.x. SD-2.x 768
    checkpoints (stable-diffusion-2, -2-1) predict v, not epsilon — the
    '-base' variants are epsilon — so the prediction type rides on the
    config for the sampler's conversion."""
    from stablekeypoints_tpu.models.unet import SD21_CONFIG, SDXL_CONFIG

    name = model_type.lower()
    if "xl" in name:
        return SDXL_CONFIG
    if "diffusion-2" in name or name.startswith("sd2"):
        if "base" in name:
            return SD21_CONFIG
        return dataclasses.replace(SD21_CONFIG, prediction_type="v_prediction")
    return SD15_CONFIG


def _setup_compilation_cache(cfg: Config) -> None:
    """Default-enable the persistent XLA compilation cache.

    The production SD-1.5/SDXL step HLOs take minutes to compile cold
    (remote TPU compiles 5-20 min in this environment); the reference has
    no analog cost (torch eager). Respect an explicit user choice: the
    JAX_COMPILATION_CACHE_DIR env var or an already-set jax config wins,
    and cfg.jax_cache_dir="" disables."""
    import os

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    if jax.config.jax_compilation_cache_dir:
        return
    path = os.path.expanduser(cfg.jax_cache_dir or "")
    if not path:
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def collect_maps(
    captures: list[jnp.ndarray],
    layers: tuple[int, ...],
    upsample_res: int = -1,
    indices: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Average captured maps over layers, reshape, optionally upsample.

    captures: list of [B, R^2, T] head-averaged maps in capture order.
    Returns [B, T', res, res]. Semantics of collect_maps (optimize.py:27-79);
    since every captured map lives at the same R^2 grid, mean-then-upsample
    equals the reference's upsample-then-mean (bilinear resize is linear),
    and index selection commutes with both.
    """
    sel = [captures[i] for i in layers if i < len(captures)]
    if indices is not None:
        # select before stacking: only one full-token map is ever live
        sel = [c[:, :, indices] for c in sel]
    # fp32 accumulation (captures may be bf16 under capture_dtype=bf16)
    maps = jnp.mean(jnp.stack(sel, axis=0), axis=0, dtype=jnp.float32)  # [B, R^2, T']
    b, rr, t = maps.shape
    r = int(round(rr**0.5))
    maps = maps.transpose(0, 2, 1).reshape(b, t, r, r)
    if upsample_res != -1 and upsample_res != r:
        maps = resize_hw(maps, upsample_res, upsample_res, "bilinear")
    return maps


@dataclasses.dataclass
class Runtime:
    cfg: Config
    unet: UNet
    vae: VAE
    unet_params: dict
    vae_params: dict
    schedule: DDIMSchedule
    mesh: jax.sharding.Mesh
    # VAE without the Pallas GroupNorm kernel, for code that runs inside
    # lax.map/while bodies (see Runtime.create)
    vae_loop: VAE = None

    @staticmethod
    def create(
        cfg: Config,
        unet_config: Optional[UNetConfig] = None,
        vae_config: Optional[VAEConfig] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ) -> "Runtime":
        _setup_compilation_cache(cfg)
        if unet_config is None:
            unet_config = unet_config_for_model_type(cfg.model_type)
        if vae_config is None:
            # SDXL's retrained VAE uses scaling_factor 0.13025 (same topology)
            from stablekeypoints_tpu.models.vae import SDXL_VAE_CONFIG

            vae_config = (
                SDXL_VAE_CONFIG if "xl" in cfg.model_type.lower() else SD_VAE_CONFIG
            )
        mesh = mesh if mesh is not None else pmesh.make_mesh(cfg.data_parallel)
        mesh_platform = mesh.devices.flat[0].platform
        # interpret-mode follows the MESH platform unconditionally: the
        # resident cross-attention kernel reads it even when pallas_capture
        # is off (a non-TPU mesh with flash on would otherwise compile the
        # kernel non-interpret and fail)
        interp = mesh_platform != "tpu"
        if interp != unet_config.pallas_interpret:
            unet_config = dataclasses.replace(unet_config, pallas_interpret=interp)
        if cfg.pallas_capture != "off":
            # the kernel runs wherever the MESH lives (which may differ from
            # the default backend, e.g. a virtual CPU mesh on a TPU host)
            use = cfg.pallas_capture == "on" or mesh_platform == "tpu"
            if (use, cfg.capture_fp32_bwd) != (
                unet_config.pallas_capture,
                unet_config.capture_fp32_bwd,
            ):
                unet_config = dataclasses.replace(
                    unet_config,
                    pallas_capture=use,
                    capture_fp32_bwd=cfg.capture_fp32_bwd,
                )
        want_cap_bf16 = cfg.capture_dtype == "bf16"
        if want_cap_bf16 != unet_config.capture_bf16:
            unet_config = dataclasses.replace(unet_config, capture_bf16=want_cap_bf16)
        use_flash = cfg.flash_attention == "on" or (
            cfg.flash_attention == "auto" and mesh_platform == "tpu"
        )
        if use_flash != unet_config.flash_attention:
            unet_config = dataclasses.replace(unet_config, flash_attention=use_flash)
        if cfg.remat != "auto":
            want_remat = cfg.remat == "on"
        else:
            # activation footprint proxy: per-device merged batch (2B) scaled
            # by image area. With flash attention the seq^2 tensors are gone,
            # so storing activations fits HBM up to ~8 units (measured: SD1.5
            # batch4@512^2 and SDXL batch1@1024^2 both faster without remat —
            # the latter 2.02 -> 2.30 steps/s/chip)
            per_dev = -(-2 * cfg.batch_size // max(mesh.shape["data"], 1))
            want_remat = per_dev * (cfg.image_size / 512) ** 2 > 8
        if want_remat != unet_config.remat:
            unet_config = dataclasses.replace(unet_config, remat=want_remat)
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        # Pallas kernels need the mesh to run under shard_map on multi-chip
        # meshes (they are opaque to GSPMD's partitioner)
        kernel_mesh = mesh if mesh.devices.size > 1 else None
        unet = UNet(unet_config, dtype=dtype, mesh=kernel_mesh)
        # fused GroupNorm+SiLU kernel in the (never-differentiated) VAE:
        # on for TPU meshes, interpret-mode when forced onto a CPU mesh
        use_fused_gn = cfg.fused_groupnorm == "on" or (
            cfg.fused_groupnorm == "auto" and mesh_platform == "tpu"
        )
        use_gn_conv = cfg.fused_gn_conv == "on" or (
            cfg.fused_gn_conv == "auto" and mesh_platform == "tpu"
        )
        vae = VAE(
            vae_config, dtype=dtype, flash=use_flash, mesh=kernel_mesh,
            fused_gn=use_fused_gn, fused_gn_interpret=mesh_platform != "tpu",
            fused_gn_conv=use_gn_conv,
        )
        # the eval ensemble chunks views through lax.map; XLA wraps custom
        # calls inside while bodies in layout copies that make the adjacent
        # convs ~13x slower (measured), so the in-loop VAE keeps the jnp
        # GroupNorm (same params, same math)
        vae_loop = VAE(vae_config, dtype=dtype, flash=use_flash, mesh=kernel_mesh)
        if cfg.model_path:
            unet_params = W.load_unet_params(cfg.model_path, unet_config, dtype)
            vae_params = W.load_vae_params(cfg.model_path, vae_config, dtype)
        else:
            sample_hw = max(cfg.image_size // 8, 32)
            unet_params = W.cast_params(
                W.init_unet_params_fast(cfg.seed, unet_config, sample_hw), dtype
            )
            vae_params = W.cast_params(
                W.init_vae_params_fast(cfg.seed + 1, vae_config, min(cfg.image_size, 64)),
                dtype,
            )
        if mesh.shape["model"] > 1:
            # Megatron-style TP over the transformer matmuls; GSPMD
            # propagates activation shardings and inserts the psums
            unet_shardings = pmesh.tensor_parallel_shardings(mesh, unet_params)
            unet_params = jax.tree_util.tree_map(
                jax.device_put, unet_params, unet_shardings
            )
        else:
            unet_params = jax.device_put(unet_params, pmesh.replicated(mesh))
        rt = Runtime(
            cfg, unet, vae,
            unet_params,
            jax.device_put(vae_params, pmesh.replicated(mesh)),
            DDIMSchedule.create(), mesh, vae_loop,
        )
        if cfg.latent_warp:
            rt.black_latent  # eager precompute; see the property's docstring
        return rt

    # ------------------------------------------------------------------
    # core computations (pure; jitted wrappers below)

    def _encode(self, vae_params, images: jnp.ndarray, in_loop: bool = False) -> jnp.ndarray:
        """Posterior-mean latents (deterministic per image; image2latent,
        ptp_utils.py:289-304). Cacheable: add_noise happens downstream.
        in_loop: called from inside a lax.map body — use the kernel-free VAE."""
        vae = self.vae_loop if (in_loop and self.vae_loop is not None) else self.vae
        return jax.lax.stop_gradient(
            vae.apply(
                {"params": vae_params}, images * 2.0 - 1.0, method=VAE.encode_mean
            )
        )

    @functools.cached_property
    def black_latent(self) -> jnp.ndarray:
        """Per-channel VAE latent of a black image, [4] fp32 (scaled).

        The reference's affine warp zero-pads images — black borders
        (invertable_transform.py:64-70). The latent-space warp
        (cfg.latent_warp) therefore fills out-of-frame latent pixels with
        the latent a black region encodes to: the center pixel of
        encode(zeros), constant per channel away from frame edges.

        Precomputed at Runtime.create when cfg.latent_warp is on: a
        cached_property first touched during a jit trace would cache a
        tracer and poison every later trace of a different step function
        (and an in-trace eager fallback cannot evaluate the Pallas
        GroupNorm kernel, which has no eager rule)."""
        from jax._src import core as _src_core

        if not _src_core.trace_state_clean():  # pragma: no cover - guarded by create()
            raise RuntimeError(
                "black_latent first touched inside a jit trace; construct "
                "the Runtime with cfg.latent_warp=True so create() "
                "precomputes it eagerly"
            )
        img = jnp.zeros((1, self.cfg.image_size, self.cfg.image_size, 3), jnp.float32)
        lat = jax.jit(self._encode)(self.vae_params, img)
        return jnp.asarray(
            np.asarray(lat[0, lat.shape[1] // 2, lat.shape[2] // 2, :])
        )

    def _warp_latents(self, latents: jnp.ndarray, thetas: jnp.ndarray, aff) -> jnp.ndarray:
        """Latent-space stand-in for encode(warp(image)) (cfg.latent_warp):
        warp the cached latent with the same normalized-coordinate theta
        (affine_grid is resolution independent), black-image-latent fill."""
        from stablekeypoints_tpu.ops.transforms import apply_affine_fill

        return jax.lax.stop_gradient(
            apply_affine_fill(latents, thetas, self.black_latent, params=aff)
        )

    def _added_cond(self, batch: int, target_size: Optional[int] = None):
        """SDXL micro-conditioning with diffusers-standard values.

        diffusers' StableDiffusionXLPipeline conditions every forward on
        time_ids = (orig_h, orig_w, crop_top, crop_left, target_h, target_w)
        = (size, size, 0, 0, size, size) for uncropped generation at `size`;
        the reference's SDXL intent (sdxl_monkey_patch.py:89-214) predates
        this plumbing entirely. With the learned context replacing the text
        encoders, the pooled text_embeds stays at its zeros default (see
        models/unet.py). Returns None for backbones without micro-cond."""
        if self.unet.config.addition_emb_dim <= 0:
            return None
        s = float(target_size if target_size is not None else self.cfg.image_size)
        tid = jnp.asarray([[s, s, 0.0, 0.0, s, s]], jnp.float32)
        return {"time_ids": jnp.broadcast_to(tid, (batch, 6))}

    def _attn_maps(
        self,
        unet_params,
        vae_params,
        images: jnp.ndarray,  # [B, H, W, 3] in [0, 1]
        context: jnp.ndarray,  # [1, T, d]
        key: jax.Array,
        upsample_res: int,
        indices: Optional[jnp.ndarray],
        truncate: bool,
        latents: Optional[jnp.ndarray] = None,  # precomputed [B, h, w, 4]
        in_loop: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        if latents is None:
            latents = self._encode(vae_params, images, in_loop=in_loop)
        noise = jax.random.normal(key, latents.shape, jnp.float32)
        t = self.schedule.timestep_at(cfg.noise_level)
        noisy = self.schedule.add_noise(latents, noise, t)
        b = images.shape[0]
        ts = jnp.full((b,), t, jnp.int32)
        ctx = jnp.broadcast_to(context, (b, *context.shape[1:]))
        _, captures = self.unet.apply(
            {"params": unet_params},
            noisy,
            ts,
            ctx,
            capture_res=cfg.feature_upsample_res,
            truncate=truncate,
            added_cond=self._added_cond(b),
        )
        return collect_maps(captures, cfg.layers, upsample_res, indices)

    def _per_sample_losses(self, maps, maps_t, theta):
        """Token selection + losses for one image (optimize.py:380-401)."""
        cfg = self.cfg
        cands = select_candidates(
            jax.lax.stop_gradient(maps),
            cfg.top_k_strategy,
            cfg.furthest_point_num_samples,
            sigma=cfg.sigma,
            num_subjects=cfg.num_subjects,
        )
        idx = furthest_point_sampling(
            jax.lax.stop_gradient(maps_t), cfg.top_k, cands
        )
        sl = sharpening_loss(maps[idx], sigma=cfg.sigma, num_subjects=cfg.num_subjects)
        aff = AffineParams(
            cfg.augment_degrees, tuple(cfg.augment_scale), tuple(cfg.augment_translate)
        )
        el = equivariance_loss(maps[idx], maps_t[idx], theta, params=aff)
        return sl, el

    def _train_step(
        self,
        unet_params,
        vae_params,
        opt,
        context,
        opt_state,
        images,
        key,
        latents_orig=None,
        return_latents=False,
    ):
        """One optimization step. `key` is chained *inside* jit: the caller
        threads the returned key back in, so the host never dispatches
        split/fold_in as separate tiny device programs (which costs real
        milliseconds per step on remote-dispatch targets).

        latents_orig: precomputed VAE latents for the ORIGINAL images (the
        posterior mean is a deterministic function of the image, so the
        training loop caches it per dataset index; the warped images change
        every step and are always encoded fresh). Numerically identical to
        encoding in-step. return_latents=True additionally returns the
        original-image latents so the caller can populate its cache.
        """
        cfg = self.cfg
        key, k_noise, k_theta = jax.random.split(key, 3)
        aff = AffineParams(cfg.augment_degrees, tuple(cfg.augment_scale), tuple(cfg.augment_translate))
        b = images.shape[0]
        thetas = sample_thetas(k_theta, b, aff)
        # The [orig; warped] BLOCK concat is deliberate (an interleaved
        # pair layout was built and measured worse): under a 'data'-sharded
        # mesh, pairing orig_i with warped_i in the equivariance loss is
        # cross-device here, but GSPMD resolves it by collective-permuting
        # the EARLIEST (latent/hidden-sized, ~KBs) tensors in the chain,
        # never the capture maps — while explicit interleaving forced
        # stack/reshape copies (-1.2% hit) and split the merged cache-miss
        # VAE encode into two half-batch encodes to keep hit/miss steps
        # bit-equivalent (-14% fill, conv efficiency drops with batch).
        # Measurement + communication table: tools/scaling_study.py,
        # STATUS.md round 3.
        if cfg.latent_warp:
            # APPROXIMATION (flag-gated): latent-space warp replaces the
            # warped-image VAE encode entirely — on cache-hit steps the
            # cached original latent is warped; on cache-miss steps the
            # original is encoded once (unavoidable; also returned to fill
            # the cache) and its latent warped, so the single-epoch
            # flagship workload (~all misses) drops one encode per step too
            if latents_orig is None:
                latents_orig = self._encode(vae_params, images)
            latents = jnp.concatenate(
                [latents_orig, self._warp_latents(latents_orig, thetas, aff)], axis=0
            )
            # only the leading batch dim is read downstream (latents are
            # given), so the concat is dead code the compiler drops
            both = jnp.concatenate([images, images], axis=0)
        else:
            images_t = apply_affine(images, thetas, params=aff)
            # one merged forward over [orig; warped]: batch ops are independent
            # per element, so this is mathematically the reference's two
            # forwards (optimize.py:349-375) with better MXU utilization and
            # half the dispatches
            both = jnp.concatenate([images, images_t], axis=0)
            if latents_orig is None:
                latents = self._encode(vae_params, both)
            else:
                latents = jnp.concatenate(
                    [latents_orig, self._encode(vae_params, images_t)], axis=0
                )

        def loss_fn(ctx):
            maps_all = self._attn_maps(
                unet_params, vae_params, both, ctx, k_noise, -1, None,
                cfg.truncate_unet, latents=latents,
            )
            maps, maps_t = maps_all[:b], maps_all[b:]
            sls, els = jax.vmap(self._per_sample_losses)(maps, maps_t, thetas)
            sl, el = jnp.mean(sls), jnp.mean(els)
            loss = sl * cfg.sharpening_loss_weight + el * cfg.equivariance_attn_loss_weight
            return loss, {"sharpening": sl, "equivariance": el}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(context)
        updates, opt_state = opt.update(grads, opt_state, context)
        context = optax.apply_updates(context, updates)
        aux = dict(aux, loss=loss)
        if return_latents:
            return context, opt_state, key, aux, latents[:b]
        return context, opt_state, key, aux

    # ------------------------------------------------------------------
    # jitted public entry points

    @functools.cached_property
    def optimizer(self) -> optax.GradientTransformation:
        return optax.adam(self.cfg.lr)

    @functools.cached_property
    def train_step(self):
        """(context, opt_state, images, key) -> (context, opt_state, key', metrics).

        Frozen model params are passed as (pre-sharded) arguments rather than
        closed over, so they are donated-free runtime inputs instead of
        baked-in executable constants. The PRNG key is split inside the
        program and the successor key returned; thread it into the next call.
        """
        repl = pmesh.replicated(self.mesh)
        data = pmesh.batch_sharding(self.mesh)

        def step(unet_params, vae_params, context, opt_state, images, key):
            return self._train_step(
                unet_params, vae_params, self.optimizer,
                context, opt_state, images, key,
            )

        jitted = jax.jit(
            step,
            # None: inherit the committed sharding of the frozen params
            # (replicated, or tensor-parallel over 'model')
            in_shardings=(None, None, repl, repl, data, repl),
            out_shardings=(repl, repl, repl, repl),
            donate_argnums=(2, 3, 5),
        )
        return functools.partial(jitted, self.unet_params, self.vae_params)

    @functools.cached_property
    def train_step_fill(self):
        """Like train_step, but additionally returns the original-image VAE
        latents [B, h, w, 4] so the training loop can populate its latent
        cache (cache-miss steps)."""
        repl = pmesh.replicated(self.mesh)
        data = pmesh.batch_sharding(self.mesh)

        def step(unet_params, vae_params, context, opt_state, images, key):
            return self._train_step(
                unet_params, vae_params, self.optimizer,
                context, opt_state, images, key, return_latents=True,
            )

        jitted = jax.jit(
            step,
            in_shardings=(None, None, repl, repl, data, repl),
            out_shardings=(repl, repl, repl, repl, data),
            donate_argnums=(2, 3, 5),
        )
        return functools.partial(jitted, self.unet_params, self.vae_params)

    @functools.cached_property
    def train_step_cached(self):
        """(context, opt_state, latents_orig, images, key) -> same outputs as
        train_step, skipping the original-image VAE encode (steady-state
        cache-hit steps: ~half the VAE work per step, identical math)."""
        repl = pmesh.replicated(self.mesh)
        data = pmesh.batch_sharding(self.mesh)

        def step(unet_params, vae_params, context, opt_state, latents, images, key):
            return self._train_step(
                unet_params, vae_params, self.optimizer,
                context, opt_state, images, key, latents_orig=latents,
            )

        jitted = jax.jit(
            step,
            in_shardings=(None, None, repl, repl, data, data, repl),
            out_shardings=(repl, repl, repl, repl),
            donate_argnums=(2, 3, 6),
        )
        return functools.partial(jitted, self.unet_params, self.vae_params)

    @functools.cached_property
    def train_step_scan(self):
        """(context, opt_state, latents [K,B,h,w,4], images [K,B,H,W,3], key)
        -> (context, opt_state, key', metrics stacked over K).

        K consecutive cache-hit steps as ONE jitted lax.scan: the scan body
        is exactly `_train_step` (the per-step program), so the context /
        opt-state / PRNG-chain trajectory matches K separate
        `train_step_cached` dispatches (identical math and RNG stream;
        floating-point agreement up to compiler fusion differences) — the
        only thing amortized is the per-dispatch host/RPC overhead
        (~9 ms/step measured on a tunneled v5e; +6.6% steps/s at K=10).
        Metrics leaves come back with a leading K axis so the training
        loop can still log any interior step exactly."""
        repl = pmesh.replicated(self.mesh)
        stacked = pmesh.stacked_batch_sharding(self.mesh)

        def step(unet_params, vae_params, context, opt_state, latents, images, key):
            def body(carry, xs):
                ctx, ost, ky = carry
                lat, img = xs
                ctx, ost, ky, aux = self._train_step(
                    unet_params, vae_params, self.optimizer,
                    ctx, ost, img, ky, latents_orig=lat,
                )
                return (ctx, ost, ky), aux

            (context, opt_state, key), metrics = jax.lax.scan(
                body, (context, opt_state, key), (latents, images)
            )
            return context, opt_state, key, metrics

        jitted = jax.jit(
            step,
            in_shardings=(None, None, repl, repl, stacked, stacked, repl),
            out_shardings=(repl, repl, repl, repl),
            donate_argnums=(2, 3, 6),
        )
        return functools.partial(jitted, self.unet_params, self.vae_params)

    @functools.cached_property
    def encode_images_fn(self):
        """(images [B, H, W, 3]) -> posterior-mean latents [B, h, w, 4]."""
        data = pmesh.batch_sharding(self.mesh)

        def fn(vae_params, images):
            return self._encode(vae_params, images)

        jitted = jax.jit(fn, in_shardings=(None, data), out_shardings=data)
        return functools.partial(jitted, self.vae_params)

    @functools.cached_property
    def attn_maps_fn(self):
        """Inference maps at feature resolution: (context, images, key) -> maps."""
        repl = pmesh.replicated(self.mesh)
        data = pmesh.batch_sharding(self.mesh)

        def fn(unet_params, vae_params, context, images, key):
            return self._attn_maps(
                unet_params, vae_params, images, context, key,
                self.cfg.feature_upsample_res, None, True,
            )

        jitted = jax.jit(
            fn, in_shardings=(None, None, repl, data, repl), out_shardings=data
        )
        return functools.partial(jitted, self.unet_params, self.vae_params)

    def _ensembled_maps(self, unet_params, vae_params, context, images, indices, key):
        """Shared test-time-ensemble core (run_image_with_context_augmented,
        eval.py:197-355): for each of M images, `augmentation_iterations`
        random affine views are batched through ONE sharded forward, the
        maps inverse-warped and averaged with NaN->0 where no view
        contributed (the reference runs views serially, eval.py:239).

        images: [M, H, W, 3] -> [M, k, S, S] fp32.
        """
        cfg = self.cfg
        data = pmesh.batch_sharding(self.mesh)
        m, size = images.shape[0], images.shape[1]
        n = cfg.augmentation_iterations
        # the ensemble can be warped/averaged at a lower resolution and the
        # average upsampled afterwards (affine warps are resolution
        # independent in normalized coordinates); -1 = reference-exact
        ens = size if cfg.eval_ensemble_res == -1 else min(cfg.eval_ensemble_res, size)
        k_theta, k_noise = jax.random.split(key)
        aff = AffineParams(
            cfg.augment_degrees, tuple(cfg.augment_scale), tuple(cfg.augment_translate)
        )
        thetas = sample_thetas(k_theta, m * n, aff)
        if cfg.latent_warp:
            # APPROXIMATION (flag-gated): encode each test image ONCE and
            # warp its latent per view — drops augmentation_iterations-1
            # VAE encodes per image from the ensemble
            lats = self._encode(vae_params, images)
            view_latents = self._warp_latents(
                jnp.repeat(lats, n, axis=0), thetas, aff
            )
            view_latents = jax.lax.with_sharding_constraint(view_latents, data)
            # downstream only reads the views' leading batch dim
            imgs_t = jnp.repeat(images, n, axis=0)
        else:
            view_latents = None
            imgs_t = apply_affine(jnp.repeat(images, n, axis=0), thetas, params=aff)
        imgs_t = jax.lax.with_sharding_constraint(imgs_t, data)

        from stablekeypoints_tpu.ops.transforms import apply_inverse_affine

        def views_to_warped(imgs_c, thetas_c, key_c, in_loop, latents_c=None):
            """views -> inverse-warped [*, k+1, E, E]: one warp for maps AND
            the view-count mask (the all-ones mask rides as an extra NHWC
            channel); the static params bound routes it onto the MXU path.
            in_loop: True only when called from the lax.map body — the
            kernel-free VAE is a while-body workaround, not a default."""
            maps = self._attn_maps(
                unet_params, vae_params, imgs_c, context, key_c, ens, indices, True,
                in_loop=in_loop, latents=latents_c,
            )  # [*, k, E, E]
            kk = maps.shape[1]
            stacked = jnp.concatenate(
                [maps, jnp.ones((maps.shape[0], 1, ens, ens), maps.dtype)], axis=1
            ).transpose(0, 2, 3, 1)
            return apply_inverse_affine(stacked, thetas_c, params=aff).transpose(
                0, 3, 1, 2
            )

        # chunk the views through the forward so HBM stays bounded when many
        # test images are batched (M * augmentation_iterations views total)
        v = m * n
        chunk = next(
            (c for c in range(min(cfg.eval_views_per_pass, v), 0, -1) if v % c == 0),
            v,
        )
        if chunk == v:
            warped = views_to_warped(imgs_t, thetas, k_noise, False, view_latents)
        else:
            nc = v // chunk
            keys_c = jax.vmap(lambda i: jax.random.fold_in(k_noise, i))(
                jnp.arange(nc)
            )
            if view_latents is None:
                warped = jax.lax.map(
                    lambda args: views_to_warped(*args, True),
                    (
                        imgs_t.reshape(nc, chunk, *imgs_t.shape[1:]),
                        thetas.reshape(nc, chunk, 2, 3),
                        keys_c,
                    ),
                ).reshape(v, -1, ens, ens)
            else:
                warped = jax.lax.map(
                    lambda args: views_to_warped(
                        args[0], args[1], args[2], True, latents_c=args[3]
                    ),
                    (
                        imgs_t.reshape(nc, chunk, *imgs_t.shape[1:]),
                        thetas.reshape(nc, chunk, 2, 3),
                        keys_c,
                        view_latents.reshape(nc, chunk, *view_latents.shape[1:]),
                    ),
                ).reshape(v, -1, ens, ens)
        kk = warped.shape[1] - 1
        warped = warped.reshape(m, n, kk + 1, ens, ens).sum(axis=1)
        tot, num = warped[:, :kk], warped[:, kk:]
        avg = jnp.nan_to_num(tot / num, nan=0.0, posinf=0.0, neginf=0.0)
        if ens != size:
            avg = resize_hw(avg.reshape(m * kk, ens, ens), size, size, "bilinear").reshape(
                m, kk, size, size
            )
        return avg

    @functools.cached_property
    def augmented_maps_fn(self):
        """Test-time-ensembled maps for one image:
        (context, image [H, W, 3], indices [k], key) -> [k, H, W] fp32."""
        repl = pmesh.replicated(self.mesh)

        def fn(unet_params, vae_params, context, image, indices, key):
            return self._ensembled_maps(
                unet_params, vae_params, context, image[None], indices, key
            )[0]

        jitted = jax.jit(
            fn, in_shardings=(None, None, repl, repl, repl, repl), out_shardings=repl
        )
        return functools.partial(jitted, self.unet_params, self.vae_params)

    def _ensembled_keypoints(self, unet_params, vae_params, context, images, indices, key):
        """Ensembled maps reduced to keypoints on device: [M, k, 2]
        normalized (y, x) via argmax/soft-argmax (eval.py:447-450,
        keypoint_regressor.py:174-192). Shared by `augmented_keypoints_fn`
        and the serving exporter (`stablekeypoints_tpu.serving`)."""
        from stablekeypoints_tpu.ops.keypoints import (
            find_max_pixel,
            pixel_from_weighted_avg,
        )

        avg = self._ensembled_maps(
            unet_params, vae_params, context, images, indices, key
        )
        m, kk, size = avg.shape[0], avg.shape[1], avg.shape[2]
        flat = avg.reshape(m * kk, size, size)
        if self.cfg.max_loc_strategy == "argmax":
            pts = find_max_pixel(flat)
        else:
            pts = pixel_from_weighted_avg(flat)
        return pts.reshape(m, kk, 2) / size

    @functools.cached_property
    def augmented_keypoints_fn(self):
        """Ensembled keypoints for a batch of images, extracted on device.

        (context, images [M, H, W, 3], indices [k], key) -> [M, k, 2]
        normalized (y, x) — only [M, k, 2] leaves the device (the reference
        ships [k, 512, 512] maps to the host per image).
        """
        repl = pmesh.replicated(self.mesh)
        jitted = jax.jit(
            self._ensembled_keypoints,
            in_shardings=(None, None, repl, repl, repl, repl),
            out_shardings=repl,
        )
        return functools.partial(jitted, self.unet_params, self.vae_params)

    @functools.cached_property
    def select_indices_fn(self):
        """Per-image token selection for stage 2 (keypoint_regressor.py:60-99).

        (context, images [B, H, W, 3], key) -> [B, top_k] token indices.
        """
        cfg = self.cfg
        repl = pmesh.replicated(self.mesh)
        data = pmesh.batch_sharding(self.mesh)

        def fn(unet_params, vae_params, context, images, key):
            maps = self._attn_maps(
                unet_params, vae_params, images, context, key,
                cfg.feature_upsample_res, None, True,
            )

            def per_image(m):
                cands = select_candidates(
                    m, cfg.top_k_strategy, cfg.furthest_point_num_samples,
                    sigma=cfg.sigma, num_subjects=cfg.num_subjects,
                )
                return furthest_point_sampling(m, cfg.top_k, cands)

            return jax.vmap(per_image)(maps)

        jitted = jax.jit(
            fn, in_shardings=(None, None, repl, data, repl), out_shardings=repl
        )
        return functools.partial(jitted, self.unet_params, self.vae_params)

    def init_context(self, key: Optional[jax.Array] = None) -> jnp.ndarray:
        """Random context init (ptp_utils.py:649-650: randn [1, T, 768])."""
        key = key if key is not None else jax.random.PRNGKey(self.cfg.seed)
        ctx = jax.random.normal(
            key, (1, self.cfg.num_tokens, self.unet.config.context_dim), jnp.float32
        )
        return jax.device_put(ctx, pmesh.replicated(self.mesh))
