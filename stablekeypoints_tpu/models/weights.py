"""Parameter initialization and HF-checkpoint conversion.

The reference loads `sd-legacy/stable-diffusion-v1-5` via diffusers
(optimize_token.py:37-39). Here, pretrained weights are converted from a
local diffusers-layout checkpoint directory (safetensors or torch .bin)
into the Flax parameter tree; a deterministic random init is provided for
benchmarks/tests in weightless environments. The text encoder is never
needed: the learned context replaces its output entirely
(ptp_utils.py:649-650).
"""

from __future__ import annotations

import os

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from stablekeypoints_tpu.models.unet import UNet, UNetConfig
from stablekeypoints_tpu.models.vae import VAE, VAEConfig

__all__ = [
    "init_unet_params",
    "init_vae_params",
    "cast_params",
    "load_unet_params",
    "load_vae_params",
    "convert_unet_state_dict",
    "convert_vae_state_dict",
]


# ---------------------------------------------------------------------------
# initialization


def init_unet_params(key: jax.Array, config: UNetConfig, sample_hw: int = 64):
    model = UNet(config)
    latents = jnp.zeros((1, sample_hw, sample_hw, config.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 8, config.context_dim))
    return model.init(key, latents, t, ctx)["params"]


def init_vae_params(key: jax.Array, config: VAEConfig, sample_hw: int = 64):
    model = VAE(config)
    images = jnp.zeros((1, sample_hw, sample_hw, config.in_channels))
    return model.init(key, images)["params"]


def _fast_random_like(shapes, seed: int, stddev: float = 0.02):
    """Host-side numpy fill for an eval_shape'd param tree.

    Stays in numpy end to end — on remote-dispatch backends every per-leaf
    device op (asarray/astype) costs a round trip and possibly a tiny
    remote compile, which for ~700 leaves adds up to tens of minutes.
    """
    rng = np.random.default_rng(seed)
    width = stddev * 3.46  # uniform with matching variance; ~10x faster to draw

    def fill(leaf):
        if leaf.ndim == 1:  # biases / norm params: zeros-like is closer to init
            return np.zeros(leaf.shape, np.float32)
        return (rng.random(leaf.shape, dtype=np.float32) - 0.5) * width

    return jax.tree_util.tree_map(fill, shapes)


def _fix_norm_scales(tree, path=()):
    # norm scales must be 1 (zeros would zero all activations)
    if isinstance(tree, dict):
        return {k: _fix_norm_scales(v, path + (k,)) for k, v in tree.items()}
    if path and path[-1] == "scale":
        return np.ones(tree.shape, np.float32)
    return tree


def init_unet_params_fast(seed: int, config: UNetConfig, sample_hw: int = 64):
    """Random-weight init without compiling the init program on device.

    flax `.init` jit-compiles a full forward; through a remote-compile
    tunnel that costs minutes for the 860M-param UNet. Benchmarks and
    weightless environments only need correctly-shaped tensors, so we
    eval_shape the init (pure tracing) and fill on host.
    """
    model = UNet(config)
    latents = jnp.zeros((1, sample_hw, sample_hw, config.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 8, config.context_dim))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), latents, t, ctx)["params"]
    params = _fast_random_like(shapes, seed)
    return _fix_norm_scales(params)


def init_unet_params_zeros(config: UNetConfig, dtype=jnp.bfloat16, sample_hw: int = 16):
    """Zero weights (norm scales = 1) in the target dtype, host-side.

    For compile checks and shape plumbing: creating 860M random values costs
    minutes on some hosts; zeros are allocated lazily by the OS.
    """
    import ml_dtypes

    np_dtype = ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.float32
    model = UNet(config)
    latents = jnp.zeros((1, sample_hw, sample_hw, config.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 8, config.context_dim))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), latents, t, ctx)["params"]

    def fill(tree, path=()):
        if isinstance(tree, dict):
            return {k: fill(v, path + (k,)) for k, v in tree.items()}
        if path[-1] == "scale":
            return np.ones(tree.shape, np.float32)
        if any("norm" in p for p in path):
            return np.zeros(tree.shape, np.float32)
        return np.zeros(tree.shape, np_dtype)

    return fill(shapes)


def init_vae_params_fast(seed: int, config: VAEConfig, sample_hw: int = 64):
    model = VAE(config)
    images = jnp.zeros((1, sample_hw, sample_hw, config.in_channels))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), images)["params"]
    return _fix_norm_scales(_fast_random_like(shapes, seed))


def cast_params(params, dtype=jnp.bfloat16):
    """Cast matmul/conv weights to `dtype`; keep normalization params fp32.

    Norm parameters are identified by a path component containing 'norm'
    (norm1/norm2/norm3/conv_norm_out/group norms named 'norm'). Host numpy
    leaves are cast on host (ml_dtypes handles bfloat16) so no device ops
    are dispatched; device leaves cast on device.
    """
    import ml_dtypes

    def np_bf16(a: np.ndarray) -> np.ndarray:
        # round-to-zero f32 -> bf16 via bit shift; ~10x faster than astype
        return (
            (np.ascontiguousarray(a, np.float32).view(np.uint32) >> 16)
            .astype(np.uint16)
            .view(ml_dtypes.bfloat16)
        )

    def cast(leaf, target):
        if isinstance(leaf, np.ndarray):
            if target is dtype and dtype == jnp.bfloat16:
                return np_bf16(leaf)
            return leaf.astype(np.float32)
        return leaf.astype(target)

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if any("norm" in p for p in path):
            return cast(tree, jnp.float32)
        return cast(tree, dtype)

    return walk(params, ())


# ---------------------------------------------------------------------------
# diffusers state-dict conversion

def _conv_w(x: np.ndarray) -> np.ndarray:
    return np.transpose(x, (2, 3, 1, 0))  # OIHW -> HWIO


def _dense_w(x: np.ndarray) -> np.ndarray:
    return np.transpose(x)  # [out, in] -> [in, out]


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)  # host; device_put happens once at the end


def _map_resnet(src: str) -> list[tuple[str, str, str]]:
    """(suffix in diffusers, suffix in ours, kind) for a resnet block."""
    return [
        ("norm1.weight", "norm1.scale", "raw"),
        ("norm1.bias", "norm1.bias", "raw"),
        ("conv1.weight", "conv1.kernel", "conv"),
        ("conv1.bias", "conv1.bias", "raw"),
        ("time_emb_proj.weight", "time_emb_proj.kernel", "dense"),
        ("time_emb_proj.bias", "time_emb_proj.bias", "raw"),
        ("norm2.weight", "norm2.scale", "raw"),
        ("norm2.bias", "norm2.bias", "raw"),
        ("conv2.weight", "conv2.kernel", "conv"),
        ("conv2.bias", "conv2.bias", "raw"),
        ("conv_shortcut.weight", "conv_shortcut.kernel", "conv"),
        ("conv_shortcut.bias", "conv_shortcut.bias", "raw"),
    ]


def _map_transformer(depth: int, linear_proj: bool = False) -> list[tuple[str, str, str]]:
    # diffusers SDXL uses nn.Linear for proj_in/out (use_linear_projection);
    # we always use 1x1 convs, so linear weights convert via "dense1x1"
    proj_kind = "dense1x1" if linear_proj else "conv"
    rules = [
        ("norm.weight", "norm.scale", "raw"),
        ("norm.bias", "norm.bias", "raw"),
        ("proj_in.weight", "proj_in.kernel", proj_kind),
        ("proj_in.bias", "proj_in.bias", "raw"),
        ("proj_out.weight", "proj_out.kernel", proj_kind),
        ("proj_out.bias", "proj_out.bias", "raw"),
    ]
    for d in range(depth):
        tb, ours = f"transformer_blocks.{d}", f"blocks_{d}"
        for attn in ("attn1", "attn2"):
            rules += [
                (f"{tb}.{attn}.to_q.weight", f"{ours}.{attn}.to_q.kernel", "dense"),
                (f"{tb}.{attn}.to_k.weight", f"{ours}.{attn}.to_k.kernel", "dense"),
                (f"{tb}.{attn}.to_v.weight", f"{ours}.{attn}.to_v.kernel", "dense"),
                (f"{tb}.{attn}.to_out.0.weight", f"{ours}.{attn}.to_out.kernel", "dense"),
                (f"{tb}.{attn}.to_out.0.bias", f"{ours}.{attn}.to_out.bias", "raw"),
            ]
        for n in ("norm1", "norm2", "norm3"):
            rules += [
                (f"{tb}.{n}.weight", f"{ours}.{n}.scale", "raw"),
                (f"{tb}.{n}.bias", f"{ours}.{n}.bias", "raw"),
            ]
        rules += [
            (f"{tb}.ff.net.0.proj.weight", f"{ours}.ff.proj_in.kernel", "dense"),
            (f"{tb}.ff.net.0.proj.bias", f"{ours}.ff.proj_in.bias", "raw"),
            (f"{tb}.ff.net.2.weight", f"{ours}.ff.proj_out.kernel", "dense"),
            (f"{tb}.ff.net.2.bias", f"{ours}.ff.proj_out.bias", "raw"),
        ]
    return rules


_KIND: dict[str, Callable[[np.ndarray], np.ndarray]] = {
    "raw": lambda x: x,
    "conv": _conv_w,
    "dense": _dense_w,
    # torch Linear [out, in] -> our 1x1 conv kernel [1, 1, in, out]
    "dense1x1": lambda x: np.transpose(x)[None, None],
}


def unet_conversion_rules(config: UNetConfig) -> list[tuple[str, str, str]]:
    """(diffusers name, our param path, transform kind) for every UNet param."""
    rules: list[tuple[str, str, str]] = [
        ("conv_in.weight", "conv_in.kernel", "conv"),
        ("conv_in.bias", "conv_in.bias", "raw"),
        ("time_embedding.linear_1.weight", "time_embedding.linear_1.kernel", "dense"),
        ("time_embedding.linear_1.bias", "time_embedding.linear_1.bias", "raw"),
        ("time_embedding.linear_2.weight", "time_embedding.linear_2.kernel", "dense"),
        ("time_embedding.linear_2.bias", "time_embedding.linear_2.bias", "raw"),
        ("conv_norm_out.weight", "conv_norm_out.scale", "raw"),
        ("conv_norm_out.bias", "conv_norm_out.bias", "raw"),
        ("conv_out.weight", "conv_out.kernel", "conv"),
        ("conv_out.bias", "conv_out.bias", "raw"),
    ]
    if config.addition_emb_dim > 0:
        rules += [
            ("add_embedding.linear_1.weight", "add_embedding_linear_1.kernel", "dense"),
            ("add_embedding.linear_1.bias", "add_embedding_linear_1.bias", "raw"),
            ("add_embedding.linear_2.weight", "add_embedding_linear_2.kernel", "dense"),
            ("add_embedding.linear_2.bias", "add_embedding_linear_2.bias", "raw"),
        ]
    n_blocks = len(config.block_channels)
    for b in range(n_blocks):
        depth = config.transformer_depth[b]
        for i in range(config.layers_per_block):
            for s, d, k in _map_resnet(f"down.{b}.{i}"):
                rules.append(
                    (f"down_blocks.{b}.resnets.{i}.{s}", f"down_{b}.resnets_{i}.{d}", k)
                )
            if config.attn_blocks[b]:
                for s, d, k in _map_transformer(depth, config.linear_projection):
                    rules.append(
                        (
                            f"down_blocks.{b}.attentions.{i}.{s}",
                            f"down_{b}.attentions_{i}.{d}",
                            k,
                        )
                    )
        if b < n_blocks - 1:
            rules += [
                (f"down_blocks.{b}.downsamplers.0.conv.weight", f"down_{b}.downsample.conv.kernel", "conv"),
                (f"down_blocks.{b}.downsamplers.0.conv.bias", f"down_{b}.downsample.conv.bias", "raw"),
            ]
    # mid
    for i in (0, 1):
        for s, d, k in _map_resnet("mid"):
            rules.append((f"mid_block.resnets.{i}.{s}", f"mid.resnets_{i}.{d}", k))
    mid_depth = config.transformer_depth[-1] if config.attn_blocks[-1] else 1
    for s, d, k in _map_transformer(mid_depth, config.linear_projection):
        rules.append((f"mid_block.attentions.0.{s}", f"mid.attentions_0.{d}", k))
    # up path (our up_{b} uses reversed channels; diffusers up_blocks too)
    rev_attn = tuple(reversed(config.attn_blocks))
    rev_depth = tuple(reversed(config.transformer_depth))
    for b in range(n_blocks):
        for i in range(config.layers_per_block + 1):
            for s, d, k in _map_resnet("up"):
                rules.append(
                    (f"up_blocks.{b}.resnets.{i}.{s}", f"up_{b}.resnets_{i}.{d}", k)
                )
            if rev_attn[b]:
                for s, d, k in _map_transformer(rev_depth[b], config.linear_projection):
                    rules.append(
                        (f"up_blocks.{b}.attentions.{i}.{s}", f"up_{b}.attentions_{i}.{d}", k)
                    )
        if b < n_blocks - 1:
            rules += [
                (f"up_blocks.{b}.upsamplers.0.conv.weight", f"up_{b}.upsample.conv.kernel", "conv"),
                (f"up_blocks.{b}.upsamplers.0.conv.bias", f"up_{b}.upsample.conv.bias", "raw"),
            ]
    return rules


def convert_unet_state_dict(sd: dict[str, np.ndarray], config: UNetConfig) -> dict:
    """diffusers UNet2DConditionModel state dict -> our param tree."""
    out: dict[str, Any] = {}
    for src, dst, kind in unet_conversion_rules(config):
        if src in sd:
            _set(out, dst, _KIND[kind](np.asarray(sd[src])))
    return out


def _map_vae_resnet(prefix_src: str, prefix_dst: str) -> list[tuple[str, str, str]]:
    return [
        (f"{prefix_src}.{s}", f"{prefix_dst}.{d}", k)
        for s, d, k in _map_resnet("vae")
        if not s.startswith("time_emb")
    ]


def vae_conversion_rules(config: VAEConfig) -> list[tuple[str, str, str]]:
    rules: list[tuple[str, str, str]] = []
    n = len(config.block_channels)
    # encoder
    rules += [
        ("encoder.conv_in.weight", "encoder.conv_in.kernel", "conv"),
        ("encoder.conv_in.bias", "encoder.conv_in.bias", "raw"),
        ("encoder.conv_norm_out.weight", "encoder.conv_norm_out.scale", "raw"),
        ("encoder.conv_norm_out.bias", "encoder.conv_norm_out.bias", "raw"),
        ("encoder.conv_out.weight", "encoder.conv_out.kernel", "conv"),
        ("encoder.conv_out.bias", "encoder.conv_out.bias", "raw"),
        ("quant_conv.weight", "encoder.quant_conv.kernel", "conv"),
        ("quant_conv.bias", "encoder.quant_conv.bias", "raw"),
        ("post_quant_conv.weight", "decoder.post_quant_conv.kernel", "conv"),
        ("post_quant_conv.bias", "decoder.post_quant_conv.bias", "raw"),
        ("decoder.conv_in.weight", "decoder.conv_in.kernel", "conv"),
        ("decoder.conv_in.bias", "decoder.conv_in.bias", "raw"),
        ("decoder.conv_norm_out.weight", "decoder.conv_norm_out.scale", "raw"),
        ("decoder.conv_norm_out.bias", "decoder.conv_norm_out.bias", "raw"),
        ("decoder.conv_out.weight", "decoder.conv_out.kernel", "conv"),
        ("decoder.conv_out.bias", "decoder.conv_out.bias", "raw"),
    ]
    for b in range(n):
        for i in range(config.layers_per_block):
            rules += _map_vae_resnet(
                f"encoder.down_blocks.{b}.resnets.{i}", f"encoder.down_{b}_resnets_{i}"
            )
        if b < n - 1:
            rules += [
                (f"encoder.down_blocks.{b}.downsamplers.0.conv.weight", f"encoder.down_{b}_downsample.conv.kernel", "conv"),
                (f"encoder.down_blocks.{b}.downsamplers.0.conv.bias", f"encoder.down_{b}_downsample.conv.bias", "raw"),
            ]
        for i in range(config.layers_per_block + 1):
            rules += _map_vae_resnet(
                f"decoder.up_blocks.{b}.resnets.{i}", f"decoder.up_{b}_resnets_{i}"
            )
        if b < n - 1:
            rules += [
                (f"decoder.up_blocks.{b}.upsamplers.0.conv.weight", f"decoder.up_{b}_upsample.conv.kernel", "conv"),
                (f"decoder.up_blocks.{b}.upsamplers.0.conv.bias", f"decoder.up_{b}_upsample.conv.bias", "raw"),
            ]
    for side in ("encoder", "decoder"):
        for i in (0, 1):
            rules += _map_vae_resnet(f"{side}.mid_block.resnets.{i}", f"{side}.mid_resnets_{i}")
        a = f"{side}.mid_block.attentions.0"
        rules += [
            (f"{a}.group_norm.weight", f"{side}.mid_attn.norm.scale", "raw"),
            (f"{a}.group_norm.bias", f"{side}.mid_attn.norm.bias", "raw"),
        ]
        for qkv in ("to_q", "to_k", "to_v"):
            rules += [
                (f"{a}.{qkv}.weight", f"{side}.mid_attn.{qkv}.kernel", "dense"),
                (f"{a}.{qkv}.bias", f"{side}.mid_attn.{qkv}.bias", "raw"),
            ]
        rules += [
            (f"{a}.to_out.0.weight", f"{side}.mid_attn.to_out.kernel", "dense"),
            (f"{a}.to_out.0.bias", f"{side}.mid_attn.to_out.bias", "raw"),
        ]
    return rules


def convert_vae_state_dict(sd: dict[str, np.ndarray], config: VAEConfig) -> dict:
    # diffusers<=0.8-era AutoencoderKL names the mid-block attention
    # query/key/value/proj_attn; newer exports use to_q/to_k/to_v/to_out.0.
    # The reference pins diffusers==0.8.0 (ptp_utils.py:573) so checkpoints
    # in the wild come in both layouts — normalize to the modern names.
    renames = (
        (".query.", ".to_q."),
        (".key.", ".to_k."),
        (".value.", ".to_v."),
        (".proj_attn.", ".to_out.0."),
    )

    def modern(name: str) -> str:
        if ".attentions." in name:
            for old, new in renames:
                name = name.replace(old, new)
        return name

    sd = {modern(k): v for k, v in sd.items()}
    out: dict[str, Any] = {}
    for src, dst, kind in vae_conversion_rules(config):
        if src in sd:
            _set(out, dst, _KIND[kind](np.asarray(sd[src])))
    return out


# ---------------------------------------------------------------------------
# checkpoint directory loading


def _load_state_dict(component_dir: str) -> dict[str, np.ndarray]:
    """Load a diffusers component dir (safetensors preferred, else torch .bin)."""
    st_files = [f for f in os.listdir(component_dir) if f.endswith(".safetensors")]
    if st_files:
        from safetensors.numpy import load_file

        sd: dict[str, np.ndarray] = {}
        for f in sorted(st_files):
            sd.update(load_file(os.path.join(component_dir, f)))
        return sd
    bin_files = [f for f in os.listdir(component_dir) if f.endswith(".bin")]
    if bin_files:
        import torch

        sd = {}
        for f in sorted(bin_files):
            raw = torch.load(
                os.path.join(component_dir, f), map_location="cpu", weights_only=True
            )
            sd.update({k: v.float().numpy() for k, v in raw.items()})
        return sd
    raise FileNotFoundError(f"no safetensors/bin weights in {component_dir}")


def load_unet_params(model_dir: str, config: UNetConfig, dtype=jnp.bfloat16):
    sd = _load_state_dict(os.path.join(model_dir, "unet"))
    return cast_params(convert_unet_state_dict(sd, config), dtype)


def load_vae_params(model_dir: str, config: VAEConfig, dtype=jnp.bfloat16):
    sd = _load_state_dict(os.path.join(model_dir, "vae"))
    return cast_params(convert_vae_state_dict(sd, config), dtype)


# ---------------------------------------------------------------------------
# checkpoint fabrication (offline testing of the load path)
#
# No real checkpoint can enter this zero-egress container, so the disk load
# path (safetensors/bin reading -> conversion -> Runtime) is exercised
# against FABRICATED checkpoints: random tensors in the exact diffusers
# layout, shapes derived by inverting the conversion rules against the Flax
# shape tree. Used by tests/test_weights_io.py and
# `tools/validate_real_weights.py --selftest`.


def fabricate_state_dict(
    rules: list[tuple[str, str, str]],
    flax_shapes,
    seed: int = 0,
    conv_scale: float = 1.0,
) -> dict[str, np.ndarray]:
    """Random diffusers-layout state dict whose shapes invert `rules`
    against a Flax `jax.eval_shape` param tree. `conv_scale` damps conv
    weights (deep random conv stacks blow up fp32 activations otherwise)."""
    rng = np.random.default_rng(seed)
    sd: dict[str, np.ndarray] = {}
    for src, dst, kind in rules:
        leaf = flax_shapes
        for p in dst.split("."):
            if not isinstance(leaf, dict) or p not in leaf:
                leaf = None
                break
            leaf = leaf[p]
        if leaf is None:  # rule target absent in this topology (no shortcut…)
            continue
        shape = tuple(leaf.shape)
        if kind == "conv":  # HWIO -> OIHW
            shape = (shape[3], shape[2], shape[0], shape[1])
        elif kind == "dense":  # [in, out] -> [out, in]
            shape = (shape[1], shape[0])
        elif kind == "dense1x1":  # [1, 1, in, out] -> [out, in]
            shape = (shape[3], shape[2])
        if dst.endswith(".scale"):
            val = 1.0 + 0.1 * rng.standard_normal(shape)
        else:
            val = 0.2 * rng.standard_normal(shape)
            if kind == "conv":
                val = val * conv_scale
        sd[src] = val.astype(np.float32)
    return sd


def fabricate_checkpoint(
    model_dir: str,
    unet_config: UNetConfig,
    vae_config: VAEConfig,
    seed: int = 0,
    fmt: str = "safetensors",
) -> str:
    """Write `{model_dir}/{unet,vae}/diffusion_pytorch_model.{safetensors,bin}`
    with random weights for the given topologies; returns model_dir. The
    directory then loads through the exact production path
    (`load_unet_params`/`load_vae_params` via `Runtime.create(model_path=…)`)."""
    unet = UNet(unet_config, dtype=jnp.float32)
    shapes = jax.eval_shape(
        unet.init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, unet_config.in_channels)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 6, unet_config.context_dim)),
    )["params"]
    usd = fabricate_state_dict(unet_conversion_rules(unet_config), shapes, seed)
    vae = VAE(vae_config, dtype=jnp.float32)
    vshapes = jax.eval_shape(
        vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, vae_config.in_channels))
    )["params"]
    vsd = fabricate_state_dict(
        vae_conversion_rules(vae_config), vshapes, seed + 1, conv_scale=0.3
    )
    for name, sd in (("unet", usd), ("vae", vsd)):
        d = os.path.join(model_dir, name)
        os.makedirs(d, exist_ok=True)
        if fmt == "safetensors":
            from safetensors.numpy import save_file

            save_file(sd, os.path.join(d, "diffusion_pytorch_model.safetensors"))
        elif fmt == "bin":
            import torch

            torch.save(
                {k: torch.from_numpy(v) for k, v in sd.items()},
                os.path.join(d, "diffusion_pytorch_model.bin"),
            )
        else:
            raise ValueError(f"unknown checkpoint format: {fmt}")
    return model_dir
