"""Fused GN-affine+SiLU+3x3conv(+residual) Pallas kernel (kernels/gn_conv.py).

Semantics under test: one-HBM-pass GroupNorm apply + SiLU + padding=1 conv
with pad-after-normalize zeros (the reference resblock composition —
diffusers ResnetBlock2D inside the frozen VAE, ptp_utils.py:289-304) —
against both the kernel's defining jnp composition and the model's unfused
GroupNorm/conv path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablekeypoints_tpu.kernels.gn_conv import (
    _jnp_reference,
    fused_gn_conv_supported,
    fused_gn_silu_conv3x3,
)
from stablekeypoints_tpu.models.layers import _group_norm, _group_norm_coeffs


def _make(b=2, h=24, w=16, cin=16, cout=32, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, cin)), dtype)
    scale = jnp.asarray(rng.normal(1.0, 0.2, (cin,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0.0, 0.2, (cin,)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, cin, cout)), jnp.float32)
    cb = jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.float32)
    res = jnp.asarray(rng.normal(0, 1, (b, h, w, cout)), dtype)
    return x, scale, bias, k, cb, res


@pytest.mark.parametrize("with_res", [False, True])
def test_matches_defining_composition(with_res):
    # h=24 -> ts=8, 3 row blocks: exercises both halo directions + edges
    x, scale, bias, k, cb, res = _make()
    m, a, b = _group_norm_coeffs(x, scale, bias, groups=8)
    out = fused_gn_silu_conv3x3(
        x, m, a, b, k, cb, residual=res if with_res else None, interpret=True
    )
    ref = _jnp_reference(x, m, a, b, k, cb, res if with_res else None)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5
    )  # fp32-accumulated both sides; only summation order differs


def test_bf16_one_ulp_vs_composition():
    """Apply+SiLU run in bf16 with the same op order as the composition and
    both convs accumulate fp32, but XLA does NOT round bf16 fusion
    intermediates identically across execution contexts (a jitted fused
    elementwise chain keeps wider intermediates than eager per-op rounding —
    measured 1-ulp differences on this host), so the contract is <= 1 bf16
    ulp elementwise, not bit equality."""
    x, scale, bias, k, cb, res = _make(dtype=jnp.bfloat16)
    m, a, b = _group_norm_coeffs(x, scale, bias, groups=8)
    out = fused_gn_silu_conv3x3(x, m, a, b, k, cb, residual=res, interpret=True)
    ref = _jnp_reference(x, m, a, b, k, cb, res)
    assert out.dtype == jnp.bfloat16
    o32 = np.asarray(out, np.float32)
    r32 = np.asarray(ref, np.float32)
    # one bf16 ulp at the output's max magnitude (2^-7 relative); both paths
    # sit the same distance from the f32 ground truth (measured ~0.03 at
    # scale 5.3 here), they just round independently
    tol = (2.0**-7) * np.abs(r32).max()
    bad = np.abs(o32 - r32) > tol
    assert not bad.any(), (bad.sum(), float(np.abs(o32 - r32).max()), float(tol))


def test_matches_unfused_model_path():
    """End-to-end against the model's unfused composition (plain _group_norm
    + XLA conv + residual): same math up to fp32 rounding."""
    x, scale, bias, k, cb, res = _make()
    m, a, b = _group_norm_coeffs(x, scale, bias, groups=8)
    out = fused_gn_silu_conv3x3(x, m, a, b, k, cb, residual=res, interpret=True)
    h = _group_norm(x, scale, bias, 8, 1e-5, "silu")
    ref = res + jax.lax.conv_general_dilated(
        h, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + cb
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_single_block_no_halo():
    # h == ts: both halos are the zero pad ring
    x, scale, bias, k, cb, res = _make(h=8)
    m, a, b = _group_norm_coeffs(x, scale, bias, groups=8)
    out = fused_gn_silu_conv3x3(x, m, a, b, k, cb, interpret=True)
    ref = _jnp_reference(x, m, a, b, k, cb, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradients_via_reference_vjp():
    x, scale, bias, k, cb, res = _make()
    m, a, b = _group_norm_coeffs(x, scale, bias, groups=8)

    def f_fused(x, k, cb, res):
        return jnp.sum(
            fused_gn_silu_conv3x3(x, m, a, b, k, cb, residual=res, interpret=True) ** 2
        )

    def f_ref(x, k, cb, res):
        return jnp.sum(_jnp_reference(x, m, a, b, k, cb, res) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3))(x, k, cb, res)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x, k, cb, res)
    for a_, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), atol=1e-4, rtol=1e-4)


def test_batch_not_multiple_of_8():
    """B=10 (the serving/detect view-merged batch): coefficients ride as one
    full [B, C] block indexed by program id — a (1, C) slice is an illegal
    Mosaic block when B > 1, which broke the first on-chip serving run."""
    x, scale, bias, k, cb, res = _make(b=10, h=16)
    m, a, b = _group_norm_coeffs(x, scale, bias, groups=8)
    out = fused_gn_silu_conv3x3(x, m, a, b, k, cb, residual=res, interpret=True)
    ref = _jnp_reference(x, m, a, b, k, cb, res)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_supported_predicate():
    assert fused_gn_conv_supported(128, 128, 128, 128)
    assert fused_gn_conv_supported(1024, 1024, 128, 128)  # SDXL 1024^2 level
    assert fused_gn_conv_supported(512, 512, 128, 256)    # channel-change level
    # admitted by the corrected VMEM model (weights single-buffered, residual
    # counted only when fused) — each probed on-chip, compiles and wins
    assert fused_gn_conv_supported(512, 512, 256, 256)
    assert fused_gn_conv_supported(256, 256, 256, 512, has_res=False)
    assert fused_gn_conv_supported(256, 256, 512, 512)
    assert fused_gn_conv_supported(128, 128, 512, 512)
    # w needs only sublane (x8) alignment — the tiled last-two block dims
    # are (w, c); admits sd21's 192^2/96^2 levels and the 64^2 level
    assert fused_gn_conv_supported(192, 192, 256, 512, has_res=False)
    assert fused_gn_conv_supported(64, 64, 512, 512)
    # measured slower on-chip -> skip-listed (kernels/gn_conv._MEASURED_SLOWER)
    assert not fused_gn_conv_supported(96, 96, 512, 512)
    assert not fused_gn_conv_supported(192, 192, 512, 512)
    assert not fused_gn_conv_supported(128, 128, 128, 128, stride=2)
    assert not fused_gn_conv_supported(128, 96, 96, 128)  # channel lanes
    assert not fused_gn_conv_supported(128, 100, 128, 128)  # w sublanes
    assert not fused_gn_conv_supported(4, 128, 128, 128)  # too short
    # interpret relaxes lanes only
    assert fused_gn_conv_supported(16, 16, 16, 32, interpret=True)


def test_shard_map_matches_single_device():
    from stablekeypoints_tpu.parallel import mesh as pmesh

    x, scale, bias, k, cb, res = _make(b=8, h=16)
    m, a, b = _group_norm_coeffs(x, scale, bias, groups=8)
    mesh = pmesh.make_mesh(4, 2)
    lone = np.asarray(
        fused_gn_silu_conv3x3(x, m, a, b, k, cb, residual=res, interpret=True)
    )
    sharded = np.asarray(
        jax.jit(
            lambda x, m, a, b, res: fused_gn_silu_conv3x3(
                x, m, a, b, k, cb, residual=res, interpret=True, mesh=mesh
            )
        )(x, m, a, b, res)
    )
    np.testing.assert_allclose(lone, sharded, atol=1e-5)


@pytest.mark.parametrize("cin,cout", [(16, 16), (16, 32)])
def test_resnet_block_fused_matches_unfused(cin, cout):
    """ResnetBlock(fused_gn_conv=True): identical param tree, matching output
    (both identity-residual and conv_shortcut variants)."""
    from stablekeypoints_tpu.models.layers import ResnetBlock

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, cin)), jnp.float32)
    kw = dict(
        out_channels=cout, use_time_emb=False, eps=1e-6, dtype=jnp.float32,
        split_conv=True, fused_interpret=True,
    )
    unfused = ResnetBlock(**kw)
    fused = ResnetBlock(**kw, fused_gn_conv=True)
    params = unfused.init(jax.random.PRNGKey(0), x)
    p2 = fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    y1 = unfused.apply(params, x)
    y2 = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-4, rtol=1e-4)


def test_resnet_block_fused_is_differentiable():
    """The 'safe anywhere' claim: grad through the fused path works (the
    gn_conv VJP backprops into gn_affine_coeffs, which carries its own
    custom VJP over the Pallas stats kernel) and matches the unfused path."""
    from stablekeypoints_tpu.models.layers import ResnetBlock

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 16)), jnp.float32)
    kw = dict(
        out_channels=16, use_time_emb=False, eps=1e-6, dtype=jnp.float32,
        split_conv=True, fused_interpret=True, fused_norm=True,
    )
    unfused = ResnetBlock(**kw)
    fused = ResnetBlock(**kw, fused_gn_conv=True)
    params = unfused.init(jax.random.PRNGKey(0), x)

    def loss(mod):
        return lambda p, x: jnp.sum(mod.apply(p, x).astype(jnp.float32) ** 2)

    g1 = jax.grad(loss(fused), argnums=(0, 1))(params, x)
    g2 = jax.grad(loss(unfused), argnums=(0, 1))(params, x)
    for a_, b_ in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), atol=2e-3, rtol=1e-3)


def test_resnet_block_mixed_gating(monkeypatch):
    """conv1 fused + conv2 unfused (the sd21 192^2 case where only the
    channel-change conv wins): output still matches the fully unfused path."""
    import stablekeypoints_tpu.kernels.gn_conv as G
    from stablekeypoints_tpu.models.layers import ResnetBlock

    real = G.fused_gn_conv_supported

    def only_conv1(h, w, cin, cout, stride=1, interpret=False, has_res=True):
        return real(h, w, cin, cout, stride, interpret, has_res) and not has_res

    monkeypatch.setattr(G, "fused_gn_conv_supported", only_conv1)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 16)), jnp.float32)
    kw = dict(
        out_channels=32, use_time_emb=False, eps=1e-6, dtype=jnp.float32,
        split_conv=True, fused_interpret=True,
    )
    fused = ResnetBlock(**kw, fused_gn_conv=True)
    unfused = ResnetBlock(**kw)
    params = unfused.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        fused.init(jax.random.PRNGKey(1), x)
    )
    y1 = unfused.apply(params, x)
    y2 = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_runtime_detect_fused_gn_conv_equivalent():
    """Full ensemble detect path (Runtime.create -> augmented_keypoints_fn)
    with cfg.fused_gn_conv on vs off: identical keypoints up to the kernel's
    one-ulp rounding (on a CPU mesh the kernel runs in interpret mode —
    same routing the multichip dryrun exercises)."""
    from stablekeypoints_tpu.config import Config
    from stablekeypoints_tpu.models.unet import tiny_unet_config
    from stablekeypoints_tpu.models.vae import tiny_vae_config
    from stablekeypoints_tpu.pipeline.runtime import Runtime

    rng = np.random.default_rng(5)
    imgs = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    pts = {}
    for mode in ("off", "on"):
        cfg = Config(
            dataset_name="synthetic", image_size=64, num_tokens=16,
            feature_upsample_res=16, top_k=4, dtype="float32",
            augmentation_iterations=2, eval_batch_images=2,
            fused_gn_conv=mode, fused_groupnorm=mode,
        )
        rt = Runtime.create(cfg, tiny_unet_config(), tiny_vae_config())
        ctx = rt.init_context()
        idx = jnp.arange(cfg.top_k, dtype=jnp.int32)
        pts[mode] = np.asarray(
            rt.augmented_keypoints_fn(ctx, imgs, idx, jax.random.PRNGKey(1))
        )
    np.testing.assert_allclose(pts["on"], pts["off"], atol=2e-3)


def test_vae_encoder_fused_matches_unfused():
    """Tiny VAE encode with fused_gn_conv on/off: same params, same latents
    (unsupported layers fall back per-layer; supported ones run the kernel)."""
    from stablekeypoints_tpu.models.vae import VAE, tiny_vae_config

    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
    cfg = tiny_vae_config()
    base = VAE(cfg, dtype=jnp.float32)
    fused = VAE(cfg, dtype=jnp.float32, fused_gn_conv=True, fused_gn_interpret=True)
    params = base.init(jax.random.PRNGKey(1), img)["params"]
    y1 = base.apply({"params": params}, img, method=VAE.encode_mean)
    y2 = fused.apply({"params": params}, img, method=VAE.encode_mean)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-4, rtol=1e-3)
