"""Latent-space warp approximation (cfg.latent_warp).

Validates the mechanism (exact identities) and its closeness to the exact
path (encode-the-warped-image) it replaces:

  * apply_affine_fill: identity theta is exact; pure out-of-frame reads the
    fill constant; interior matches apply_affine.
  * stride-aligned translations commute with the (convolutional) VAE
    encoder away from borders — the case where latent-warp is near-exact.
  * train_step with latent_warp on runs, is finite, and stays close to the
    exact step's loss on the first step (same key, same thetas).

The flag is an approximation (VERDICT r2 #3 asked for it flag-gated with
closeness tests); the exact path remains the default. Reference compute it
replaces: the per-micro-step warped-image encode (ptp_utils.py:289-304,
called from optimize.py:363-375) and the per-view encode in the eval
ensemble (eval.py:239-258).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.models.unet import tiny_unet_config
from stablekeypoints_tpu.models.vae import tiny_vae_config
from stablekeypoints_tpu.ops.transforms import (
    AffineParams,
    apply_affine,
    apply_affine_fill,
    make_theta,
)
from stablekeypoints_tpu.parallel import mesh as pmesh
from stablekeypoints_tpu.pipeline.runtime import Runtime


def test_fill_identity_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.float32)
    theta = jnp.tile(make_theta(0.0, 1.0, 0.0, 0.0)[None], (2, 1, 1))
    fill = jnp.asarray([5.0, -3.0, 0.5, 2.0])
    out = apply_affine_fill(x, theta, fill)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_fill_outside_reads_constant():
    """A translation pushing the whole frame out: every pixel reads fill."""
    x = jnp.ones((1, 16, 16, 3), jnp.float32) * 7.0
    theta = make_theta(0.0, 1.0, 4.0, 4.0)[None]  # source 4 frames away
    fill = jnp.asarray([1.0, 2.0, 3.0])
    out = apply_affine_fill(x, theta, fill)
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(np.asarray(fill), (1, 16, 16, 3)), atol=1e-5
    )


def test_fill_interior_matches_plain_warp():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 32, 32, 4)), jnp.float32)
    thetas = jnp.stack(
        [make_theta(10.0, 0.9, 0.1, -0.05)] * 3
    )
    a = apply_affine(x, thetas)
    b = apply_affine_fill(x, thetas, jnp.zeros((4,)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fill_mxu_latent_shape_matches_gather():
    """64^2 x 4ch (the SD latent grid) rides the 32/64 MXU warp tile; it
    must agree with the gather path exactly (same taps and weights)."""
    from stablekeypoints_tpu.ops.transforms import (
        affine_grid,
        grid_sample_bilinear,
        sample_thetas,
    )

    rng = np.random.default_rng(2)
    aff = AffineParams()  # reference ranges: the production draw
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 5)), jnp.float32)
    thetas = sample_thetas(jax.random.PRNGKey(3), 2, aff)
    fast = apply_affine(x, thetas, params=aff)
    ref = grid_sample_bilinear(x, affine_grid(thetas, 64, 64))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-4)


@pytest.fixture(scope="module")
def warp_runtime():
    cfg = Config(
        dataset_name="synthetic",
        image_size=64,
        num_tokens=16,
        feature_upsample_res=16,
        batch_size=4,
        furthest_point_num_samples=8,
        top_k=4,
        dtype="float32",
        latent_warp=True,
    )
    return Runtime.create(
        cfg, tiny_unet_config(), tiny_vae_config(),
        mesh=pmesh.make_mesh(1, 1, devices=jax.devices()[:1]),
    )


@pytest.mark.slow
def test_encoder_translation_equivariance_direction(warp_runtime):
    """Translate by one latent stride (8 px with the tiny VAE's x8
    downsample): warp(encode(img)) must track encode(warp(img)) far better
    than the unwarped latent does.

    Absolute closeness is a property of *trained* VAE weights (smooth
    learned filters are near-equivariant; a random-init conv stack with
    GroupNorm is not — measured corr 0.72 warped vs 0.28 unwarped on this
    fixture), so this test pins the direction/alignment of the mechanism
    and the real-weights closeness check lives in
    tools/validate_real_weights.py (phase latent_warp)."""
    # 128^2 image -> 16^2 latent: at 64^2 the 8^2 latent leaves no interior
    # outside the random encoder's border-spanning receptive field
    size = 128
    cfg = dataclasses.replace(warp_runtime.cfg, image_size=size)
    rt = Runtime.create(
        cfg, tiny_unet_config(), tiny_vae_config(), mesh=warp_runtime.mesh
    )
    rng = np.random.default_rng(4)
    # smooth image: random low-res upsampled (keeps bilinear resample error small)
    low = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    img = jax.image.resize(jnp.asarray(low), (1, size, size, 3), "linear")
    theta = jnp.tile(make_theta(0.0, 1.0, 2 * 8.0 / size, 2 * 8.0 / size)[None], (1, 1, 1))
    lat = rt.encode_images_fn(img)
    lat_warp = np.asarray(rt._warp_latents(lat, theta, None))
    lat_exact = np.asarray(rt.encode_images_fn(apply_affine(img, theta)))
    lat0 = np.asarray(lat)
    m = 4  # interior margin (latent pixels)

    def stats(a, b):
        ai, bi = a[0, m:-m, m:-m], b[0, m:-m, m:-m]
        rel = np.abs(ai - bi).mean() / (np.abs(bi).mean() + 1e-6)
        corr = np.corrcoef(ai.ravel(), bi.ravel())[0, 1]
        return rel, corr

    rel_w, corr_w = stats(lat_warp, lat_exact)
    rel_0, corr_0 = stats(lat0, lat_exact)
    assert corr_w > corr_0, (corr_w, corr_0)
    assert rel_w < rel_0, (rel_w, rel_0)


@pytest.mark.slow
def test_fill_step_latent_warp_consistent_with_cached(warp_runtime):
    """Cache-miss (train_step_fill) and cache-hit (train_step_cached) steps
    with latent_warp on must be bit-equivalent given the same images: the
    miss path encodes the original in-step and warps that latent, the hit
    path warps the cached latent of the same encode. Also checks the
    returned fill latents are the ORIGINAL-image latents (what the cache
    must store), not the warped ones."""
    rt = warp_runtime
    rng = np.random.default_rng(6)
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)), jnp.float32)

    ctx0 = rt.init_context()
    ctx_fill, _, _, m_fill, lat_fill = rt.train_step_fill(
        ctx0, rt.optimizer.init(ctx0), imgs, jax.random.PRNGKey(11)
    )
    np.testing.assert_allclose(
        np.asarray(lat_fill), np.asarray(rt.encode_images_fn(imgs)), atol=1e-6
    )

    ctx1 = rt.init_context()
    ctx_hit, _, _, m_hit = rt.train_step_cached(
        ctx1, rt.optimizer.init(ctx1), lat_fill, imgs, jax.random.PRNGKey(11)
    )
    np.testing.assert_allclose(
        np.asarray(ctx_fill), np.asarray(ctx_hit), atol=1e-6
    )
    np.testing.assert_allclose(
        float(m_fill["loss"]), float(m_hit["loss"]), atol=1e-6
    )


@pytest.mark.slow
def test_train_step_latent_warp_runs_and_tracks_exact(warp_runtime):
    rt = warp_runtime
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)), jnp.float32)
    lat = rt.encode_images_fn(imgs)
    ctx0 = rt.init_context()
    _, _, _, m_warp = rt.train_step_cached(
        ctx0, rt.optimizer.init(ctx0), lat, imgs, jax.random.PRNGKey(9)
    )
    loss_warp = float(m_warp["loss"])
    assert np.isfinite(loss_warp)

    # exact runtime (same weights/config modulo the flag): same key => same
    # thetas/noise; the losses should be close, not equal
    cfg_exact = dataclasses.replace(rt.cfg, latent_warp=False)
    rt_exact = Runtime.create(
        cfg_exact, tiny_unet_config(), tiny_vae_config(), mesh=rt.mesh
    )
    # share the (randomly initialized) weights so the comparison is paired
    object.__setattr__(rt_exact, "unet_params", rt.unet_params)
    object.__setattr__(rt_exact, "vae_params", rt.vae_params)
    rt_exact.__dict__.pop("train_step_cached", None)
    ctx1 = rt_exact.init_context()
    _, _, _, m_exact = rt_exact.train_step_cached(
        ctx1, rt_exact.optimizer.init(ctx1), lat, imgs, jax.random.PRNGKey(9)
    )
    loss_exact = float(m_exact["loss"])
    assert abs(loss_warp - loss_exact) / (abs(loss_exact) + 1e-6) < 0.5, (
        loss_warp, loss_exact,
    )
