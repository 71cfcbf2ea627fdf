"""End-to-end stage-1 test: tiny models, synthetic data, 8-device mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.data.synthetic import SyntheticBlobs
from stablekeypoints_tpu.models.unet import tiny_unet_config
from stablekeypoints_tpu.models.vae import tiny_vae_config
from stablekeypoints_tpu.parallel import mesh as pmesh
from stablekeypoints_tpu.pipeline.optimize import optimize_embedding
from stablekeypoints_tpu.pipeline.runtime import Runtime, collect_maps


pytestmark = pytest.mark.slow  # model-heavy: excluded from the smoke subset


def tiny_config(**kw) -> Config:
    base = dict(
        dataset_name="synthetic",
        image_size=64,
        num_tokens=16,
        feature_upsample_res=16,
        batch_size=8,
        num_steps=3,
        furthest_point_num_samples=8,
        top_k=4,
        dtype="float32",
        log_every=1,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def tiny_runtime():
    cfg = tiny_config()
    mesh = pmesh.make_mesh()
    return Runtime.create(cfg, tiny_unet_config(), tiny_vae_config(), mesh=mesh)


def test_collect_maps_layers_and_indices():
    caps = [jnp.full((2, 16, 6), float(i)) for i in range(4)]
    out = collect_maps(caps, layers=(0, 1), upsample_res=-1)
    assert out.shape == (2, 6, 4, 4)
    np.testing.assert_allclose(np.asarray(out), 0.5)
    out2 = collect_maps(caps, layers=(0, 1, 2, 3), upsample_res=8, indices=jnp.asarray([1, 3]))
    assert out2.shape == (2, 2, 8, 8)
    np.testing.assert_allclose(np.asarray(out2), 1.5)


def test_attn_maps_shape(tiny_runtime):
    rt = tiny_runtime
    ctx = rt.init_context()
    imgs = jnp.ones((8, 64, 64, 3)) * 0.5
    maps = rt.attn_maps_fn(ctx, imgs, jax.random.PRNGKey(0))
    assert maps.shape == (8, rt.cfg.num_tokens, 16, 16)
    assert np.isfinite(np.asarray(maps)).all()


def test_train_step_updates_context_and_reduces_loss(tiny_runtime):
    rt = tiny_runtime
    ds = SyntheticBlobs(length=16, image_size=64, num_kpts=4)
    ctx0 = np.asarray(rt.init_context())
    ctx = optimize_embedding(rt, ds)
    ctx = np.asarray(ctx)
    assert ctx.shape == (1, rt.cfg.num_tokens, 32)
    assert np.isfinite(ctx).all()
    assert np.abs(ctx - ctx0).max() > 1e-6  # context actually moved


def test_train_step_batch_sharded(tiny_runtime):
    """The per-step input batch is sharded over the 8-device data axis."""
    rt = tiny_runtime
    imgs = pmesh.shard_batch(rt.mesh, np.ones((8, 64, 64, 3), np.float32))
    shards = imgs.addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (1, 64, 64, 3)


def test_loss_decreases_on_synthetic(tiny_runtime):
    """A few steps on learnable synthetic data should reduce the loss."""
    rt = tiny_runtime
    ds = SyntheticBlobs(length=16, image_size=64, num_kpts=4)
    from stablekeypoints_tpu.data.base import Loader
    import jax as _jax

    loader = iter(Loader(ds, batch_size=8, infinite=True, seed=0))
    ctx = rt.init_context()
    opt_state = rt.optimizer.init(ctx)
    key = _jax.random.PRNGKey(0)
    losses = []
    for step in range(8):
        batch = next(loader)
        key, sub = _jax.random.split(key)
        imgs = pmesh.shard_batch(rt.mesh, batch["img"])
        ctx, opt_state, sub, m = rt.train_step(ctx, opt_state, imgs, sub)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[4:]) < losses[0]


def test_multi_subject_train_step():
    """num_subjects > 1: multi-peak Gaussian targets flow through the step."""
    import jax as _jax
    from stablekeypoints_tpu.pipeline.runtime import Runtime as _RT
    from stablekeypoints_tpu.models.unet import tiny_unet_config as _tc
    from stablekeypoints_tpu.models.vae import tiny_vae_config as _tv

    cfg = tiny_config(num_subjects=2, batch_size=8)
    rt = _RT.create(cfg, _tc(), _tv(), mesh=pmesh.make_mesh())
    imgs = pmesh.shard_batch(rt.mesh, np.ones((8, 64, 64, 3), np.float32) * 0.3)
    ctx = rt.init_context()
    opt_state = rt.optimizer.init(ctx)
    ctx, opt_state, _, m = rt.train_step(ctx, opt_state, imgs, _jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_low_res_ensemble_close_to_exact():
    """eval_ensemble_res < image size: keypoints close to the exact mode."""
    import dataclasses
    import jax as _jax
    from stablekeypoints_tpu.pipeline.runtime import Runtime as _RT
    from stablekeypoints_tpu.models.unet import tiny_unet_config as _tc
    from stablekeypoints_tpu.models.vae import tiny_vae_config as _tv
    from stablekeypoints_tpu.data.synthetic import SyntheticBlobs as _SB

    cfg = tiny_config(augmentation_iterations=8)
    img = _SB(length=2, image_size=64, num_kpts=4)[0]["img"][None]
    indices = np.arange(4, dtype=np.int32)
    pts = {}
    for res in (-1, 16):
        c = dataclasses.replace(cfg, eval_ensemble_res=res)
        rt = _RT.create(c, _tc(), _tv(), mesh=pmesh.make_mesh())
        ctx = rt.init_context()
        pts[res] = np.asarray(
            rt.augmented_keypoints_fn(ctx, img, indices, _jax.random.PRNGKey(0))
        )
    # same random weights/keys: locations should agree within a few pixels
    assert np.abs(pts[-1] - pts[16]).max() < 0.12


def test_cached_latent_step_matches_uncached(tiny_runtime):
    """train_step_cached(encode(images), images) must be bit-equivalent to
    train_step(images): the latent cache is a pure reordering of the same
    deterministic encode."""
    import jax as _jax

    rt = tiny_runtime
    imgs = pmesh.shard_batch(
        rt.mesh,
        np.random.default_rng(3).uniform(0, 1, (8, 64, 64, 3)).astype(np.float32),
    )
    ctx0 = rt.init_context()
    opt0 = rt.optimizer.init(ctx0)

    # the step donates (context, opt_state, key): use fresh equal-valued keys
    ctx_a, _, _, m_a = rt.train_step(ctx0, opt0, imgs, _jax.random.PRNGKey(7))
    lat = rt.encode_images_fn(imgs)
    ctx_b, _, _, m_b = rt.train_step_cached(
        rt.init_context(), rt.optimizer.init(rt.init_context()), lat, imgs,
        _jax.random.PRNGKey(7),
    )
    np.testing.assert_allclose(np.asarray(ctx_a), np.asarray(ctx_b), atol=1e-6)
    assert abs(float(m_a["loss"]) - float(m_b["loss"])) < 1e-5


def test_optimize_loop_cache_on_off_identical():
    """The full stage-1 loop with the latent cache produces the same
    embedding as without it (same seeds -> same data order and PRNG)."""
    from stablekeypoints_tpu.data.synthetic import SyntheticBlobs as _SB

    results = {}
    for cache in (True, False):
        cfg = tiny_config(num_steps=4, cache_latents=cache)
        rt = Runtime.create(
            cfg,
            __import__("stablekeypoints_tpu.models.unet", fromlist=["x"]).tiny_unet_config(),
            __import__("stablekeypoints_tpu.models.vae", fromlist=["x"]).tiny_vae_config(),
            mesh=pmesh.make_mesh(),
        )
        ds = _SB(length=16, image_size=64, num_kpts=4)
        results[cache] = np.asarray(optimize_embedding(rt, ds))
    np.testing.assert_allclose(results[True], results[False], atol=1e-6)


def test_optimize_loop_hits_cached_path():
    """After the first epoch every index is cached, so steady-state steps
    must route through train_step_cached (the whole point of the cache)."""
    from stablekeypoints_tpu.data.synthetic import SyntheticBlobs as _SB

    cfg = tiny_config(num_steps=5, batch_size=8)
    rt = Runtime.create(
        cfg,
        __import__("stablekeypoints_tpu.models.unet", fromlist=["x"]).tiny_unet_config(),
        __import__("stablekeypoints_tpu.models.vae", fromlist=["x"]).tiny_vae_config(),
        mesh=pmesh.make_mesh(),
    )
    calls = {"cached": 0, "fill": 0}
    cached, fill = rt.train_step_cached, rt.train_step_fill

    def spy_cached(*a, **k):
        calls["cached"] += 1
        return cached(*a, **k)

    def spy_fill(*a, **k):
        calls["fill"] += 1
        return fill(*a, **k)

    rt.__dict__["train_step_cached"] = spy_cached
    rt.__dict__["train_step_fill"] = spy_fill
    optimize_embedding(rt, _SB(length=8, image_size=64, num_kpts=4))
    assert calls["fill"] >= 1
    assert calls["cached"] >= 3  # one 8-image epoch fills; the rest hit


def test_ensemble_view_chunking_is_exact(monkeypatch):
    """Chunking the ensemble's views through lax.map must be a pure
    reshape/reduction refactor: with the per-view noise draw zeroed out
    (it legitimately depends on the chunking of the PRNG stream),
    chunked and single-pass ensembles are identical."""
    import jax as _jax

    imgs = np.random.default_rng(5).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    idx = np.arange(4, dtype=np.int32)
    out = {}
    for chunk in (1000, 4):  # 2 images x 8 views = 16 views; 4 chunks of 4
        cfg = tiny_config(augmentation_iterations=8, eval_views_per_pass=chunk)
        rt = Runtime.create(
            cfg,
            __import__("stablekeypoints_tpu.models.unet", fromlist=["x"]).tiny_unet_config(),
            __import__("stablekeypoints_tpu.models.vae", fromlist=["x"]).tiny_vae_config(),
            mesh=pmesh.make_mesh(),
        )
        ctx = rt.init_context()
        real_normal = _jax.random.normal
        monkeypatch.setattr(
            _jax.random, "normal",
            lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
        )
        try:
            out[chunk] = np.asarray(
                rt.augmented_keypoints_fn(ctx, imgs, idx, _jax.random.PRNGKey(1))
            )
        finally:
            monkeypatch.setattr(_jax.random, "normal", real_normal)
    np.testing.assert_allclose(out[1000], out[4], atol=1e-5)


def test_remat_auto_policy():
    """Lock the measured auto-remat decisions: off while the activation
    footprint (per-device merged batch x image area) fits HBM (SD1.5
    batch4@512^2, SDXL batch1@1024^2), on above ~8 units."""
    from stablekeypoints_tpu.config import Config
    from stablekeypoints_tpu.models.unet import tiny_unet_config
    from stablekeypoints_tpu.models.vae import tiny_vae_config
    from stablekeypoints_tpu.pipeline.runtime import Runtime

    def remat_for(batch, size):
        cfg = Config(
            dataset_name="synthetic", batch_size=batch, image_size=size,
            data_parallel=1,  # policy is per-device; pin a 1-chip mesh
        )
        rt = Runtime.create(cfg, tiny_unet_config(), tiny_vae_config())
        return rt.unet.config.remat

    assert remat_for(4, 512) is False  # reference workload: store activations
    assert remat_for(1, 1024) is False  # SDXL headline: 2*1*4 = 8 units
    assert remat_for(2, 1024) is True  # 2*2*4 = 16 units: recompute
    assert remat_for(16, 512) is True  # 32 units at 512^2
