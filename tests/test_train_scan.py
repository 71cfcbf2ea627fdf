"""steps_per_call dispatch amortization: the K-step lax.scan training path
must reproduce per-step dispatch exactly (same math, same PRNG stream —
the scan body IS the per-step program), and the stage-1 loop's grouping
must fall back cleanly around cache misses, checkpoint boundaries, and the
tail. The feature exists purely to amortize per-dispatch host overhead
(reference has no analog: its loop dispatches per micro-step,
optimize.py:339)."""

import dataclasses

import jax
import numpy as np
import pytest

from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.data.synthetic import SyntheticBlobs
from stablekeypoints_tpu.models.unet import tiny_unet_config
from stablekeypoints_tpu.models.vae import tiny_vae_config
from stablekeypoints_tpu.parallel import mesh as pmesh
from stablekeypoints_tpu.pipeline.optimize import optimize_embedding
from stablekeypoints_tpu.pipeline.runtime import Runtime

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


def _fresh(rt):
    context = rt.init_context()
    opt_state = jax.device_put(
        rt.optimizer.init(context), pmesh.replicated(rt.mesh)
    )
    key = jax.device_put(jax.random.PRNGKey(7), pmesh.replicated(rt.mesh))
    return context, opt_state, key


def test_scan_matches_per_step_dispatch(tiny_runtime):
    """K scanned steps == K train_step_cached dispatches: same context
    trajectory and same per-step metrics (tight tolerance; only compiler
    fusion may differ)."""
    rt = tiny_runtime
    K = 3
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, size=(K, 8, 64, 64, 3)).astype(np.float32)
    lats = np.stack([np.asarray(rt.encode_images_fn(i)) for i in imgs])

    ctx, ost, key = _fresh(rt)
    per_step_metrics = []
    for j in range(K):
        lat = pmesh.shard_batch(rt.mesh, lats[j])
        img = pmesh.shard_batch(rt.mesh, imgs[j])
        ctx, ost, key, m = rt.train_step_cached(ctx, ost, lat, img, key)
        per_step_metrics.append({k: float(v) for k, v in m.items()})
    ctx_ref, key_ref = np.asarray(ctx), np.asarray(key)

    ctx, ost, key = _fresh(rt)
    sh = pmesh.stacked_batch_sharding(rt.mesh)
    ctx, ost, key, mstack = rt.train_step_scan(
        ctx, ost, jax.device_put(lats, sh), jax.device_put(imgs, sh), key
    )
    # the PRNG chain is bitwise-identical (pure splitting, no float math)
    np.testing.assert_array_equal(np.asarray(key), key_ref)
    np.testing.assert_allclose(np.asarray(ctx), ctx_ref, rtol=1e-5, atol=1e-6)
    for j in range(K):
        for k, v in per_step_metrics[j].items():
            np.testing.assert_allclose(float(mstack[k][j]), v, rtol=1e-5, atol=1e-7)


def test_optimize_loop_grouping_matches_per_step(tiny_runtime, tmp_path):
    """Full stage-1 loop with steps_per_call=3 vs =1: identical batch order
    (same loader seed), same cache-fill epoch per-step, then grouped
    cache-hit epochs — final contexts must agree."""
    rt1 = tiny_runtime  # steps_per_call defaults >1 but dataset is tiny
    ds = SyntheticBlobs(length=16, image_size=64, num_kpts=4)

    # 16 images / batch 8 = 2 fill steps, then hits; 8 steps total -> the
    # scan path runs for steps [2..7] in two groups of 3
    cfg_scan = tiny_config(num_steps=8, steps_per_call=3, save_folder=str(tmp_path / "a"))
    cfg_step = tiny_config(num_steps=8, steps_per_call=1, save_folder=str(tmp_path / "b"))
    mesh = pmesh.make_mesh()
    rt_scan = Runtime.create(cfg_scan, tiny_unet_config(), tiny_vae_config(), mesh=mesh)
    rt_step = dataclasses.replace(rt_scan, cfg=cfg_step)

    repl = pmesh.replicated(mesh)
    ctx0 = np.asarray(rt_scan.init_context())  # host copy: steps donate
    ctx_a = np.asarray(
        optimize_embedding(rt_scan, ds, context=jax.device_put(ctx0, repl))
    )
    ctx_b = np.asarray(
        optimize_embedding(rt_step, ds, context=jax.device_put(ctx0, repl))
    )
    assert np.abs(ctx_a - ctx0).max() > 1e-6  # training actually happened
    np.testing.assert_allclose(ctx_a, ctx_b, rtol=1e-4, atol=1e-6)


def test_grouping_respects_checkpoint_boundaries(tiny_runtime, tmp_path):
    """A checkpoint boundary strictly inside a would-be group forces the
    per-step path, so the saved step index always matches the saved
    context (resume-correctness)."""
    ds = SyntheticBlobs(length=8, image_size=64, num_kpts=4)
    cfg = tiny_config(
        num_steps=6, steps_per_call=4, checkpoint_every=3,
        save_folder=str(tmp_path), log_every=100,
    )
    mesh = pmesh.make_mesh()
    rt = Runtime.create(cfg, tiny_unet_config(), tiny_vae_config(), mesh=mesh)
    ctx = optimize_embedding(rt, ds)
    assert np.isfinite(np.asarray(ctx)).all()
    assert (tmp_path / "embedding.npy").exists() or any(
        p.name.startswith("embedding") for p in tmp_path.iterdir()
    )
