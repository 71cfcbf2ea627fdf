"""Checkpoint DISK-load path (models/weights.py:_load_state_dict).

No real checkpoint can enter this zero-egress container, so the path a
user's first real run takes — diffusers-layout files on disk -> format
reading -> name conversion -> Runtime — is exercised against FABRICATED
checkpoints (random tensors in the exact diffusers layout, shapes derived
by inverting the conversion rules). Numeric fidelity of the conversion
itself is covered separately against a torch oracle in
tests/test_conversion_numeric.py; the end-to-end harness is
`tools/validate_real_weights.py --selftest`.

Reference analog: StableDiffusionPipeline.from_pretrained
(reference optimize_token.py:37-39) — diffusers did the file IO there.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablekeypoints_tpu.models import weights as W
from stablekeypoints_tpu.models.unet import UNet, tiny_unet_config
from stablekeypoints_tpu.models.vae import VAE, tiny_vae_config


def _tree_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)
    fb = jax.tree_util.tree_flatten_with_path(b)
    assert [p for p, _ in fa[0]] == [p for p, _ in fb[0]]
    for (pa, la), (_, lb) in zip(fa[0], fb[0]):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb), err_msg=str(pa))


def test_safetensors_and_bin_load_identically(tmp_path):
    """The two on-disk formats route through different readers
    (safetensors.numpy vs torch.load) but must yield identical params."""
    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    st = W.fabricate_checkpoint(str(tmp_path / "st"), ucfg, vcfg, seed=5)
    bn = W.fabricate_checkpoint(str(tmp_path / "bin"), ucfg, vcfg, seed=5, fmt="bin")
    for load, cfg in ((W.load_unet_params, ucfg), (W.load_vae_params, vcfg)):
        _tree_equal(load(st, cfg, jnp.float32), load(bn, cfg, jnp.float32))


def test_loaded_tree_matches_model_init_structure(tmp_path):
    """Every Flax param must be populated from disk with the right shape —
    a missing conversion rule or a misnamed file key fails here, not at a
    user's first real-checkpoint run."""
    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    d = W.fabricate_checkpoint(str(tmp_path / "ck"), ucfg, vcfg, seed=7)

    unet_shapes = jax.eval_shape(
        UNet(ucfg, dtype=jnp.float32).init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, ucfg.in_channels)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 6, ucfg.context_dim)),
    )["params"]
    vae_shapes = jax.eval_shape(
        VAE(vcfg, dtype=jnp.float32).init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, vcfg.in_channels)),
    )["params"]
    for load, cfg, shapes in (
        (W.load_unet_params, ucfg, unet_shapes),
        (W.load_vae_params, vcfg, vae_shapes),
    ):
        params = load(d, cfg, jnp.float32)
        want = jax.tree_util.tree_flatten_with_path(shapes)[0]
        got = dict(jax.tree_util.tree_flatten_with_path(params)[0])
        assert set(got) == {p for p, _ in want}
        for p, leaf in want:
            assert got[p].shape == leaf.shape, p


@pytest.mark.slow
def test_runtime_create_from_model_path(tmp_path):
    """Runtime.create(model_path=...) — the production entry a real
    checkpoint takes — loads from disk and produces finite capture maps."""
    from stablekeypoints_tpu.config import Config
    from stablekeypoints_tpu.pipeline.runtime import Runtime

    ucfg, vcfg = tiny_unet_config(context_dim=768), tiny_vae_config()
    d = W.fabricate_checkpoint(str(tmp_path / "ck"), ucfg, vcfg, seed=9)
    cfg = Config(
        dataset_name="synthetic", model_path=d, image_size=64,
        feature_upsample_res=16, num_tokens=16, furthest_point_num_samples=8,
        top_k=4, dtype="float32",
    )
    from stablekeypoints_tpu.parallel import mesh as pmesh

    rt = Runtime.create(cfg, ucfg, vcfg, mesh=pmesh.make_mesh(1, 1))
    img = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    maps = np.asarray(rt.attn_maps_fn(rt.init_context(), img, jax.random.PRNGKey(0)))
    assert np.isfinite(maps).all() and maps.shape[1] == 16
