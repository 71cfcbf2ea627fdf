"""Golden regression tests: pinned numeric outputs for fixed seeds.

Guards the end-to-end numerical behavior across refactors (SURVEY.md §4
"golden-value tests"). Values recorded from the current implementation on
CPU fp32; loose tolerances absorb BLAS variation across hosts.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stablekeypoints_tpu.ops.gaussians import gaussian_circle
from stablekeypoints_tpu.ops.losses import equivariance_loss, sharpening_loss
from stablekeypoints_tpu.ops.selection import find_top_k_gaussian, furthest_point_sampling
from stablekeypoints_tpu.ops import transforms as T





def _maps(seed=0, t=20, h=32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    centers = jax.random.uniform(ks[0], (t, 2), minval=0.2, maxval=0.8)
    base = gaussian_circle(centers, h, 2.5)
    noise = 0.1 * jax.random.normal(ks[1], (t, h, h))
    return base + noise


def test_golden_selection_pipeline():
    maps = _maps()
    cands = find_top_k_gaussian(maps, 10, sigma=2.0)
    sel = furthest_point_sampling(maps, 4, cands)
    # pinned: deterministic given the seed and the exact op semantics
    assert sorted(np.asarray(cands).tolist())[:3] == sorted(
        np.asarray(cands).tolist()
    )[:3]  # shape sanity
    assert len(set(np.asarray(sel).tolist())) == 4
    # the actual pinned values
    np.testing.assert_array_equal(np.asarray(sel), _GOLDEN_SEL)


def test_golden_losses():
    maps = _maps(seed=1, t=6)
    theta = T.make_theta(jnp.asarray([7.0]), jnp.asarray([0.9]), jnp.asarray([0.1]), jnp.asarray([-0.05]))
    maps_t = T.apply_affine(maps.transpose(1, 2, 0)[None], theta)[0].transpose(2, 0, 1)
    sl = float(sharpening_loss(maps, sigma=2.0))
    el = float(equivariance_loss(maps, maps_t, theta[0]))
    np.testing.assert_allclose(sl, _GOLDEN_SHARP, rtol=1e-4)
    np.testing.assert_allclose(el, _GOLDEN_EQUI, rtol=1e-4)


# recorded values (CPU fp32, jax 0.9.0)
_GOLDEN_SEL = np.asarray([19, 3, 11, 18])
_GOLDEN_SHARP = 0.013516022823750973
_GOLDEN_EQUI = 0.00474512530490756
