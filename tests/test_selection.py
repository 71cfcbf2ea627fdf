"""Selection ops vs an independent naive-Python oracle of the same semantics."""

import jax.numpy as jnp
import numpy as np

from stablekeypoints_tpu.ops import selection
from stablekeypoints_tpu.ops.keypoints import find_max_pixel


def _naive_fps(locs, candidates, top_k):
    """Greedy FPS oracle: furthest pair seed, then max-min-distance adds.

    Mirrors the documented semantics (ptp_utils.py:115-159): strict `>`
    comparisons, candidates visited in ranking order.
    """
    cand = list(candidates)
    best = (-1.0, None)
    for i in range(len(cand)):
        for j in range(i + 1, len(cand)):
            d = float(np.linalg.norm(locs[cand[i]] - locs[cand[j]]))
            if d > best[0]:
                best = (d, (cand[i], cand[j]))
    selected = list(best[1])
    for _ in range(top_k - 2):
        best_d, best_i = -1.0, None
        for i in cand:
            if i in selected:
                continue
            dmin = min(float(np.linalg.norm(locs[i] - locs[s])) for s in selected)
            if dmin > best_d:
                best_d, best_i = dmin, i
        if best_i is not None:
            selected.append(best_i)
    return selected


def test_fps_matches_naive_oracle():
    rng = np.random.default_rng(0)
    for seed in range(5):
        rng = np.random.default_rng(seed)
        t, h = 40, 32
        maps = rng.standard_normal((t, h, h)).astype(np.float32)
        locs = np.asarray(find_max_pixel(jnp.asarray(maps))) / h
        candidates = rng.choice(t, size=15, replace=False).astype(np.int32)
        ours = np.asarray(
            selection.furthest_point_sampling(jnp.asarray(maps), 8, jnp.asarray(candidates))
        )
        oracle = _naive_fps(locs, candidates, 8)
        np.testing.assert_array_equal(ours, oracle)


def test_top_k_gaussian_prefers_gaussian_like_map():
    h = 32
    ys, xs = np.mgrid[0:h, 0:h].astype(np.float32) + 0.5
    gauss = np.exp(-(((ys - 16) ** 2 + (xs - 8) ** 2) / (2 * 3.0**2)))
    flat = np.ones((h, h), dtype=np.float32) * 0.5
    noise = np.random.default_rng(0).standard_normal((h, h)).astype(np.float32) * 0.3
    maps = np.stack([flat, 10 * gauss, noise]).astype(np.float32)
    idx = np.asarray(selection.find_top_k_gaussian(jnp.asarray(maps), 1, sigma=3.0))
    assert idx[0] == 1


def test_entropy_sort_prefers_peaked_map():
    h = 16
    peaked = np.zeros((h, h), dtype=np.float32)
    peaked[4, 4] = 50.0
    flat = np.zeros((h, h), dtype=np.float32)
    maps = np.stack([flat, peaked])
    idx = np.asarray(selection.entropy_sort(jnp.asarray(maps), 2))
    assert idx[0] == 1


def test_consistent_strategy_is_arange():
    maps = jnp.zeros((10, 8, 8))
    idx = np.asarray(selection.select_candidates(maps, "consistent", 5))
    np.testing.assert_array_equal(idx, np.arange(5))


def test_kl_ranking_matches_naive():
    rng = np.random.default_rng(7)
    t, h = 12, 16
    maps = rng.standard_normal((t, h, h)).astype(np.float32)
    ours = np.asarray(selection.find_top_k_gaussian(jnp.asarray(maps), t, sigma=3.0))

    # naive oracle
    from stablekeypoints_tpu.ops.gaussians import gaussian_circles
    from stablekeypoints_tpu.ops.keypoints import find_k_max_pixels

    pos = np.asarray(find_k_max_pixels(jnp.asarray(maps), 1)) / h
    eps = 1e-5
    logits = maps.reshape(t, -1) + eps
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    target = np.asarray(gaussian_circles(jnp.asarray(pos), h, 3.0)).reshape(t, -1) + eps
    target /= target.sum(-1, keepdims=True)
    kl = (target * (np.log(target) - np.log(p))).sum(-1)
    np.testing.assert_array_equal(ours, np.argsort(kl))
