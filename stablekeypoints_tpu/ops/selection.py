"""Token selection: ranking strategies + furthest point sampling.

Jit-compatible counterparts of the reference's selection ops
(ptp_utils.py:86-187). The reference runs greedy furthest-point sampling as
a Python O(k*n) loop with device->host syncs every iteration
(ptp_utils.py:115-159); here it is a masked fixed-shape `lax.fori_loop`
whose greedy selections match the reference's (first-maximum tie rule, as
with torch/jnp argmax over iteration order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stablekeypoints_tpu.ops.gaussians import gaussian_circles
from stablekeypoints_tpu.ops.keypoints import find_k_max_pixels, find_max_pixel

__all__ = [
    "find_top_k_gaussian",
    "entropy_sort",
    "furthest_point_sampling",
    "select_candidates",
]


def find_top_k_gaussian(
    maps: jnp.ndarray,
    top_k: int,
    sigma: float = 3.0,
    epsilon: float = 1e-5,
    num_subjects: int = 1,
) -> jnp.ndarray:
    """Rank tokens by KL(gaussian-at-own-argmax || softmax(map)), keep best.

    maps: [T, H, W] -> [top_k] token indices, ascending KL
    (ptp_utils.py:86-112).
    """
    t, h, w = maps.shape
    pos = find_k_max_pixels(maps, num=num_subjects) / h  # [num, T, 2]
    log_p = jax.nn.log_softmax(maps.reshape(t, h * w) + epsilon, axis=-1)

    target = gaussian_circles(pos, size=h, sigma=sigma).reshape(t, h * w) + epsilon
    target = target / jnp.sum(target, axis=-1, keepdims=True)

    kl = jnp.sum(target * (jnp.log(target) - log_p), axis=-1)
    order = jnp.argsort(kl)
    return order[:top_k]


def entropy_sort(maps: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Rank tokens by entropy of softmax(map), keep lowest (ptp_utils.py:165-187)."""
    t, h, w = maps.shape
    log_p = jax.nn.log_softmax(maps.reshape(t, h * w), axis=-1)
    entropy = -jnp.sum(jnp.exp(log_p) * log_p, axis=-1)
    order = jnp.argsort(entropy)
    return order[:top_k]


def furthest_point_sampling(
    maps: jnp.ndarray, top_k: int, candidates: jnp.ndarray
) -> jnp.ndarray:
    """Greedy furthest-point sampling in argmax-location space.

    maps: [T, H, W] heatmaps whose argmaxes define token locations;
    candidates: [K] token indices to choose among (in ranking order);
    returns [top_k] token indices (ptp_utils.py:115-159). Seeded with the
    most distant candidate pair, then greedily adds the candidate whose
    minimum distance to the selected set is largest; strict-> comparisons
    give first-in-order winners on ties, matching the reference loops.
    """
    h = maps.shape[1]
    locs = find_max_pixel(maps) / h  # [T, 2] normalized
    k = candidates.shape[0]
    cand_locs = locs[candidates]  # [K, 2]

    diff = cand_locs[:, None, :] - cand_locs[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff**2, axis=-1))  # [K, K]

    # furthest pair among candidates, scanned in row-major (i, j>i) order
    iu = jnp.triu(jnp.ones((k, k), dtype=bool), 1)
    pair_idx = jnp.argmax(jnp.where(iu, dist, -1.0).reshape(-1))
    i0, j0 = pair_idx // k, pair_idx % k

    selected = jnp.full((top_k,), -1, dtype=jnp.int32)
    selected = selected.at[0].set(i0.astype(jnp.int32))
    selected = selected.at[1].set(j0.astype(jnp.int32))
    sel_mask = jnp.zeros((k,), dtype=bool).at[i0].set(True).at[j0].set(True)

    def body(step, carry):
        selected, sel_mask = carry
        # min distance from each candidate to the selected set
        mind = jnp.min(jnp.where(sel_mask[None, :], dist, jnp.inf), axis=1)
        # already-selected candidates are skipped by the reference loop
        mind = jnp.where(sel_mask, -jnp.inf, mind)
        nxt = jnp.argmax(mind).astype(jnp.int32)
        selected = selected.at[step].set(nxt)
        sel_mask = sel_mask.at[nxt].set(True)
        return selected, sel_mask

    selected, _ = jax.lax.fori_loop(2, top_k, body, (selected, sel_mask))
    return candidates[selected]


def select_candidates(
    maps: jnp.ndarray,
    strategy: str,
    num_candidates: int,
    sigma: float = 3.0,
    num_subjects: int = 1,
) -> jnp.ndarray:
    """Strategy dispatch used by stages 1 and 2 (optimize.py:382-395)."""
    if strategy == "gaussian":
        return find_top_k_gaussian(
            maps, num_candidates, sigma=sigma, num_subjects=num_subjects
        )
    if strategy == "entropy":
        return entropy_sort(maps, num_candidates)
    if strategy == "consistent":
        return jnp.arange(num_candidates, dtype=jnp.int32)
    raise NotImplementedError(f"unknown top_k_strategy: {strategy}")
