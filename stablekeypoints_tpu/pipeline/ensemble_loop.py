"""Prefetched host loop for the stage-3/5 ensemble dispatches.

The reference fetches+decodes each sample inline between device dispatches
(keypoint_regressor.py:111-198, eval.py:422): at 50k stage-3 images with
real JPEG decode, host decode serializes with device ensemble compute.
This loop overlaps three things at once:

  * thread-pool decode of chunk i+1 (submitted before chunk i dispatches),
  * the device ensemble of chunk i (jax dispatch is async), and
  * host consumption (regressor/metric math) of chunk i-1.

The tail chunk dispatches at its TRUE size — one extra jit shape, cached
by the persistent compilation cache — instead of padding with repeats of
the last image: repeat-padding wasted up to (m-1)/m of the final chunk's
ensemble compute on small datasets.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Iterator

import jax
import numpy as np

__all__ = ["ensemble_chunks"]


def ensemble_chunks(
    runtime,
    dataset,
    order,
    context,
    idx_arr: np.ndarray,
    key,
    chunk_size: int,
    num_workers: int = 8,
) -> Iterator[tuple[list[dict], np.ndarray]]:
    """Yield `(samples, keypoints [len(samples), k, 2])` per chunk of `order`.

    The per-chunk PRNG stream is `key, sub = jax.random.split(key)` in chunk
    order — identical to the previous inline loops in evaluate/regressor.
    """
    order = np.asarray(order)
    m = max(1, int(chunk_size))
    chunks = [order[lo : lo + m] for lo in range(0, len(order), m)]
    if not chunks:
        return
    pool = cf.ThreadPoolExecutor(max_workers=num_workers)
    try:
        futs = [pool.submit(dataset.__getitem__, int(i)) for i in chunks[0]]
        prev = None
        for ci in range(len(chunks)):
            samples = [f.result() for f in futs]
            if ci + 1 < len(chunks):
                futs = [pool.submit(dataset.__getitem__, int(i)) for i in chunks[ci + 1]]
            images = np.stack([np.asarray(s["img"], np.float32) for s in samples])
            key, sub = jax.random.split(key)
            pts_dev = runtime.augmented_keypoints_fn(context, images, idx_arr, sub)
            if prev is not None:
                yield prev[0], np.asarray(prev[1])
            prev = (samples, pts_dev)
        yield prev[0], np.asarray(prev[1])
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
