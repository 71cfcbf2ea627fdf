"""Dataset protocol and host-side batch loader.

Every adapter returns `{'img': [H, W, 3] float32 in [0,1] (NHWC),
'kpts': [K, 2] normalized (y, x), 'visibility': [K]}` — the same sample
contract as the reference's torch Datasets (SURVEY.md §2.2), in NHWC.

The loader replaces torch DataLoader: shuffled epochs, fixed batch shapes,
and a thread-pool prefetcher that overlaps image decode with device compute
(the reference decodes synchronously on the training thread).
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
from typing import Iterator, Protocol

import numpy as np
from PIL import Image

__all__ = ["KeypointDataset", "Loader", "load_image_rgb", "set_native_io"]


class KeypointDataset(Protocol):
    def __len__(self) -> int: ...

    def __getitem__(self, idx: int) -> dict: ...


def is_deterministic(dataset) -> bool:
    """True when __getitem__(i) always returns the same sample (no train-time
    augmentation randomness) — the precondition for index-keyed caching.
    Adapters with per-access randomness set `deterministic = False`."""
    return bool(getattr(dataset, "deterministic", True))


# Native-IO routing policy for every adapter image load (Config.native_io):
#   off  — PIL decode + antialiased bilinear resize (reference-exact)
#   auto — native libjpeg decode ONLY when the file is already at target
#          size (no resize => bit-identical to PIL; measured ~1.3x per
#          thread and GIL-free, so the prefetch pool scales on many-core
#          hosts where PIL serializes)
#   on   — native decode+fused resize for all JPEGs (torch-bilinear
#          align_corners=False, no antialias: differs slightly from PIL
#          when resizing; opt-in for throughput-critical ingestion)
_NATIVE_IO_MODE = "auto"


def set_native_io(mode: str) -> None:
    global _NATIVE_IO_MODE
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"native_io must be auto|on|off, got {mode!r}")
    _NATIVE_IO_MODE = mode


def _load_image_pil(path: str, image_size: int) -> np.ndarray:
    """PIL decode + antialiased bilinear resize (matches the reference's
    torchvision/PIL resizes) -> [image_size, image_size, 3] float32 [0,1]."""
    img = Image.open(path).convert("RGB")
    if img.size != (image_size, image_size):
        img = img.resize((image_size, image_size), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


def load_image_rgb(path: str, image_size: int) -> np.ndarray:
    """Decode + bilinear resize to [image_size, image_size, 3] float32 [0,1].

    Dispatches between the PIL path and the native image-IO core per the
    `set_native_io` policy (see comment above)."""
    mode = _NATIVE_IO_MODE
    if mode != "off" and path.lower().endswith((".jpg", ".jpeg")):
        if mode == "on":
            return load_image_rgb_fast(path, image_size)
        # auto: native only when bit-identical to the PIL path (the file is
        # already target-sized, so no resize happens and both paths are raw
        # libjpeg output / 255). Read the bytes ONCE and probe the size from
        # the buffer — a separate Image.open(path) header probe doubled the
        # file I/O on exactly the files the fast path targets.
        from stablekeypoints_tpu.utils import native

        if native.available():
            import io

            try:
                with open(path, "rb") as f:
                    buf = f.read()
                with Image.open(io.BytesIO(buf)) as im:  # header-only parse
                    at_size = im.size == (image_size, image_size)
            except Exception:
                at_size = False
            if at_size:
                out = native.decode_resize_jpeg(buf, image_size, image_size)
                if out is not None:
                    return out
    return _load_image_pil(path, image_size)


def load_image_rgb_fast(path: str, image_size: int) -> np.ndarray:
    """GIL-free native decode+resize for JPEGs (native/image_io.cpp).

    Uses torch-style bilinear (align_corners=False, no antialias) — slightly
    different from PIL when downscaling; intended for high-throughput
    training where the prefetch pool saturates the GIL. Falls back to the
    PIL path for non-JPEGs or when the native library is unavailable.
    """
    if path.lower().endswith((".jpg", ".jpeg")):
        from stablekeypoints_tpu.utils import native

        with open(path, "rb") as f:
            data = f.read()
        out = native.decode_resize_jpeg(data, image_size, image_size)
        if out is not None:
            return out
    return _load_image_pil(path, image_size)


def _stack(samples: list[dict]) -> dict:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class Loader:
    """Shuffled, prefetched, fixed-shape batch iterator."""

    def __init__(
        self,
        dataset: KeypointDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        infinite: bool = False,
        num_workers: int = 8,
        prefetch: int = 2,
    ):
        if len(dataset) == 0:
            raise ValueError("empty dataset")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.infinite = infinite
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)
        self._pool = cf.ThreadPoolExecutor(max_workers=num_workers)

    def _index_stream(self) -> Iterator[np.ndarray]:
        n = len(self.dataset)
        while True:
            order = self._rng.permutation(n) if self.shuffle else np.arange(n)
            end = n - (n % self.batch_size) if self.drop_last else n
            if end == 0:  # dataset smaller than batch: sample with replacement
                yield self._rng.choice(n, size=self.batch_size)
                if not self.infinite:
                    return
                continue
            for i in range(0, end, self.batch_size):
                yield order[i : i + self.batch_size]
            if not self.infinite:
                return

    def __iter__(self) -> Iterator[dict]:
        stream = self._index_stream()
        pending: list[cf.Future] = []

        def submit():
            try:
                idxs = next(stream)
            except StopIteration:
                return False
            futs = [self._pool.submit(self.dataset.__getitem__, int(i)) for i in idxs]
            pending.append((idxs, futs))
            return True

        def result_or_substitute(i: int, fut: cf.Future) -> tuple[int, dict]:
            """Corrupt/truncated files must not kill a long training run:
            on sample failure, warn once per index and substitute a random
            other sample (bounded retries), keeping batch shapes fixed."""
            try:
                return i, fut.result()
            except Exception as e:  # noqa: BLE001 — adapter/decoder errors
                import warnings

                n = len(self.dataset)
                for _ in range(8):
                    j = int(self._rng.integers(n))
                    if j == i:
                        continue
                    try:
                        sample = self.dataset[j]
                        warnings.warn(
                            f"sample {i} failed ({type(e).__name__}: {e}); "
                            f"substituted sample {j}"
                        )
                        return j, sample
                    except Exception:
                        continue
                raise

        for _ in range(self.prefetch + 1):
            if not submit():
                break
        while pending:
            idxs, futs = pending.pop(0)
            resolved = [result_or_substitute(int(i), f) for i, f in zip(idxs, futs)]
            batch = _stack([s for _, s in resolved])
            batch["_idx"] = np.asarray([i for i, _ in resolved], np.int64)
            submit()
            yield batch

    def __len__(self) -> int:
        n = len(self.dataset)
        if n < self.batch_size:
            return 1
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)
