"""Stage-3/5 host loop: decode must overlap device dispatch, and the tail
chunk must dispatch at its true size instead of repeat-padding (the
reference fetches samples inline between dispatches and pays full ensemble
compute on padded repeats — keypoint_regressor.py:111-198, eval.py:422)."""

import threading
import time

import numpy as np
import pytest

from stablekeypoints_tpu.pipeline.ensemble_loop import ensemble_chunks


class _RecordingDataset:
    """Fixture dataset that records __getitem__ call times/order."""

    def __init__(self, n, size=8, delay=0.0):
        self.n = n
        self.size = size
        self.delay = delay
        self.calls: list[tuple[int, float]] = []
        self._lock = threading.Lock()

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            time.sleep(self.delay)
        with self._lock:
            self.calls.append((i, time.monotonic()))
        rng = np.random.default_rng(i)
        return {
            "img": rng.uniform(0, 1, (self.size, self.size, 3)).astype(np.float32),
            "kpts": np.full((4, 2), i, np.float32),
        }


class _FakeRuntime:
    """Stands in for Runtime: records dispatch shapes, returns per-image
    keypoints tagged with the image's content so consumers can be checked
    sample-by-sample."""

    def __init__(self):
        self.dispatch_shapes: list[int] = []
        self.dispatch_times: list[float] = []

    def augmented_keypoints_fn(self, context, images, idx_arr, key):
        self.dispatch_shapes.append(images.shape[0])
        self.dispatch_times.append(time.monotonic())
        # tag each output with its image mean so sample pairing is testable
        tag = images.mean(axis=(1, 2, 3))
        return np.broadcast_to(
            tag[:, None, None], (images.shape[0], len(idx_arr), 2)
        ).astype(np.float32)


def _run(n, m, delay=0.0):
    import jax

    ds = _RecordingDataset(n, delay=delay)
    rt = _FakeRuntime()
    order = np.arange(n)
    out = list(
        ensemble_chunks(
            rt, ds, order, None, np.arange(3, dtype=np.int32), jax.random.PRNGKey(0), m
        )
    )
    return ds, rt, out


def test_tail_dispatches_true_size():
    ds, rt, out = _run(n=5, m=2)
    assert rt.dispatch_shapes == [2, 2, 1]
    assert [len(s) for s, _ in out] == [2, 2, 1]
    for samples, pts in out:
        assert pts.shape == (len(samples), 3, 2)
        for s, p in zip(samples, pts):
            np.testing.assert_allclose(p[0, 0], s["img"].mean(), rtol=1e-6)


def test_all_samples_covered_in_order():
    ds, rt, out = _run(n=7, m=3)
    seen = [float(s["kpts"][0, 0]) for samples, _ in out for s in samples]
    assert seen == list(range(7))


def test_next_chunk_decode_submitted_before_current_dispatch():
    """The prefetch contract: by the time chunk i dispatches to the device,
    chunk i+1's decodes have already been SUBMITTED to the pool (with a
    slow __getitem__ they are in flight, not yet resolved)."""
    ds, rt, out = _run(n=8, m=2, delay=0.02)
    assert len(out) == 4
    # chunk 1's first decode must START before chunk 1's dispatch happens —
    # i.e. while the loop was still busy dispatching/consuming chunk 0
    chunk1_decode_starts = [t for i, t in ds.calls if i in (2, 3)]
    assert min(chunk1_decode_starts) < rt.dispatch_times[1]


def test_single_chunk_dataset():
    ds, rt, out = _run(n=2, m=4)
    assert rt.dispatch_shapes == [2]
    assert len(out) == 1 and len(out[0][0]) == 2


def test_prng_stream_matches_inline_split():
    """The per-chunk key sequence is split(key) in chunk order — identical
    to the previous inline loops (resume/replay stability)."""
    import jax

    keys = []

    class _KeyRt(_FakeRuntime):
        def augmented_keypoints_fn(self, context, images, idx_arr, key):
            keys.append(np.asarray(key).copy())
            return super().augmented_keypoints_fn(context, images, idx_arr, key)

    ds = _RecordingDataset(5)
    rt = _KeyRt()
    list(
        ensemble_chunks(
            rt, ds, np.arange(5), None, np.arange(2, dtype=np.int32),
            jax.random.PRNGKey(9), 2,
        )
    )
    k = jax.random.PRNGKey(9)
    for got in keys:
        k, sub = jax.random.split(k)
        np.testing.assert_array_equal(got, np.asarray(sub))
