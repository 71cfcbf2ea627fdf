"""Dataset adapters against synthetic on-disk fixtures in the reference's
file layouts."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.data.base import Loader
from stablekeypoints_tpu.data.registry import build_dataset


def _write_img(path, size=(64, 48), value=128):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.full((size[1], size[0], 3), value, np.uint8)
    Image.fromarray(arr).save(path)


# ---------------------------------------------------------------------------
# CelebA fixture


@pytest.fixture(scope="module")
def celeba_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("celeba")
    n = 6
    os.makedirs(root / "Anno")
    os.makedirs(root / "MAFL")
    with open(root / "Anno" / "list_landmarks_align_celeba.txt", "w") as f:
        f.write(f"{n}\nlefteye_x lefteye_y ...\n")
        for i in range(n):
            name = f"{i + 1:06d}.jpg"
            kps = " ".join(str(10 + 2 * j) for j in range(10))
            f.write(f"{name} {kps}\n")
    with open(root / "MAFL" / "training.txt", "w") as f:
        for i in range(4):
            f.write(f"{i + 1:06d}.jpg\n")
    with open(root / "MAFL" / "testing.txt", "w") as f:
        for i in range(4, 6):
            f.write(f"{i + 1:06d}.jpg\n")
    for i in range(n):
        _write_img(str(root / "Img" / "img_align_celeba_png" / f"{i + 1:06d}.png"))
    return str(root)


def test_celeba_aligned(celeba_root):
    cfg = Config(dataset_name="celeba_aligned", dataset_loc=celeba_root, image_size=32)
    train = build_dataset(cfg, "train")
    test = build_dataset(cfg, "test")
    assert len(train) == 4 and len(test) == 2
    s = train[0]
    assert s["img"].shape == (32, 32, 3)
    assert s["kpts"].shape == (5, 2)
    # kpts normalized by original 64x48 size, (y, x) order:
    # first landmark (x=10, y=12) -> y/H = 12/48, x/W = 10/64
    np.testing.assert_allclose(s["kpts"][0], [12 / 48, 10 / 64], rtol=1e-6)
    assert s["visibility"].shape == (5,)


def test_celeba_max_len(celeba_root):
    cfg = Config(
        dataset_name="celeba_aligned", dataset_loc=celeba_root, image_size=32, max_len=2
    )
    assert len(build_dataset(cfg, "train")) == 2


# ---------------------------------------------------------------------------
# CUB aligned (h5) fixture


@pytest.fixture(scope="module")
def cub_root(tmp_path_factory):
    import h5py

    root = tmp_path_factory.mktemp("cub")
    with h5py.File(root / "cub.h5", "w") as hf:
        for tag, n in (("train", 5), ("test", 3)):
            hf[f"{tag}_img"] = np.random.default_rng(0).integers(
                0, 255, size=(n, 3, 48, 48), dtype=np.uint8
            )
            hf[f"{tag}_kp"] = np.random.default_rng(1).uniform(0, 1, (n, 15, 2)).astype(
                np.float32
            )
            hf[f"{tag}_vis"] = np.ones((n, 15), np.float32)
    return str(root)


def test_cub_aligned(cub_root):
    cfg = Config(dataset_name="cub_aligned", dataset_loc=cub_root, image_size=32)
    train = build_dataset(cfg, "train")
    test = build_dataset(cfg, "test")
    assert len(train) == 5 and len(test) == 3
    s = test[0]
    assert s["img"].shape == (32, 32, 3)
    assert s["kpts"].shape == (15, 2)
    assert s["visibility"].shape == (15,)
    assert 0 <= s["img"].min() and s["img"].max() <= 1


# ---------------------------------------------------------------------------
# DeepFashion fixture


@pytest.fixture(scope="module")
def deepfashion_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("df")
    n = 4
    files = [f"im_{i}.jpg" for i in range(n)]
    for tag in ("train", "test"):
        with open(root / f"data_{tag}.csv", "w") as f:
            f.write("idx,path\n")
            for i, name in enumerate(files):
                f.write(f"{i},{name}\n")
        kp = [
            {"keypoints": (np.arange(16).reshape(8, 2) * 10 + 5).tolist()}
            for _ in range(n)
        ]
        with open(root / f"data_{tag}.json", "w") as f:
            json.dump(kp, f)
    for name in files:
        _write_img(str(root / "img" / name), size=(56, 56))
    return str(root)


def test_deepfashion(deepfashion_root):
    cfg = Config(dataset_name="deepfashion", dataset_loc=deepfashion_root, image_size=32)
    ds = build_dataset(cfg, "test")
    s = ds[0]
    assert s["img"].shape == (32, 32, 3)
    # reference normalizes to [-1, 1]: uniform-128 fixture -> 128/255*2-1
    np.testing.assert_allclose(s["img"], 128 / 255 * 2 - 1, atol=1e-6)
    # kpts: roll (x,y)->(y,x), /256: first kpt raw (5, 15) -> (15/256, 5/256)
    np.testing.assert_allclose(s["kpts"][0], [15 / 256, 5 / 256], rtol=1e-6)
    # train split has no kpt annotations
    tr = build_dataset(cfg, "train")
    assert tr[0]["kpts"].shape == (8, 2)


# ---------------------------------------------------------------------------
# Loader behavior


def test_loader_fixed_shapes_and_epochs():
    from stablekeypoints_tpu.data.synthetic import SyntheticBlobs

    ds = SyntheticBlobs(length=10, image_size=16, num_kpts=3)
    batches = list(Loader(ds, batch_size=4, shuffle=True, seed=0, infinite=False))
    assert len(batches) == 2  # drop_last
    for b in batches:
        assert b["img"].shape == (4, 16, 16, 3)
        assert b["kpts"].shape == (4, 3, 2)


def test_loader_smaller_than_batch_samples_with_replacement():
    from stablekeypoints_tpu.data.synthetic import SyntheticBlobs

    ds = SyntheticBlobs(length=2, image_size=8, num_kpts=2)
    batches = list(Loader(ds, batch_size=4, infinite=False))
    assert len(batches) == 1
    assert batches[0]["img"].shape == (4, 8, 8, 3)


def test_loader_infinite_cycles():
    from stablekeypoints_tpu.data.synthetic import SyntheticBlobs

    ds = SyntheticBlobs(length=4, image_size=8, num_kpts=2)
    it = iter(Loader(ds, batch_size=4, infinite=True))
    for _ in range(5):
        b = next(it)
        assert b["img"].shape == (4, 8, 8, 3)


def test_loader_substitutes_corrupt_samples(tmp_path):
    """A truncated image file must not kill training: the loader warns and
    substitutes another sample, keeping batch shapes fixed."""
    import warnings

    import numpy as np
    from PIL import Image

    from stablekeypoints_tpu.data.base import Loader
    from stablekeypoints_tpu.data.custom import CustomDataset

    for i in range(6):
        Image.fromarray(
            (np.random.default_rng(i).uniform(0, 255, (32, 32, 3))).astype(np.uint8)
        ).save(tmp_path / f"im_{i}.jpg")
    # truncate one file mid-stream
    p = tmp_path / "im_3.jpg"
    data = p.read_bytes()
    p.write_bytes(data[: len(data) // 3])

    ds = CustomDataset(str(tmp_path), image_size=32)
    loader = Loader(ds, batch_size=6, shuffle=False, num_workers=2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        batches = list(loader)
    assert len(batches) == 1
    assert batches[0]["img"].shape == (6, 32, 32, 3)
    assert np.isfinite(batches[0]["img"]).all()
    assert any("substituted" in str(x.message) for x in w)
    # the substituted index is recorded so latent caching stays correct
    assert 3 not in batches[0]["_idx"].tolist() or len(set(batches[0]["_idx"].tolist())) == 6
