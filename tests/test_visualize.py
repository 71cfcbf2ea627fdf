"""Visualization artifact smoke tests."""

import os

import numpy as np

from stablekeypoints_tpu.pipeline.visualize import plot_point_correspondences, save_grid


def test_save_grid(tmp_path):
    imgs = np.random.default_rng(0).uniform(0, 1, (5, 16, 16)).astype(np.float32)
    path = str(tmp_path / "grid.png")
    save_grid(imgs, path)
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_plot_point_correspondences(tmp_path):
    imgs = np.random.default_rng(0).uniform(0, 1, (3, 16, 16, 3)).astype(np.float32)
    pts = np.random.default_rng(1).uniform(0, 1, (3, 4, 2))
    path = str(tmp_path / "kpts.pdf")
    plot_point_correspondences(imgs, pts, path)
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_save_grid_mixed_list(tmp_path):
    import numpy as np

    panels = [
        np.random.default_rng(0).uniform(0, 1, (16, 16, 3)).astype(np.float32),
        np.random.default_rng(1).uniform(0, 1, (16, 16)).astype(np.float32),
    ]
    path = str(tmp_path / "mixed.png")
    save_grid(panels, path, ncols=2)
    assert os.path.getsize(path) > 0
