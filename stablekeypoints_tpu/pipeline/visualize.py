"""Visualization artifacts (reference visualize.py:40-374).

Produces the same artifact set: a grid of images with numbered keypoints
(`unsupervised_keypoints.pdf`), per-keypoint heatmap grids
(`keypoint_{i:03d}.png`), regressed-vs-GT panels
(`estimated_keypoints.pdf` / `gt_keypoints.pdf`), and `create_vid`'s
keypoint tracking over ordered frames (`keypoints.npy/.pt`,
`saved_maps.npy/.pt`).
"""

from __future__ import annotations

import os

import jax
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from stablekeypoints_tpu.pipeline.metrics import apply_regressor
from stablekeypoints_tpu.pipeline.regressor import extract_keypoints
from stablekeypoints_tpu.pipeline.runtime import Runtime
from stablekeypoints_tpu.utils.artifacts import save_artifact

__all__ = ["visualize_attn_maps", "save_grid", "plot_point_correspondences", "create_vid"]


def save_grid(images, path: str, ncols: int = 8, titles=None):
    """Save a grid of HWC images / HW heatmaps (list or array) to a file
    (visualize.py:40-73)."""
    n = len(images)
    ncols = min(ncols, n)
    nrows = -(-n // ncols)
    fig, axs = plt.subplots(nrows, ncols, figsize=(2 * ncols, 2 * nrows), squeeze=False)
    for i in range(nrows * ncols):
        ax = axs[i // ncols][i % ncols]
        ax.axis("off")
        if i < n:
            img = images[i]
            ax.imshow(img if img.ndim == 3 else img, cmap=None if img.ndim == 3 else "viridis")
            if titles is not None:
                ax.set_title(str(titles[i]), fontsize=6)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def plot_point_correspondences(
    images: np.ndarray, points: np.ndarray, path: str, ncols: int = 8
):
    """Images with numbered (y, x)-normalized keypoints (visualize.py:105-138)."""
    n = len(images)
    ncols = min(ncols, n)
    nrows = -(-n // ncols)
    fig, axs = plt.subplots(nrows, ncols, figsize=(2 * ncols, 2 * nrows), squeeze=False)
    cmap = plt.get_cmap("tab10")
    for i in range(nrows * ncols):
        ax = axs[i // ncols][i % ncols]
        ax.axis("off")
        if i < n:
            h, w = images[i].shape[:2]
            ax.imshow(images[i])
            for j, (y, x) in enumerate(points[i]):
                ax.scatter([x * w], [y * h], s=12, color=cmap(j % 10))
                ax.annotate(str(j), (x * w, y * h), fontsize=5, color="white")
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def visualize_attn_maps(
    runtime: Runtime,
    dataset,
    context,
    indices,
    regressor=None,
    num_images: int = 16,
    logger=None,
):
    """Grid + per-keypoint heatmaps (+ regressed/GT panels) for a sample
    of images (visualize.py:140-247)."""
    cfg = runtime.cfg
    os.makedirs(cfg.save_folder, exist_ok=True)
    key = jax.random.PRNGKey(cfg.seed + 6)
    idx_arr = np.asarray(indices, np.int32)
    rng = np.random.default_rng(cfg.seed + 6)
    picks = rng.permutation(len(dataset))[: min(num_images, len(dataset))]

    images, all_points, all_maps, all_gt = [], [], [], []
    for di in picks:
        sample = dataset[int(di)]
        key, sub = jax.random.split(key)
        maps = np.asarray(runtime.augmented_maps_fn(context, sample["img"], idx_arr, sub))
        pts = extract_keypoints(maps, cfg.max_loc_strategy)
        images.append(np.asarray(sample["img"]))
        all_points.append(pts)
        all_maps.append(maps)
        all_gt.append(np.asarray(sample["kpts"]))

    images = np.stack(images)
    all_points = np.stack(all_points)
    plot_point_correspondences(
        images, all_points, os.path.join(cfg.save_folder, "unsupervised_keypoints.pdf")
    )
    for j in range(len(idx_arr)):
        save_grid(
            np.stack([m[j] for m in all_maps]),
            os.path.join(cfg.save_folder, f"keypoint_{j:03d}.png"),
        )
    if regressor is not None:
        est = np.stack(
            [apply_regressor(p, np.asarray(regressor)) for p in all_points]
        )
        plot_point_correspondences(
            images, est, os.path.join(cfg.save_folder, "estimated_keypoints.pdf")
        )
        plot_point_correspondences(
            images, np.stack(all_gt), os.path.join(cfg.save_folder, "gt_keypoints.pdf")
        )
    if logger is not None:
        logger.log({"event": "visualized", "num_images": len(picks)})


def save_augmentation_panel(
    runtime: Runtime, image: np.ndarray, context, indices, path: str, key=None
):
    """Debug panel for the test-time ensemble (eval.py:268-353's
    `augmentation.png`): the input image, one per-view warped image, its
    maps, and the averaged ensemble for the first selected keypoint."""
    import jax as _jax
    from stablekeypoints_tpu.ops import transforms as T

    cfg = runtime.cfg
    key = key if key is not None else _jax.random.PRNGKey(cfg.seed + 10)
    idx_arr = np.asarray(indices, np.int32)
    k_theta, _ = _jax.random.split(key)
    aff = T.AffineParams(
        cfg.augment_degrees, tuple(cfg.augment_scale), tuple(cfg.augment_translate)
    )
    thetas = T.sample_thetas(k_theta, 4, aff)
    imgs = np.asarray(
        T.apply_affine(np.broadcast_to(image[None], (4, *image.shape)), thetas)
    )
    maps = np.asarray(runtime.augmented_maps_fn(context, image, idx_arr, key))
    panels = [image] + [imgs[i] for i in range(4)] + [maps[0] / (maps[0].max() + 1e-8)]
    save_grid(panels, path, ncols=3)  # save_grid accepts a mixed list


def create_vid(runtime: Runtime, dataset, context, indices, regressor=None, logger=None):
    """Track keypoints across ordered frames (visualize.py:250-374): per
    frame, run the augmented ensemble, extract keypoints, save the tracks
    and maps, and write per-frame panels."""
    cfg = runtime.cfg
    key = jax.random.PRNGKey(cfg.seed + 7)
    idx_arr = np.asarray(indices, np.int32)
    frames_dir = os.path.join(cfg.save_folder, "frames")
    os.makedirs(frames_dir, exist_ok=True)

    keypoints, saved_maps = [], []
    for fi in range(len(dataset)):
        sample = dataset[fi]
        key, sub = jax.random.split(key)
        maps = np.asarray(runtime.augmented_maps_fn(context, sample["img"], idx_arr, sub))
        pts = extract_keypoints(maps, cfg.max_loc_strategy)
        if regressor is not None:
            pts = apply_regressor(pts, np.asarray(regressor))
        keypoints.append(pts)
        saved_maps.append(maps.astype(np.float16))
        plot_point_correspondences(
            np.asarray(sample["img"])[None], pts[None],
            os.path.join(frames_dir, f"frame_{fi:05d}.png"), ncols=1,
        )
        if logger is not None and fi % 20 == 0:
            logger.log({"event": "vid_frame", "frame": fi})

    keypoints = np.stack(keypoints)
    save_artifact(cfg.save_folder, "keypoints", keypoints)
    save_artifact(cfg.save_folder, "saved_maps", np.stack(saved_maps))
    return keypoints


def main(argv=None):
    """Standalone video-tracking CLI (the reference's `create_vid`,
    visualize.py:250-374, is imported by its main.py:19 but never callable
    from any entry point — here it is): load the learned embedding +
    indices (+ optional regressor) from --save_folder and track keypoints
    across the ordered frames of --dataset_loc.

        python -m stablekeypoints_tpu.pipeline.visualize \
            --save_folder outputs --dataset_loc /data/frames
    """
    import argparse

    import jax.numpy as jnp

    from stablekeypoints_tpu.config import Config
    from stablekeypoints_tpu.data.custom import CustomDataset
    from stablekeypoints_tpu.utils.artifacts import load_artifact

    p = argparse.ArgumentParser(description="track keypoints across video frames")
    p.add_argument("--save_folder", type=str, default="outputs")
    p.add_argument("--dataset_loc", type=str, required=True,
                   help="folder of ordered frame images")
    p.add_argument("--model_type", type=str, default=Config.model_type)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_regressor", action="store_true",
                   help="apply the fitted stage-4 regressor to the tracks")
    args = p.parse_args(argv)

    embedding = load_artifact(args.save_folder, "embedding")
    indices = load_artifact(args.save_folder, "indices")
    regressor = load_artifact(args.save_folder, "regressor") if args.use_regressor else None
    cfg = Config(
        dataset_name="custom", dataset_loc=args.dataset_loc,
        model_type=args.model_type, model_path=args.model_path,
        image_size=args.image_size, num_tokens=embedding.shape[1],
        seed=args.seed, save_folder=args.save_folder,
    )
    runtime = Runtime.create(cfg)
    frames = CustomDataset(args.dataset_loc, image_size=args.image_size)
    kpts = create_vid(runtime, frames, jnp.asarray(embedding), indices, regressor=regressor)
    print(f"tracked {kpts.shape[0]} frames x {kpts.shape[1]} keypoints -> "
          f"{os.path.join(args.save_folder, 'keypoints.npy')} + frames/")


if __name__ == "__main__":
    main()
