"""Generate a synthetic CelebA-layout dataset for end-to-end smoke runs.

Writes the exact on-disk structure the CelebA adapter (and the reference's
datasets/celeba.py) expects — Anno/list_landmarks_align_celeba.txt, MAFL
train/test splits, Img/img_align_celeba_png/NNNNNN.png — with procedurally
generated "faces": Gaussian blobs at 5 consistent (jittered) landmark
positions. Lets the full 5-stage pipeline (optimize -> indices ->
precompute -> regressor -> evaluate) run without the real dataset:

    python examples/make_synthetic_celeba.py --root /tmp/synth_celeba --n 24
    python -m stablekeypoints_tpu.main --dataset_name celeba_aligned \
        --dataset_loc /tmp/synth_celeba --save_folder /tmp/skt_celeba \
        --num_steps 30 --num_indices 10 --max_num_points 16
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def make_synthetic_celeba(
    root: str, n: int = 24, image_size: int = 512, n_train: int | None = None, seed: int = 0
) -> None:
    rng = np.random.default_rng(seed)
    n_train = n_train if n_train is not None else int(n * 0.75)
    os.makedirs(os.path.join(root, "Anno"), exist_ok=True)
    os.makedirs(os.path.join(root, "MAFL"), exist_ok=True)
    img_dir = os.path.join(root, "Img", "img_align_celeba_png")
    os.makedirs(img_dir, exist_ok=True)

    # 5 canonical landmark positions (eyes, nose, mouth corners), normalized
    base = np.asarray(
        [[0.35, 0.38], [0.65, 0.38], [0.50, 0.55], [0.38, 0.72], [0.62, 0.72]],
        np.float32,
    )  # (x, y)
    colors = rng.uniform(120, 255, (5, 3))

    ys, xs = np.mgrid[0:image_size, 0:image_size].astype(np.float32) / image_size
    lines = []
    for i in range(n):
        off = rng.uniform(-0.05, 0.05, (1, 2)).astype(np.float32)
        pts = np.clip(base + off, 0.08, 0.92)  # (x, y) normalized
        img = rng.uniform(0, 25, (image_size, image_size, 3)).astype(np.float32)
        for (px, py), c in zip(pts, colors):
            bump = np.exp(-((ys - py) ** 2 + (xs - px) ** 2) / (2 * 0.035**2))
            img += bump[:, :, None] * c
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"{i + 1:06d}.png")
        )
        px_pts = np.round(pts * image_size).astype(int)  # landmark file is pixels
        lines.append(
            f"{i + 1:06d}.jpg " + " ".join(str(v) for xy in px_pts for v in xy)
        )

    with open(os.path.join(root, "Anno", "list_landmarks_align_celeba.txt"), "w") as f:
        f.write(f"{n}\nlefteye_x lefteye_y righteye_x righteye_y nose_x nose_y "
                "leftmouth_x leftmouth_y rightmouth_x rightmouth_y\n")
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(root, "MAFL", "training.txt"), "w") as f:
        f.write("\n".join(f"{i + 1:06d}.jpg" for i in range(n_train)) + "\n")
    with open(os.path.join(root, "MAFL", "testing.txt"), "w") as f:
        f.write("\n".join(f"{i + 1:06d}.jpg" for i in range(n_train, n)) + "\n")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--n", type=int, default=24)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    make_synthetic_celeba(args.root, args.n, args.image_size, seed=args.seed)
    print(f"wrote {args.n} synthetic faces under {args.root}")
