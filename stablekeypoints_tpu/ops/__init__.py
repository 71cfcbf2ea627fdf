from stablekeypoints_tpu.ops import gaussians, keypoints, losses, resize, selection, transforms

__all__ = ["gaussians", "keypoints", "losses", "resize", "selection", "transforms"]
