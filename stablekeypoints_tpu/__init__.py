"""StableKeypoints-TPU: unsupervised keypoints from diffusion models, TPU-native.

A from-scratch JAX/Flax/Pallas framework with the capabilities of
ubc-vision/StableKeypoints (CVPR 2024, arXiv 2312.00065): learn `num_tokens`
text-embedding vectors such that cross-attention maps of a frozen Stable
Diffusion UNet localize consistent semantic parts, then read keypoints off
the maps.

Design differences from the reference (see SURVEY.md §7):
  * attention maps are captured *functionally* (returned from the forward
    pass) instead of via monkey-patched modules and per-device stores
    (reference: ptp_utils.py:472-573, optimize_token.py:45-69);
  * the whole optimization step (two UNet forwards, token selection,
    losses, grad, Adam update) is one jitted program;
  * data parallelism is a `jax.sharding.Mesh` axis with XLA collectives,
    not `nn.DataParallel` (reference: optimize_token.py:41-56);
  * resizes are expressed as matmuls (MXU), gather-free where possible.
"""

__version__ = "0.1.0"
