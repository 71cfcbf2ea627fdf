from stablekeypoints_tpu.kernels import attn_capture

__all__ = ["attn_capture"]
