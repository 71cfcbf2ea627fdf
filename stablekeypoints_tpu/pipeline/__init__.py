from stablekeypoints_tpu.pipeline import runtime

__all__ = ["runtime"]
