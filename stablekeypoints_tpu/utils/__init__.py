from stablekeypoints_tpu.utils import artifacts, logging

__all__ = ["artifacts", "logging"]
