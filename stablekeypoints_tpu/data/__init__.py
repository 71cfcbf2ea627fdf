from stablekeypoints_tpu.data import base, registry

__all__ = ["base", "registry"]
