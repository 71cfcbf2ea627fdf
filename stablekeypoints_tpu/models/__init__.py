from stablekeypoints_tpu.models import layers, scheduler, unet, vae, weights

__all__ = ["layers", "scheduler", "unet", "vae", "weights"]
