"""Full-encoder gn_conv ablation: which LEVELS of the VAE encoder should
run the fused GN+SiLU+conv kernel?

Per-conv microbenches (kernel_microbench --which gnconv) show every live
shape winning in isolation, yet the round-5 matrix showed sd15/sd21 train
FILL regressing while sdxl improved — the layout interaction between the
kernel's custom calls and the adjacent XLA ops (mid-block attention,
stride-2 downsample convs) at the deep small levels is the suspected cost
(same phenomenon as the round-2 'pallas apply doubled adjacent conv time'
finding, groupnorm.py).

This measures wall time of the FULL `VAE.encode_mean` per backbone's live
(batch, size) with the kernel gated to levels >= a minimum pixel area,
sweeping the threshold. GNCONV_MIN_AREA is read by the gate when set (see
kernels/gn_conv.fused_gn_conv_supported).

Usage: JAX_COMPILATION_CACHE_DIR=... python tools/encoder_ablation.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stablekeypoints_tpu.models import weights as W
from stablekeypoints_tpu.models.vae import SD_VAE_CONFIG, SDXL_VAE_CONFIG, VAE


def timeit(f, *a, iters=10):
    r = f(*a)
    float(jnp.asarray(r).astype(jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    float(jnp.asarray(r).astype(jnp.float32).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import stablekeypoints_tpu.kernels.gn_conv as G

    cases = [  # (name, vae_config, batch, size)
        ("sd15 b4 512", SD_VAE_CONFIG, 4, 512),
        ("sd21 b2 768", SD_VAE_CONFIG, 2, 768),
        ("sdxl b1 1024", SDXL_VAE_CONFIG, 1, 1024),
    ]
    # min-area thresholds: 0 = everything supported, 'off' = kernel disabled
    sweeps = [("off", None), ("all", 0), (">=128^2", 128 * 128),
              (">=256^2", 256 * 256), (">=384^2", 384 * 384)]
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    for name, cfg, batch, size in cases:
        params = W.cast_params(W.init_vae_params_fast(0, cfg, 64), dtype)
        x = jnp.asarray(rng.uniform(-1, 1, (batch, size, size, 3)), jnp.float32)
        row = [name + ":"]
        for label, area in sweeps:
            if area is None:
                vae = VAE(cfg, dtype=dtype, fused_gn=True)
                os.environ.pop("GNCONV_MIN_AREA", None)
            else:
                vae = VAE(cfg, dtype=dtype, fused_gn=True, fused_gn_conv=True)
                os.environ["GNCONV_MIN_AREA"] = str(area)
            fn = jax.jit(
                lambda p, x, v=vae: v.apply({"params": p}, x, method=VAE.encode_mean)
            )
            t = timeit(fn, params, x)
            row.append(f"{label} {t:7.2f} ms")
        print("   ".join(row), flush=True)


if __name__ == "__main__":
    main()
