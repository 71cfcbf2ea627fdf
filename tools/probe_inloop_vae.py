"""Probe: VAE encode inside a lax.map body, kerneled vs kernel-free.

History: round-2 measured that XLA wraps pallas custom calls inside while
bodies in layout copies that make the ADJACENT convs ~13x slower, so the
eval ensemble's chunked path uses a kernel-free `vae_loop` (runtime.py).
The fused GN+SiLU+conv kernel changes the trade: most convs are now
INSIDE the custom call, so the copies have fewer adjacent ops to poison.
If the kerneled in-loop encode beats the kernel-free one, the chunked
detect paths (sd15 M=4 / sd21 M=2 / serving) inherit the VAE win too.

Usage: JAX_COMPILATION_CACHE_DIR=... python tools/probe_inloop_vae.py [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stablekeypoints_tpu.models import weights as W
from stablekeypoints_tpu.models.vae import SD_VAE_CONFIG, VAE


def timeit(f, *a, iters=10):
    r = f(*a)
    float(jnp.asarray(r).astype(jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    float(jnp.asarray(r).astype(jnp.float32).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    chunk, nc = 10, 4  # eval_views_per_pass-style chunks, M=4 images
    dtype = jnp.bfloat16
    cfg = SD_VAE_CONFIG
    params = W.cast_params(W.init_vae_params_fast(0, cfg, 64), dtype)

    vae_kern = VAE(cfg, dtype=dtype, fused_gn=True, fused_gn_conv=True)
    vae_plain = VAE(cfg, dtype=dtype)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (nc, chunk, size, size, 3)), jnp.float32)

    def loop(vae):
        def f(params, x):
            return jax.lax.map(
                lambda c: vae.apply({"params": params}, c, method=VAE.encode_mean), x
            )
        return jax.jit(f)

    def direct(vae):
        def f(params, x):
            return vae.apply(
                {"params": params}, x.reshape(nc * chunk, size, size, 3),
                method=VAE.encode_mean,
            )
        return jax.jit(f)

    for name, fn in [
        ("loop kernel-free", loop(vae_plain)),
        ("loop kerneled   ", loop(vae_kern)),
        ("direct kerneled ", direct(vae_kern)),
        ("direct plain    ", direct(vae_plain)),
    ]:
        t = timeit(fn, params, x)
        print(f"{name}: {t:8.2f} ms for {nc}x{chunk} {size}^2 encodes "
              f"({t / (nc * chunk):6.2f} ms/image)")


if __name__ == "__main__":
    main()
