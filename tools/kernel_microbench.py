"""Microbenchmark the Pallas kernels in isolation on the attached TPU.

Times fwd and fwd+bwd for the capture kernel and the cross/flash attention
paths at the live SD-1.5 training shapes, so kernel-level changes can be
judged without step-level session noise. Sync is by value transfer
(block_until_ready returns early on the axon platform).

Usage: python tools/kernel_microbench.py [--iters 30] [--which capture,cross,flash]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import jax
import jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters * 1e3


def bench_capture(iters):
    from stablekeypoints_tpu.kernels.attn_capture import capture_attention

    for b, h, n, d, t in [(8, 8, 16384, 160, 500), (8, 8, 16384, 80, 500)]:
        kq, kk, kc = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(kq, (b, h, n, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, t, h, d), jnp.bfloat16)
        cot = jax.random.normal(kc, (b, n, t), jnp.float32)
        scale = 1.0 / math.sqrt(d)

        fwd = jax.jit(lambda q, k: capture_attention(q, k, scale))
        grad = jax.jit(
            jax.grad(lambda q, k: jnp.sum(capture_attention(q, k, scale) * cot), (0, 1))
        )
        print(
            f"capture  B{b} H{h} N{n} D{d} T{t}: fwd {_timeit(fwd, q, k, iters=iters):7.3f} ms"
            f"   fwd+bwd {_timeit(grad, q, k, iters=iters):7.3f} ms"
        )


def bench_cross(iters):
    from stablekeypoints_tpu.kernels.cross_attn import cross_attention_resident
    from stablekeypoints_tpu.kernels.flash import flash_cross_attention

    # the live non-captured cross layers (SD-1.5 512^2, merged batch 8)
    for b, n, h, d, t in [(8, 4096, 8, 40, 500), (8, 1024, 8, 80, 500), (8, 1024, 8, 160, 500)]:
        kq, kk, kv, kc = jax.random.split(jax.random.key(1), 4)
        q = jax.random.normal(kq, (b, n, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, t, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, t, h, d), jnp.bfloat16)
        cot = jax.random.normal(kc, (b, n, h, d), jnp.bfloat16)
        scale = 1.0 / math.sqrt(d)
        for name, fn in [("resident", cross_attention_resident), ("flash", flash_cross_attention)]:
            fwd = jax.jit(lambda q, k, v, fn=fn: fn(q, k, v, scale))
            grad = jax.jit(
                jax.grad(
                    lambda q, k, v, fn=fn: jnp.sum(fn(q, k, v, scale).astype(jnp.float32) * cot),
                    (0, 1, 2),
                )
            )
            print(
                f"cross-{name:9s} B{b} N{n} D{d}: fwd {_timeit(fwd, q, k, v, iters=iters):7.3f} ms"
                f"   fwd+bwd {_timeit(grad, q, k, v, iters=iters):7.3f} ms"
            )


def bench_flash(iters):
    from stablekeypoints_tpu.kernels.flash import flash_self_attention

    for b, n, h, d in [(8, 4096, 8, 40), (8, 1024, 8, 80)]:
        kq, kk, kv, kc = jax.random.split(jax.random.key(2), 4)
        q = jax.random.normal(kq, (b, n, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, n, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, n, h, d), jnp.bfloat16)
        cot = jax.random.normal(kc, (b, n, h, d), jnp.bfloat16)
        scale = 1.0 / math.sqrt(d)
        fwd = jax.jit(lambda q, k, v: flash_self_attention(q, k, v, scale))
        grad = jax.jit(
            jax.grad(
                lambda q, k, v: jnp.sum(flash_self_attention(q, k, v, scale).astype(jnp.float32) * cot),
                (0, 1, 2),
            )
        )
        print(
            f"flash-self B{b} N{n} D{d}: fwd {_timeit(fwd, q, k, v, iters=iters):7.3f} ms"
            f"   fwd+bwd {_timeit(grad, q, k, v, iters=iters):7.3f} ms"
        )


def bench_pad(iters):
    """Head-dim padding trade study (VERDICT r4 #4): the d_head=40 flash
    self-attention layers (SD-1.5 64^2, 8 heads x 40) contract over 40 of
    the MXU's 128 lanes. Zero-padding q/k/v to d in {64, 128} is exact
    (zero channels add nothing to logits; extra v columns slice off) but
    trades pad/slice HBM copies + extra FLOPs for alignment. Measured
    here at kernel level; adopt only on a >2% step-level win."""
    from stablekeypoints_tpu.kernels.flash import flash_self_attention

    b, n, h, d = 8, 4096, 8, 40
    kq, kk, kv, kc = jax.random.split(jax.random.key(2), 4)
    q = jax.random.normal(kq, (b, n, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, n, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, n, h, d), jnp.bfloat16)
    cot = jax.random.normal(kc, (b, n, h, d), jnp.bfloat16)
    scale = 1.0 / math.sqrt(d)  # logits unchanged by zero-padding

    def padded(fn_d):
        def f(q, k, v):
            if fn_d == d:
                return flash_self_attention(q, k, v, scale)
            pad = [(0, 0), (0, 0), (0, 0), (0, fn_d - d)]
            out = flash_self_attention(
                jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad), scale
            )
            return out[..., :d]

        return f

    for target in (40, 64, 128):
        fn = padded(target)
        fwd = jax.jit(fn)
        grad = jax.jit(
            jax.grad(
                lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) * cot),
                (0, 1, 2),
            )
        )
        print(
            f"flash-pad  B{b} N{n} D{d}->{target}: fwd {_timeit(fwd, q, k, v, iters=iters):7.3f} ms"
            f"   fwd+bwd {_timeit(grad, q, k, v, iters=iters):7.3f} ms"
        )


def bench_gnconv(iters):
    """Fused GN+SiLU+3x3conv(+residual) kernel (kernels/gn_conv.py) vs the
    production unfused path (fused-GN stats kernel + split conv + residual)
    at the SDXL VAE encoder's live shapes (batch 1, bf16, forward-only —
    the VAE is never differentiated). The kernel's pitch is bandwidth:
    ~(1 read + 1 write) of HBM per conv instead of the apply/conv/residual
    passes XLA schedules."""
    import numpy as np

    from stablekeypoints_tpu.kernels.gn_conv import (
        fused_gn_conv_supported,
        fused_gn_silu_conv3x3,
    )
    from stablekeypoints_tpu.kernels.groupnorm import fused_group_norm, gn_affine_coeffs
    from stablekeypoints_tpu.ops.convsplit import conv3x3_spatial_split

    rng = np.random.default_rng(7)
    shapes = [  # (H, W, Cin, Cout, residual) — SDXL encoder levels at 1024^2
        (1024, 1024, 128, 128, True),
        (512, 512, 128, 256, False),   # conv1 of the channel-change block
        (512, 512, 256, 256, True),
        (256, 256, 256, 512, False),
        (256, 256, 512, 512, True),
        (128, 128, 512, 512, True),
    ]
    if os.environ.get("GNCONV_ALL_BACKBONES", "0") == "1":
        shapes += [  # sd21 768^2 levels (w%8 relaxation admits 192/96) ...
            (768, 768, 128, 128, True),
            (384, 384, 128, 256, False),
            (384, 384, 256, 256, True),
            (192, 192, 256, 512, False),
            (192, 192, 512, 512, True),
            (96, 96, 512, 512, True),
            # ... and sd15 512^2 levels (64^2 likewise)
            (512, 512, 128, 128, True),
            (256, 256, 128, 256, False),
            (256, 256, 256, 256, True),
            (128, 128, 256, 512, False),
            (64, 64, 512, 512, True),
        ]
    for hh, ww, cin, cout, with_res in shapes:
        x = jnp.asarray(rng.normal(0, 1, (1, hh, ww, cin)), jnp.bfloat16)
        scale = jnp.asarray(rng.normal(1, 0.2, (cin,)), jnp.float32)
        bias = jnp.asarray(rng.normal(0, 0.2, (cin,)), jnp.float32)
        kern = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)), jnp.float32)
        cb = jnp.asarray(rng.normal(0, 0.05, (cout,)), jnp.float32)
        res = (
            jnp.asarray(rng.normal(0, 1, (1, hh, ww, cout)), jnp.bfloat16)
            if with_res
            else None
        )

        def unfused(x, res):
            h = fused_group_norm(x, scale, bias, 32, 1e-6, "silu")
            y = conv3x3_spatial_split(
                h, kern.astype(h.dtype), 1, (1, 1), (1, 1), preferred_element_type=None
            ).astype(h.dtype) + cb.astype(h.dtype)
            return res + y if res is not None else y

        def fused(x, res):
            m, a, b = gn_affine_coeffs(x, scale, bias, 32, 1e-6, False)
            return fused_gn_silu_conv3x3(x, m, a, b, kern, cb, residual=res)

        args = (x, res) if with_res else (x, None)
        sup = fused_gn_conv_supported(hh, ww, cin, cout, has_res=with_res)
        t_un = _timeit(jax.jit(unfused), *args, iters=iters)
        t_fu = _timeit(jax.jit(fused), *args, iters=iters) if sup else float("nan")
        # exactness check rides along (<= 1 bf16 ulp of the unfused path)
        if sup:
            d = float(
                jnp.abs(
                    jax.jit(fused)(*args).astype(jnp.float32)
                    - jax.jit(unfused)(*args).astype(jnp.float32)
                ).max()
            )
        else:
            d = float("nan")
        print(
            f"gnconv H{hh} W{ww} {cin}->{cout} res={int(with_res)}: "
            f"unfused {t_un:7.3f} ms   fused {t_fu:7.3f} ms   maxdiff {d:.4f}"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--which", default="capture,cross,flash")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}")
    which = set(args.which.split(","))
    if "capture" in which:
        bench_capture(args.iters)
    if "cross" in which:
        bench_cross(args.iters)
    if "flash" in which:
        bench_flash(args.iters)
    if "pad" in which:
        bench_pad(args.iters)
    if "gnconv" in which:
        bench_gnconv(args.iters)


if __name__ == "__main__":
    main()
