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


if __name__ == "__main__":
    main()
