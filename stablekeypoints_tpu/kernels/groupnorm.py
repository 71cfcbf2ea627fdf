"""Pallas TPU kernel: fused GroupNorm(+SiLU) for bandwidth-bound stages.

The VAE encoder's 512^2 stages are pure HBM traffic: XLA lowers the fp32
GroupNorm as a materialized fp32 upcast plus separate mean/variance
reduction passes (~6 full-tensor HBM passes per norm). This kernel does it
in two bf16 passes:

  pass 1 (stats): one read  — per-(batch, channel) sum and sum-of-squares,
                  fp32 accumulated across spatial tiles in VMEM.
  glue (jnp)    : tiny [B, C] math — group mean/var, rsqrt, folded into
                  per-(batch, channel) affine coefficients.
  apply (jnp)   : one read + one write — y = silu(x * a + b) as a single
                  XLA elementwise fusion whose output layout the consumer
                  conv controls (a pallas apply pinned the layout and
                  doubled the adjacent convs' time).

Variance uses the shifted sum-of-squares identity: the first spatial tile's
per-channel mean is used as a shift, so the accumulated sums are centered
and the E[x^2] - E[x]^2 cancellation that plagues the naive identity never
materializes (asserted against the exact two-pass formula in tests,
including at mean/std ratios of 60).

Used by the VAE (both encode and decode paths are never differentiated —
the embedding gradient does not flow through the VAE, optimize.py:357 /
ptp_utils.py:289-304) but carries a custom_vjp whose backward recomputes
through the exact jnp formulation, so it is safe anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_group_norm", "fused_group_norm_supported"]


def _spatial_tile(hw: int, c: int) -> int:
    budget = 2 * 1024 * 1024  # bytes of x tile in VMEM (bf16)
    for ts in (2048, 1024, 512, 256, 128, 8):
        if hw % ts == 0 and ts * c * 2 <= budget:
            return ts
    return hw


def fused_group_norm_supported(
    hw: int, c: int, groups: int, interpret: bool = False
) -> bool:
    """The lane constraint (c % 128) is a hardware tiling concern; interpret
    mode (virtual CPU meshes, the multichip dryrun) runs any aligned shape,
    so the dryrun genuinely exercises the kernel + shard_map path."""
    if c % groups != 0 or hw % 8 != 0:
        return False
    return interpret or c % 128 == 0


def _stats_kernel(x_ref, out_ref):
    xt = x_ref[0].astype(jnp.float32)  # [ts, C]

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])
        # first tile's per-channel mean = the shift (grid steps for a given
        # batch run sequentially, so later tiles read it back from the
        # VMEM-resident output block)
        out_ref[0, 2] = jnp.mean(xt, axis=0)

    xc = xt - out_ref[0, 2]
    out_ref[0, 0] += jnp.sum(xc, axis=0)
    out_ref[0, 1] += jnp.sum(xc * xc, axis=0)


def gn_affine_coeffs(x, scale, bias, groups, eps, interpret, mesh=None):
    """Pallas-stats GroupNorm folded into per-(batch, channel) affine
    coefficients, WITHOUT applying them: returns (m_q, a, b_comp), all
    [B, C] fp32, such that `(x - m_q)*a + b_comp` in x.dtype equals
    GroupNorm(x)*scale+bias with the compensated center-first rounding
    documented in `_fused_impl`. m_q already holds the x.dtype-rounded
    mean (round once here, not at every consumer). Differentiable: a
    custom VJP recomputes through the jnp coefficient path, so consumers
    (the GN+SiLU+conv kernel's own VJP backprops into m/a/b) stay safe.

    mesh: shard_map with batch on 'data' on multi-device meshes (GN stats
    are per batch element, so batch sharding is exact)."""
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import PartitionSpec as P

        n_data = mesh.shape.get("data", 1)
        if x.shape[0] % n_data == 0:
            return jax.shard_map(
                lambda xs, s, bb: _coeffs_core(xs, s, bb, groups, eps, interpret),
                mesh=mesh,
                in_specs=(P("data", None, None, None), P(), P()),
                out_specs=(P("data", None), P("data", None), P("data", None)),
                check_vma=False,
            )(x, scale, bias)
    return _coeffs_core(x, scale, bias, groups, eps, interpret)


def _coeffs_impl(x, scale, bias, groups, eps, interpret):
    b, h, w, c = x.shape
    hw = h * w
    cg = c // groups
    xf = x.reshape(b, hw, c)
    ts = _spatial_tile(hw, c)

    sums = pl.pallas_call(
        _stats_kernel,
        grid=(b, hw // ts),
        in_specs=[pl.BlockSpec((1, ts, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, c), jnp.float32),
        interpret=interpret,
    )(xf)

    # reconstruct group stats from per-channel shifted sums:
    #   s0_c = sum_s (x - ref_c),  s1_c = sum_s (x - ref_c)^2
    #   sum_c sum_s (x - mu_g)^2
    #     = sum_c [ s1_c - 2 (mu_g - ref_c) s0_c + hw (mu_g - ref_c)^2 ]
    n = hw * cg
    s0 = sums[:, 0].reshape(b, groups, cg)
    s1 = sums[:, 1].reshape(b, groups, cg)
    ref = sums[:, 2].reshape(b, groups, cg)
    mean = (s0.sum(-1) + hw * ref.sum(-1)) / n  # [B, G]
    dmu = mean[:, :, None] - ref  # [B, G, cg]
    ss = (s1 - 2.0 * dmu * s0 + hw * dmu * dmu).sum(-1)
    var = jnp.maximum(ss / n, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    inv_c = jnp.repeat(inv, cg, axis=1)  # [B, C]
    mean_c = jnp.repeat(mean, cg, axis=1)
    a = inv_c * scale.astype(jnp.float32)[None]
    m_q = mean_c.astype(x.dtype).astype(jnp.float32)  # the value actually subtracted
    # (x - m_q)·a + b_comp == (x - mean)·a + bias exactly, in fp32 terms
    b_comp = bias.astype(jnp.float32)[None] + (m_q - mean_c) * a  # [B, C]
    return m_q, a, b_comp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _coeffs_core(x, scale, bias, groups, eps, interpret):
    return _coeffs_impl(x, scale, bias, groups, eps, interpret)


def _coeffs_fwd(x, scale, bias, groups, eps, interpret):
    return _coeffs_impl(x, scale, bias, groups, eps, interpret), (x, scale, bias)


def _coeffs_bwd(groups, eps, interpret, res, g):
    # recompute through the jnp coefficient path (same math, no pallas —
    # the stats kernel has no autodiff rule)
    from stablekeypoints_tpu.models.layers import _group_norm_coeffs

    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda *t: _group_norm_coeffs(*t, groups, eps), x, scale, bias
    )
    return vjp(g)


_coeffs_core.defvjp(_coeffs_fwd, _coeffs_bwd)


def _fused_impl(x, scale, bias, groups, eps, act, interpret):
    m_q, a, b_comp = gn_affine_coeffs(x, scale, bias, groups, eps, interpret)

    # the APPLY stays in jnp: XLA fuses the (x-mean)*a+bias(+silu) into one
    # elementwise pass, and — unlike a custom-call result — that fusion's
    # output can adopt the consumer conv's preferred layout (a pallas apply
    # measurably doubled the adjacent VAE convs' time). It runs in x.dtype:
    # the per-channel mean/affine are computed in fp32 above and rounded
    # once per [B, C] — at 1024^2 XLA materialized the x->fp32 convert as a
    # standalone 19 ms op per layer instead of fusing it (SDXL profile,
    # STATUS round 3), and the surrounding VAE already computes in bf16
    # (this VAE path is forward-only; the VJP uses the exact jnp reference).
    # CENTER-FIRST form, not x*a + (bias - mean*a): with a high-mean channel
    # the folded form's x*a intermediate is O(mean/std) and its bf16
    # rounding survives the cancellation against bc (measured 0.68 absolute
    # at mean 30 / std 0.5); centering keeps every intermediate O(1). The
    # subtracted mean is itself rounded to x.dtype — its rounding residue
    # (up to half an input ulp, x1/std after scaling) is COMPENSATED into
    # the bias in fp32, so the remaining error is product-rounding only
    # (x - m_q is exact by Sterbenz for x within 2x of the mean).
    y = (x - m_q.astype(x.dtype)[:, None, None, :]) * a.astype(x.dtype)[
        :, None, None, :
    ] + b_comp.astype(x.dtype)[:, None, None, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_core(x, scale, bias, groups, eps, act, interpret):
    return _fused_impl(x, scale, bias, groups, eps, act, interpret)


def _jnp_reference(x, scale, bias, groups, eps, act):
    # exact formulation (models.layers._group_norm), used only for the VJP
    from stablekeypoints_tpu.models.layers import _group_norm

    return _group_norm(x, scale, bias, groups, eps, act)


def _fused_fwd(x, scale, bias, groups, eps, act, interpret):
    return _fused_impl(x, scale, bias, groups, eps, act, interpret), (x, scale, bias)


def _fused_bwd(groups, eps, act, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda *a: _jnp_reference(*a, groups, eps, act), x, scale, bias)
    return vjp(g)


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def fused_group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int = 32,
    eps: float = 1e-5,
    act: str | None = None,
    interpret: bool = False,
    mesh=None,
):
    """x [B, H, W, C] -> GroupNorm(x)*scale+bias (+SiLU), in x.dtype.

    mesh: on multi-device meshes the kernel runs under shard_map with the
    batch on 'data' (pallas_call is opaque to GSPMD); scale/bias replicated.
    Falls back to shard_map-free call on 1-device meshes.
    """
    act = act or "none"
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import PartitionSpec as P

        n_data = mesh.shape.get("data", 1)
        if x.shape[0] % n_data == 0:
            return jax.shard_map(
                lambda xs, s, bb: _fused_core(xs, s, bb, groups, eps, act, interpret),
                mesh=mesh,
                in_specs=(P("data", None, None, None), P(), P()),
                out_specs=P("data", None, None, None),
                check_vma=False,
            )(x, scale, bias)
    return _fused_core(x, scale, bias, groups, eps, act, interpret)
