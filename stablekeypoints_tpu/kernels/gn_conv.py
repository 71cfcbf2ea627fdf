"""Pallas TPU kernel: fused GroupNorm-affine + SiLU + 3x3 conv (+residual).

The SDXL VAE encoder at 1024^2 is the framework's weakest cell (BENCH_MATRIX
round 4): each resblock is GN -> SiLU -> conv -> GN -> SiLU -> conv -> +res
over 268 MB (bf16) activation tensors, and the GN apply / residual add each
cost a full HBM read+write pass that XLA schedules well below streaming
bandwidth at this shape (STATUS rounds 2-4). This kernel collapses
apply + SiLU + 3x3 conv + bias + residual-add into ONE pass: per
(batch, row-block) Mosaic pipelines in a ts-row block of the raw input plus
its 2 pre-gathered halo rows, applies the precomputed per-(batch, channel)
GN affine and SiLU in VMEM, runs the 3x3 conv as 9 shifted
[ts*W, Cin] x [Cin, Cout] MXU matmuls with fp32 accumulation, and writes the
bf16 output block — ~one read + one write of HBM per conv layer instead of
five+.

Halo rows ride as a standard block-indexed input (gathered once in XLA as
`halos[b, j] = x[b, (j*ts-1, j*ts+ts)]`, an extra 2/ts read+write of x)
instead of a manual in-kernel DMA: this keeps the kernel on Mosaic's
automatic double-buffered pipeline (the DMA variant serializes slab fetch
against compute) and keeps plain `interpret=True` usable on CPU meshes
(the DMA-semaphore interpreter deadlocks / needs the minutes-slow
TPU-semantics interpreter).

GN statistics stay global: callers obtain (m_q, a, b_comp) from
`kernels.groupnorm.gn_affine_coeffs` (the existing one-read Pallas stats
kernel + fp32 glue) and this kernel consumes them, reproducing the fused-GN
apply's compensated center-first bf16 numerics to <= 1 bf16 ulp (same ops
in the same dtype; XLA's fusion emitter keeps wider intermediates than
per-op rounding, so cross-context bit equality is not a defined property),
then the conv in bf16 with fp32 accumulation like the XLA conv it replaces.

Zero-padding semantics match the reference conv (torch Conv2d padding=1 on
the NORMALIZED tensor, i.e. the pad ring is 0 *after* GN+SiLU — reference
resblock: diffusers' ResnetBlock2D used by the frozen VAE,
ptp_utils.py:289-304): halo rows are normalized like any interior row, and
the pad ring is written as zeros explicitly.

Forward-only by design (the VAE is never differentiated — the embedding
gradient does not flow through image2latent, optimize.py:357); a custom_vjp
recomputes through the exact jnp composition so the kernel is still safe
anywhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_gn_silu_conv3x3", "fused_gn_conv_supported"]

_VMEM_BUDGET = 13 * 1024 * 1024  # leave headroom under the ~16 MB scoped limit

# shapes where the kernel MEASURED slower than the unfused path on-chip
# (1xv5e, 20 iters, tools/kernel_microbench.py --which gnconv with
# GNCONV_ALL_BACKBONES=1): deep 512-channel levels at w in {96, 192} where
# conv FLOPs dominate, XLA's conv is already efficient, and the small row
# tiles the VMEM budget forces (ts<=4) pay more grid/halo overhead than the
# saved HBM passes. Every other live encoder shape of sd15/sd21/sdxl wins.
_MEASURED_SLOWER = frozenset({
    (192, 192, 512, 512),
    (96, 96, 512, 512),
})


def _pick_ts(
    h: int, w: int, cin: int, cout: int, itemsize: int = 2, has_res: bool = True
) -> int:
    """Rows per output block: largest ts dividing h whose working set fits
    the budget — pipelined in/halo/out/res blocks double-buffered, ns
    scratch, fp32 accumulator, weights (constant index map -> Mosaic keeps
    ONE resident copy, verified empirically: 256^2x512ch compiles and wins
    at ts=2 where a double-counted model said it could not), one live
    temporary. The residual counts only when fused."""
    for ts in (32, 16, 8, 4, 2):
        if h % ts != 0:
            continue
        xin = 2 * ts * w * cin * itemsize          # pipelined input block
        halo = 2 * 2 * w * cin * itemsize          # pipelined halo block
        ns = (ts + 2) * (w + 2) * cin * itemsize   # normalized+padded scratch
        out = 2 * ts * w * cout * itemsize         # pipelined output block
        res = (2 * ts * w * cout * itemsize) if has_res else 0
        acc = ts * w * cout * 4                    # fp32 accumulator value
        wts = 9 * cin * cout * itemsize            # resident weights (x1)
        tmp = ts * w * cin * itemsize              # one live norm/window temp
        if xin + halo + ns + out + res + acc + wts + tmp <= _VMEM_BUDGET:
            return ts
    return 0


def fused_gn_conv_supported(
    h: int,
    w: int,
    cin: int,
    cout: int,
    stride: int = 1,
    interpret: bool = False,
    has_res: bool = True,
) -> bool:
    """Stride-1 3x3 convs whose channels are lane-aligned and whose working
    set fits VMEM. Interpret mode (CPU tests, the multichip dryrun) relaxes
    only the alignment gates — the geometry gates are semantic.

    Block shapes put (w, c) in the tiled last-two dims, so Mosaic needs
    w % 8 and c % 128 — NOT w % 128 (the first gate over-required it;
    relaxing admits sd21's 192^2/96^2 encoder levels and the 64^2 level of
    the 512^2 encoders; probed on-chip before adoption, see BENCH/STATUS)."""
    if stride != 1 or h < 8 or w < 8:
        return False
    if not interpret and (cin % 128 != 0 or cout % 128 != 0 or w % 8 != 0):
        return False
    if not interpret and (h, w, cin, cout) in _MEASURED_SLOWER:
        return False
    # experimental override for tools/encoder_ablation.py: fuse only levels
    # with at least this many pixels (trace-time; unset = no constraint)
    min_area = int(os.environ.get("GNCONV_MIN_AREA", "0"))
    if not interpret and h * w < min_area:
        return False
    return _pick_ts(h, w, cin, cout, has_res=has_res) > 0


def _kernel(nblocks, ts, has_res, m_ref, a_ref, b_ref, w_ref, cb_ref, *refs):
    if has_res:
        x_ref, h_ref, res_ref, y_ref, ns = refs
    else:
        x_ref, h_ref, y_ref, ns = refs
        res_ref = None
    i = pl.program_id(0)
    j = pl.program_id(1)
    w = y_ref.shape[2]
    cout = y_ref.shape[3]
    cin = x_ref.shape[3]

    # --- GN affine + SiLU in input dtype (== fused_group_norm apply) -----
    # m/a/b ride as one full [B, C] block (a (1, C) slice is an illegal
    # Mosaic block shape when B > 1: second-to-last dim must divide by 8 or
    # equal B) and the batch row is picked by program id.
    dt = x_ref.dtype
    m = m_ref[i].astype(dt)   # [C] — m_q: the x.dtype-rounded mean
    a = a_ref[i].astype(dt)
    b = b_ref[i].astype(dt)

    def norm(t):  # [r, w, c] -> normalized + SiLU
        t = (t - m[None, None, :]) * a[None, None, :] + b[None, None, :]
        # sigmoid explicitly in f32 rounded back to t.dtype: Mosaic's bf16
        # logistic lowering miscompiles (f32 scalar broadcast into a bf16
        # vector, verification error); XLA's own bf16 logistic is the same
        # upcast-compute-round sequence, so numerics are unchanged
        s = jax.nn.sigmoid(t.astype(jnp.float32)).astype(t.dtype)
        return t * s

    ns[1 : ts + 1, 1 : w + 1, :] = norm(x_ref[0])
    ns[0:1, 1 : w + 1, :] = norm(h_ref[0, 0, 0:1])
    ns[ts + 1 : ts + 2, 1 : w + 1, :] = norm(h_ref[0, 0, 1:2])
    # zero pad ring (pad-after-normalize, the conv's padding=1 semantics)
    zero_col = jnp.zeros((ts + 2, 1, cin), dt)
    ns[:, 0:1, :] = zero_col
    ns[:, w + 1 : w + 2, :] = zero_col
    zero_row = jnp.zeros((1, w + 2, cin), dt)

    @pl.when(j == 0)
    def _():
        ns[0:1] = zero_row

    @pl.when(j == nblocks - 1)
    def _():
        ns[ts + 1 : ts + 2] = zero_row

    # --- 3x3 conv: 9 shifted matmuls, fp32 accumulation ------------------
    acc = jnp.zeros((ts * w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = ns[dy : dy + ts, dx : dx + w, :].reshape(ts * w, cin)
            acc = acc + jax.lax.dot(
                win, w_ref[dy * 3 + dx], preferred_element_type=jnp.float32
            )
    out = acc.reshape(ts, w, cout).astype(y_ref.dtype) + cb_ref[0][None, None, :].astype(
        y_ref.dtype
    )
    if res_ref is not None:
        out = res_ref[0] + out
    y_ref[0] = out


def _jnp_reference(x, m, a, b, kernel, conv_bias, residual):
    """Exact composition the kernel implements (also the VJP's primal)."""
    dt = x.dtype
    t = (x - m.astype(dt)[:, None, None, :]) * a.astype(dt)[:, None, None, :] + b.astype(
        dt
    )[:, None, None, :]
    # sigmoid in f32 rounded back (matches the kernel, which cannot use the
    # bf16 logistic — Mosaic miscompiles it; see _kernel.norm). Within one
    # bf16 ulp of XLA's own bf16 logistic.
    t = t * jax.nn.sigmoid(t.astype(jnp.float32)).astype(dt)
    y = jax.lax.conv_general_dilated(
        t, kernel.astype(dt), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y.astype(dt) + conv_bias.astype(dt)
    if residual is not None:
        y = residual + y
    return y


def _impl(x, m, a, b, kernel, conv_bias, residual, interpret):
    bsz, h, w, cin = x.shape
    cout = kernel.shape[-1]
    ts = _pick_ts(
        h, w, cin, cout, jnp.dtype(x.dtype).itemsize, has_res=residual is not None
    )
    if ts == 0:
        # gate passed on bf16 sizing but the runtime dtype is wider (fp32
        # CPU tests): the defining composition is the correct fallback
        return _jnp_reference(x, m, a, b, kernel, conv_bias, residual)
    nblocks = h // ts
    w9 = kernel.astype(x.dtype).reshape(9, cin, cout)
    cb = conv_bias.astype(jnp.float32).reshape(1, cout)
    has_res = residual is not None

    # halo rows per block, gathered once in XLA (strided slices; for block
    # j the rows j*ts-1 and j*ts+ts — edge values are overwritten with the
    # zero pad ring inside the kernel, so the clamped indices never leak)
    idx_top = np.maximum(np.arange(nblocks) * ts - 1, 0)
    idx_bot = np.minimum(np.arange(nblocks) * ts + ts, h - 1)
    halos = jnp.stack([x[:, idx_top], x[:, idx_bot]], axis=2)  # [B, nb, 2, W, C]

    in_specs = [
        pl.BlockSpec((bsz, cin), lambda i, j: (0, 0), memory_space=pltpu.VMEM),  # m
        pl.BlockSpec((bsz, cin), lambda i, j: (0, 0), memory_space=pltpu.VMEM),  # a
        pl.BlockSpec((bsz, cin), lambda i, j: (0, 0), memory_space=pltpu.VMEM),  # b
        pl.BlockSpec((9, cin, cout), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda i, j: (0, 0), memory_space=pltpu.VMEM),  # bias
        pl.BlockSpec((1, ts, w, cin), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 1, 2, w, cin), lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    args = [m, a, b, w9, cb, x, halos]
    if has_res:
        in_specs.append(
            pl.BlockSpec((1, ts, w, cout), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(residual)

    return pl.pallas_call(
        functools.partial(_kernel, nblocks, ts, has_res),
        grid=(bsz, nblocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, ts, w, cout), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((ts + 2, w + 2, cin), x.dtype),  # normalized + padded
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _core(x, m, a, b, kernel, conv_bias, residual, interpret):
    return _impl(x, m, a, b, kernel, conv_bias, residual, interpret)


def _fwd(x, m, a, b, kernel, conv_bias, residual, interpret):
    return _impl(x, m, a, b, kernel, conv_bias, residual, interpret), (
        x, m, a, b, kernel, conv_bias, residual,
    )


def _bwd(interpret, res, g):
    x, m, a, b, kernel, conv_bias, residual = res
    if residual is None:
        primal = lambda *t: _jnp_reference(*t, None)
        _, vjp = jax.vjp(primal, x, m, a, b, kernel, conv_bias)
        return (*vjp(g), None)
    _, vjp = jax.vjp(_jnp_reference, x, m, a, b, kernel, conv_bias, residual)
    return vjp(g)


_core.defvjp(_fwd, _bwd)


def fused_gn_silu_conv3x3(
    x: jnp.ndarray,            # [B, H, W, Cin]
    m: jnp.ndarray,            # [B, Cin] fp32 (x.dtype-rounded mean, gn_affine_coeffs)
    a: jnp.ndarray,            # [B, Cin] fp32
    b: jnp.ndarray,            # [B, Cin] fp32 (compensated bias)
    kernel: jnp.ndarray,       # [3, 3, Cin, Cout] (HWIO)
    conv_bias: jnp.ndarray,    # [Cout]
    residual: jnp.ndarray | None = None,  # [B, H, W, Cout], fused add
    interpret: bool = False,
    mesh=None,
) -> jnp.ndarray:
    """silu((x - m)*a + b) ⨂ kernel + conv_bias (+ residual), one HBM pass.

    mesh: on multi-device meshes runs under shard_map with batch on 'data'
    (pallas_call is opaque to GSPMD); coefficient rows shard with the batch.
    """
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import PartitionSpec as P

        n_data = mesh.shape.get("data", 1)
        if x.shape[0] % n_data == 0:
            spec4 = P("data", None, None, None)
            if residual is not None:
                return jax.shard_map(
                    lambda xs, ms, as_, bs, rs: _core(
                        xs, ms, as_, bs, kernel, conv_bias, rs, interpret
                    ),
                    mesh=mesh,
                    in_specs=(spec4, P("data", None), P("data", None), P("data", None), spec4),
                    out_specs=spec4,
                    check_vma=False,
                )(x, m, a, b, residual)
            return jax.shard_map(
                lambda xs, ms, as_, bs: _core(
                    xs, ms, as_, bs, kernel, conv_bias, None, interpret
                ),
                mesh=mesh,
                in_specs=(spec4, P("data", None), P("data", None), P("data", None)),
                out_specs=spec4,
                check_vma=False,
            )(x, m, a, b)
    return _core(x, m, a, b, kernel, conv_bias, residual, interpret)
