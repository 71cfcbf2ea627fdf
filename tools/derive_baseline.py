"""Derive same-shape A100 reference baselines for sd15 / sd21 / sdxl.

The reference publishes no numbers and cannot run here (no CUDA), so the
`vs_baseline` denominators are DERIVED. Round 3's reviewed sd15 derivation
(BASELINE.md "A100 reference derivation") anchored on the XLA cost analysis
of our own compiled step; this tool extends that methodology to every
(backbone x mode) cell so no matrix row divides by an SD-1.5 analog:

  1. Compile our train/forward/encode programs with every TPU-side
     optimization OFF — einsum attention (no Pallas), no up-path
     truncation, remat off (the reference's torch stores activations),
     fp32 flop counts are dtype-independent. COMPILE-ONLY: the programs
     are never executed, so memory does not constrain the einsum path.
  2. Read total FLOPs from `compiled.cost_analysis()` and split
     convolution vs matmul FLOPs by parsing the optimized HLO
     (`convolution` / `dot` instructions with their shapes — exact, not
     estimated; elementwise flops are left in "other").
  3. Add the reference-only extras our programs don't run: the untruncated
     up-path tail is included by compiling with truncate=False; the
     project-at-128^2 capture (ptp_utils.py:519-526 re-projects q on the
     bicubic-upsampled hidden states; we project at source resolution and
     upsample the queries — a linear commute) is added analytically per
     captured layer: (2*R^2*C^2 - 2*s^2*C^2) matmul FLOPs, x3 for
     fwd+bwd on train, x1 on eval views.
  4. Price on A100: matmuls at true fp32 (torch>=1.12 defaults
     `matmul.allow_tf32=False`, the reference sets no precision flags —
     19.5 TF/s peak), convs at TF32 (`cudnn.allow_tf32` defaults True —
     156 TF/s peak), 30-40% utilization band (torch eager, small batch),
     plus the host-synced overhead model: per micro-step FPS greedy loop +
     top-k sort + dataloader + DataParallel dispatch + re-hook = 30-60 ms
     (train); per-view chunk syncs + 512^2-map upsample/inverse-warp
     traffic scaled by pixel count (eval, eval.py:239-266).

Usage (on the TPU host):
  python tools/derive_baseline.py --model sd15          # one backbone
  python tools/derive_baseline.py --all                 # all three
  python tools/derive_baseline.py --report              # render from JSON

Writes/updates baseline_derivation.json at the repo root.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_JSON = os.path.join(REPO, "baseline_derivation.json")

# A100 rate model (see module docstring; BASELINE.md round-3 derivation)
A100_FP32_TFLOPS = 19.5  # CUDA-core fp32 (matmul path, allow_tf32=False)
A100_TF32_TFLOPS = 156.0  # tensor-core TF32 (cudnn conv path)
UTIL_BAND = (0.30, 0.40)  # torch eager utilization band
HOST_MS_PER_MICROSTEP = (30.0, 60.0)  # FPS loop + sort + loader + re-hook
# eval: 10 chunked view dispatches with a host sync each (eval.py:239) +
# the selected-map upsample-to-image + inverse grid_sample traffic, scaled
# by pixels from the 512^2 estimate (0.1-0.2 s)
EVAL_SYNC_S = (0.3, 0.6)
EVAL_TRAFFIC_512_S = (0.1, 0.2)

BENCH_SHAPES = {  # model -> (train batch, image size)
    "sd15": (4, 512),
    "sd21": (2, 768),
    "sdxl": (1, 1024),
}

_SHAPE_RE = re.compile(r"(?:f|bf|s|u|pred)[\d]*\[([\d,]*)\]")


def _dims(shape_str: str) -> list[int]:
    return [int(x) for x in shape_str.split(",") if x] if shape_str else []


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= x
    return out


_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?(%[\w.\-]+)\s*=\s*(.+)$")
_OPERAND_RE = re.compile(r"(%[\w.\-]+)|((?:f|bf|s|u|pred|c)[\d]*\[[\d,]*\])")


def hlo_conv_dot_flops(hlo_text: str) -> tuple[float, float]:
    """Exact convolution / dot FLOPs (fma=2) from optimized HLO text.

    Counts every `convolution` and `dot` instruction, including those
    inside fusion computation bodies (fusion call sites don't repeat
    them). Operands are printed by NAME in optimized HLO, so result
    shapes are tracked per computation and looked up; a global map is
    the fallback for cross-computation references.
    """
    conv = 0.0
    dot = 0.0
    local: dict[str, list[int]] = {}
    global_shapes: dict[str, list[int]] = {}

    def op_dims(tok_name, tok_shape):
        if tok_shape:
            mm = _SHAPE_RE.search(tok_shape)
            return _dims(mm.group(1)) if mm else None
        return local.get(tok_name, global_shapes.get(tok_name))

    for line in hlo_text.splitlines():
        if line.endswith("{") and "=" not in line:
            local = {}  # new computation scope
            # record parameter shapes from the signature line
            for pm in re.finditer(r"(%?[\w.\-]+):\s*(?:f|bf|s|u|pred|c)[\d]*\[([\d,]*)\]", line):
                name = pm.group(1)
                if not name.startswith("%"):
                    name = "%" + name
                local[name] = _dims(pm.group(2))
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, rhs = m.group(1), m.group(2)
        sm = _SHAPE_RE.search(rhs)
        if sm:
            local[name] = global_shapes[name] = _dims(sm.group(1))
        call = re.search(r"\b(convolution|dot)\((.*?)\)", rhs)
        if call is None:
            continue
        kind, inner = call.group(1), call.group(2)
        operands = []
        for om in _OPERAND_RE.finditer(inner):
            operands.append(op_dims(om.group(1), om.group(2)))
        # drop None-resolution duplicates: tokens come in (name|shape) pairs
        # only when types are printed inline; normally names only
        operands = [o for o in operands if o is not None]
        if len(operands) < 2:
            continue
        if kind == "convolution":
            out_dims = local.get(name)
            kern = operands[1]
            dl = re.search(r"dim_labels=\S+?_([\w?]+?)->", rhs)
            if dl is None or not kern or out_dims is None:
                continue
            klab = dl.group(1)  # e.g. "01io" / "o01i"
            i_pos, o_pos = klab.index("i"), klab.index("o")
            spatial = [kern[j] for j in range(len(kern)) if j not in (i_pos, o_pos)]
            kin = kern[i_pos]
            conv += 2.0 * _prod(out_dims) * _prod(spatial) * kin
        else:
            lhs, rhsh = operands[0], operands[1]

            def dimset(nm):
                mm = re.search(nm + r"=\{([\d,]*)\}", rhs)
                return [int(x) for x in mm.group(1).split(",") if x] if mm else []

            lb, lc = dimset("lhs_batch_dims"), dimset("lhs_contracting_dims")
            batch = _prod([lhs[d] for d in lb])
            contract = _prod([lhs[d] for d in lc])
            lfree = _prod([d for j, d in enumerate(lhs) if j not in lb + lc])
            rb, rc = dimset("rhs_batch_dims"), dimset("rhs_contracting_dims")
            rfree = _prod([d for j, d in enumerate(rhsh) if j not in rb + rc])
            dot += 2.0 * batch * lfree * rfree * contract
    return conv, dot


def captured_layers(unet_cfg, latent_hw: int) -> list[tuple[int, int]]:
    """Replicates the capture rule (models/unet.py UpBlock; reference
    ptp_utils.py:508-511): up-path cross-attn layers with seq <=
    capture_max_seq, first max_capture_layers in execution order.
    Returns [(channels, source_res), ...]."""
    ch = unet_cfg.block_channels
    rev_ch = tuple(reversed(ch))
    rev_attn = tuple(reversed(unet_cfg.attn_blocks))
    n = len(ch)
    r = latent_hw // (2 ** (n - 1))
    out: list[tuple[int, int]] = []
    for bi in range(n):
        if rev_attn[bi]:
            for _ in range(unet_cfg.layers_per_block + 1):
                if r * r <= unet_cfg.capture_max_seq and len(out) < unet_cfg.max_capture_layers:
                    out.append((rev_ch[bi], r))
        if bi < n - 1:
            r *= 2
    return out


def reproj_extra_flops(unet_cfg, latent_hw: int, capture_res: int) -> float:
    """Per image-forward, forward-only matmul FLOPs the reference spends
    re-projecting q at the upsampled resolution vs our source-res
    projection (ptp_utils.py:519-526 vs the linear commute)."""
    extra = 0.0
    for c, s in captured_layers(unet_cfg, latent_hw):
        extra += 2.0 * (capture_res**2 - s**2) * c * c
    return extra


def measure(model: str) -> dict:
    """Compile the reference-math programs ON THE CPU BACKEND and extract
    FLOP totals + conv/dot splits. Compile-only — nothing runs, so memory
    never constrains the einsum path. CPU is load-bearing for the SPLIT:
    TPU-optimized HLO rewrites every `dot` into dilated `convolution`
    tricks (verified empirically), which makes a conv-vs-matmul split
    unparseable there; CPU HLO keeps both ops in standard form, and FLOP
    counts are backend-independent."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.default_backend() == "cpu", (
        "run under JAX_PLATFORMS=cpu (PYTHONPATH= JAX_PLATFORMS=cpu "
        "python tools/derive_baseline.py ...): the conv/dot HLO split is "
        "only parseable from CPU-compiled HLO"
    )

    from stablekeypoints_tpu.config import Config
    from stablekeypoints_tpu.pipeline.runtime import Runtime
    from stablekeypoints_tpu.parallel import mesh as pmesh

    batch, size = BENCH_SHAPES[model]
    cfg = Config(
        dataset_name="synthetic",
        model_type=Config.model_type if model == "sd15" else model,
        image_size=size,
        num_tokens=500,
        batch_size=batch,
        dtype="bfloat16",
        # reference-math configuration: plain einsum attention, no kernels,
        # no remat (torch stores activations)
        flash_attention="off",
        pallas_capture="off",
        fused_groupnorm="off",
        remat="off",
    )
    rt = Runtime.create(cfg)

    def cost(lowered):
        comp = lowered.compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        text = comp.as_text()
        conv, dot = hlo_conv_dot_flops(text)
        return {"flops": float(ca["flops"]), "conv": conv, "dot": dot}

    context = rt.init_context()
    opt_state = rt.optimizer.init(context)
    key = jax.random.PRNGKey(0)
    images = jnp.zeros((batch, size, size, 3), jnp.float32)

    # (a) full train step, fill path (2B VAE encodes — the reference has no
    # latent cache, every step encodes orig + warped; optimize.py:349-375)
    fill = rt.train_step  # functools.partial(jitted, unet_params, vae_params)
    lowered = fill.func.lower(*fill.args, context, opt_state, images, key)
    step = cost(lowered)

    # (b) capture forward, truncated vs full (the reference runs the whole
    # up path even though stage 1 never reads eps)
    lat_hw = size // 8
    latents = jnp.zeros((1, lat_hw, lat_hw, 4), jnp.float32)
    tsteps = jnp.zeros((1,), jnp.int32)
    ctx1 = jnp.zeros((1, cfg.num_tokens, rt.unet.config.context_dim), jnp.float32)

    def fwd(truncate):
        def f(params, l, t, c):
            eps, caps = rt.unet.apply(
                {"params": params}, l, t, c,
                capture_res=cfg.feature_upsample_res, truncate=truncate,
            )
            out = [cc.astype(jnp.float32) for cc in caps]
            if eps is not None:
                # eps must be RETURNED or jax/XLA dead-code-eliminates the
                # post-capture tail this variant exists to price
                out.append(eps)
            return out

        return cost(jax.jit(f, static_argnums=()).lower(rt.unet_params, latents, tsteps, ctx1))

    fwd_trunc = fwd(True)
    fwd_full = fwd(False)

    # (c) one VAE encode (pure conv + one tiny bottleneck attention)
    enc = rt.encode_images_fn
    img1 = jnp.zeros((1, size, size, 3), jnp.float32)
    encode = cost(enc.func.lower(*enc.args, img1))

    reproj = reproj_extra_flops(rt.unet.config, lat_hw, cfg.feature_upsample_res)
    caps = captured_layers(rt.unet.config, lat_hw)

    return {
        "model": model,
        "batch": batch,
        "image_size": size,
        "step_fill": step,
        "fwd_trunc": fwd_trunc,
        "fwd_full": fwd_full,
        "encode_1": encode,
        "captured_layers": caps,
        "reproj_extra_fwd_flops": reproj,
        "device": str(jax.devices()[0].device_kind),
    }


def derive(meas: dict) -> dict:
    """Assemble the A100 estimate from the measured components."""
    b = meas["batch"]
    size = meas["image_size"]
    n_fwd = 2 * b  # image-forwards per optimizer step (orig + warped, B micro-steps)

    # ---- train ----
    # reference step = our fill step (einsum math, untruncated already? NO:
    # our fill step truncates) + the up-path tail our truncation skips
    # (forward only — autograd never traverses past the last captured map)
    # + the project-at-128^2 capture extra (x3: fwd + 2 bwd matmuls).
    tail = {
        k: meas["fwd_full"][k] - meas["fwd_trunc"][k] for k in ("flops", "conv", "dot")
    }
    reproj3 = 3.0 * meas["reproj_extra_fwd_flops"]
    total = meas["step_fill"]["flops"] + n_fwd * (tail["flops"] + reproj3)
    conv = meas["step_fill"]["conv"] + n_fwd * tail["conv"]
    dot = meas["step_fill"]["dot"] + n_fwd * (tail["dot"] + reproj3)
    other = max(total - conv - dot, 0.0)  # elementwise/softmax/norms

    def a100_seconds(conv_f, dot_f, other_f, util):
        # elementwise ops ride the fp32 CUDA-core path (bandwidth-bound in
        # practice; pricing them at the fp32 rate is charitable to the ref)
        t_conv = conv_f / (A100_TF32_TFLOPS * 1e12 * util)
        t_mm = (dot_f + other_f) / (A100_FP32_TFLOPS * 1e12 * util)
        return t_conv + t_mm

    lo = a100_seconds(conv, dot, other, UTIL_BAND[1]) + b * HOST_MS_PER_MICROSTEP[0] / 1e3
    hi = a100_seconds(conv, dot, other, UTIL_BAND[0]) + b * HOST_MS_PER_MICROSTEP[1] / 1e3
    train_sps = (1.0 / hi, 1.0 / lo)
    train_center = round((train_sps[0] + train_sps[1]) / 2, 2)

    # ---- detect ----
    # per view: VAE encode + full capture forward + reproj (fwd only);
    # 10 views per image, serial in chunks with a host sync each
    # (eval.py:239-266), + map upsample/inverse-warp traffic scaled by
    # pixels from the 512^2 estimate.
    vconv = meas["encode_1"]["conv"] + meas["fwd_full"]["conv"]
    vdot = meas["encode_1"]["dot"] + meas["fwd_full"]["dot"] + meas["reproj_extra_fwd_flops"]
    vother = max(
        meas["encode_1"]["flops"] + meas["fwd_full"]["flops"] - vconv - vdot
        + meas["reproj_extra_fwd_flops"] * 0.0,
        0.0,
    )
    scale = (size / 512.0) ** 2
    d_lo = (
        10 * a100_seconds(vconv, vdot, vother, UTIL_BAND[1])
        + EVAL_SYNC_S[0]
        + EVAL_TRAFFIC_512_S[0] * scale
    )
    d_hi = (
        10 * a100_seconds(vconv, vdot, vother, UTIL_BAND[0])
        + EVAL_SYNC_S[1]
        + EVAL_TRAFFIC_512_S[1] * scale
    )
    detect_center = round((d_lo + d_hi) / 2, 2)

    return {
        "model": meas["model"],
        "train": {
            "ref_tflop_per_step": round(total / 1e12, 2),
            "conv_tflop": round(conv / 1e12, 2),
            "dot_tflop": round(dot / 1e12, 2),
            "other_tflop": round(other / 1e12, 2),
            "a100_seconds_per_step": [round(lo, 2), round(hi, 2)],
            "a100_steps_per_sec": [round(train_sps[0], 3), round(train_sps[1], 3)],
            "denominator_steps_per_sec": train_center,
        },
        "detect": {
            "view_tflop": round((vconv + vdot + vother) / 1e12, 3),
            "a100_seconds_per_image": [round(d_lo, 2), round(d_hi, 2)],
            "denominator_seconds_per_image": detect_center,
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=sorted(BENCH_SHAPES))
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args()

    data = {}
    if os.path.exists(OUT_JSON):
        with open(OUT_JSON) as f:
            data = json.load(f)

    models = sorted(BENCH_SHAPES) if args.all else ([args.model] if args.model else [])
    for model in models:
        print(f"== measuring {model} (compile-only) ==", flush=True)
        meas = measure(model)
        data[model] = {"measured": meas, "derived": derive(meas)}
        with open(OUT_JSON, "w") as f:
            json.dump(data, f, indent=1)
        print(json.dumps(data[model]["derived"], indent=1))

    if args.report or not models:
        for model, entry in sorted(data.items()):
            d = entry["derived"]
            print(
                f"{model}: train {d['train']['denominator_steps_per_sec']} steps/s "
                f"({d['train']['ref_tflop_per_step']} TFLOP: "
                f"{d['train']['conv_tflop']} conv / {d['train']['dot_tflop']} dot / "
                f"{d['train']['other_tflop']} other), "
                f"detect {d['detect']['denominator_seconds_per_image']} s/image"
            )


if __name__ == "__main__":
    main()
