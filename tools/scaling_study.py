"""Multi-chip communication/scaling evidence on a virtual CPU mesh.

Real multi-chip hardware is not available in this container, so this tool
records the next-best evidence for the parallel layer (VERDICT r2 weak #6):
for each (data, model) mesh shape it compiles the FULL training step
SPMD-partitioned over virtual host CPU devices and reports, from the
compiled HLO itself:

  * collective counts by type (all-reduce / all-gather / reduce-scatter /
    collective-permute) — the communication XLA actually inserted,
  * total all-reduced bytes (payload riding ICI on real hardware),
  * per-device FLOPs from XLA cost analysis (compute strong-scaling).

and asserts the design's communication contract:

  * DP meshes run ONE reduction: the fused context-gradient +
    scalar-metrics all-reduce, whose bytes stay within 2x of the
    context-gradient size (num_tokens x ctx_dim fp32) regardless of dp;
    no all-gather / reduce-scatter appears (nothing gathers weights).
  * A small, stable number of collective-permutes is EXPECTED on dp>1:
    the training step's [orig; warped] block concat makes the
    equivariance pairing cross-device, and GSPMD resolves it by
    permuting input-adjacent hidden-sized tensors. An explicit
    interleaved-pair layout that removed these permutes was built and
    measured on-chip: -1.2% on the cache-hit step (stack/reshape
    copies) and -14% on the cache-miss step (it forces the merged
    [orig; warped] VAE encode to split into two half-batch encodes to
    keep hit/miss bit-equivalence, and conv efficiency drops with
    batch), so block layout + tolerated KB-scale permutes is the
    committed design (STATUS.md round 3).
  * per-device FLOPs scale ~1/dp at fixed global batch (strong scaling).
  * TP meshes add the row-parallel matmul psums + the capture head-mean
    psum on top — collective count grows with the transformer depth, and
    the all-reduce payload stays activation-sized (no weight gathers).

The reference has no analog: its only parallelism is single-process
nn.DataParallel (reference optimize_token.py:41-56) with an implicit
device-0 gather. Usage:

    python tools/scaling_study.py            # table + assertions
    python tools/scaling_study.py --json     # machine-readable lines
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as _graft  # provisions virtual CPU devices pre-backend

_graft._ensure_cpu_devices(8)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from stablekeypoints_tpu.config import Config  # noqa: E402
from stablekeypoints_tpu.models.unet import tiny_unet_config  # noqa: E402
from stablekeypoints_tpu.models.vae import tiny_vae_config  # noqa: E402
from stablekeypoints_tpu.parallel import mesh as pmesh  # noqa: E402
from stablekeypoints_tpu.pipeline.runtime import Runtime  # noqa: E402

GLOBAL_BATCH = 8  # fixed across meshes: strong scaling

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "s32": 4,
    "u64": 8, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

# result shapes of a collective HLO line, e.g.
#   %all-reduce.3 = (f32[16,48]{1,0}, f32[]) all-reduce(...)
_SHAPE_RE = re.compile(r"(f64|f32|f16|bf16|s64|s32|u64|u32|s16|u16|s8|u8|pred)\[([0-9,]*)\]")
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "collective-permute")


def _shape_bytes(shapes_text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shapes_text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_stats(hlo_text: str) -> dict:
    """Counts and result-payload bytes per collective type in compiled HLO.

    `-start` variants (async) are counted once; `-done` lines carry no new
    payload. Bytes are the logical payload (the all-reduced tensor size) —
    the per-link traffic of a ring implementation is 2(n-1)/n of this.
    """
    out = {c: {"count": 0, "bytes": 0} for c in _COLLECTIVES}
    for line in hlo_text.splitlines():
        for c in _COLLECTIVES:
            # result type may be a tuple with spaces: "= (f32[16,32]{1,0}, f32[]) all-reduce("
            m = re.search(rf"= (.+?) {c}(-start)?\(", line)
            if m:
                out[c]["count"] += 1
                out[c]["bytes"] += _shape_bytes(m.group(1))
                break
    return out


def measure(n_data: int, n_model: int) -> dict:
    devices = jax.devices("cpu")[: n_data * n_model]
    mesh = pmesh.make_mesh(n_data, n_model, devices=devices)
    cfg = Config(
        dataset_name="synthetic",
        image_size=64,
        num_tokens=16,
        feature_upsample_res=16,
        batch_size=GLOBAL_BATCH,
        furthest_point_num_samples=8,
        top_k=4,
        dtype="float32",
        pallas_capture="on",   # the kernels the real meshes run (interpret on CPU)
        fused_groupnorm="on",
    )
    with jax.default_device(devices[0]):
        rt = Runtime.create(cfg, tiny_unet_config(), tiny_vae_config(), mesh=mesh)
        images = pmesh.shard_batch(
            mesh,
            np.random.default_rng(0)
            .uniform(0, 1, (GLOBAL_BATCH, 64, 64, 3))
            .astype(np.float32),
        )
        context = rt.init_context()
        opt_state = jax.device_put(rt.optimizer.init(context), pmesh.replicated(mesh))
        key = jax.device_put(jax.random.PRNGKey(0), pmesh.replicated(mesh))
        step = rt.train_step
        lowered = step.func.lower(*step.args, context, opt_state, images, key)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        try:
            ma = compiled.memory_analysis()
            mem = {
                "argument_bytes": int(ma.argument_size_in_bytes),
                "temp_bytes": int(ma.temp_size_in_bytes),
            }
        except Exception:
            mem = {"argument_bytes": None, "temp_bytes": None}
    ctx_grad_bytes = int(np.prod(np.asarray(context).shape)) * 4
    return {
        "mesh": f"{n_data}x{n_model}",
        "n_devices": n_data * n_model,
        "per_device_flops": float(ca["flops"]),
        "collectives": collective_stats(hlo),
        "context_grad_bytes": ctx_grad_bytes,
        # per-device memory from the compiled executable: arguments (params +
        # inputs as sharded) and temporaries (activations/workspace) — the TP
        # memory-headroom evidence (weights AND resblock activations shrink
        # with tp under the widened conv sharding)
        **mem,
    }


def check(rows: list[dict]) -> list[str]:
    failures = []
    by_mesh = {r["mesh"]: r for r in rows}

    for r in rows:
        c = r["collectives"]
        dp = int(r["mesh"].split("x")[0])
        tp = int(r["mesh"].split("x")[1])
        if tp == 1:
            for kind in ("all-gather", "reduce-scatter"):
                if dp > 1 and c[kind]["count"]:
                    failures.append(f"{r['mesh']}: unexpected {kind} x{c[kind]['count']}")
            if dp > 1 and c["collective-permute"]["count"] > 12:
                failures.append(
                    f"{r['mesh']}: {c['collective-permute']['count']} collective-"
                    "permutes — the orig/warped pairing should cost a handful of "
                    "hidden-sized permutes, not a per-layer cascade"
                )
            if dp > 1 and c["all-reduce"]["count"] != 1:
                failures.append(
                    f"{r['mesh']}: {c['all-reduce']['count']} all-reduces — DP "
                    "should fuse the gradient + metrics into one"
                )
            if dp > 1 and not (0 < c["all-reduce"]["bytes"] <= 2 * r["context_grad_bytes"] + 4096):
                failures.append(
                    f"{r['mesh']}: all-reduce bytes {c['all-reduce']['bytes']} vs "
                    f"context grad {r['context_grad_bytes']} — DP should reduce "
                    "only gradients + scalar metrics"
                )
        else:
            base = by_mesh.get(f"{dp}x1") or by_mesh.get("8x1")
            if base and c["all-reduce"]["count"] <= base["collectives"]["all-reduce"]["count"]:
                failures.append(
                    f"{r['mesh']}: TP added no all-reduces over DP "
                    f"({c['all-reduce']['count']} vs {base['collectives']['all-reduce']['count']})"
                )

    # strong scaling: per-device flops ~1/dp at fixed global batch
    dp_rows = sorted(
        (r for r in rows if r["mesh"].endswith("x1") and r["n_devices"] > 0),
        key=lambda r: r["n_devices"],
    )
    for a, b in zip(dp_rows, dp_rows[1:]):
        ratio = a["per_device_flops"] / b["per_device_flops"]
        expect = b["n_devices"] / a["n_devices"]
        if not (0.8 * expect <= ratio <= 1.25 * expect):
            failures.append(
                f"per-device flops {a['mesh']}->{b['mesh']}: ratio {ratio:.2f}, "
                f"expected ~{expect:.2f}"
            )
    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    shapes = [(1, 1), (2, 1), (4, 1), (8, 1), (4, 2), (2, 4)]
    rows = [measure(d, m) for d, m in shapes]

    if args.json:
        import json

        for r in rows:
            print(json.dumps(r))
    else:
        print(
            f"{'mesh':>6} {'flops/dev':>12} {'AR#':>4} {'AR bytes':>9} "
            f"{'AG#':>4} {'RS#':>4} {'CP#':>4} {'CP bytes':>9} "
            f"{'arg MB/dev':>10} {'tmp MB/dev':>10}"
        )
        for r in rows:
            c = r["collectives"]
            mb = lambda x: f"{x / 1e6:.2f}" if x is not None else "n/a"
            print(
                f"{r['mesh']:>6} {r['per_device_flops']:>12.3e} "
                f"{c['all-reduce']['count']:>4} {c['all-reduce']['bytes']:>9} "
                f"{c['all-gather']['count']:>4} {c['reduce-scatter']['count']:>4} "
                f"{c['collective-permute']['count']:>4} "
                f"{c['collective-permute']['bytes']:>9} "
                f"{mb(r['argument_bytes']):>10} {mb(r['temp_bytes']):>10}"
            )
    failures = check(rows)
    if failures:
        print("FAIL:")
        for f in failures:
            print(" -", f)
        sys.exit(1)
    print("communication contract: OK")


if __name__ == "__main__":
    main()
