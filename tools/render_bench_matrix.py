"""Render bench_matrix.jsonl (tools/measure_all.sh output) to BENCH_MATRIX.md.

Usage: python tools/render_bench_matrix.py [in.jsonl] [out.md]
"""

from __future__ import annotations

import json
import os
import sys


def render(in_path: str, out_path: str) -> None:
    # sessions are delimited by 'start ...' markers; the LATEST complete
    # session is the authoritative table (earlier sessions measured earlier
    # commits — history stays in the jsonl / git log)
    sessions = []  # [(header_meta, rows)]
    env = ""
    with open(in_path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("start "):
                sessions.append([line[len("start "):], []])
                env = ""
            elif line.startswith("### "):
                env = line[4:]
            elif line.startswith("{") and sessions:
                sessions[-1][1].append((env, json.loads(line)))
    # drop trailing aborted/empty sessions (a 'start' with no rows — e.g. a
    # run killed during its first compile) rather than rendering nothing
    while sessions and not sessions[-1][1]:
        sessions.pop()
    if not sessions:
        raise SystemExit(f"no completed sessions in {in_path}")
    header_meta, rows = sessions[-1]
    n_prior = sum(len(r) for _, r in sessions[:-1])

    out = [
        "# BENCH_MATRIX — on-chip measurement matrix",
        "",
        f"Single session, `tools/measure_all.sh`: {header_meta}.",
        "Raw JSON lines in `bench_matrix.jsonl` (same commit)"
        + (f"; {n_prior} rows from earlier sessions kept there as history."
           if n_prior else "."),
        "",
        "| bench (env) | metric | value | unit | vs_baseline | mfu | fill |",
        "|---|---|---|---|---|---|---|",
    ]
    for env, r in rows:
        mfu = r.get("mfu")
        mfu_s = "" if mfu is None else f"{mfu:.3f}" + (
            f" / {r['mfu_fill']:.3f}" if "mfu_fill" in r else ""
        )
        fill = r.get("fill_steps_per_sec_per_chip")
        out.append(
            f"| `{env}` | {r['metric']} | **{r['value']}** | {r['unit']} | "
            f"{r.get('vs_baseline', '')} | {mfu_s} | {'' if fill is None else fill} |"
        )
    out += [
        "",
        "Baselines: derived A100 reference estimates (BASELINE.md); the",
        "reference repo publishes no numbers of its own.",
        "",
    ]
    with open(out_path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {out_path} ({len(rows)} rows)")


if __name__ == "__main__":
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    in_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(root, "bench_matrix.jsonl")
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(root, "BENCH_MATRIX.md")
    render(in_path, out_path)
