#!/bin/bash
# One-shot on-chip measurement matrix (run when the TPU tunnel is up).
# Results append as one JSON line per bench; default log lives in-repo so
# the matrix survives the container (VERDICT r3 missing #2) — commit it as
# BENCH_MATRIX.md via tools/render_bench_matrix.py.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=${1:-/root/repo/bench_matrix.jsonl}
run() {
  echo "### $*" >> "$LOG"
  # stderr goes to a side log so a failed row leaves a diagnosable trace
  # (an empty row under its ### header means: check the .err log)
  timeout 2400 env "$@" python bench.py 2>>"${LOG%.jsonl}.err" | tail -1 >> "$LOG"
}
echo "start $(date -u +%FT%TZ) device=$(python - <<'EOF' 2>/dev/null
import jax; print(jax.devices()[0].device_kind)
EOF
)" >> "$LOG"
run BENCH_STEPS=20                                   # sd15 train, hit+fill
run BENCH_MODEL=sd21 BENCH_STEPS=10                  # sd21 train (768^2, 48^2 flash fallback)
run BENCH_MODEL=sdxl BENCH_STEPS=10                  # sdxl train (1024^2)
run BENCH_CAPTURE_DTYPE=bf16 BENCH_STEPS=20          # bf16 capture-map ablation
run BENCH_LATENT_WARP=1 BENCH_STEPS=20               # approximation ablation
run BENCH_MODE=detect BENCH_STEPS=5                  # eval path, exact
run BENCH_MODE=detect BENCH_LATENT_WARP=1 BENCH_STEPS=5
run BENCH_MODE=detect BENCH_MODEL=sd21 BENCH_STEPS=5 # 768^2 ensemble
run BENCH_MODE=detect BENCH_MODEL=sdxl BENCH_STEPS=5 # 1024^2 ensemble
# latent_warp ablation for the non-sd15 backbones (VERDICT r4 missing #5)
run BENCH_MODEL=sd21 BENCH_LATENT_WARP=1 BENCH_STEPS=10
run BENCH_MODEL=sdxl BENCH_LATENT_WARP=1 BENCH_STEPS=10
run BENCH_MODE=detect BENCH_MODEL=sd21 BENCH_LATENT_WARP=1 BENCH_STEPS=5
run BENCH_MODE=detect BENCH_MODEL=sdxl BENCH_LATENT_WARP=1 BENCH_STEPS=5
# exported-artifact serving latency + on-chip parity (VERDICT r4 #5)
run BENCH_MODE=serving BENCH_STEPS=5
# eval_batch_images scaling study (VERDICT r4 #7): detect s/image vs M
run BENCH_MODE=detect BENCH_BATCH=1 BENCH_STEPS=5
run BENCH_MODE=detect BENCH_BATCH=8 BENCH_STEPS=5
run BENCH_MODE=detect BENCH_BATCH=16 BENCH_STEPS=3
echo "done $(date -u +%FT%TZ)" >> "$LOG"
cat "$LOG"
