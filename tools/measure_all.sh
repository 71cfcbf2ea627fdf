#!/bin/bash
# One-shot on-chip measurement matrix (run when the TPU tunnel is up).
# Results append to /tmp/measure_all.log as one JSON line per bench.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=${1:-/tmp/measure_all.log}
run() {
  echo "### $*" >> "$LOG"
  timeout 1800 env "$@" python bench.py 2>/dev/null | tail -1 >> "$LOG"
}
run BENCH_STEPS=20                       # sd15 train, hit+fill
run BENCH_MODEL=sdxl BENCH_STEPS=10      # sdxl train
run BENCH_LATENT_WARP=1 BENCH_STEPS=20   # approximation ablation
run BENCH_MODE=detect BENCH_STEPS=5      # eval path, exact
run BENCH_MODE=detect BENCH_LATENT_WARP=1 BENCH_STEPS=5
echo "done $(date -u +%FT%TZ)" >> "$LOG"
cat "$LOG"
