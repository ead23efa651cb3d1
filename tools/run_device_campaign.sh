#!/bin/bash
# Round-3 device measurement campaign — run when the chip is free.
# Serializes every TPU measurement (the chip must be exclusive for honest
# numbers), appending one JSON/log block per tool to $OUT.
#
#   bash tools/run_device_campaign.sh [outfile]
#
# Order: forward stage attribution (rulebook-build delta), whole bench,
# forest-scan skeletonize throughput, SSSP round/convergence profile.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/device_campaign.log}
stamp() { echo "=== $1 @ $(date +%H:%M:%S) ===" >> "$OUT"; }

stamp bench_forward_stages
timeout 1800 python tools/bench_forward_stages.py >> "$OUT" 2>&1
stamp bench_rulebook
timeout 1800 python tools/bench_rulebook.py >> "$OUT" 2>&1
stamp bench_py
timeout 1800 python bench.py >> "$OUT" 2>&1
stamp bench_scan
timeout 1800 python tools/bench_scan.py --skeletonize >> "$OUT" 2>&1
stamp bench_sssp
timeout 1800 python tools/bench_sssp.py >> "$OUT" 2>&1
stamp eval_tpu_seed100
# CPU fp32 eval of synthetic-r2 seed 100 reads IoU 0.978 / cos 0.758; the
# 2026-08-17 TPU-lane run read 0.965 / 0.442 with identical code+weights.
# Reproduce on-chip to bisect the TPU numerics gap (BASELINE.md round-3).
timeout 1800 python tools/evaluate.py smart_tree_tpu/weights/synthetic-r2.npz \
    --seeds 100 >> "$OUT" 2>&1
stamp done
