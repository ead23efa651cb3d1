#!/bin/bash
# Round-4 device measurement campaign — run when the chip is EXCLUSIVE
# (no training job sharing it; concurrent HBM users corrupt every number).
#
#   bash tools/run_device_campaign_r4.sh [outfile]
#
# Decisive items first (relay flakiness cuts campaigns short):
#   1. bench.py            — e2e with compact transfers (VERDICT #4 target:
#                            >= 88,730 points/sec = 10x CPU)
#   2. bench_slab.py       — slab Pallas kernel vs XLA gather vs z9 with
#                            fixed routing (VERDICT #3 and #6)
#   3. bench_skeleton_stage — per-stage skeleton timing + shortcuts decision
#                            (VERDICT #1)
#   4. bench_scan --skeletonize — clouds/min end-to-end (VERDICT #1)
#   5. evaluate synthetic-r3 on-chip (VERDICT #2 quality table)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/device_campaign_r4.log}
stamp() { echo "=== $1 @ $(date +%H:%M:%S) ===" | tee -a "$OUT"; }

stamp bench_py_compact
timeout 2400 python bench.py >> "$OUT" 2>&1
stamp bench_slab
timeout 2400 python tools/bench_slab.py >> "$OUT" 2>&1
stamp bench_skeleton_stage
timeout 2400 python tools/bench_skeleton_stage.py >> "$OUT" 2>&1
stamp bench_scan_skeletonize
timeout 2400 python tools/bench_scan.py --skeletonize >> "$OUT" 2>&1
stamp eval_r3_tpu
if [ -f smart_tree_tpu/weights/synthetic-r3.npz ]; then
  timeout 2400 python tools/evaluate.py smart_tree_tpu/weights/synthetic-r3.npz \
      --seeds 100 102 103 >> "$OUT" 2>&1
fi
stamp done
