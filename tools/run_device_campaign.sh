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
stamp bench_py
timeout 1800 python bench.py >> "$OUT" 2>&1
stamp bench_scan
timeout 1800 python tools/bench_scan.py --skeletonize >> "$OUT" 2>&1
stamp bench_sssp
timeout 1800 python tools/bench_sssp.py >> "$OUT" 2>&1
stamp done
