#!/bin/bash
# Final-engine absolute-throughput showcase at whole-box parallelism.
#
# Two single-level runs of the scaling worker (rep-min protocol, untimed CC
# warmup, pinned ActiveProcessorCount), NOT a pairing:
#   1. 64M edges / 4M vertices at local[32] — the absolute edges/s numbers
#      BASELINE.md quotes against the single-node reference rate.
#   2. 256M edges / 16M vertices at local[32] — 4x the sample scale, same
#      n_part-per-core density (job-constant partitioning sized for the
#      box), demonstrating the engine's headroom: no OOM, same round
#      structure, throughput held. 16M vertices stays inside the PageRank
#      broadcast_join V-gate (20M) by design, matching the samples' regime.
# Run on an otherwise-idle box, AFTER all pairing samples have finished.
set -u
cd "$(dirname "$0")/.."
echo "=== showcase 64M @ local[32] ($(date -u +%H:%M:%S)) ==="
python bench/scaling_worker.py 32 64000000 4000000 uniform 64
echo "=== showcase 256M @ local[32] ($(date -u +%H:%M:%S)) ==="
python bench/scaling_worker.py 32 256000000 16000000 uniform 64
echo "=== showcase done ($(date -u +%H:%M:%S)) ==="
