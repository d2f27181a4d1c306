#!/bin/bash
# Round-4 scaling-evidence collection queue (run on an otherwise-idle box).
#
# Each line is one independent N->4N sample: both parallelism levels in
# their own JVMs on the identical deterministic input (bench/scaling.py),
# per-superstep rep-min protocol with an untimed CC warmup solve
# (scaling_worker.py). Samples append to BENCH_SCALING.json stamped with
# the engine content hash, so summaries never mix engine eras.
#
# Queue rationale (VERDICT r3 "next round" items 1, 6, 7):
#   - 4->16 uniform x3: PageRank now times its measured-best (auto ->
#     broadcast_join) mode; the north-rule median claim needs >=3 fresh
#     samples on the frozen r4 engine.
#   - 4->16 skew x3: all pre-r4 skew samples were warmup-contaminated or
#     steal-spiked; collect a clean distribution.
#   - 8->32 uniform at the tail, if wall-clock remains: the bandwidth
#     probe caps ANY bandwidth-bound stage at 0.73 efficiency for this
#     pairing on this box, so 4->16 carries the north-rule claim.
#
# r4 protocol: both levels of a pairing run the IDENTICAL physical job
# (shuffle partitions fixed at 2 x the high level's cores; see
# bench/scaling.py).
set -u
cd "$(dirname "$0")/.."
for spec in \
    "64000000 4000000 uniform 4,16" \
    "32000000 4000000 skew 4,16" \
    "64000000 4000000 uniform 4,16" \
    "32000000 4000000 skew 4,16" \
    "64000000 4000000 uniform 4,16" \
    "32000000 4000000 skew 4,16" \
    "64000000 4000000 uniform 8,32" \
    "64000000 4000000 uniform 8,32" \
; do
    set -- $spec
    edges=$1; verts=$2; kind=$3; pair=$4
    # scaling.py's positional contract: [n_edges] [n_vertices] [skew|other] [lo,hi]
    flag=x; [ "$kind" = skew ] && flag=skew
    echo "=== sample: ${pair} ${kind} ${edges} ($(date -u +%H:%M:%S)) ==="
    python bench/scaling.py "$edges" "$verts" "$flag" "$pair" || echo "SAMPLE FAILED"
done
echo "=== queue done ($(date -u +%H:%M:%S)) ==="
