#!/bin/bash
# Round-4b scaling-evidence queue, final engine (engine_hash 6ba8cde9d98b).
#
# The 2->8 pairing already clears the north-rule bar on median-of-3
# (CC 0.873, PageRank steady 0.938). What is still evidence-short:
#   - 4->16 uniform: PageRank's claim-carrying pairing (its superstep is
#     all-JVM, so 4->16 is thread-fair for it) sits at n=2, median 0.738
#     with one badly steal-spiked sample; collect to n=5.
#   - 4->16 skew: zero final-engine samples (VERDICT r3 item 6).
#   - 2->8 uniform: CC's thread-fair pairing at n=3; one more firms the
#     median against the 0.686 outlier.
# Protocol identical to collect_samples.sh (job-constant n_part = 2 x high
# cores, rep-min over 3 in-JVM reps, untimed CC warmup, pinned
# ActiveProcessorCount). Run on an otherwise-idle box.
set -u
cd "$(dirname "$0")/.."
for spec in \
    "64000000 4000000 uniform 4,16" \
    "32000000 4000000 skew 4,16" \
    "64000000 4000000 uniform 4,16" \
    "32000000 4000000 skew 4,16" \
    "32000000 4000000 uniform 2,8" \
    "64000000 4000000 uniform 4,16" \
; do
    set -- $spec
    edges=$1; verts=$2; kind=$3; pair=$4
    flag=x; [ "$kind" = skew ] && flag=skew
    echo "=== sample: ${pair} ${kind} ${edges} ($(date -u +%H:%M:%S)) ==="
    python bench/scaling.py "$edges" "$verts" "$flag" "$pair" || echo "SAMPLE FAILED"
done
echo "=== queue done ($(date -u +%H:%M:%S)) ==="
