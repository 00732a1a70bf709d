#!/bin/bash
# Round-6 sweep, part 2: the cells the first launch didn't finish.
#  - components (window form) @32 retried at 16g — it OOM'd at 8g
#    (UNABLE_TO_ACQUIRE_MEMORY in the large-star stage); the agg form
#    completed at 8g. The 8g abort is itself a data point for the race.
#  - the remaining 8 vs 32 pairs (pagerank/lpa/walks @32, lpa/walks @8).
# Single rep per cell, fresh JVM per cell (round-5 protocol).
set -uo pipefail
IN=${1:-/tmp/scaling_huge}
OUT=${2:-/tmp/scaling_r6}
mkdir -p "$OUT"
run() { # kernel cpus mem
  local k=$1 c=$2 m=$3
  echo "=== $k @$c mem=$m $(date +%T) load1=$(cut -d' ' -f1 /proc/loadavg)"
  SPARK_DRIVER_MEM=$m sbt -batch \
    "runMain graft.ScalingBench measure $IN $c 1 $k" \
    2>"$OUT/$k.$c.err" | grep '^{' >> "$OUT/results.jsonl" || \
    echo "FAILED $k @$c mem=$m" >> "$OUT/results.jsonl"
}
run pagerank_5iter 32 8g
run lpa_2step 8 8g
run lpa_2step 32 8g
run walks_4steps 8 8g
run walks_4steps 32 8g
run components 32 16g
echo "sweep part 2 done $(date +%T)"
