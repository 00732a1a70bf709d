#!/bin/bash
# Round-6 scaling sweep at the 141M-edge input (/tmp/scaling_huge):
#  - verdict #2: race Components' window vs agg large-star form
#  - verdict #5: the 8 vs 32 parallelism pair for the headline kernels
# Each cell is a fresh JVM (ScalingBench measure forks per invocation).
# Single rep per cell, matching the round-5 protocol at this input size.
set -e
IN=${1:-/tmp/scaling_huge}
OUT=${2:-/tmp/scaling_r6}
mkdir -p "$OUT"
run() { # kernel cpus
  local k=$1 c=$2
  echo "=== $k @$c $(date +%T) load1=$(cut -d' ' -f1 /proc/loadavg)"
  SPARK_DRIVER_MEM=${MEM:-8g} sbt -batch \
    "runMain graft.ScalingBench measure $IN $c 1 $k" \
    2>"$OUT/$k.$c.err" | grep '^{' | tee -a "$OUT/results.jsonl"
}
# the race first (the round's open question), then the 8->32 pairs
for c in 8 32; do
  run components $c
  run components_agg $c
done
for c in 8 32; do
  run pagerank_5iter $c
  run lpa_2step $c
  run walks_4steps $c
done
echo "sweep done $(date +%T)"
