#!/bin/bash
# Round-6 dedup-pipeline scaling sweep: the LLM-curation layer's N vs 4N
# evidence (the graph kernels have had theirs since round 2; the docs layer
# had none). Input: ScalingBench gendocs corpus (deterministic, planted
# near-dup clusters). Fresh JVM per cell, 2 reps best-of, one kernel per
# cell so a slow kernel can't poison another's JIT/cache state.
set -e
IN=${1:-/tmp/docs_500k}
OUT=${2:-/tmp/docs_scaling_r6}
mkdir -p "$OUT"
run() { # kernel cpus
  local k=$1 c=$2
  echo "=== $k @$c $(date +%T) load1=$(cut -d' ' -f1 /proc/loadavg)"
  SPARK_DRIVER_MEM=${MEM:-8g} sbt -batch \
    "runMain graft.ScalingBench measuredocs $IN $c 2 $k" \
    2>"$OUT/$k.$c.err" | grep '^{' | tee -a "$OUT/results.jsonl"
}
for c in 2 8; do
  run minhash_lsh_k13 $c
  run simhash_pairs_h3 $c
  run dedup_exact $c
done
echo "sweep done $(date +%T)"
