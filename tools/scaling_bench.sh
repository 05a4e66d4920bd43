#!/bin/bash
# Scaling-efficiency protocol (BASELINE.md): identical parse->enrich->route
# job at N and 4N local cores (default 2 and 8 — see BENCH/BASELINE.md on why
# this host cannot evidence 8->32), separate JVMs, same input, interleaved,
# medians reported. Usage: [GRAFT_CORES="2 8"] tools/scaling_bench.sh [nConvs] [runs]
set -e
NCONVS=${1:-60000}
RUNS=${2:-3}
MODE=${GRAFT_SINK_MODE:-noop}
cd "$(dirname "$0")/.."
for i in $(seq 1 $RUNS); do
  for CORES in ${GRAFT_CORES:-2 8}; do   # interleaved: N,4N,N,4N,...
    OUT=$(mktemp -d /tmp/graft-scale-XXXX)
    GRAFT_SINK_MODE=$MODE SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.pipeline.RunPipeline $NCONVS $OUT $CORES" 2>/dev/null \
      | grep -o '\[pipeline\].*' | sed "s/^/cores=$CORES run=$i mode=$MODE /"
    rm -rf "$OUT"
    sync; sleep 10   # let writeback drain so runs don't interfere
  done
done
