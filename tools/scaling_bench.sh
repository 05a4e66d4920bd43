#!/bin/bash
# Scaling-efficiency protocol (BASELINE.md): identical parse->enrich->route
# job at N=8 and 4N=32 local cores, separate JVMs, same input, 3 runs each,
# median reported. Usage: tools/scaling_bench.sh [nConvs] [runs]
set -e
NCONVS=${1:-60000}
RUNS=${2:-3}
MODE=${GRAFT_SINK_MODE:-noop}
cd "$(dirname "$0")/.."
for CORES in 8 32; do
  for i in $(seq 1 $RUNS); do
    OUT=$(mktemp -d /tmp/graft-scale-XXXX)
    GRAFT_SINK_MODE=$MODE SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.pipeline.RunPipeline $NCONVS $OUT $CORES" 2>/dev/null \
      | grep -o '\[pipeline\].*' | sed "s/^/cores=$CORES run=$i mode=$MODE /"
    rm -rf "$OUT"
    sync; sleep 10   # let writeback drain so runs don't interfere
  done
done
