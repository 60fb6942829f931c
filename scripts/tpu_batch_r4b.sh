#!/bin/bash
# Round-4 second on-chip batch: the R7 filtered composed pipeline + a
# headline refresh.  ONE job at a time (CLAUDE.md: never two TPU
# processes at once).
set -x
cd /root/repo
mkdir -p scripts/r4_logs

# 1. Filtered composed query (R7 = staged filter -> kernel pipeline)
#    A/B vs the unfiltered pipeline, masked-count oracle
timeout 5400 python scripts/bench_filtered_pipeline.py \
  > scripts/r4_logs/filtered_pipeline_json.txt \
  2> scripts/r4_logs/filtered_pipeline.log

# 2. Headline refresh (cached programs; confirms no regression)
timeout 3600 python bench.py > scripts/r4_logs/bench_json2.txt \
  2> scripts/r4_logs/bench2.log

echo BATCH_DONE
