#!/bin/bash
# Round-4 on-chip measurement batch — runs the round-3 stages that never
# got a TPU window (relay outage; scripts/r3_logs has only stages 1/3/5).
# ONE job at a time (CLAUDE.md: never two TPU processes at once).
set -x
cd /root/repo
mkdir -p scripts/r4_logs

# 1. Materialize at scale with the exact 200M-row oracle (VERDICT_r02 #3)
timeout 3600 python scripts/bench_materialize.py \
  > scripts/r4_logs/materialize_json.txt \
  2> scripts/r4_logs/materialize.log

# 2. Full uniform-keys grid, 15+ columns like the skewed grids (VERDICT #6)
timeout 10800 python scripts/record_results.py \
  --outdir results/tpu-v5e-uniform --skew 0 \
  --partitions 32 64 128 256 512 1024 2048 4096 8192 \
  --algos sort-merge no-partitioning shuffle radix radix-chained \
          nopart-chained radix-2pass \
  2> scripts/r4_logs/uniform_grid.log

# 3. Two-pass radix point on the skewed workload (VERDICT #7) with the
#    single-pass chained comparator at the same P
timeout 4800 python scripts/record_results.py \
  --outdir results/tpu-v5e-2pass --skew 1.05 --partitions 256 \
  --algos radix-2pass radix-chained \
  2> scripts/r4_logs/radix_2pass.log

# 4. Headline refresh (cached programs; confirms no regression)
timeout 3600 python bench.py > scripts/r4_logs/bench_json.txt \
  2> scripts/r4_logs/bench.log

echo BATCH_DONE
