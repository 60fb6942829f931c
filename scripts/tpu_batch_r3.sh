#!/bin/bash
# Round-3 on-chip measurement batch — run ONE job at a time (CLAUDE.md:
# never two TPU processes at once).  Each stage logs to scripts/r3_logs/.
# Stages are independent; comment out what has already been recorded.
set -x
cd /root/repo
mkdir -p scripts/r3_logs

# 1. Sorter phase costs + full-sort vs XLA + block-size sweep + tuple k=2
timeout 3000 python scripts/probe_bitonic.py \
  2> scripts/r3_logs/probe_bitonic.log

# 2. Flagship A/B: two-run count with xla vs pallas partition sorts
timeout 2400 python scripts/bench_sorter_ab.py \
  2> scripts/r3_logs/sorter_ab.log

# 3. int64 plane path (new one-program 2-key plane sorts)
timeout 2400 python scripts/bench_int64.py \
  2> scripts/r3_logs/int64.log

# 4. Materialize at scale (exact 200M-row oracle)
timeout 2400 python scripts/bench_materialize.py \
  2> scripts/r3_logs/materialize.log

# 5. Filter+GROUP BY at 200M (compaction kernel pass 2)
timeout 2400 python scripts/bench_operators.py \
  2> scripts/r3_logs/operators.log

# 6. Full uniform-keys grid (VERDICT #6: 15 columns like the skewed grids)
timeout 9000 python scripts/record_results.py \
  --outdir results/tpu-v5e-uniform --skew 0 \
  --partitions 32 64 128 256 512 1024 2048 4096 8192 \
  --algos sort-merge no-partitioning shuffle radix radix-chained \
          nopart-chained radix-2pass \
  2> scripts/r3_logs/uniform_grid.log

# 7. Two-pass radix point on the skewed grid (VERDICT #7)
timeout 3600 python scripts/record_results.py \
  --outdir results/tpu-v5e-2pass --skew 1.05 --partitions 256 \
  --algos radix-2pass radix-chained \
  2> scripts/r3_logs/radix_2pass.log

# 8. Headline bench (PHJ_SORT_IMPL per the A/B outcome)
timeout 3600 python bench.py 2> scripts/r3_logs/bench.log \
  | tee scripts/r3_logs/bench_json.txt

tail -n +1 scripts/r3_logs/*.log
