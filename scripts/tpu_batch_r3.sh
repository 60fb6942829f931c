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

tail -n +1 scripts/r3_logs/*.log
