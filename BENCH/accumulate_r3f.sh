#!/bin/bash
# Round-3 sampler, third revision (tag pgc32m). Diagnosis that retired the
# h4g4x record on the refreshed host: its 4-core packing ceiling of ~0.76
# was NOT host noise — a GC log showed 12.1 s of single-threaded SerialGC
# pauses in a 46 s four-core run (3 of 4 cores idle for 26 % of wall),
# plus a scan stage of only ~6 input splits (659 MB file / 128 MB
# maxPartitionBytes) running as 1.5 ragged waves. Neither hurts the 1-core
# arm, so both deflated the 1->4 ratio asymmetrically. Fix, applied
# IDENTICALLY to every arm (apples-to-apples):
#   - ParallelGC (GC threads scale with the taskset budget, like a real
#     N-core executor) instead of SerialGC,
#   - spark.sql.files.maxPartitionBytes=32m  -> ~21 scan tasks (5 waves on
#     4 cores) instead of 6,
#   - shuffle partitions = 8 x cores (was 4 x).
# Measured packing at 4 cores moved 0.76 -> 0.93 (cpu/wall/4), best wall
# 40.0 -> 32.9 s, while the 1-core arm stays at its work floor (wall==cpu).
cd "$(dirname "$0")/.." || exit 1
IN=tests/data/transcripts_bench4x.parquet
CONF='{"spark.sql.adaptive.enabled": "false", "spark.driver.extraJavaOptions": "-XX:+UseParallelGC", "spark.driver.memory": "4g", "spark.sql.files.maxPartitionBytes": "32m"}'
while true; do
  SPARK_GRAFT_EXTRA_CONF="$CONF" python BENCH/run_scaling.py --pin --reps 2 --cores 4 --parts-mult 8 --conf-tag pgc32m --wait-idle 5 --input "$IN"
  SPARK_GRAFT_EXTRA_CONF="$CONF" python BENCH/run_scaling.py --pin --reps 1 --cores 1,4 --parts-mult 8 --conf-tag pgc32m --wait-idle 5 --input "$IN"
done
