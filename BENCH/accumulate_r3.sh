#!/bin/bash
# Round-3 scaling-sample accumulation loop (protocol: BENCH/BASELINE.md).
#
# Measurement child: BENCH/child_cascade.py (staged cascade, production job
# shape) on the 4x corpus (~8.3M turns) — see BASELINE.md "round-3 gate
# record" for why the larger input raises the physical efficiency ceiling.
#
# Config: SerialGC + AQE off + 4g driver heap ("h4g4x"), IDENTICAL at both
# arms of every pair. Chosen by measurement twice over (BENCH/sweep_gc4.log):
# every 16g-heap variant (SerialGC or G1) burns 2.5-4x the CPU work floor at
# the 4-core arm (581-737 cpu-s vs the ~190-230 floor — GC pathology on the
# large young gen), while SerialGC@4g stayed at the floor in every sample
# (187-232 cpu-s); ParallelGC@4g and G1@4g crash the child under memory
# pressure. unc4x (cache off, same conf) runs every 3rd cycle as the
# scan-heavy control.
#
# Shuffle layout: --parts-mult 4 (4 task waves per core) — measured on the
# 4-core arm (sweep_gc4.log sgc4g_p4 vs sgc4g): multi-wave cuts TOTAL CPU
# work ~20% (153-175 vs 187-232 cpu-s; smaller per-task agg hash maps stay
# cache/GC-friendly) on top of bin-packing the hot-conv partition skew.
#
# Min-of-audited-samples per arm is the estimator (cross-window), with the
# same-window paired view (efficiency_Nx4_paired) recorded alongside. Kill
# the loop once p4_h4g4x shows efficiency_Nx4_audited >= 0.8 with >= 3 quiet
# samples per arm.
cd "$(dirname "$0")/.." || exit 1
IN=tests/data/transcripts_bench4x.parquet
H4G='{"spark.sql.adaptive.enabled": "false", "spark.driver.extraJavaOptions": "-XX:+UseSerialGC", "spark.driver.memory": "4g"}'
i=0
while true; do
  SPARK_GRAFT_EXTRA_CONF="$H4G" python BENCH/run_scaling.py --pin --reps 1 --cores 1,4 --parts-mult 4 --conf-tag h4g4x --wait-idle 6 --input "$IN"
  SPARK_GRAFT_EXTRA_CONF="$H4G" python BENCH/run_scaling.py --pin --reps 1 --cores 4,1 --parts-mult 4 --conf-tag h4g4x --wait-idle 6 --input "$IN"
  SPARK_GRAFT_EXTRA_CONF="$H4G" python BENCH/run_scaling.py --pin --reps 1 --cores 2,8 --parts-mult 4 --conf-tag h4g4x --wait-idle 6 --input "$IN"
  if [ $((i % 3)) -eq 2 ]; then
    SPARK_GRAFT_NO_CACHE=1 SPARK_GRAFT_EXTRA_CONF="$H4G" python BENCH/run_scaling.py --pin --reps 1 --cores 4,1 --parts-mult 4 --conf-tag unc4x --wait-idle 6 --input "$IN"
  fi
  i=$((i + 1))
done
