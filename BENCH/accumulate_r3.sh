#!/bin/bash
# Round-3 scaling-sample accumulation loop (protocol: BENCH/BASELINE.md).
#
# Measurement child: BENCH/child_cascade.py — the staged cascade exactly as
# jobs/rollup.py runs it (1m persisted, 1h/1d merge from it).
#
# Input: the 4x bench corpus (~8M turns). Round-3 finding: the 4-core arm's
# CPU-work overhead vs 1-core is a CONSTANT ~8 cpu-s (bench 39.5 vs 31.5,
# bench4x 110.9 vs 102.8 — same delta at 4x the work), i.e. per-thread
# fixed cost (JIT, buffers, scheduler), not proportional contention. The 4x
# corpus amortizes it: work-inflation ratio drops 1.25 -> 1.08, raising the
# physical efficiency ceiling W(1)/W(4) from ~0.80 to ~0.93. Larger input is
# also the more faithful proxy for the 10^12-turn north rule.
#
# Variants (same conf at both arms of every pair, apples-to-apples):
#   sgc4x — SerialGC + AQE off, cached (primary)
#   h4g4x — SerialGC + AQE off + 4g driver heap (guards against GC inflation
#           of the larger cached 1m frame)
#   unc4x — cache disabled (scan-heavy fallback, historically work-flat)
# Min-of-samples per arm is the estimator; extra samples only sharpen it.
# Kill the loop once a record shows efficiency_Nx4_audited >= 0.8 with >= 3
# quiet samples per arm.
cd "$(dirname "$0")/.." || exit 1
IN=tests/data/transcripts_bench4x.parquet
SGC='{"spark.sql.adaptive.enabled": "false", "spark.driver.extraJavaOptions": "-XX:+UseSerialGC"}'
H4G='{"spark.sql.adaptive.enabled": "false", "spark.driver.extraJavaOptions": "-XX:+UseSerialGC", "spark.driver.memory": "4g"}'
i=0
while true; do
  SPARK_GRAFT_EXTRA_CONF="$SGC" python BENCH/run_scaling.py --pin --reps 1 --cores 1,4 --conf-tag sgc4x --wait-idle 6 --input "$IN"
  SPARK_GRAFT_EXTRA_CONF="$H4G" python BENCH/run_scaling.py --pin --reps 1 --cores 4,1 --conf-tag h4g4x --wait-idle 6 --input "$IN"
  SPARK_GRAFT_EXTRA_CONF="$SGC" python BENCH/run_scaling.py --pin --reps 1 --cores 2,8 --conf-tag sgc4x --wait-idle 6 --input "$IN"
  if [ $((i % 3)) -eq 2 ]; then
    SPARK_GRAFT_NO_CACHE=1 SPARK_GRAFT_EXTRA_CONF="$SGC" python BENCH/run_scaling.py --pin --reps 1 --cores 4,1 --conf-tag unc4x --wait-idle 6 --input "$IN"
  fi
  i=$((i + 1))
done
