#!/bin/bash
# Round-3 unified scaling sampler (replaces r3b/r3c; ONE process so record
# writes never race and pinned core sets never overlap):
#   1. solo 4-core single  - chases the turbo-window audited min (the 1-core
#      arm already sits at its work floor; 4-core is the one still inflated)
#   2. simultaneous 1,4 pair - disjoint-core same-instant run; the host
#      frequency window cancels exactly in the ratio (conservative: shared
#      bandwidth + the 1-core arm's unshared tail both push the ratio DOWN)
#   3. back-to-back 1,4 pair - the established same-window paired estimator
#   4. every 3rd cycle: back-to-back 8,2 for the secondary pair
cd "$(dirname "$0")/.." || exit 1
IN=tests/data/transcripts_bench4x.parquet
H4G='{"spark.sql.adaptive.enabled": "false", "spark.driver.extraJavaOptions": "-XX:+UseSerialGC", "spark.driver.memory": "4g"}'
i=0
while true; do
  SPARK_GRAFT_EXTRA_CONF="$H4G" python BENCH/run_scaling.py --pin --reps 1 --cores 4 --parts-mult 4 --conf-tag h4g4x --wait-idle 2 --input "$IN"
  SPARK_GRAFT_EXTRA_CONF="$H4G" python BENCH/run_scaling.py --simultaneous --pin --reps 1 --cores 1,4 --parts-mult 4 --conf-tag h4g4x --wait-idle 2 --input "$IN"
  SPARK_GRAFT_EXTRA_CONF="$H4G" python BENCH/run_scaling.py --pin --reps 1 --cores 1,4 --parts-mult 4 --conf-tag h4g4x --wait-idle 2 --input "$IN"
  if [ $((i % 3)) -eq 2 ]; then
    SPARK_GRAFT_EXTRA_CONF="$H4G" python BENCH/run_scaling.py --pin --reps 1 --cores 8,2 --parts-mult 4 --conf-tag h4g4x --wait-idle 2 --input "$IN"
  fi
  i=$((i + 1))
done
