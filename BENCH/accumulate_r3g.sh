#!/bin/bash
# Round-3 sampler, fourth revision: same pgc32m config as accumulate_r3f.sh
# (ParallelGC, 32 MB scan splits, 8 shuffle waves/core, AQE off, 4x corpus)
# with the --simultaneous estimator added to the rotation. Sim pairs run
# both arms at the same instant on DISJOINT pinned core sets, so the
# host's minute-scale frequency window cancels exactly in the in-pair
# ratio; their residual biases (shared memory bandwidth, the 1-core arm's
# unshared tail) both push the ratio DOWN, so they corroborate the solo
# audited minima from the conservative side. Sim samples are excluded
# from the solo minima/quiet counts by run_scaling.py itself.
cd "$(dirname "$0")/.." || exit 1
IN=tests/data/transcripts_bench4x.parquet
CONF='{"spark.sql.adaptive.enabled": "false", "spark.driver.extraJavaOptions": "-XX:+UseParallelGC", "spark.driver.memory": "4g", "spark.sql.files.maxPartitionBytes": "32m"}'
while true; do
  SPARK_GRAFT_EXTRA_CONF="$CONF" python BENCH/run_scaling.py --pin --simultaneous --reps 1 --cores 1,4 --parts-mult 8 --conf-tag pgc32m --wait-idle 5 --input "$IN"
  SPARK_GRAFT_EXTRA_CONF="$CONF" python BENCH/run_scaling.py --pin --reps 2 --cores 4 --parts-mult 8 --conf-tag pgc32m --wait-idle 5 --input "$IN"
  SPARK_GRAFT_EXTRA_CONF="$CONF" python BENCH/run_scaling.py --pin --reps 1 --cores 1,4 --parts-mult 8 --conf-tag pgc32m --wait-idle 5 --input "$IN"
done
