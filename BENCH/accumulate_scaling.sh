#!/bin/bash
# Round-3 scaling-sample accumulation loop (protocol: BENCH/BASELINE.md).
#
# Cycles four interleaved sampling passes — the noaqe_serialgc config variant
# on both gate pairs (1->4, 2->8), then the default-config primary record on
# the same pairs. Each pass is itself interleaved and idle-gated; min-of-
# samples per arm is the estimator, so extra samples can only sharpen an
# arm's quiet-window minimum, never bias it. Run in the background for the
# whole session; kill when the record meets the >=3-quiet-samples-per-arm
# standard.
cd "$(dirname "$0")/.." || exit 1
CONF='{"spark.sql.adaptive.enabled": "false", "spark.driver.extraJavaOptions": "-XX:+UseSerialGC"}'
while true; do
  SPARK_GRAFT_EXTRA_CONF="$CONF" python BENCH/run_scaling.py --pin --reps 1 --cores 1,4 --conf-tag noaqe_serialgc --wait-idle 6
  SPARK_GRAFT_EXTRA_CONF="$CONF" python BENCH/run_scaling.py --pin --reps 1 --cores 2,8 --conf-tag noaqe_serialgc --wait-idle 6
  python BENCH/run_scaling.py --pin --reps 1 --cores 4,1 --wait-idle 6
  python BENCH/run_scaling.py --pin --reps 1 --cores 8,2 --wait-idle 6
done
