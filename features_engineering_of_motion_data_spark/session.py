"""SparkSession factory with the engine's canonical configuration.

Local mode is the sandbox stand-in for a multi-executor cluster; the configs
below are chosen so the same code deploys unchanged via
``spark-submit --py-files`` (SURVEY.md §3 E1).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "transcript-rollup",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the canonical SparkSession.

    ``master=None`` defers to spark-submit / an existing session, so the same
    entry points run under a real cluster manager unchanged.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    extra_default: dict[str, str] = {}
    if shuffle_partitions is None:
        # 4 task waves per core, not the 200 default (local mode = 1 JVM) and
        # not 1 wave: measured on the staged cascade (BENCH/sweep_gc4.log,
        # sgc4g_p4 vs sgc4g) a 4-wave layout cuts TOTAL CPU ~20% — smaller
        # per-task agg hash maps stay cache/GC-friendly — on top of
        # bin-packing hot-conversation partition skew (max/mean 1.35 at one
        # wave). The AQE coalesce floor is ONE wave (= core count), not the
        # full 4-wave layout: pinning it at 4 waves keeps the cascade's
        # small-hash-map benefit but forbids AQE from shrinking the many
        # tiny shuffles of the dedup/LSH queries (measured at sf0.1: floor
        # 4w → 1w cuts q25 9.2→6.9 s, q28 14.9→11.5 s, total bench −8%,
        # while the cascade moves <0.5 s). The scaling-gate harness pins
        # its own conf (AQE off) and is unaffected.
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
        shuffle_partitions = 4 * cpus
        extra_default["spark.sql.adaptive.coalescePartitions.minPartitionNum"] = str(
            cpus
        )
    conf = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # modern parquet timestamps (µs), not legacy INT96: INT96 columns get
        # NO footer min/max statistics, which silently disables both engines'
        # row-group skipping and the tier manifest's file-level bucket_start
        # bounds (sources/sinks.py data skipping)
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # bound Arrow batches crossing the JVM<->Python boundary (SURVEY §4)
        "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        **extra_default,
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
