"""Tier-table sink (SURVEY.md §2.1 S3): idempotent partitioned parquet writes.

Tier tables are partitioned by ``bucket_date`` (day of ``bucket_start``) so
retention (R4) and resume are partition drops / dynamic overwrites. On
Iceberg this becomes ``overwritePartitions()``; locally we use Spark's dynamic
partition overwrite which is semantically identical for this layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_tier(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a tier table partitioned by bucket_date, dynamic overwrite."""
    (
        df.withColumn("bucket_date", F.to_date("bucket_start"))
        .write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket_date")
        .parquet(path)
    )


def expire(spark, path: str, older_than) -> int:
    """Retention enforcement (R4): drop partitions older than a cutoff.

    Local parquet: delete ``bucket_date=...`` dirs below the cutoff date.
    Iceberg: ``DELETE FROM t WHERE bucket_start < cutoff`` (metadata-only for
    partition-aligned predicates). Returns number of partitions dropped.
    """
    import datetime
    import os
    import shutil

    if isinstance(older_than, str):
        older_than = datetime.date.fromisoformat(older_than)
    elif isinstance(older_than, datetime.datetime):
        older_than = older_than.date()
    dropped = 0
    if not os.path.isdir(path):
        return 0
    for name in os.listdir(path):
        if not name.startswith("bucket_date="):
            continue
        d = datetime.date.fromisoformat(name.split("=", 1)[1])
        if d < older_than:
            shutil.rmtree(os.path.join(path, name))
            dropped += 1
    return dropped
