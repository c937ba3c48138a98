"""Archive-codec round-trip query (the driver face of SURVEY.md §2.7 C1–C3).

The codecs (delta-of-delta timestamps, Gorilla-XOR values — kernels/codecs.py)
were previously attested only by pytest (hypothesis round-trips, adversarial
floats).  q81 runs the FULL archive path — channel frame → ``build_archive``
(applyInPandas encode per (conv, channel)) → ``decode_archive`` (mapInPandas
decode-scan) — and emits per-(conv, 1h bucket) digests of the DECODED rows:
row count, value sum, and an md5 over the ordered ``turn:ts:x`` series.  The
oracle computes the identical digests from the RAW rows with no codec in the
loop, so the driver's hash equality proves the encode→decode loop is exact —
including element order, every timestamp bit, and every value bit (the md5
covers the full decoded sequence, not just aggregates).

Scale shape: the turn-order window and the encode groupBy share ONE
hash(conv_id) exchange (the window keys on the same string key the groupBy
uses — plan-checked: two exchanges total); decode is a narrow mapInPandas
explode, after which the digest agg necessarily re-shuffles (a pandas
explode cannot advertise its partitioning to Catalyst).  The digest's
``collect_list`` is bounded by bucket size (≤ one hour of one
conversation), the same bound the archive payload itself has — this is an
audit query, run per bucket, never a global collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.archive import build_archive, decode_archive
from .events import HOUR_US, _base

_C_SQL = """
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
"""


def q81_archive_roundtrip_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode + decode every (conv, 1h bucket) of the events value channel
    through the C1/C2 codecs, then digest the decoded rows per bucket:
    ``n``, ``s1`` (Σ cents), and ``digest`` = md5 of the turn-ordered
    ``turn_idx:ts_us:x`` series — compared against codec-free SQL."""
    # window on the STRING key the encode groupBy uses: alias tracking does
    # not survive a cast, so partitioning by user_id here would force a
    # second exchange before build_archive's groupBy(conv_id, channel) —
    # keyed this way the window and the encode share one hash(conv_id)
    # exchange (row_number per string key ≡ per user_id; the cast is 1:1)
    w = Window.partitionBy("conv_id").orderBy("ts_us", "event_id")
    ch = _base(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.lit("value").alias("channel"),
        "ts_us",
        F.col("c").alias("x"),
        "event_id",
    ).select(
        "conv_id",
        "channel",
        F.row_number().over(w).cast("int").alias("turn_idx"),
        "ts_us",
        "x",
    )
    decoded = decode_archive(build_archive(ch, "1h"))
    ser = F.concat_ws(
        ":",
        F.col("turn_idx").cast("string"),
        F.col("ts_us").cast("string"),
        F.col("x").cast("string"),
    )
    return (
        decoded.withColumn(
            "bucket_us", F.col("ts_us") - F.pmod(F.col("ts_us"), F.lit(HOUR_US))
        )
        .withColumn("_ser", ser)
        .groupBy("conv_id", "bucket_us")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s1"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("turn_idx", "_ser"))
                        ),
                        lambda s: s["_ser"],
                    ),
                    ",",
                ).cast("binary")
            ).alias("digest"),
        )
    )


_Q81_SQL = f"""
WITH c AS ({_C_SQL}), s AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS turn_idx,
         ts_us, c AS x
  FROM c
)
SELECT conv_id, ts_us - ts_us % {HOUR_US} AS bucket_us,
       COUNT(*) AS n,
       CAST(SUM(x) AS BIGINT) AS s1,
       md5(string_agg(turn_idx || ':' || ts_us || ':' || x, ','
                      ORDER BY turn_idx)) AS digest
FROM s GROUP BY 1, 2
"""


QUERIES = {
    "q81_archive_roundtrip_1h": q81_archive_roundtrip_1h,
}

ORACLE_SQL = {
    "q81_archive_roundtrip_1h": _Q81_SQL,
}
