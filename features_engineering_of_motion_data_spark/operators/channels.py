"""Dedup + channel derivation (SURVEY.md §2.2 P1/P4, §1.2).

The transcripts table becomes a long-format integer signal table
``(conv_id, channel, turn_idx, ts_us, x, prev_x, prev_ts_us)`` with one
window pass per conversation. All channel values are exact integers
(DESIGN.md §1); ``prev_*`` columns let every retention tier compute its own
zero-crossing indicator without another shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# sorts-last sentinel for null text in the dedup tie-break (DESIGN.md §4)
_NULL_LAST = "￿"


def dedup_turns(df: DataFrame) -> DataFrame:
    """P4: keep the first row per (conv_id, turn_idx) under the deterministic
    tie-break (ts asc, md5(text) asc, nulls last).

    Deliberately windowed by ``conv_id`` alone (ordered by turn_idx, ts, md5)
    rather than by (conv_id, turn_idx): ``HashPartitioning(conv_id)``
    satisfies the clustering required by every downstream window/groupBy in
    the pipeline (all key on conv_id supersets), so dedup → channels → tier
    aggregation → full cascade runs on a SINGLE shuffle.
    """
    w = Window.partitionBy("conv_id").orderBy(
        F.col("turn_idx").asc(),
        F.col("ts").asc(),
        F.coalesce(F.md5(F.col("text").cast("binary")), F.lit(_NULL_LAST)).asc(),
    )
    dup = F.lag("turn_idx").over(w) == F.col("turn_idx")
    return (
        df.withColumn("_dup", F.coalesce(dup, F.lit(False)))
        .filter(~F.col("_dup"))
        .drop("_dup")
    )


def derive_channels(df: DataFrame) -> DataFrame:
    """P1 + W1 + melt: per-turn integer channel values in long format.

    One shuffle (hash by conv_id for the lag window); the melt itself is
    narrow. Output carries prev_x/prev_ts_us from the same window pass so
    tier aggregation needs no further window.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    base = (
        df.select(
            "conv_id",
            "turn_idx",
            F.unix_micros("ts").alias("ts_us"),
            F.when(F.col("text").isNotNull(), F.length("text").cast("long")).alias(
                "text_len"
            ),
            F.col("tool").isNotNull().cast("long").alias("tool_cadence"),
        )
        .withColumn("lat_us", F.col("ts_us") - F.lag("ts_us").over(w))
    )
    melted = base.selectExpr(
        "conv_id",
        "turn_idx",
        "ts_us",
        "stack(3, 'text_len', text_len, 'inter_turn_latency', lat_us,"
        " 'tool_cadence', tool_cadence) as (channel, x)",
    ).filter(F.col("x").isNotNull())
    # per-(conv, channel) previous observation, ordered by turn_idx
    wc = Window.partitionBy("conv_id", "channel").orderBy("turn_idx")
    return melted.select(
        "conv_id",
        "channel",
        "turn_idx",
        "ts_us",
        "x",
        F.lag("x").over(wc).alias("prev_x"),
        F.lag("ts_us").over(wc).alias("prev_ts_us"),
    )
