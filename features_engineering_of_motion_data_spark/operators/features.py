"""Tier feature aggregation (SURVEY.md §2.4 A1–A8, DESIGN.md §1–§3, §5).

The reference library computes windowed statistical features (mean, std, RMS,
min/max, zero-crossings, energy) with per-window numpy calls over motion
signals; here the same feature contract is expressed as a single native Spark
hash aggregation over exact-integer sufficient statistics, so the hot path is
whole-stage-codegen JVM work with zero Python, and every partial merge is an
integer add/min/max — associative and order-free, hence bit-identical at any
parallelism (the N-vs-4N exactness requirement, SURVEY.md §4 last para).

Pipeline position::

    derive_channels(...)  →  aggregate_tier(df, '1m')  →  rollup_merge(...)
                                     │
                              finalize_features(...)   →  tier table

``aggregate_tier`` produces the *sufficient statistics* frame; tiers above the
base are produced by :mod:`.rollup`'s merge algebra, never by re-reading raw.
``finalize_features`` applies the pinned float64 evaluation order of
DESIGN.md §2 — each step is one IEEE-754 double op, so the JVM and the numpy
oracle (oracle/features.py) produce identical bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TIER_US = {"1m": 60_000_000, "1h": 3_600_000_000, "1d": 86_400_000_000}

#: stat columns carried by every tier's sufficient-statistics frame
STAT_COLS = [
    "n",
    "s1",
    "s2",
    "min_raw",
    "max_raw",
    "zc",
    "first_ts_us",
    "last_ts_us",
    "first_val",
    "last_val",
]

KEY_COLS = ["conv_id", "channel", "bucket_us"]


def bucket_us(col: Column, tier: str) -> Column:
    """Epoch-aligned bucket floor in µs (DESIGN.md §5).

    Pure integer arithmetic — ``ts − pmod(ts, step)`` — because float division
    of µs-scale int64 loses ulps near bucket edges.
    """
    step = F.lit(TIER_US[tier])
    return (col - F.pmod(col, step)).alias("bucket_us")


def _sign(col: Column) -> Column:
    """sign(x) = −1 if x < 0 else +1; sign(0) = +1 (DESIGN.md §3)."""
    return F.when(col < 0, F.lit(-1)).otherwise(F.lit(1))


def aggregate_tier(channels: DataFrame, tier: str) -> DataFrame:
    """Base-tier sufficient statistics per (conv_id, channel, bucket).

    Input is :func:`..operators.channels.derive_channels` output — the long
    channel frame already carries ``prev_x``/``prev_ts_us`` from the same
    window pass, so the zero-crossing indicator (a crossing belongs to bucket
    b iff *both* turns of the consecutive pair truncate to b; DESIGN.md §3)
    is a row-local expression and this whole operator is one hash aggregation
    that reuses the existing hash(conv_id) partitioning — no extra shuffle.

    s2 = Σx² is decimal(38,0): latency-µs squared exceeds int64; decimal sums
    are exact integers, keeping every merge bit-exact.
    """
    step = F.lit(TIER_US[tier])
    b = F.col("ts_us") - F.pmod(F.col("ts_us"), step)
    prev_b = F.col("prev_ts_us") - F.pmod(F.col("prev_ts_us"), step)
    cross = (
        F.col("prev_ts_us").isNotNull()
        & (prev_b == b)
        & (_sign(F.col("prev_x")) * _sign(F.col("x")) < 0)
    ).cast("long")

    x_dec = F.col("x").cast("decimal(19,0)")
    return (
        channels.withColumn("bucket_us", b)
        .withColumn("_cross", cross)
        .groupBy("conv_id", "channel", "bucket_us")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s1"),
            F.sum(x_dec * x_dec).cast("decimal(38,0)").alias("s2"),
            F.min("x").alias("min_raw"),
            F.max("x").alias("max_raw"),
            F.sum("_cross").alias("zc"),
            F.min_by("ts_us", "turn_idx").alias("first_ts_us"),
            F.max_by("ts_us", "turn_idx").alias("last_ts_us"),
            F.min_by("x", "turn_idx").alias("first_val"),
            F.max_by("x", "turn_idx").alias("last_val"),
        )
    )


def unit_divisor(channel: Column) -> Column:
    """Per-channel raw-unit divisor u (DESIGN.md §1): µs→s for latency."""
    return F.when(channel == F.lit("inter_turn_latency"), F.lit(1e6)).otherwise(
        F.lit(1.0)
    )


def finalize_features(stats: DataFrame) -> DataFrame:
    """Pinned float64 finalization (DESIGN.md §2) — verbatim evaluation order.

    Every arithmetic step below is a single IEEE-754 double operation mirrored
    exactly in oracle/features.py::_finalize; int→double and decimal→double
    casts are correctly rounded on both the JVM and CPython.
    """
    fn = F.col("n").cast("double")
    m = F.col("s1").cast("double") / fn
    q = F.col("s2").cast("double") / fn
    var = q - m * m
    var = F.when(var < 0, F.lit(0.0)).otherwise(var)
    u = unit_divisor(F.col("channel"))
    return stats.select(
        "conv_id",
        "channel",
        F.timestamp_micros(F.col("bucket_us")).alias("bucket_start"),
        (m / u).alias("f_mean"),
        (F.sqrt(var) / u).alias("f_std"),
        (F.sqrt(q) / u).alias("f_rms"),
        (F.col("min_raw").cast("double") / u).alias("f_min"),
        (F.col("max_raw").cast("double") / u).alias("f_max"),
        F.col("zc").alias("f_zero_crossings"),
        (F.col("s2").cast("double") / (u * u)).alias("f_energy"),
        *STAT_COLS,
    )


def features_from_turns(channels: DataFrame, tier: str) -> DataFrame:
    """Convenience: base aggregation + finalization at one tier."""
    return finalize_features(aggregate_tier(channels, tier))
