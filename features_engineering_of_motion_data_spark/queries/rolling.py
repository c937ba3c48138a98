"""Rolling tier-window features (round-4, second half): the driver face of
:func:`~..operators.rollup.rolling_merge` — trailing 24h windows merged from
1h sufficient statistics, never from raw rescans.

The oracle is deliberately INDEPENDENT of the merge algebra: DuckDB joins
each present end-bucket to the raw rows of its 24-bucket range and counts
zero crossings from consecutive raw pairs directly (a pair counts iff both
rows' buckets lie in the window).  The driver's bitwise hash equality
therefore proves the engine's windowed stats algebra — including the
Σboundary − first(boundary) zero-crossing window term — against raw-pair
semantics, not against itself.

Exactness follows the package contract (queries/__init__.py): all stats are
exact integers; w_mean/w_std are the pinned q01 finalize tree (m = s1/n,
q = s2/n, var = q − m·m clamped at 0, std = √var) with DuckDB's s2 cast via
split_dbl and Spark's via its single-rounding decimal→double cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.rollup import rolling_merge
from .events import HOUR_US, _base, _bucket
from .signal import _dec
from .sqlexact import split_dbl

_C_SQL = """
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
"""

# trailing window width in 1h buckets (24 buckets = one day); the deviation
# channel x = c − 100.00 units re-centers the all-positive fixture values so
# zero crossings are non-trivial (q02's convention)
ROLL_WIDTH = 24
_DEV_CENTS = 10_000


def q78_rolling_features_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24h rolling features per (conv, present 1h end-bucket) via the
    rolling_merge operator: n, Σx, zero crossings, min/max of the deviation
    channel x = c − 100.00 over the trailing 24 one-hour buckets, plus the
    pinned mean/std finalize.

    Scale shape: base lag window, 1h hash agg, boundary lag window, and the
    RANGE rolling frame all cluster under hash(conv) — a single exchange,
    no Python, and each output row reads ≤ 24 tier rows regardless of how
    many raw rows the day held.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = (
        _base(spark, sf_dir)
        .withColumn("x", F.col("c") - F.lit(_DEV_CENTS))
        .withColumn("prev_x", F.lag("x").over(w))
        .withColumn("prev_ts", F.lag("ts_us").over(w))
    )
    b = _bucket(F.col("ts_us"), HOUR_US)
    prev_b = _bucket(F.col("prev_ts"), HOUR_US)
    sgn = lambda col: F.when(col < 0, F.lit(-1)).otherwise(F.lit(1))  # noqa: E731
    cross = (
        F.col("prev_ts").isNotNull()
        & (prev_b == b)
        & (sgn(F.col("prev_x")) * sgn(F.col("x")) < 0)
    ).cast("long")
    key = F.struct("ts_us", "event_id")
    stats = (
        d.withColumn("bucket_us", b)
        .withColumn("_cross", cross)
        .groupBy(
            F.col("user_id").alias("conv_id"),
            F.lit("value_dev").alias("channel"),
            "bucket_us",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s1"),
            F.sum(_dec(F.col("x")) * _dec(F.col("x")))
            .cast("decimal(38,0)")
            .alias("s2"),
            F.min("x").alias("min_raw"),
            F.max("x").alias("max_raw"),
            F.sum("_cross").alias("zc"),
            F.min_by("ts_us", key).alias("first_ts_us"),
            F.max_by("ts_us", key).alias("last_ts_us"),
            F.min_by("x", key).alias("first_val"),
            F.max_by("x", key).alias("last_val"),
        )
    )
    r = rolling_merge(stats, "1h", ROLL_WIDTH)
    nd = F.col("n").cast("double")
    m = F.col("s1").cast("double") / nd
    q = F.col("s2").cast("double") / nd
    var = q - m * m
    var = F.when(var < 0, F.lit(0.0)).otherwise(var)
    return r.select(
        "conv_id",
        "bucket_us",
        "n",
        "s1",
        "zc",
        F.col("min_raw").alias("min_x"),
        F.col("max_raw").alias("max_x"),
        m.alias("w_mean"),
        F.sqrt(var).alias("w_std"),
    )


_SPAN_US = (ROLL_WIDTH - 1) * HOUR_US

_Q78_SQL = f"""
WITH c AS ({_C_SQL}), nb AS (
  SELECT user_id, ts_us,
         c - {_DEV_CENTS} AS x,
         lag(c - {_DEV_CENTS}) OVER w AS prev_x,
         lag(ts_us) OVER w AS prev_ts
  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), ends AS (
  SELECT DISTINCT user_id, ts_us - ts_us % {HOUR_US} AS e FROM nb
), j AS (
  SELECT ends.user_id, ends.e, nb.x, nb.prev_x, nb.prev_ts
  FROM ends JOIN nb ON nb.user_id = ends.user_id
   AND nb.ts_us - nb.ts_us % {HOUR_US} BETWEEN ends.e - {_SPAN_US} AND ends.e
), g AS (
  SELECT user_id AS conv_id, e AS bucket_us,
         COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS s1,
         SUM(CAST(x AS HUGEINT) * x) AS s2,
         CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                        AND prev_ts - prev_ts % {HOUR_US} >= e - {_SPAN_US}
                        AND (CASE WHEN x < 0 THEN -1 ELSE 1 END)
                          * (CASE WHEN prev_x < 0 THEN -1 ELSE 1 END) < 0
                   THEN 1 ELSE 0 END) AS BIGINT) AS zc,
         CAST(MIN(x) AS BIGINT) AS min_x,
         CAST(MAX(x) AS BIGINT) AS max_x
  FROM j GROUP BY 1, 2
)
SELECT conv_id, bucket_us, n, s1, zc, min_x, max_x,
       CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS w_mean,
       sqrt(CASE WHEN {split_dbl("s2")} / CAST(n AS DOUBLE)
                   - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) < 0
            THEN 0.0
            ELSE {split_dbl("s2")} / CAST(n AS DOUBLE)
                   - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
            END) AS w_std
FROM g
"""


QUERIES = {
    "q78_rolling_features_24h": q78_rolling_features_24h,
}

ORACLE_SQL = {
    "q78_rolling_features_24h": _Q78_SQL,
}
