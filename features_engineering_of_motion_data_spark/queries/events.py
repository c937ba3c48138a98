"""Time-series queries over the driver's ``events`` fixture.

``events`` is the transcript-stream stand-in (FIXTURES.md §B): user_id →
conv_id, value → signal. Every pair here follows the exact-integer bridging
contract from the package docstring: doubles are scaled to cent BIGINTs, all
cross-engine aggregation is integer, derived floats use pinned IEEE-754 op
sequences written identically in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000
SESSION_GAP_US = 1_800_000_000  # 30 min


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """user_id, event_id, event_type, ts_us (epoch µs), c (value in cents)."""
    return _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        # fixture parquet carries TIMESTAMP_NTZ; session TZ is pinned UTC so
        # the cast to TIMESTAMP is value-preserving
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    )


def _bucket(col, step: int):
    return col - F.pmod(col, F.lit(step))


# --- q01: A1–A8 feature aggregation, 1h tier (flagship) ----------------------


def q01_tier_features_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        _base(spark, sf_dir)
        .groupBy(
            F.col("user_id").alias("conv_id"),
            _bucket(F.col("ts_us"), HOUR_US).alias("bucket_us"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("s1_cents"),
            F.sum(F.col("c") * F.col("c")).alias("s2_cents2"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
        )
    )
    fn = F.col("n").cast("double")
    m = F.col("s1_cents").cast("double") / fn
    q = F.col("s2_cents2").cast("double") / fn
    var = F.greatest(q - m * m, F.lit(0.0))
    return s.select(
        "conv_id",
        "bucket_us",
        "n",
        "s1_cents",
        "s2_cents2",
        "min_cents",
        "max_cents",
        (m / F.lit(100.0)).alias("f_mean"),
        (F.sqrt(var) / F.lit(100.0)).alias("f_std"),
        (F.sqrt(q) / F.lit(100.0)).alias("f_rms"),
        (F.col("min_cents").cast("double") / F.lit(100.0)).alias("f_min"),
        (F.col("max_cents").cast("double") / F.lit(100.0)).alias("f_max"),
        (F.col("s2_cents2").cast("double") / F.lit(10000.0)).alias("f_energy"),
    )


_Q01_SQL = f"""
WITH c AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(ts) % {HOUR_US} AS bucket_us,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
), s AS (
  SELECT user_id AS conv_id, bucket_us,
         COUNT(*) AS n,
         CAST(SUM(c) AS BIGINT) AS s1_cents,
         CAST(SUM(c * c) AS BIGINT) AS s2_cents2,
         MIN(c) AS min_cents,
         MAX(c) AS max_cents
  FROM c GROUP BY 1, 2
)
SELECT conv_id, bucket_us, n, s1_cents, s2_cents2, min_cents, max_cents,
       (CAST(s1_cents AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 AS f_mean,
       sqrt(greatest(CAST(s2_cents2 AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(s1_cents AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(s1_cents AS DOUBLE) / CAST(n AS DOUBLE)),
                     0.0)) / 100.0 AS f_std,
       sqrt(CAST(s2_cents2 AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 AS f_rms,
       CAST(min_cents AS DOUBLE) / 100.0 AS f_min,
       CAST(max_cents AS DOUBLE) / 100.0 AS f_max,
       CAST(s2_cents2 AS DOUBLE) / 10000.0 AS f_energy
FROM s
"""


# --- q02: zero crossings (A5), centered signal, 1d tier ----------------------


def q02_zero_crossings_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crossings of (value − 100.00) per (user, day); a crossing is counted
    in bucket b iff BOTH turns of the consecutive pair land in b (DESIGN §3)."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = (
        _base(spark, sf_dir)
        .withColumn("x", F.col("c") - F.lit(10_000))
        .withColumn("prev_x", F.lag("x").over(w))
        .withColumn("prev_ts", F.lag("ts_us").over(w))
    )
    sign = F.when(F.col("x") < 0, -1).otherwise(1)
    prev_sign = F.when(F.col("prev_x") < 0, -1).otherwise(1)
    cross = (
        F.col("prev_ts").isNotNull()
        & (_bucket(F.col("prev_ts"), DAY_US) == _bucket(F.col("ts_us"), DAY_US))
        & (sign * prev_sign < 0)
    ).cast("long")
    return (
        d.withColumn("_cross", cross)
        .groupBy(
            F.col("user_id").alias("conv_id"),
            _bucket(F.col("ts_us"), DAY_US).alias("bucket_us"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_cross").alias("f_zero_crossings"))
    )


_Q02_SQL = f"""
WITH c AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100, 0) AS BIGINT) - 10000 AS x
  FROM events
), lagged AS (
  SELECT user_id, ts_us, x,
         lag(x) OVER w AS prev_x,
         lag(ts_us) OVER w AS prev_ts
  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT user_id AS conv_id,
       ts_us - ts_us % {DAY_US} AS bucket_us,
       COUNT(*) AS n,
       CAST(COALESCE(SUM(CASE WHEN prev_ts IS NOT NULL
                      AND prev_ts - prev_ts % {DAY_US} = ts_us - ts_us % {DAY_US}
                      AND (CASE WHEN x < 0 THEN -1 ELSE 1 END)
                          * (CASE WHEN prev_x < 0 THEN -1 ELSE 1 END) < 0
                 THEN 1 ELSE 0 END), 0) AS BIGINT) AS f_zero_crossings
FROM lagged GROUP BY 1, 2
"""


# --- q03: inter-event latency (W1 lag) ---------------------------------------


def q03_inter_event_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    return (
        _base(spark, sf_dir)
        .withColumn("gap_us", gap)
        .filter(F.col("gap_us").isNotNull())
        .groupBy(F.col("user_id").alias("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_us").alias("sum_gap_us"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
    )


_Q03_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
  FROM events
)
SELECT user_id AS conv_id,
       COUNT(*) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
       MIN(gap_us) AS min_gap_us,
       MAX(gap_us) AS max_gap_us
FROM g WHERE gap_us IS NOT NULL GROUP BY 1
"""


# --- q04: turn rate (A8) -----------------------------------------------------


def q04_turn_rate_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _base(spark, sf_dir)
        .groupBy(
            F.col("user_id").alias("conv_id"),
            _bucket(F.col("ts_us"), HOUR_US).alias("bucket_us"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("turn_rate", F.col("n").cast("double") / F.lit(3600.0))
    )


_Q04_SQL = f"""
SELECT user_id AS conv_id,
       epoch_us(ts) - epoch_us(ts) % {HOUR_US} AS bucket_us,
       COUNT(*) AS n,
       CAST(COUNT(*) AS DOUBLE) / 3600.0 AS turn_rate
FROM events GROUP BY 1, 2
"""


# --- q05: dedup / keep-first (P4, W2) ----------------------------------------


def q05_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    return (
        _base(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("conv_id"),
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts_us").alias("first_ts_us"),
        )
    )


_Q05_SQL = """
WITH r AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
)
SELECT user_id AS conv_id, event_type,
       event_id AS first_event_id, ts_us AS first_ts_us
FROM r WHERE rn = 1
"""


# --- q06: sessionization (conversation episodes; §2.10 batch analogue) -------


def q06_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag("ts_us").over(w)
    new_sess = (
        prev.isNull() | ((F.col("ts_us") - prev) > F.lit(SESSION_GAP_US))
    ).cast("long")
    per_sess = (
        _base(spark, sf_dir)
        .withColumn("sess_idx", F.sum(new_sess).over(wrun))
        .groupBy("user_id", "sess_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("ts_us") - F.min("ts_us")).alias("dur_us"),
        )
    )
    return per_sess.groupBy(F.col("user_id").alias("conv_id")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.max("dur_us").alias("max_session_us"),
    )


_Q06_SQL = f"""
WITH g AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), s AS (
  SELECT user_id, ts_us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_idx
  FROM g
), per_sess AS (
  SELECT user_id, sess_idx, COUNT(*) AS n_events,
         MAX(ts_us) - MIN(ts_us) AS dur_us
  FROM s GROUP BY 1, 2
)
SELECT user_id AS conv_id,
       COUNT(*) AS n_sessions,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events,
       MAX(dur_us) AS max_session_us
FROM per_sess GROUP BY 1
"""


# --- q07: as-of join via window (J4) -----------------------------------------


def q07_asof_prior_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each error event: ts of the latest signup at-or-before it (same
    user). Spark has no native as-of join; this is the documented window
    formulation (SURVEY §2.3 J4)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sig = F.max(
        F.when(F.col("event_type") == "signup", F.col("ts_us"))
    ).over(w)
    return (
        _base(spark, sf_dir)
        .withColumn("asof_signup_us", sig)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id"),
            F.col("user_id").alias("conv_id"),
            F.col("ts_us"),
            "asof_signup_us",
        )
    )


_Q07_SQL = """
WITH w AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
         MAX(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS UNBOUNDED PRECEDING) AS asof_signup_us
  FROM events
)
SELECT event_id, user_id AS conv_id, ts_us, asof_signup_us
FROM w WHERE event_type = 'error'
"""


# --- q08: json props (F5) ----------------------------------------------------


def q08_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        _events(spark, sf_dir)
        .withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


_Q08_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY 1
"""


# --- q09: top-k hot conversations (O2) ---------------------------------------


def q09_topk_hot_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(F.col("user_id").alias("conv_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("conv_id"))
        .limit(10)
    )


_Q09_SQL = """
SELECT user_id AS conv_id, COUNT(*) AS n
FROM events GROUP BY 1
ORDER BY n DESC, conv_id ASC LIMIT 10
"""


# --- q10: grouping sets / rollup (A10) ---------------------------------------


def q10_rollup_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _base(spark, sf_dir)
        .rollup("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("sum_cents"))
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            "n",
            "sum_cents",
        )
    )


_Q10_SQL = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY ROLLUP (event_type)
"""


# --- q19: sliding-window rolling features (W3 — the reference's overlapping
# windows, expressed as a row frame) ------------------------------------------


def q19_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling stats over the last 4 events per user — the Spark face of the
    reference library's sliding/overlapping feature windows."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-3, 0)
    )
    d = _base(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("conv_id"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
        F.sum("c").over(w).alias("roll_s1_cents"),
        F.min("c").over(w).alias("roll_min_cents"),
        F.max("c").over(w).alias("roll_max_cents"),
    )
    mean = (
        F.col("roll_s1_cents").cast("double")
        / F.col("roll_n").cast("double")
        / F.lit(100.0)
    )
    return d.withColumn("roll_mean", mean)


_Q19_SQL = """
WITH c AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
), r AS (
  SELECT event_id, user_id AS conv_id,
         COUNT(*) OVER w AS roll_n,
         CAST(SUM(c) OVER w AS BIGINT) AS roll_s1_cents,
         MIN(c) OVER w AS roll_min_cents,
         MAX(c) OVER w AS roll_max_cents
  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
)
SELECT event_id, conv_id, roll_n, roll_s1_cents, roll_min_cents,
       roll_max_cents,
       CAST(roll_s1_cents AS DOUBLE) / CAST(roll_n AS DOUBLE) / 100.0
         AS roll_mean
FROM r
"""


# --- q35: per-tier ops metrics (A9 at the table level) -----------------------


def q35_tier_ops_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events-fixture face of operators/metrics.tier_metrics: one metrics
    row per tier summarizing what an operator monitors — bucket count, point
    volume, exact distinct conversations, bucket coverage, checksum-grade
    total. (The HLL-sketch twin column is engine-specific and covered by
    tests/test_metrics.py; this driver-checked face keeps to portable SQL.)
    """
    b = _base(spark, sf_dir)
    outs = []
    for tier, step in (("1h", HOUR_US), ("1d", DAY_US)):
        s = b.groupBy(
            "user_id", _bucket(F.col("ts_us"), step).alias("bucket_us")
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("s1"))
        outs.append(
            s.agg(
                F.count(F.lit(1)).alias("n_buckets"),
                F.sum("n").alias("n_points"),
                F.countDistinct("user_id").alias("n_convs"),
                F.min("bucket_us").alias("first_bucket_us"),
                F.max("bucket_us").alias("last_bucket_us"),
                F.sum("s1").alias("total_s1_cents"),
            ).select(F.lit(tier).alias("tier"), "*")
        )
    return outs[0].unionByName(outs[1])


_Q35_SQL = f"""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
), tiers(tier, step) AS (VALUES ('1h', {HOUR_US}), ('1d', {DAY_US})),
s AS (
  SELECT tier, user_id, ts_us - ts_us % step AS bucket_us,
         COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s1
  FROM c, tiers GROUP BY 1, 2, 3
)
SELECT tier,
       COUNT(*) AS n_buckets,
       CAST(SUM(n) AS BIGINT) AS n_points,
       COUNT(DISTINCT user_id) AS n_convs,
       MIN(bucket_us) AS first_bucket_us,
       MAX(bucket_us) AS last_bucket_us,
       CAST(SUM(s1) AS BIGINT) AS total_s1_cents
FROM s GROUP BY 1
"""


# --- q38: tier-level gap-fill with linear interpolation (G1/G2, driver face) -


def q38_gapfill_linear_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate gap-fill: densify each conversation's 1h bucket
    grid between its first and last observed bucket and fill missing buckets'
    mean by linear interpolation between the neighboring observed means
    (TimescaleDB ``time_bucket_gapfill``+``interpolate`` semantics; the
    tier-table face of operators/gapfill.py, whose kernel fills raw series —
    here the SAME no-extrapolation rule holds by construction because the
    grid spans exactly the observed range).

    Exactness bridge: observed means derive from exact cent BIGINTs via the
    pinned ``(s1/n)/100.0`` sequence; the interpolation
    ``x0 + (x1-x0) * ((t-t0)/(t1-t0))`` is the identical IEEE-754 double op
    order on both engines over exact integer inputs, so even filled doubles
    match DuckDB bitwise.

    Scale shape (single-pass): one scan → one hash agg → one ``lead()``
    window; each observed bucket emits itself plus its following gap's
    filled rows through ONE struct-array explode, so there is no grid
    self-join and the raw input is never scanned twice.  Output rows are
    bounded by (observed span / bucket width) per conv.  (The DuckDB oracle
    uses an equivalent grid + IGNORE-NULLS-window formulation — independent
    derivation, same semantics.)
    """
    s = (
        _base(spark, sf_dir)
        .groupBy("user_id", _bucket(F.col("ts_us"), HOUR_US).alias("bucket_us"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("s1"))
    )
    w = Window.partitionBy("user_id").orderBy("bucket_us")
    x_obs = (F.col("s1").cast("double") / F.col("n").cast("double")) / F.lit(
        100.0
    )
    d = (
        s.withColumn("x0", x_obs)
        .withColumn("t1", F.lead("bucket_us").over(w))
        .withColumn("x1", F.lead(x_obs).over(w))
    )
    gap = F.when(
        F.col("t1").isNotNull() & (F.col("t1") > F.col("bucket_us") + HOUR_US),
        F.sequence(
            F.col("bucket_us") + HOUR_US,
            F.col("t1") - HOUR_US,
            F.lit(HOUR_US),
        ),
    ).otherwise(F.array().cast("array<bigint>"))

    def _interp(fb):
        frac = (fb - F.col("bucket_us")).cast("double") / (
            F.col("t1") - F.col("bucket_us")
        ).cast("double")
        return F.col("x0") + (F.col("x1") - F.col("x0")) * frac

    items = F.concat(
        F.array(
            F.struct(
                F.col("bucket_us").alias("b"),
                F.col("n").alias("n"),
                F.lit(0).alias("is_filled"),
                F.col("x0").alias("x"),
            )
        ),
        F.transform(
            gap,
            lambda fb: F.struct(
                fb.alias("b"),
                F.lit(0).cast("long").alias("n"),
                F.lit(1).alias("is_filled"),
                _interp(fb).alias("x"),
            ),
        ),
    )
    return d.select(
        F.col("user_id").alias("conv_id"),
        F.explode(items).alias("it"),
    ).select(
        "conv_id",
        F.col("it.b").alias("bucket_us"),
        F.col("it.n").alias("n"),
        F.col("it.is_filled").alias("is_filled"),
        F.col("it.x").alias("x_mean"),
    )


_Q38_SQL = f"""
WITH c AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(ts) % {HOUR_US} AS bucket_us,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
), s AS (
  SELECT user_id, bucket_us, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s1
  FROM c GROUP BY 1, 2
), rng AS (
  SELECT user_id, MIN(bucket_us) AS b0, MAX(bucket_us) AS b1 FROM s GROUP BY 1
), grid AS (
  SELECT user_id,
         unnest(generate_series(b0, b1, {HOUR_US})) AS bucket_us
  FROM rng
), j AS (
  SELECT g.user_id, g.bucket_us, s.n, s.s1
  FROM grid g LEFT JOIN s ON s.user_id = g.user_id AND s.bucket_us = g.bucket_us
), w AS (
  SELECT user_id, bucket_us, n,
         CASE WHEN n IS NOT NULL
              THEN (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 END AS x_obs,
         last_value(CASE WHEN n IS NOT NULL THEN bucket_us END IGNORE NULLS)
           OVER wp AS t0,
         last_value(CASE WHEN n IS NOT NULL
              THEN (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 END IGNORE NULLS)
           OVER wp AS x0,
         first_value(CASE WHEN n IS NOT NULL THEN bucket_us END IGNORE NULLS)
           OVER wn AS t1,
         first_value(CASE WHEN n IS NOT NULL
              THEN (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 END IGNORE NULLS)
           OVER wn AS x1
  FROM j
  WINDOW wp AS (PARTITION BY user_id ORDER BY bucket_us ROWS UNBOUNDED PRECEDING),
         wn AS (PARTITION BY user_id ORDER BY bucket_us
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id AS conv_id, bucket_us,
       CAST(COALESCE(n, 0) AS BIGINT) AS n,
       CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS INT) AS is_filled,
       CASE WHEN n IS NOT NULL THEN x_obs
            ELSE x0 + (x1 - x0) * (CAST(bucket_us - t0 AS DOUBLE)
                                   / CAST(t1 - t0 AS DOUBLE)) END AS x_mean
FROM w
"""


# --- q39: OHLC downsample (first/last/min/max per bucket) --------------------


def q39_downsample_ohlc_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick/monitoring downsample: per (conv, 1h bucket) the open
    (first by ts), close (last by ts), low, high, and count — the standard
    lossy downsample of every timeseries store's retention path, here kept
    fully exact (cent BIGINTs; first/last resolved by the deterministic
    (ts, event_id) order both engines share).

    Scale shape: two row_number windows + one hash agg, all partitioned on
    the same (conv, bucket) key — a single shuffle end-to-end.
    """
    d = _base(spark, sf_dir).withColumn(
        "bucket_us", _bucket(F.col("ts_us"), HOUR_US)
    )
    wa = Window.partitionBy("user_id", "bucket_us").orderBy(
        F.asc("ts_us"), F.asc("event_id")
    )
    wd = Window.partitionBy("user_id", "bucket_us").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    d = d.withColumn("rna", F.row_number().over(wa)).withColumn(
        "rnd", F.row_number().over(wd)
    )
    return d.groupBy(
        F.col("user_id").alias("conv_id"), "bucket_us"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.when(F.col("rna") == 1, F.col("c"))).alias("open_cents"),
        F.max(F.when(F.col("rnd") == 1, F.col("c"))).alias("close_cents"),
        F.min("c").alias("low_cents"),
        F.max("c").alias("high_cents"),
    )


_Q39_SQL = f"""
WITH c AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         epoch_us(ts) - epoch_us(ts) % {HOUR_US} AS bucket_us,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
), r AS (
  SELECT user_id, bucket_us, c,
         row_number() OVER (PARTITION BY user_id, bucket_us
                            ORDER BY ts_us ASC, event_id ASC) AS rna,
         row_number() OVER (PARTITION BY user_id, bucket_us
                            ORDER BY ts_us DESC, event_id DESC) AS rnd
  FROM c
)
SELECT user_id AS conv_id, bucket_us,
       COUNT(*) AS n,
       MAX(CASE WHEN rna = 1 THEN c END) AS open_cents,
       MAX(CASE WHEN rnd = 1 THEN c END) AS close_cents,
       MIN(c) AS low_cents,
       MAX(c) AS high_cents
FROM r GROUP BY 1, 2
"""


# --- q40: counter increase with reset detection (PromQL increase()) ----------


def q40_counter_increase_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic-counter semantics over an arbitrary series: per (conv, 1h
    bucket), the summed positive deltas between consecutive samples whose
    pair lies inside the bucket (same pair-in-bucket convention as q02's
    zero-crossings), treating a drop as a counter reset — the reset
    contributes the post-reset value, exactly PromQL's ``increase()``
    reconstruction. Resets are also counted. All arithmetic on cent
    BIGINTs — exact at any parallelism.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = (
        _base(spark, sf_dir)
        .withColumn("prev_c", F.lag("c").over(w))
        .withColumn("prev_ts", F.lag("ts_us").over(w))
    )
    in_bucket = F.col("prev_ts").isNotNull() & (
        _bucket(F.col("prev_ts"), HOUR_US) == _bucket(F.col("ts_us"), HOUR_US)
    )
    inc = F.when(
        in_bucket,
        F.when(F.col("c") >= F.col("prev_c"), F.col("c") - F.col("prev_c"))
        .otherwise(F.col("c")),
    ).otherwise(F.lit(0))
    reset = (in_bucket & (F.col("c") < F.col("prev_c"))).cast("long")
    return (
        d.groupBy(
            F.col("user_id").alias("conv_id"),
            _bucket(F.col("ts_us"), HOUR_US).alias("bucket_us"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(inc).alias("increase_cents"),
            F.sum(reset).alias("n_resets"),
        )
    )


_Q40_SQL = f"""
WITH c AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
), lagged AS (
  SELECT user_id, ts_us, c,
         lag(c) OVER w AS prev_c,
         lag(ts_us) OVER w AS prev_ts
  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT user_id AS conv_id,
       ts_us - ts_us % {HOUR_US} AS bucket_us,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                      AND prev_ts - prev_ts % {HOUR_US} = ts_us - ts_us % {HOUR_US}
                     THEN CASE WHEN c >= prev_c THEN c - prev_c ELSE c END
                     ELSE 0 END) AS BIGINT) AS increase_cents,
       CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                      AND prev_ts - prev_ts % {HOUR_US} = ts_us - ts_us % {HOUR_US}
                      AND c < prev_c
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_resets
FROM lagged GROUP BY 1, 2
"""


# --- q41: exact percentiles of inter-turn latency ----------------------------


def q41_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of the inter-turn gap per conversation — the
    monitoring-tier quantile feature, computed EXACTLY (not sketch-based)
    with the standard linear-interpolation definition, written as a pinned
    op sequence so DuckDB matches bitwise: for quantile p over n sorted
    values, ``idx = (n-1)·p``, ``x = x_lo + (x_hi − x_lo)·(idx − lo)``
    with lo/hi the flanking ranks.  Engine-native ``percentile_approx`` is
    the at-scale sketch twin (engine-specific merge, so not oracle-able);
    this exact form needs one sort per conversation — fine for per-conv
    cardinalities, and the same shape Spark's own ``percentile`` uses.

    Scale shape: one window (rank over gap) + one hash agg, both
    partitioned on conv_id — a single shuffle.
    """
    wseq = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = (
        _base(spark, sf_dir)
        .withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(wseq))
        .filter(F.col("gap_us").isNotNull())
    )
    wrank = Window.partitionBy("user_id").orderBy("gap_us", "ts_us", "event_id")
    r = gaps.select(
        "user_id",
        "gap_us",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
    )

    def pick(p: float):
        idx = (F.col("n") - 1).cast("double") * F.lit(p)
        lo = F.floor(idx).cast("long")
        x_lo = F.max(F.when(F.col("rn") == lo + 1, F.col("gap_us")))
        x_hi = F.max(F.when(F.col("rn") == lo + 2, F.col("gap_us")))
        # when idx is integral (lo == idx) there is no hi rank to fetch at
        # the top end; coalesce to x_lo so the formula degrades exactly
        return x_lo.cast("double") + (
            F.coalesce(x_hi, x_lo).cast("double") - x_lo.cast("double")
        ) * (F.max(idx) - F.max(lo.cast("double")))

    return r.groupBy(F.col("user_id").alias("conv_id")).agg(
        F.max("n").alias("n_gaps"),
        pick(0.5).alias("p50_us"),
        pick(0.9).alias("p90_us"),
        pick(0.99).alias("p99_us"),
    )


_Q41_SQL = """
WITH g AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
  FROM events
), r AS (
  SELECT user_id, gap_us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY gap_us, ts_us, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM g WHERE gap_us IS NOT NULL
)
SELECT user_id AS conv_id,
       MAX(n) AS n_gaps,
       CAST(MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 THEN gap_us END) AS DOUBLE)
         + (CAST(COALESCE(MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 2 THEN gap_us END),
                          MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 THEN gap_us END)) AS DOUBLE)
            - CAST(MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 THEN gap_us END) AS DOUBLE))
           * (MAX(CAST(n - 1 AS DOUBLE) * 0.5) - MAX(floor(CAST(n - 1 AS DOUBLE) * 0.5))) AS p50_us,
       CAST(MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.9) AS BIGINT) + 1 THEN gap_us END) AS DOUBLE)
         + (CAST(COALESCE(MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.9) AS BIGINT) + 2 THEN gap_us END),
                          MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.9) AS BIGINT) + 1 THEN gap_us END)) AS DOUBLE)
            - CAST(MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.9) AS BIGINT) + 1 THEN gap_us END) AS DOUBLE))
           * (MAX(CAST(n - 1 AS DOUBLE) * 0.9) - MAX(floor(CAST(n - 1 AS DOUBLE) * 0.9))) AS p90_us,
       CAST(MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.99) AS BIGINT) + 1 THEN gap_us END) AS DOUBLE)
         + (CAST(COALESCE(MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.99) AS BIGINT) + 2 THEN gap_us END),
                          MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.99) AS BIGINT) + 1 THEN gap_us END)) AS DOUBLE)
            - CAST(MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.99) AS BIGINT) + 1 THEN gap_us END) AS DOUBLE))
           * (MAX(CAST(n - 1 AS DOUBLE) * 0.99) - MAX(floor(CAST(n - 1 AS DOUBLE) * 0.99))) AS p99_us
FROM r GROUP BY 1
"""


# --- q42: fixed-width value histogram per conversation-day -------------------


def q42_value_histogram_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monitoring histogram: count of samples per 5.00-unit value bin per
    (conv, day) — the heatmap/histogram rollup every metrics store keeps.
    Bin index is integer floor-division of exact cents, so it is exact in
    both engines (floor semantics for negatives included).
    """
    width = 500  # cents
    b = _base(spark, sf_dir)
    bin_idx = F.floor(F.col("c") / F.lit(width)).cast("long")
    return (
        b.groupBy(
            F.col("user_id").alias("conv_id"),
            _bucket(F.col("ts_us"), DAY_US).alias("bucket_us"),
            bin_idx.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


_Q42_SQL = f"""
SELECT user_id AS conv_id,
       epoch_us(ts) - epoch_us(ts) % {DAY_US} AS bucket_us,
       CAST(floor(CAST(round(value * 100, 0) AS BIGINT) / 500.0) AS BIGINT) AS bin,
       COUNT(*) AS n
FROM events GROUP BY 1, 2, 3
"""


# --- q50: LOCF gap-fill with staleness --------------------------------------


def q50_gapfill_locf_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap-fill (TimescaleDB
    ``time_bucket_gapfill``+``locf`` semantics) — the step-function sibling
    of q38's linear interpolation, the right fill for state-like channels
    (config values, gauges that hold between samples) where interpolating
    invents values that never existed.  Each missing 1h bucket inside a
    conversation's observed span carries the previous observed mean
    unchanged, plus a ``stale_buckets`` staleness age (how many buckets ago
    the carried value was actually observed — the monitoring-side freshness
    signal TimescaleDB exposes as the locf'd row's distance to its source).

    Exactness bridge: the carried value is a bit-copy of the observed mean
    (no arithmetic on the fill path at all), and the observed mean uses the
    same pinned exact-cents ``(s1/n)/100.0`` sequence as q38, so every
    double matches DuckDB bitwise by construction.

    Scale shape (single-pass, identical to q38's): one scan → one hash agg
    → one ``lead()`` window → one struct-array explode per observed bucket
    covering its following gap.  No grid self-join, no second scan; output
    bounded by (observed span / bucket width) per conv.
    """
    s = (
        _base(spark, sf_dir)
        .groupBy("user_id", _bucket(F.col("ts_us"), HOUR_US).alias("bucket_us"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("s1"))
    )
    w = Window.partitionBy("user_id").orderBy("bucket_us")
    x_obs = (F.col("s1").cast("double") / F.col("n").cast("double")) / F.lit(
        100.0
    )
    d = s.withColumn("x0", x_obs).withColumn("t1", F.lead("bucket_us").over(w))
    gap = F.when(
        F.col("t1").isNotNull() & (F.col("t1") > F.col("bucket_us") + HOUR_US),
        F.sequence(
            F.col("bucket_us") + HOUR_US,
            F.col("t1") - HOUR_US,
            F.lit(HOUR_US),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    items = F.concat(
        F.array(
            F.struct(
                F.col("bucket_us").alias("b"),
                F.col("n").alias("n"),
                F.lit(0).alias("is_filled"),
                F.col("x0").alias("x"),
                F.lit(0).cast("long").alias("stale"),
            )
        ),
        F.transform(
            gap,
            lambda fb: F.struct(
                fb.alias("b"),
                F.lit(0).cast("long").alias("n"),
                F.lit(1).alias("is_filled"),
                F.col("x0").alias("x"),
                ((fb - F.col("bucket_us")) / F.lit(HOUR_US))
                .cast("long")
                .alias("stale"),
            ),
        ),
    )
    return d.select(
        F.col("user_id").alias("conv_id"),
        F.explode(items).alias("it"),
    ).select(
        "conv_id",
        F.col("it.b").alias("bucket_us"),
        F.col("it.n").alias("n"),
        F.col("it.is_filled").alias("is_filled"),
        F.col("it.x").alias("x_locf"),
        F.col("it.stale").alias("stale_buckets"),
    )


_Q50_SQL = f"""
WITH c AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(ts) % {HOUR_US} AS bucket_us,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
), s AS (
  SELECT user_id, bucket_us, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s1
  FROM c GROUP BY 1, 2
), rng AS (
  SELECT user_id, MIN(bucket_us) AS b0, MAX(bucket_us) AS b1 FROM s GROUP BY 1
), grid AS (
  SELECT user_id,
         unnest(generate_series(b0, b1, {HOUR_US})) AS bucket_us
  FROM rng
), j AS (
  SELECT g.user_id, g.bucket_us, s.n, s.s1
  FROM grid g LEFT JOIN s ON s.user_id = g.user_id AND s.bucket_us = g.bucket_us
), w AS (
  SELECT user_id, bucket_us, n,
         last_value(CASE WHEN n IS NOT NULL THEN bucket_us END IGNORE NULLS)
           OVER wp AS t0,
         last_value(CASE WHEN n IS NOT NULL
              THEN (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 END IGNORE NULLS)
           OVER wp AS x0
  FROM j
  WINDOW wp AS (PARTITION BY user_id ORDER BY bucket_us ROWS UNBOUNDED PRECEDING)
)
SELECT user_id AS conv_id, bucket_us,
       CAST(COALESCE(n, 0) AS BIGINT) AS n,
       CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS INT) AS is_filled,
       x0 AS x_locf,
       CAST((bucket_us - t0) / {HOUR_US} AS BIGINT) AS stale_buckets
FROM w
"""


QUERIES = {
    "q01_tier_features_1h": q01_tier_features_1h,
    "q02_zero_crossings_1d": q02_zero_crossings_1d,
    "q03_inter_event_latency": q03_inter_event_latency,
    "q04_turn_rate_1h": q04_turn_rate_1h,
    "q05_dedup_first": q05_dedup_first,
    "q06_sessionize": q06_sessionize,
    "q07_asof_prior_signup": q07_asof_prior_signup,
    "q08_json_props": q08_json_props,
    "q09_topk_hot_users": q09_topk_hot_users,
    "q10_rollup_event_types": q10_rollup_event_types,
    "q19_rolling_features": q19_rolling_features,
    "q35_tier_ops_metrics": q35_tier_ops_metrics,
    "q38_gapfill_linear_1h": q38_gapfill_linear_1h,
    "q39_downsample_ohlc_1h": q39_downsample_ohlc_1h,
    "q40_counter_increase_1h": q40_counter_increase_1h,
    "q41_gap_percentiles": q41_gap_percentiles,
    "q42_value_histogram_1d": q42_value_histogram_1d,
    "q50_gapfill_locf_1h": q50_gapfill_locf_1h,
}

ORACLE_SQL = {
    "q01_tier_features_1h": _Q01_SQL,
    "q02_zero_crossings_1d": _Q02_SQL,
    "q03_inter_event_latency": _Q03_SQL,
    "q04_turn_rate_1h": _Q04_SQL,
    "q05_dedup_first": _Q05_SQL,
    "q06_sessionize": _Q06_SQL,
    "q07_asof_prior_signup": _Q07_SQL,
    "q08_json_props": _Q08_SQL,
    "q09_topk_hot_users": _Q09_SQL,
    "q10_rollup_event_types": _Q10_SQL,
    "q19_rolling_features": _Q19_SQL,
    "q35_tier_ops_metrics": _Q35_SQL,
    "q38_gapfill_linear_1h": _Q38_SQL,
    "q39_downsample_ohlc_1h": _Q39_SQL,
    "q40_counter_increase_1h": _Q40_SQL,
    "q41_gap_percentiles": _Q41_SQL,
    "q42_value_histogram_1d": _Q42_SQL,
    "q50_gapfill_locf_1h": _Q50_SQL,
}
