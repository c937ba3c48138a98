"""Detection-canon features (round-4, second half): peak census / step
counting (q75), Teager–Kaiser operator energy + DASDV (q76), the CUSUM
changepoint locator (q77), and the lead–lag cross-channel correlation
(q79 — the temporal companion of q48's lag-0 cross-correlation).

These close the *detection* third of the motion-feature literature that the
aggregation (q01/q62–q67) and census (q68/q71/q73) blocks don't cover:
Figo et al. 2010 §3.1 peak-based step counting, Kaiser 1990's nonlinear
energy operator (the EMG-onset canon's TKEO), Phinyomark et al. 2012's
DASDV, and Page 1954's CUSUM statistic with the classic argmax location
estimator.

All follow the package's exact-integer bridging contract (see
``queries/__init__.py``): counts and sums are exact BIGINT/decimal(38,0)
integers, argmax selections are decided on exact integers only (DESIGN.md
§14 selection rule), and every emitted double is a pinned IEEE-754 op tree
written identically in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .events import DAY_US, HOUR_US, _base, _bucket
from .signal import _dec
from .sqlexact import split_dbl

_C_SQL = """
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
"""

# A local maximum must rise at least this much (cents) above BOTH ordered
# neighbors to count as a peak — the prominence gate every pedometer-style
# step counter applies to reject jitter.  Fixture |Δc| median ≈ 3.5e3 cents,
# so 2e3 keeps a rich census while still filtering genuine plateau noise.
PEAK_RISE_CENTS = 2_000


# --- q75: peak census + inter-peak interval per (conv, 1h bucket) -------------


def q75_peak_census_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak census per (conv, 1h bucket): the number of prominent local
    maxima (c − prev ≥ PEAK_RISE_CENTS and c − next ≥ PEAK_RISE_CENTS over
    the conv-ordered series) plus the mean inter-peak interval in seconds —
    the step-counting primitive of the motion canon (Figo et al. 2010
    §3.1: peak counting over a sliding window is THE walking detector).

    Peak-ness is a property of the conv-ordered series (neighbors may sit
    across a bucket boundary); the peak is counted in its own event's
    bucket.  Interval pairs are formed between consecutive peaks WITHIN a
    bucket, so every (conv, bucket) row is self-contained.

    Exactness: the census and Σinterval are exact BIGINTs; the one double
    (mean interval, seconds) is the pinned tree cast(Σ)/cast(n_peaks−1)/1e6,
    emitted only when the bucket holds ≥ 2 peaks (NULL otherwise — both
    engines produce the literal NULL, no arithmetic runs).

    Scale shape: the conv-ordered lag/lead window, the peak-interval lag
    window on (conv, bucket), and the final hash agg all cluster under
    hash(conv) (subset rule) — a single exchange, no Python.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = (
        _base(spark, sf_dir)
        .withColumn("prev_c", F.lag("c").over(w))
        .withColumn("next_c", F.lead("c").over(w))
        .filter(
            F.col("prev_c").isNotNull()
            & F.col("next_c").isNotNull()
            & (F.col("c") - F.col("prev_c") >= PEAK_RISE_CENTS)
            & (F.col("c") - F.col("next_c") >= PEAK_RISE_CENTS)
        )
        .withColumn("bucket_us", _bucket(F.col("ts_us"), HOUR_US))
    )
    wp = Window.partitionBy("user_id", "bucket_us").orderBy("ts_us", "event_id")
    d = d.withColumn("prev_peak_ts", F.lag("ts_us").over(wp))
    g = d.groupBy(F.col("user_id").alias("conv_id"), F.col("bucket_us")).agg(
        F.count(F.lit(1)).alias("n_peaks"),
        F.coalesce(
            F.sum(F.col("ts_us") - F.col("prev_peak_ts")), F.lit(0)
        ).alias("ipi_sum_us"),
    )
    mean_ipi = (
        F.col("ipi_sum_us").cast("double")
        / (F.col("n_peaks") - 1).cast("double")
        / F.lit(1e6)
    )
    return g.select(
        "conv_id",
        "bucket_us",
        "n_peaks",
        "ipi_sum_us",
        F.when(F.col("n_peaks") >= 2, mean_ipi).alias("mean_ipi_s"),
    )


_Q75_SQL = f"""
WITH c AS ({_C_SQL}), nb AS (
  SELECT user_id, event_id, ts_us, c,
         lag(c) OVER w AS prev_c,
         lead(c) OVER w AS next_c
  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), peaks AS (
  SELECT user_id, event_id, ts_us,
         ts_us - ts_us % {HOUR_US} AS bucket_us
  FROM nb
  WHERE prev_c IS NOT NULL AND next_c IS NOT NULL
    AND c - prev_c >= {PEAK_RISE_CENTS}
    AND c - next_c >= {PEAK_RISE_CENTS}
), ipi AS (
  SELECT user_id, bucket_us, ts_us,
         lag(ts_us) OVER (PARTITION BY user_id, bucket_us
                          ORDER BY ts_us, event_id) AS prev_peak_ts
  FROM peaks
), g AS (
  SELECT user_id AS conv_id, bucket_us,
         COUNT(*) AS n_peaks,
         CAST(COALESCE(SUM(ts_us - prev_peak_ts), 0) AS BIGINT)
           AS ipi_sum_us
  FROM ipi GROUP BY 1, 2
)
SELECT conv_id, bucket_us, n_peaks, ipi_sum_us,
       CASE WHEN n_peaks >= 2 THEN
         CAST(ipi_sum_us AS DOUBLE) / CAST(n_peaks - 1 AS DOUBLE) / 1000000.0
       END AS mean_ipi_s
FROM g
"""


# --- q76: Teager–Kaiser energy + DASDV per (conv, 1d bucket) ------------------


def q76_tkeo_dasdv_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Teager–Kaiser operator energy (ψᵢ = cᵢ² − cᵢ₋₁·cᵢ₊₁, Kaiser
    1990 — the nonlinear energy the EMG-onset canon thresholds) and DASDV
    (difference absolute standard deviation, √(Σ(Δc)²/(n−1)); Phinyomark
    et al. 2012) per (conv, 1d bucket), under q63's in-bucket neighborhood
    convention: a triple/pair contributes only when every member shares the
    bucket, so each row is self-contained.  1d grain because 1h buckets
    rarely hold three consecutive events below sf0.1 (q70's rationale).

    Exactness: Σψ and Σ(Δc)² are exact decimal(38,0)/HUGEINT (cents widened
    before the products; |ψᵢ| ≤ 2c² ≤ 5·10⁹ so n·|ψ| stays < 2¹⁰¹ to ~10²⁰
    triples); DuckDB casts them to double via split_dbl (correctly rounded),
    Spark via its single-rounding decimal→double cast; then ONE pinned
    division each, plus one correctly-rounded sqrt for DASDV.  With n_pairs
    pairs the DASDV divisor is exactly n_pairs (= bucket-local n−1 when the
    bucket is contiguous).

    Scale shape: one shared lag/lead window + one hash agg on conv — a
    single exchange, no Python.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    b = lambda col: _bucket(col, DAY_US)  # noqa: E731
    d = (
        _base(spark, sf_dir)
        .withColumn("bucket_us", b(F.col("ts_us")))
        .withColumn("prev_c", F.lag("c").over(w))
        .withColumn("prev_ts", F.lag("ts_us").over(w))
        .withColumn("next_c", F.lead("c").over(w))
        .withColumn("next_ts", F.lead("ts_us").over(w))
    )
    pair_in = F.col("prev_ts").isNotNull() & (
        b(F.col("prev_ts")) == F.col("bucket_us")
    )
    triple_in = (
        pair_in
        & F.col("next_ts").isNotNull()
        & (b(F.col("next_ts")) == F.col("bucket_us"))
    )
    psi = _dec(F.col("c")) * _dec(F.col("c")) - _dec(F.col("prev_c")) * _dec(
        F.col("next_c")
    )
    dd = _dec(F.col("c") - F.col("prev_c"))
    g = d.groupBy(F.col("user_id").alias("conv_id"), F.col("bucket_us")).agg(
        F.sum(triple_in.cast("long")).alias("n_triples"),
        F.sum(F.when(triple_in, psi)).alias("s_psi"),
        F.sum(pair_in.cast("long")).alias("n_pairs"),
        F.sum(F.when(pair_in, dd * dd)).alias("s_d2"),
    )
    return g.filter((F.col("n_triples") >= 1) & (F.col("n_pairs") >= 1)).select(
        "conv_id",
        "bucket_us",
        "n_triples",
        "n_pairs",
        (
            F.col("s_psi").cast("double") / F.col("n_triples").cast("double")
        ).alias("mean_tkeo"),
        F.sqrt(
            F.col("s_d2").cast("double") / F.col("n_pairs").cast("double")
        ).alias("dasdv_cents"),
    )


_Q76_SQL = f"""
WITH c AS ({_C_SQL}), nb AS (
  SELECT user_id, ts_us, c,
         ts_us - ts_us % {DAY_US} AS bucket_us,
         lag(c)   OVER w AS prev_c,
         lag(ts_us)  OVER w AS prev_ts,
         lead(c)  OVER w AS next_c,
         lead(ts_us) OVER w AS next_ts
  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), tagged AS (
  SELECT user_id, bucket_us, c, prev_c, next_c,
         (prev_ts IS NOT NULL
          AND prev_ts - prev_ts % {DAY_US} = bucket_us) AS pair_in,
         (prev_ts IS NOT NULL
          AND prev_ts - prev_ts % {DAY_US} = bucket_us
          AND next_ts IS NOT NULL
          AND next_ts - next_ts % {DAY_US} = bucket_us) AS triple_in
  FROM nb
), g AS (
  SELECT user_id AS conv_id, bucket_us,
         CAST(SUM(CASE WHEN triple_in THEN 1 ELSE 0 END) AS BIGINT)
           AS n_triples,
         SUM(CASE WHEN triple_in THEN
               CAST(c AS HUGEINT) * c - CAST(prev_c AS HUGEINT) * next_c
             END) AS s_psi,
         CAST(SUM(CASE WHEN pair_in THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
         SUM(CASE WHEN pair_in THEN
               CAST(c - prev_c AS HUGEINT) * (c - prev_c)
             END) AS s_d2
  FROM tagged GROUP BY 1, 2
)
SELECT conv_id, bucket_us, n_triples, n_pairs,
       {split_dbl("s_psi")} / CAST(n_triples AS DOUBLE) AS mean_tkeo,
       sqrt({split_dbl("s_d2")} / CAST(n_pairs AS DOUBLE)) AS dasdv_cents
FROM g
WHERE n_triples >= 1 AND n_pairs >= 1
"""


# --- q77: CUSUM changepoint locator per conversation ---------------------------


def q77_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint per conversation (Page 1954): with Sₖ =
    Σᵢ≤ₖ(cᵢ − mean), the estimated change location is argmax_{1≤k<n} |Sₖ| —
    the classic mean-shift locator.  Emits the location (ordinal index and
    its event timestamp) plus the peak CUSUM magnitude in value units.

    Exactness: Sₖ·n = n·Pₖ − k·S (Pₖ = prefix sum, S = total) is an exact
    decimal(38,0)/HUGEINT, so the argmax is decided on exact integers only
    (ties break to the smallest k — deterministic in both engines; the mean
    never needs to exist as a double).  Headroom: n·Pₖ ≤ n²·c_max <
    2¹⁰¹ to n ≈ 10⁶ rows per conversation.  The one emitted double is the
    pinned tree split-cast(|T|)/cast(n)/100.0 (= max|Sₖ| in value units).

    Scale shape: the ordered prefix window, the conv-total window, and the
    rank-1 selection window all cluster under hash(conv) — a single
    exchange, no Python.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wall = Window.partitionBy("user_id")
    d = (
        _base(spark, sf_dir)
        .withColumn("k", F.row_number().over(w))
        .withColumn(
            "pk", F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("s", F.sum("c").over(wall))
        .withColumn("n", F.count(F.lit(1)).over(wall))
    )
    t = _dec(F.col("n")) * _dec(F.col("pk")) - _dec(F.col("k")) * _dec(F.col("s"))
    d = (
        d.filter((F.col("n") >= 2) & (F.col("k") < F.col("n")))
        .withColumn("abs_t", F.abs(t))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("abs_t").desc(), F.col("k").asc()
                )
            ),
        )
        .filter(F.col("rnk") == 1)
    )
    return d.select(
        F.col("user_id").alias("conv_id"),
        F.col("n"),
        F.col("k").alias("cp_idx"),
        F.col("ts_us").alias("cp_ts_us"),
        (
            F.col("abs_t").cast("double") / F.col("n").cast("double") / F.lit(100.0)
        ).alias("cusum_max"),
    )


_Q77_SQL = f"""
WITH c AS ({_C_SQL}), pre AS (
  SELECT user_id, ts_us,
         row_number() OVER w AS k,
         SUM(c) OVER w AS pk,
         SUM(c) OVER (PARTITION BY user_id) AS s,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM c
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), t AS (
  SELECT user_id, ts_us, k, n,
         abs(CAST(n AS HUGEINT) * pk - CAST(k AS HUGEINT) * s) AS abs_t
  FROM pre
  WHERE n >= 2 AND k < n
)
SELECT user_id AS conv_id,
       CAST(n AS BIGINT) AS n,
       CAST(k AS BIGINT) AS cp_idx,
       ts_us AS cp_ts_us,
       {split_dbl("abs_t")} / CAST(n AS DOUBLE) / 100.0 AS cusum_max
FROM t
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY abs_t DESC, k ASC) = 1
"""


# --- q79: lead-lag cross-correlation, value → next inter-event gap -----------


def q79_crosscorr_value_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 cross-channel Pearson correlation per conversation between the
    signal value xᵢ and the FOLLOWING inter-event gap yᵢ = tsᵢ₊₁ − tsᵢ —
    the lead–lag companion of q48's lag-0 cross-channel correlation (does
    amplitude predict the next sampling gap?).

    Exactness: all five sufficient sums are exact decimal(38,0)/HUGEINT
    (cents × µs products widened before multiplying); the Pearson numerator
    N = n·Σxy − Σx·Σy and both variance terms D = n·Σ² − (Σ)² stay exact
    integers, and the one emitted double is the pinned tree
    ``cast(N) / sqrt(cast(Dx) · cast(Dy))`` — two correctly-rounded casts
    (split_dbl in DuckDB, single-rounding decimal→double in Spark), one
    multiply, one sqrt, one divide, identical in both engines.  Headroom:
    n·Σy² ≲ n²·gap² < 2¹⁰¹ to ~10⁶ rows/conv at hour-scale gaps.

    Scale shape: one lead window + one hash agg on conv — single exchange,
    no Python.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = (
        _base(spark, sf_dir)
        .withColumn("ynext", F.lead("ts_us").over(w) - F.col("ts_us"))
        .filter(F.col("ynext").isNotNull())
    )
    x, y = _dec(F.col("c")), _dec(F.col("ynext"))
    g = d.groupBy(F.col("user_id").alias("conv_id")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sx"),
        F.sum("ynext").alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sx2"),
        F.sum(y * y).alias("sy2"),
    )
    n = _dec(F.col("n"))
    num = n * F.col("sxy") - _dec(F.col("sx")) * _dec(F.col("sy"))
    dx = n * F.col("sx2") - _dec(F.col("sx")) * _dec(F.col("sx"))
    dy = n * F.col("sy2") - _dec(F.col("sy")) * _dec(F.col("sy"))
    return g.filter((F.col("n") >= 2) & (dx > 0) & (dy > 0)).select(
        "conv_id",
        "n",
        (
            num.cast("double") / F.sqrt(dx.cast("double") * dy.cast("double"))
        ).alias("r_xy1"),
    )


_Q79_SQL = f"""
WITH c AS ({_C_SQL}), led AS (
  SELECT user_id, c,
         lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           - ts_us AS ynext
  FROM c
), g AS (
  SELECT user_id AS conv_id,
         COUNT(*) AS n,
         CAST(SUM(c) AS BIGINT) AS sx,
         CAST(SUM(ynext) AS BIGINT) AS sy,
         SUM(CAST(c AS HUGEINT) * ynext) AS sxy,
         SUM(CAST(c AS HUGEINT) * c) AS sx2,
         SUM(CAST(ynext AS HUGEINT) * ynext) AS sy2
  FROM led WHERE ynext IS NOT NULL
  GROUP BY 1
), t AS (
  SELECT conv_id, n,
         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
         CAST(n AS HUGEINT) * sx2 - CAST(sx AS HUGEINT) * sx AS dx,
         CAST(n AS HUGEINT) * sy2 - CAST(sy AS HUGEINT) * sy AS dy
  FROM g
)
SELECT conv_id, n,
       {split_dbl("num")} / sqrt({split_dbl("dx")} * {split_dbl("dy")})
         AS r_xy1
FROM t
WHERE n >= 2 AND dx > 0 AND dy > 0
"""


QUERIES = {
    "q75_peak_census_1h": q75_peak_census_1h,
    "q76_tkeo_dasdv_1d": q76_tkeo_dasdv_1d,
    "q77_cusum_changepoint": q77_cusum_changepoint,
    "q79_crosscorr_value_gap": q79_crosscorr_value_gap,
}

ORACLE_SQL = {
    "q75_peak_census_1h": _Q75_SQL,
    "q76_tkeo_dasdv_1d": _Q76_SQL,
    "q77_cusum_changepoint": _Q77_SQL,
    "q79_crosscorr_value_gap": _Q79_SQL,
}
