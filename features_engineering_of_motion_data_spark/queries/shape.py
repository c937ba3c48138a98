"""Shape / distribution / model-coefficient features (round-4 additions).

The remaining members of the classic motion/EMG time-domain feature canon
(Phinyomark et al. 2012; Figo et al. 2010) not yet covered by q01/q51–q54/
q62/q63: higher temporal moments + integrated absolute value (q64), binned
histogram diversity (q65), AR(2) model coefficients via Yule–Walker (q66),
vibration-canon amplitude factors (q67) and burst run-length statistics
(q68, gaps-and-islands).

All follow the package's exact-integer bridging contract (see
``queries/__init__.py``): every cross-engine aggregate is an exact integer
(cent BIGINTs, widened to decimal(38,0)/HUGEINT before any product that
could overflow int64), and every emitted double is produced by a *pinned*
IEEE-754 op sequence — each op individually correctly rounded (add, sub,
mul, div, sqrt; DuckDB integer→double casts above 2⁵³ via
:func:`~.sqlexact.split_dbl`) — written identically in Spark and DuckDB, so
the driver's value-hash matches bitwise.
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


# --- q64: higher temporal moments + IEMG/MAV per (conv, 1d bucket) ------------


def q64_temporal_moments_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher temporal moments TM3/TM4/TM5 plus integrated absolute value
    (IEMG = Σ|x|) and mean absolute value (MAV = IEMG/n) per (conv, 1d
    bucket) — the order-3..5 companions of A6's energy in the EMG/motion
    time-domain canon (TMk = |Σxᵏ|/n for odd k, Σxᵏ/n for even k).

    Exactness: Σ|c|, Σc³, Σc⁴, Σc⁵ are exact (cents widened to
    decimal(38,0)/HUGEINT before the powers); each emitted double is ONE
    pinned division of a correctly-rounded cast.  Headroom: n·|c|⁵ < 2¹⁰¹
    (split_dbl fidelity) holds to ~10⁶ samples per (conv, 1d) bucket at the
    fixture's |c| ≤ 5·10⁴ cent scale (Σc⁵ ≤ 3·10²⁹).

    Scale shape: one hash agg on conv — a single shuffle, no window, no
    Python.
    """
    c = _dec(F.col("c"))
    c2 = c * c
    g = (
        _base(spark, sf_dir)
        .groupBy(
            F.col("user_id").alias("conv_id"),
            _bucket(F.col("ts_us"), DAY_US).alias("bucket_us"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.abs(F.col("c"))).alias("iemg"),
            F.sum(c2 * c).alias("s3"),
            F.sum(c2 * c2).alias("s4"),
            F.sum(c2 * c2 * c).alias("s5"),
        )
    )
    nd = F.col("n").cast("double")
    return g.select(
        "conv_id",
        "bucket_us",
        "n",
        "iemg",
        (F.col("iemg").cast("double") / nd).alias("mav"),
        (F.abs(F.col("s3")).cast("double") / nd).alias("tm3"),
        (F.col("s4").cast("double") / nd).alias("tm4"),
        (F.abs(F.col("s5")).cast("double") / nd).alias("tm5"),
    )


_Q64_SQL = f"""
WITH c AS ({_C_SQL}), g AS (
  SELECT user_id AS conv_id,
         ts_us - ts_us % {DAY_US} AS bucket_us,
         COUNT(*) AS n,
         CAST(SUM(abs(c)) AS BIGINT) AS iemg,
         SUM(CAST(c AS HUGEINT) * c * c) AS s3,
         SUM(CAST(c AS HUGEINT) * c * c * c) AS s4,
         SUM(CAST(c AS HUGEINT) * c * c * c * c) AS s5
  FROM c GROUP BY 1, 2
)
SELECT conv_id, bucket_us, n, iemg,
       CAST(iemg AS DOUBLE) / CAST(n AS DOUBLE) AS mav,
       {split_dbl("abs(s3)")} / CAST(n AS DOUBLE) AS tm3,
       {split_dbl("s4")} / CAST(n AS DOUBLE) AS tm4,
       {split_dbl("abs(s5)")} / CAST(n AS DOUBLE) AS tm5
FROM g
"""


# --- q65: binned histogram diversity per (conv, 1h bucket) --------------------

HIST_BIN_CENTS = 2500  # 25.00 value units per bin — part of the definition


def q65_histogram_diversity_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width binned-distribution features per (conv, 1h bucket): number
    of occupied bins, the modal bin and its count (tie → smallest bin, a
    deterministic rule), and Gini impurity ``1 − Σpᵢ²`` — the log-free
    diversity measure of the histogram feature family (Figo et al. §3.1).
    Shannon entropy is deliberately NOT emitted: it needs log2, which is not
    correctly rounded (and so not bitwise-pinnable) across JVM/libm.

    Bin index is ``floor(c / 2500.0)``: both engines perform the same
    correctly-rounded double division, so the floor is identical even when
    c/2500 is inexact.  Gini = (n² − Σcntᵢ²)/n² is ONE pinned division of
    exact BIGINTs (n ≤ ~10⁶ per bucket keeps n² < 2⁵³, so plain casts are
    exact).  Mode tie-break via max over (cnt, −bin) pairs.

    Scale shape: two hash aggs — (conv, bucket, bin) then (conv, bucket).
    The second groups a prefix of the first's key, so AQE coalesces both
    onto small exchanges; counts-per-bin shrink the data to |buckets|·|bins|
    rows before the second shuffle.  No window, no Python.
    """
    bins = (
        _base(spark, sf_dir)
        .groupBy(
            F.col("user_id").alias("conv_id"),
            _bucket(F.col("ts_us"), HOUR_US).alias("bucket_us"),
            F.floor(F.col("c") / F.lit(float(HIST_BIN_CENTS))).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    g = bins.groupBy("conv_id", "bucket_us").agg(
        F.sum("cnt").alias("n"),
        F.count(F.lit(1)).alias("n_bins"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sq"),
        F.max(
            F.struct(F.col("cnt").alias("a"), (-F.col("bin")).alias("b"))
        ).alias("m"),
    )
    n = F.col("n")
    return g.select(
        "conv_id",
        "bucket_us",
        "n",
        "n_bins",
        (-F.col("m.b")).alias("mode_bin"),
        F.col("m.a").alias("mode_n"),
        (
            (n * n - F.col("sq")).cast("double") / (n * n).cast("double")
        ).alias("gini"),
    )


_Q65_SQL = f"""
WITH c AS ({_C_SQL}), bins AS (
  SELECT user_id AS conv_id,
         ts_us - ts_us % {HOUR_US} AS bucket_us,
         CAST(floor(CAST(c AS DOUBLE) / {HIST_BIN_CENTS}.0) AS BIGINT) AS bin,
         COUNT(*) AS cnt
  FROM c GROUP BY 1, 2, 3
), g AS (
  SELECT conv_id, bucket_us,
         CAST(SUM(cnt) AS BIGINT) AS n,
         COUNT(*) AS n_bins,
         CAST(SUM(cnt * cnt) AS BIGINT) AS sq,
         MAX(cnt) AS mode_n
  FROM bins GROUP BY 1, 2
)
SELECT g.conv_id, g.bucket_us, g.n, g.n_bins,
       (SELECT MIN(b.bin) FROM bins b
        WHERE b.conv_id = g.conv_id AND b.bucket_us = g.bucket_us
          AND b.cnt = g.mode_n) AS mode_bin,
       CAST(g.mode_n AS BIGINT) AS mode_n,
       CAST(g.n * g.n - g.sq AS DOUBLE) / CAST(g.n * g.n AS DOUBLE) AS gini
FROM g
"""


# --- q66: AR(2) coefficients via Yule–Walker per conversation -----------------


def q66_ar2_yule_walker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order autoregressive model coefficients per conversation via
    the Yule–Walker equations — the ``arCoeff`` member of the HAR feature
    canon (UCI-HAR uses Burg AR(4); Yule–Walker on the sample ACF is the
    textbook closed form and is exactly bridgeable):

        φ₁ = r₁(1 − r₂)/(1 − r₁²),   φ₂ = (r₂ − r₁²)/(1 − r₁²)

    with r_k the sample lag-k autocorrelation under q44's convention
    (overall mean, lag-0 denominator).

    Exactness: r₁ = N₁/D and r₂ = N₂/D where (q44's n²-scaling, lag-k
    generalized) ``N_k = n²·Σx_i·x_{i−k} − n·s1·(sh_k + st_k) + (n−k)·s1²``
    and ``D = n·(n·s2 − s1²)`` are exact decimal(38,0)/HUGEINT integers.
    r₁, r₂ are each ONE pinned division of split_dbl casts; φ₁, φ₂ are then
    short identical double-op trees on r₁, r₂ (every op correctly rounded
    in both engines, so bitwise-stable).  Headroom: |N_k|, |D| ≲ n³·c² <
    2¹⁰¹ holds to ~10⁵ samples per conversation at cent scale.

    Scale shape: one window (both lags share it) + one hash agg on conv —
    a single shuffle, no Python.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = (
        _base(spark, sf_dir)
        .withColumn("p1", F.lag("c").over(w))
        .withColumn("p2", F.lag("c", 2).over(w))
    )
    h1, h2 = F.col("p1").isNotNull(), F.col("p2").isNotNull()
    g = d.groupBy(F.col("user_id").alias("conv_id")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(_dec(F.col("c")) * _dec(F.col("c"))).alias("s2"),
        F.sum(F.when(h1, _dec(F.col("p1")) * _dec(F.col("c")))).alias("sxy1"),
        F.sum(F.when(h1, F.col("p1"))).alias("sh1"),
        F.sum(F.when(h1, F.col("c"))).alias("st1"),
        F.sum(F.when(h2, _dec(F.col("p2")) * _dec(F.col("c")))).alias("sxy2"),
        F.sum(F.when(h2, F.col("p2"))).alias("sh2"),
        F.sum(F.when(h2, F.col("c"))).alias("st2"),
    )
    n, s1 = _dec(F.col("n")), _dec(F.col("s1"))

    def _num(k: int) -> F.Column:
        return (
            n * n * F.col(f"sxy{k}")
            - n * s1 * _dec(F.col(f"sh{k}") + F.col(f"st{k}"))
            + _dec(F.col("n") - k) * s1 * s1
        )

    den = n * (n * F.col("s2") - s1 * s1)
    r1 = _num(1).cast("double") / den.cast("double")
    r2 = _num(2).cast("double") / den.cast("double")
    yw_den = F.lit(1.0) - r1 * r1
    return g.filter((F.col("n") >= 5) & (den != 0)).select(
        "conv_id",
        "n",
        r1.alias("r1"),
        r2.alias("r2"),
        (r1 * (F.lit(1.0) - r2) / yw_den).alias("phi1"),
        ((r2 - r1 * r1) / yw_den).alias("phi2"),
    )


def _q66_num(k: int) -> str:
    return f"""CAST(n AS HUGEINT) * n * sxy{k}
              - CAST(n AS HUGEINT) * s1 * (sh{k} + st{k})
              + CAST(n - {k} AS HUGEINT) * s1 * s1"""


_Q66_SQL = f"""
WITH c AS ({_C_SQL}), lagged AS (
  SELECT user_id, c, lag(c) OVER w AS p1, lag(c, 2) OVER w AS p2
  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), g AS (
  SELECT user_id AS conv_id,
         COUNT(*) AS n,
         SUM(c) AS s1,
         SUM(CAST(c AS HUGEINT) * c) AS s2,
         SUM(CASE WHEN p1 IS NOT NULL
                  THEN CAST(p1 AS HUGEINT) * c END) AS sxy1,
         SUM(CASE WHEN p1 IS NOT NULL THEN p1 END) AS sh1,
         SUM(CASE WHEN p1 IS NOT NULL THEN c END) AS st1,
         SUM(CASE WHEN p2 IS NOT NULL
                  THEN CAST(p2 AS HUGEINT) * c END) AS sxy2,
         SUM(CASE WHEN p2 IS NOT NULL THEN p2 END) AS sh2,
         SUM(CASE WHEN p2 IS NOT NULL THEN c END) AS st2
  FROM lagged GROUP BY 1
), r AS (
  SELECT conv_id, n,
         {split_dbl(_q66_num(1))}
           / {split_dbl("CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)")} AS r1,
         {split_dbl(_q66_num(2))}
           / {split_dbl("CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)")} AS r2
  FROM g
  WHERE n >= 5
    AND CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * s2
          - CAST(s1 AS HUGEINT) * s1) <> 0
)
SELECT conv_id, n, r1, r2,
       r1 * (1.0 - r2) / (1.0 - r1 * r1) AS phi1,
       (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi2
FROM r
"""


# --- q67: amplitude factors per (conv, 1h bucket) -----------------------------


def q67_amplitude_factors_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vibration-canon amplitude factors per (conv, 1h bucket): peak-to-peak,
    peak (max |x|), and the three classic dimensionless shape ratios —
    crest factor (peak/RMS), impulse factor (peak/MAV) and shape factor
    (RMS/MAV).  Clearance factor is deliberately omitted: it sums √|xᵢ|
    (irrational doubles), whose total is partitioning-order-dependent and
    so not exactly reproducible — the package contract forbids it.

    Exactness: ptp, peak, Σ|c|, Σc² are exact integers; rms =
    √(split(s2)/n), crest = peak/rms, mav = iemg/n, impulse = peak/mav,
    shape = rms/mav — identical correctly-rounded op trees both sides.
    Rows with iemg = 0 (all-zero buckets, where the ratios are 0/0) are
    excluded by definition.

    Scale shape: one hash agg on conv — a single shuffle, no window, no
    Python.
    """
    g = (
        _base(spark, sf_dir)
        .groupBy(
            F.col("user_id").alias("conv_id"),
            _bucket(F.col("ts_us"), HOUR_US).alias("bucket_us"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.max("c") - F.min("c")).alias("ptp"),
            F.max(F.abs(F.col("c"))).alias("peak"),
            F.sum(F.abs(F.col("c"))).alias("iemg"),
            F.sum(_dec(F.col("c")) * _dec(F.col("c"))).alias("s2"),
        )
    )
    nd = F.col("n").cast("double")
    rms = F.sqrt(F.col("s2").cast("double") / nd)
    mav = F.col("iemg").cast("double") / nd
    return g.filter(F.col("iemg") > 0).select(
        "conv_id",
        "bucket_us",
        "n",
        "ptp",
        "peak",
        rms.alias("rms"),
        mav.alias("mav"),
        (F.col("peak").cast("double") / rms).alias("crest"),
        (F.col("peak").cast("double") / mav).alias("impulse"),
        (rms / mav).alias("shape"),
    )


_Q67_SQL = f"""
WITH c AS ({_C_SQL}), g AS (
  SELECT user_id AS conv_id,
         ts_us - ts_us % {HOUR_US} AS bucket_us,
         COUNT(*) AS n,
         MAX(c) - MIN(c) AS ptp,
         MAX(abs(c)) AS peak,
         CAST(SUM(abs(c)) AS BIGINT) AS iemg,
         SUM(CAST(c AS HUGEINT) * c) AS s2
  FROM c GROUP BY 1, 2
)
SELECT conv_id, bucket_us, n, ptp, peak,
       sqrt({split_dbl("s2")} / CAST(n AS DOUBLE)) AS rms,
       CAST(iemg AS DOUBLE) / CAST(n AS DOUBLE) AS mav,
       CAST(peak AS DOUBLE)
         / sqrt({split_dbl("s2")} / CAST(n AS DOUBLE)) AS crest,
       CAST(peak AS DOUBLE)
         / (CAST(iemg AS DOUBLE) / CAST(n AS DOUBLE)) AS impulse,
       sqrt({split_dbl("s2")} / CAST(n AS DOUBLE))
         / (CAST(iemg AS DOUBLE) / CAST(n AS DOUBLE)) AS shape
FROM g
WHERE iemg > 0
"""


# --- q68: burst run-length statistics per conversation -------------------------

BURST_EPS_CENTS = 5000  # |x| > 50.00 value units = "active" (MYOP threshold)


def q68_burst_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst (run-length) statistics per conversation — gaps-and-islands over
    the activity indicator ``|x| > threshold`` in stable turn order: number
    of maximal active runs, total active turns, the longest run, and mean
    run length.  The run-length view of activity complements q63's MYOP
    (which only counts active samples, blind to their clustering).

    Islands via the classic two-row_number difference: ``island =
    row_number(all rows) − row_number(active rows)`` is constant within a
    maximal active run and distinct across runs.  All outputs are exact
    integers except mean_len — ONE pinned division.

    Scale shape: both windows and both aggs key on conv (the island agg on
    (conv, island) keeps conv as a prefix); data shrinks to one row per run
    after the first agg.  No Python.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = (
        _base(spark, sf_dir)
        .withColumn("rn_all", F.row_number().over(w))
        .filter(F.abs(F.col("c")) > F.lit(BURST_EPS_CENTS))
        .withColumn("rn_act", F.row_number().over(w))
    )
    runs = d.groupBy(
        F.col("user_id").alias("conv_id"),
        (F.col("rn_all") - F.col("rn_act")).alias("island"),
    ).agg(F.count(F.lit(1)).alias("len"))
    return runs.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_bursts"),
        F.sum("len").alias("active_turns"),
        F.max("len").alias("max_len"),
        (F.sum("len").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_len"
        ),
    )


_Q68_SQL = f"""
WITH c AS ({_C_SQL}), flagged AS (
  SELECT user_id, ts_us, event_id, c,
         row_number() OVER w AS rn_all
  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), active AS (
  SELECT user_id,
         rn_all - row_number() OVER w AS island
  FROM flagged
  WHERE abs(c) > {BURST_EPS_CENTS}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), runs AS (
  SELECT user_id AS conv_id, island, COUNT(*) AS len
  FROM active GROUP BY 1, 2
)
SELECT conv_id,
       COUNT(*) AS n_bursts,
       CAST(SUM(len) AS BIGINT) AS active_turns,
       MAX(len) AS max_len,
       CAST(SUM(len) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_len
FROM runs GROUP BY 1
"""


# --- q69: dominant ACF lag per conversation ------------------------------------

ACF_MAX_LAG = 8  # lags 1..8 scanned — part of the feature definition


def q69_dominant_acf_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant periodicity via the autocorrelation function: the lag
    k ∈ 1..8 maximizing the sample ACF r_k (q44's convention), plus r at
    that lag — the time-domain stand-in for "dominant frequency" used by
    the HAR literature when series are short/irregular.

    Exactness: all r_k share the same positive denominator D, so
    ``argmax_k r_k = argmax_k N_k`` is decided on the exact n²-scaled
    integer numerators — no doubles touch the selection.  Ties break to
    the smallest lag (deterministic).  The single emitted double r_dom is
    ONE pinned division.  Headroom identical to q44/q66 (|N_k|, D ≲ n³c²
    < 2¹⁰¹).

    Scale shape: one shared lag window (8 lags) + one hash agg on conv —
    a single shuffle, no Python.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = _base(spark, sf_dir)
    for k in range(1, ACF_MAX_LAG + 1):
        d = d.withColumn(f"p{k}", F.lag("c", k).over(w))
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(_dec(F.col("c")) * _dec(F.col("c"))).alias("s2"),
    ]
    for k in range(1, ACF_MAX_LAG + 1):
        h = F.col(f"p{k}").isNotNull()
        aggs += [
            F.sum(F.when(h, _dec(F.col(f"p{k}")) * _dec(F.col("c")))).alias(
                f"sxy{k}"
            ),
            F.sum(F.when(h, F.col(f"p{k}"))).alias(f"sh{k}"),
            F.sum(F.when(h, F.col("c"))).alias(f"st{k}"),
        ]
    g = d.groupBy(F.col("user_id").alias("conv_id")).agg(*aggs)
    n, s1 = _dec(F.col("n")), _dec(F.col("s1"))

    def _num(k: int) -> F.Column:
        return (
            n * n * F.col(f"sxy{k}")
            - n * s1 * _dec(F.col(f"sh{k}") + F.col(f"st{k}"))
            + _dec(F.col("n") - k) * s1 * s1
        )

    den = n * (n * F.col("s2") - s1 * s1)
    best = F.greatest(
        *[
            F.struct(_num(k).alias("nk"), F.lit(-k).alias("mk"))
            for k in range(1, ACF_MAX_LAG + 1)
        ]
    )
    return g.filter((F.col("n") >= 2 * ACF_MAX_LAG) & (den > 0)).select(
        "conv_id",
        "n",
        (-best["mk"]).alias("dominant_lag"),
        (best["nk"].cast("double") / den.cast("double")).alias("r_dom"),
    )


def _q69_sql() -> str:
    lag_cols = ",\n         ".join(
        f"lag(c, {k}) OVER w AS p{k}" for k in range(1, ACF_MAX_LAG + 1)
    )
    sums = ",\n         ".join(
        f"""SUM(CASE WHEN p{k} IS NOT NULL
                  THEN CAST(p{k} AS HUGEINT) * c END) AS sxy{k},
         SUM(CASE WHEN p{k} IS NOT NULL THEN p{k} END) AS sh{k},
         SUM(CASE WHEN p{k} IS NOT NULL THEN c END) AS st{k}"""
        for k in range(1, ACF_MAX_LAG + 1)
    )
    branches = "\n  UNION ALL\n".join(
        f"""  SELECT conv_id, n, den, {k} AS k,
         {_q66_num(k)} AS nk
  FROM g"""
        for k in range(1, ACF_MAX_LAG + 1)
    )
    return f"""
WITH c AS ({_C_SQL}), lagged AS (
  SELECT user_id, c,
         {lag_cols}
  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), g AS (
  SELECT user_id AS conv_id,
         COUNT(*) AS n,
         SUM(c) AS s1,
         SUM(CAST(c AS HUGEINT) * c) AS s2,
         {sums},
         CAST(COUNT(*) AS HUGEINT)
           * (CAST(COUNT(*) AS HUGEINT) * SUM(CAST(c AS HUGEINT) * c)
              - CAST(SUM(c) AS HUGEINT) * SUM(c)) AS den
  FROM lagged GROUP BY user_id
), lags AS (
{branches}
), pick AS (
  SELECT conv_id, n, den, k, nk,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY nk DESC, k ASC) AS rn
  FROM lags
  WHERE n >= {2 * ACF_MAX_LAG} AND den > 0
)
SELECT conv_id, n,
       CAST(k AS INT) AS dominant_lag,
       {split_dbl("nk")} / {split_dbl("den")} AS r_dom
FROM pick WHERE rn = 1
"""


# --- q70: PAA + SAX word per (conv, 1d bucket) --------------------------------

SAX_SEGMENTS = 4
# N(0,1) quartile breakpoints for the 4-symbol SAX alphabet (Lin et al. 2003).
# Hard-coded shortest-repr double literals: both engines parse them to the
# identical IEEE-754 double, so symbol comparisons are bitwise-aligned.
SAX_B1 = -0.6744897501960817
SAX_B3 = 0.6744897501960817


def q70_paa_sax_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piecewise Aggregate Approximation + SAX word (Lin et al. 2003, the
    standard symbolic time-series representation) per (conv, 1d bucket):
    the bucket's turns are split into 4 equal-count segments in stable
    order, each segment's z-normalized mean (PAA) is mapped to one of 4
    symbols at the N(0,1) quartile breakpoints, and the symbols concatenate
    into the bucket's SAX word — the indexable shape fingerprint.

    Exactness: segment assignment is ``floor((rank−1)·4 / n)`` computed as
    the identical IEEE double division both sides (numerator ≤ 4n < 2⁵³ is
    exact; the quotient is ≥ 1/n away from any integer it could mis-floor
    to).  Each PAA value is a pinned tree on exact integers — seg_sum/seg_n,
    minus s1/n, divided by √(split(n·s2 − s1²)/n²) — and symbols compare
    those bitwise-identical doubles against hard-coded double literals, so
    the words match exactly.  Buckets need n ≥ 4 (every segment non-empty)
    and nonzero variance (exact predicate n·s2 − s1² > 0).

    Scale shape: one window stack on (conv, bucket) (rank + bucket sums
    share the partition key) + two hash aggs (segment level then bucket
    level); all keys conv-prefixed.  No Python.
    """
    P = SAX_SEGMENTS
    wb = Window.partitionBy("user_id", "bucket_us")
    wo = wb.orderBy("ts_us", "event_id")
    d = (
        _base(spark, sf_dir)
        .withColumn("bucket_us", _bucket(F.col("ts_us"), DAY_US))
        .withColumn("rk", F.row_number().over(wo))
        .withColumn("n", F.count(F.lit(1)).over(wb))
        .withColumn("s1", F.sum("c").over(wb))
        .withColumn("s2", F.sum(_dec(F.col("c")) * _dec(F.col("c"))).over(wb))
        .withColumn(
            "seg",
            F.floor(
                ((F.col("rk") - 1) * P).cast("double") / F.col("n").cast("double")
            ),
        )
    )
    segs = d.groupBy(
        F.col("user_id").alias("conv_id"), "bucket_us", "seg"
    ).agg(
        F.count(F.lit(1)).alias("seg_n"),
        F.sum("c").alias("seg_sum"),
        F.first("n").alias("n"),
        F.first("s1").alias("s1"),
        F.first("s2").alias("s2"),
    )
    n = _dec(F.col("n"))
    m2 = n * F.col("s2") - _dec(F.col("s1")) * _dec(F.col("s1"))
    std = F.sqrt(m2.cast("double") / (F.col("n") * F.col("n")).cast("double"))
    mean = F.col("s1").cast("double") / F.col("n").cast("double")
    paa = (
        F.col("seg_sum").cast("double") / F.col("seg_n").cast("double") - mean
    ) / std
    sym = (
        F.when(paa < F.lit(SAX_B1), F.lit("a"))
        .when(paa < F.lit(0.0), F.lit("b"))
        .when(paa < F.lit(SAX_B3), F.lit("c"))
        .otherwise(F.lit("d"))
    )
    z = segs.filter((F.col("n") >= P) & (m2 > 0)).select(
        "conv_id", "bucket_us", "seg", "n", paa.alias("paa"), sym.alias("sym")
    )
    pick = lambda p, col: F.max(F.when(F.col("seg") == p, F.col(col)))  # noqa: E731
    return z.groupBy("conv_id", "bucket_us").agg(
        F.first("n").alias("n"),
        *[pick(p, "paa").alias(f"paa{p + 1}") for p in range(P)],
        F.concat(*[pick(p, "sym") for p in range(P)]).alias("sax_word"),
    )


def _q70_sql() -> str:
    P = SAX_SEGMENTS
    paa_cols = ",\n       ".join(
        f"MAX(CASE WHEN seg = {p} THEN paa END) AS paa{p + 1}" for p in range(P)
    )
    syms = " || ".join(
        f"MAX(CASE WHEN seg = {p} THEN sym END)" for p in range(P)
    )
    return f"""
WITH c AS ({_C_SQL}), tagged AS (
  SELECT user_id, ts_us, event_id, c,
         ts_us - ts_us % {DAY_US} AS bucket_us
  FROM c
), ranked AS (
  SELECT user_id, bucket_us, c,
         row_number() OVER (PARTITION BY user_id, bucket_us
                            ORDER BY ts_us, event_id) AS rk,
         COUNT(*) OVER wb AS n,
         SUM(c) OVER wb AS s1,
         SUM(CAST(c AS HUGEINT) * c) OVER wb AS s2
  FROM tagged
  WINDOW wb AS (PARTITION BY user_id, bucket_us)
), segged AS (
  SELECT user_id, bucket_us, c, n, s1, s2,
         CAST(floor(CAST((rk - 1) * {P} AS DOUBLE)
                    / CAST(n AS DOUBLE)) AS BIGINT) AS seg
  FROM ranked
), segs AS (
  SELECT user_id AS conv_id, bucket_us, seg,
         COUNT(*) AS seg_n,
         SUM(c) AS seg_sum,
         MAX(n) AS n, MAX(s1) AS s1, MAX(s2) AS s2
  FROM segged GROUP BY 1, 2, 3
), z AS (
  SELECT conv_id, bucket_us, seg, n,
         (CAST(seg_sum AS DOUBLE) / CAST(seg_n AS DOUBLE)
          - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
         / sqrt({split_dbl("CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1")}
                / CAST(n * n AS DOUBLE)) AS paa
  FROM segs
  WHERE n >= {P}
    AND CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 > 0
), sy AS (
  SELECT conv_id, bucket_us, seg, n, paa,
         CASE WHEN paa < {SAX_B1!r} THEN 'a'
              WHEN paa < 0.0 THEN 'b'
              WHEN paa < {SAX_B3!r} THEN 'c'
              ELSE 'd' END AS sym
  FROM z
)
SELECT conv_id, bucket_us,
       CAST(MIN(n) AS BIGINT) AS n,
       {paa_cols},
       {syms} AS sax_word
FROM sy GROUP BY 1, 2
"""


# --- q71: ordinal pattern census per (conv, 1d bucket) -------------------------


def q71_ordinal_patterns_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-3 ordinal (permutation) pattern census per (conv, 1d bucket) —
    the Bandt–Pompe representation behind permutation entropy: each
    in-bucket consecutive triple (a, b, c) is classified into one of the 6
    rank patterns, and the bucket emits the 6 pattern counts plus the
    pattern distribution's Gini impurity.  Permutation *entropy* itself is
    deliberately not emitted (log2 is not bitwise-pinnable across
    JVM/libm); the census plus Gini carries the same information
    losslessly — exactly the q65 design rule.

    Ties are broken by position (stable argsort — the Bandt–Pompe
    convention): the earlier element ranks first on equality, so the three
    booleans a≤b, b≤c, a≤c decide the pattern.  Of the 8 boolean combos,
    two are logically impossible (≤ is transitive on the stable order);
    they are asserted away by construction of the CASE.

    Exactness: pattern ids are integer comparisons on exact cents; counts
    are exact; Gini = (t² − Σcntᵢ²)/t² is ONE pinned division.

    Scale shape: one shared lag window (two lags) + one hash agg on conv —
    a single shuffle, no Python.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    b = lambda col: _bucket(col, DAY_US)  # noqa: E731
    d = (
        _base(spark, sf_dir)
        .withColumn("a", F.lag("c", 2).over(w))
        .withColumn("bb", F.lag("c").over(w))
        .withColumn("a_ts", F.lag("ts_us", 2).over(w))
    )
    # triple is in-bucket iff its oldest member shares the bucket (ts is
    # non-decreasing within the window order, so the middle member does too)
    in3 = F.col("a_ts").isNotNull() & (b(F.col("a_ts")) == b(F.col("ts_us")))
    ab = F.col("a") <= F.col("bb")
    bc = F.col("bb") <= F.col("c")
    ac = F.col("a") <= F.col("c")
    pid = (
        F.when(ab & bc, 0)               # a ≤ b ≤ c
        .when(ab & ~bc & ac, 1)          # a ≤ c < b
        .when(ab & ~bc & ~ac, 2)         # c < a ≤ b
        .when(~ab & bc & ac, 3)          # b < a ≤ c
        .when(~ab & bc & ~ac, 4)         # b ≤ c < a
        .otherwise(5)                    # c < b < a
    )
    aggs = [F.sum(F.when(in3, 1).otherwise(0)).alias("t")] + [
        F.sum(F.when(in3 & (pid == p), 1).otherwise(0)).alias(f"p{p}")
        for p in range(6)
    ]
    g = d.groupBy(
        F.col("user_id").alias("conv_id"), b(F.col("ts_us")).alias("bucket_us")
    ).agg(*aggs)
    t = F.col("t")
    sq = sum((F.col(f"p{p}") * F.col(f"p{p}") for p in range(6)), F.lit(0))
    return g.filter(t >= 1).select(
        "conv_id",
        "bucket_us",
        "t",
        *[f"p{p}" for p in range(6)],
        ((t * t - sq).cast("double") / (t * t).cast("double")).alias(
            "pattern_gini"
        ),
    )


def _q71_sql() -> str:
    pid_case = """CASE
           WHEN a <= bb AND bb <= c THEN 0
           WHEN a <= bb AND NOT bb <= c AND a <= c THEN 1
           WHEN a <= bb AND NOT bb <= c AND NOT a <= c THEN 2
           WHEN NOT a <= bb AND bb <= c AND a <= c THEN 3
           WHEN NOT a <= bb AND bb <= c AND NOT a <= c THEN 4
           ELSE 5 END"""
    counts = ",\n         ".join(
        f"CAST(SUM(CASE WHEN in3 AND pid = {p} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS p{p}"
        for p in range(6)
    )
    sq = " + ".join(f"p{p} * p{p}" for p in range(6))
    return f"""
WITH c AS ({_C_SQL}), lagged AS (
  SELECT user_id, ts_us, c,
         lag(c, 2) OVER w AS a,
         lag(c) OVER w AS bb,
         lag(ts_us, 2) OVER w AS a_ts
  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), tagged AS (
  SELECT user_id,
         ts_us - ts_us % {DAY_US} AS bucket_us,
         (a_ts IS NOT NULL
          AND a_ts - a_ts % {DAY_US} = ts_us - ts_us % {DAY_US}) AS in3,
         {pid_case} AS pid
  FROM lagged
), g AS (
  SELECT user_id AS conv_id, bucket_us,
         CAST(SUM(CASE WHEN in3 THEN 1 ELSE 0 END) AS BIGINT) AS t,
         {counts}
  FROM tagged GROUP BY 1, 2
)
SELECT conv_id, bucket_us, t, p0, p1, p2, p3, p4, p5,
       CAST(t * t - ({sq}) AS DOUBLE) / CAST(t * t AS DOUBLE) AS pattern_gini
FROM g WHERE t >= 1
"""


# --- q72: sample-entropy template counts per (conv, 1d bucket) -----------------

SAMPEN_R_CENTS = 2000  # Chebyshev tolerance r = 20.00 value units
SAMPEN_M = 2  # template length m (A counts use m+1) — fixed by construction


def q72_sample_entropy_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-entropy template-match counts (Richman & Moorman 2000) per
    (conv, 1d bucket), m = 2: B = #{unordered template pairs within
    Chebyshev distance r on their first 2 elements}, A = the subset also
    matching on the 3rd — SampEn is −ln(A/B).  Emits A, B and the ratio
    A/B; the log is left to the consumer (log-free rule, DESIGN.md §18).
    Both counts range over the same template index set i ≤ N−m (the
    standard convention), i.e. templates whose 3 elements all fall in the
    bucket.

    Exactness: A and B are exact integer counts over integer-cent
    comparisons; the ratio is ONE pinned division.

    Scale shape: SampEn is Θ(pairs-within-r) by definition; the engine
    makes the pair generation output-bound instead of O(n²) with a BAND
    self-join — templates are bucketed by ``floor(c/r)`` and each probe
    template joins only its 3 adjacent value bands (a complete cover of
    |Δc| ≤ r), then exact filters decide.  The banding is a Spark-side
    physical optimization only: the DuckDB oracle runs the literal
    quadratic self-join, and both count the identical pair set.  Keys are
    (conv, bucket, band) — conv-prefixed, so hot buckets still bound the
    join by band occupancy, and a duplicate-heavy band degrades to the
    true pair count (which IS the output size), never beyond.
    """
    r = SAMPEN_R_CENTS
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    b = lambda col: _bucket(col, DAY_US)  # noqa: E731
    d = (
        _base(spark, sf_dir)
        .withColumn("bucket_us", b(F.col("ts_us")))
        .withColumn("c1", F.lead("c").over(w))
        .withColumn("c2", F.lead("c", 2).over(w))
        .withColumn("t2", F.lead("ts_us", 2).over(w))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("user_id", "bucket_us"))
        )
    )
    # ts is non-decreasing in window order: t2 in-bucket ⇒ t1 in-bucket
    tpl = (
        d.filter(F.col("t2").isNotNull() & (b(F.col("t2")) == F.col("bucket_us")))
        .withColumn(
            "idx",
            F.row_number().over(
                Window.partitionBy("user_id", "bucket_us").orderBy(
                    "ts_us", "event_id"
                )
            ),
        )
        .select(
            F.col("user_id").alias("conv_id"),
            "bucket_us",
            "n",
            "idx",
            "c",
            "c1",
            "c2",
            F.floor(F.col("c").cast("double") / F.lit(float(r))).alias("cb"),
        )
    )
    probe = tpl.withColumn(
        "cbp", F.explode(F.array(F.col("cb") - 1, F.col("cb"), F.col("cb") + 1))
    )
    a, bt = probe.alias("a"), tpl.alias("b")
    pairs = a.join(
        bt,
        (F.col("a.conv_id") == F.col("b.conv_id"))
        & (F.col("a.bucket_us") == F.col("b.bucket_us"))
        & (F.col("a.cbp") == F.col("b.cb")),
    ).filter(
        (F.col("a.idx") < F.col("b.idx"))
        & (F.abs(F.col("a.c") - F.col("b.c")) <= r)
        & (F.abs(F.col("a.c1") - F.col("b.c1")) <= r)
    )
    g = pairs.groupBy(
        F.col("a.conv_id").alias("conv_id"),
        F.col("a.bucket_us").alias("bucket_us"),
    ).agg(
        F.first(F.col("a.n")).alias("n"),
        F.count(F.lit(1)).alias("b_pairs"),
        F.sum(
            (F.abs(F.col("a.c2") - F.col("b.c2")) <= r).cast("long")
        ).alias("a_pairs"),
    )
    return g.select(
        "conv_id",
        "bucket_us",
        "n",
        "b_pairs",
        "a_pairs",
        (
            F.col("a_pairs").cast("double") / F.col("b_pairs").cast("double")
        ).alias("sampen_ratio"),
    )


_Q72_SQL = f"""
WITH c AS ({_C_SQL}), lagged AS (
  SELECT user_id, ts_us, event_id, c,
         ts_us - ts_us % {DAY_US} AS bucket_us,
         lead(c) OVER w AS c1,
         lead(c, 2) OVER w AS c2,
         lead(ts_us, 2) OVER w AS t2,
         COUNT(*) OVER (PARTITION BY user_id, ts_us - ts_us % {DAY_US}) AS n
  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), tpl AS (
  SELECT user_id AS conv_id, bucket_us, n, c, c1, c2,
         row_number() OVER (PARTITION BY user_id, bucket_us
                            ORDER BY ts_us, event_id) AS idx
  FROM lagged
  WHERE t2 IS NOT NULL AND t2 - t2 % {DAY_US} = bucket_us
), pairs AS (
  SELECT a.conv_id, a.bucket_us, a.n,
         CASE WHEN abs(a.c2 - b.c2) <= {SAMPEN_R_CENTS} THEN 1 ELSE 0 END AS am
  FROM tpl a JOIN tpl b
    ON a.conv_id = b.conv_id AND a.bucket_us = b.bucket_us
   AND a.idx < b.idx
   AND abs(a.c - b.c) <= {SAMPEN_R_CENTS}
   AND abs(a.c1 - b.c1) <= {SAMPEN_R_CENTS}
)
SELECT conv_id, bucket_us,
       CAST(MIN(n) AS BIGINT) AS n,
       COUNT(*) AS b_pairs,
       CAST(SUM(am) AS BIGINT) AS a_pairs,
       CAST(SUM(am) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS sampen_ratio
FROM pairs GROUP BY 1, 2
"""


# --- q73: mean-crossing rate per (conv, 1h bucket) -----------------------------


def q73_mean_crossing_rate_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-crossing rate per (conv, 1h bucket) — A5's zero-crossing count
    re-centered on the bucket's own mean (the HAR canon's MCR, robust to a
    channel's DC offset): #{in-bucket consecutive pairs whose values sit on
    opposite sides of the bucket mean} / (n − 1).

    Exactness trick: a value's side of the mean is ``sign(c·n − s1)`` — an
    exact integer (the mean itself, s1/n, never needs to exist as a
    double), with sign(0) = +1 matching A5's convention.  Both pair
    members use the SAME bucket's (n, s1) since the pair is in-bucket by
    construction.  The only double is the rate — ONE pinned division.

    Scale shape: the conv-ordered lag window and the (conv, bucket) sum
    window both cluster under hash(conv) (subset rule), so the whole query
    is a single exchange + one hash agg, no Python.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    b = lambda col: _bucket(col, HOUR_US)  # noqa: E731
    d = (
        _base(spark, sf_dir)
        .withColumn("bucket_us", b(F.col("ts_us")))
        .withColumn("prev_c", F.lag("c").over(w))
        .withColumn("prev_ts", F.lag("ts_us").over(w))
    )
    wb = Window.partitionBy("user_id", "bucket_us")
    d = d.withColumn("bn", F.count(F.lit(1)).over(wb)).withColumn(
        "bs1", F.sum("c").over(wb)
    )
    dev = _dec(F.col("c")) * _dec(F.col("bn")) - _dec(F.col("bs1"))
    dev_prev = _dec(F.col("prev_c")) * _dec(F.col("bn")) - _dec(F.col("bs1"))
    sgn = lambda col: F.when(col < 0, F.lit(-1)).otherwise(F.lit(1))  # noqa: E731
    in_pair = F.col("prev_ts").isNotNull() & (b(F.col("prev_ts")) == F.col("bucket_us"))
    cross = in_pair & (sgn(dev) * sgn(dev_prev) < 0)
    g = d.groupBy(
        F.col("user_id").alias("conv_id"), F.col("bucket_us")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cross.cast("long")).alias("mc"),
    )
    return g.filter(F.col("n") >= 2).select(
        "conv_id",
        "bucket_us",
        "n",
        "mc",
        (
            F.col("mc").cast("double") / (F.col("n") - 1).cast("double")
        ).alias("mcr"),
    )


_Q73_SQL = f"""
WITH c AS ({_C_SQL}), lagged AS (
  SELECT user_id, ts_us, c,
         ts_us - ts_us % {HOUR_US} AS bucket_us,
         lag(c) OVER w AS prev_c,
         lag(ts_us) OVER w AS prev_ts
  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), dev AS (
  SELECT user_id, bucket_us, prev_c, prev_ts,
         COUNT(*) OVER wb AS bn,
         SUM(c) OVER wb AS bs1,
         c
  FROM lagged
  WINDOW wb AS (PARTITION BY user_id, bucket_us)
), tagged AS (
  SELECT user_id, bucket_us,
         (prev_ts IS NOT NULL
          AND prev_ts - prev_ts % {HOUR_US} = bucket_us
          AND (CASE WHEN CAST(c AS HUGEINT) * bn - bs1 < 0
                    THEN -1 ELSE 1 END)
            * (CASE WHEN CAST(prev_c AS HUGEINT) * bn - bs1 < 0
                    THEN -1 ELSE 1 END) < 0) AS cross_hit
  FROM dev
)
SELECT user_id AS conv_id, bucket_us,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN cross_hit THEN 1 ELSE 0 END) AS BIGINT) AS mc,
       CAST(SUM(CASE WHEN cross_hit THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) - 1 AS DOUBLE) AS mcr
FROM tagged
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


# --- q74: signal magnitude area per (conv, 1h bucket) -------------------------


def q74_sma_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signal magnitude area (SMA) per (conv, 1h bucket) — the canonical
    HAR composite magnitude feature (Figo et al. 2010 §3.1: SMA =
    (1/n)·Σ(|x|+|y|+|z|) across axes), applied to the transcript-derived
    channel pair under q48's pair-in-bucket convention: an event
    contributes iff its predecessor is in the same bucket; axis x = the
    signal value, axis y = the inter-event gap.  Channels are
    unit-normalized before combining (cents→value units by /100,
    µs→seconds by /1e6) so the composite is scale-commensurate.

    Exactness: Σ|c| and Σdt are exact BIGINTs (headroom: |c| ≤ 5·10⁴ cents
    and Σdt per 1h bucket ≤ 3.6·10⁹ µs·convs — both orders of magnitude
    inside 2⁵³, so a plain cast is correctly rounded); each emitted double
    is the pinned left-associated tree ``cast(Σ)/cast(n)/unit`` and the
    composite is the single further add of the two trees, written
    identically in both engines.

    Scale shape: one lag window + one hash agg, both keyed on conv — a
    single shuffle, no Python.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = (
        _base(spark, sf_dir)
        .withColumn("prev_ts", F.lag("ts_us").over(w))
        .filter(
            F.col("prev_ts").isNotNull()
            & (_bucket(F.col("prev_ts"), HOUR_US) == _bucket(F.col("ts_us"), HOUR_US))
        )
    )
    g = d.groupBy(
        F.col("user_id").alias("conv_id"),
        _bucket(F.col("ts_us"), HOUR_US).alias("bucket_us"),
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.abs(F.col("c"))).alias("sabs_value"),
        F.sum(F.col("ts_us") - F.col("prev_ts")).alias("sabs_gap_us"),
    )
    nd = F.col("n_pairs").cast("double")
    sma_v = F.col("sabs_value").cast("double") / nd / F.lit(100.0)
    sma_g = F.col("sabs_gap_us").cast("double") / nd / F.lit(1e6)
    return g.select(
        "conv_id",
        "bucket_us",
        "n_pairs",
        "sabs_value",
        "sabs_gap_us",
        sma_v.alias("sma_value"),
        sma_g.alias("sma_gap_s"),
        (sma_v + sma_g).alias("sma"),
    )


_Q74_SQL = f"""
WITH c AS ({_C_SQL}), lagged AS (
  SELECT user_id, ts_us, c,
         lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS prev_ts
  FROM c
), pairs AS (
  SELECT user_id,
         ts_us - ts_us % {HOUR_US} AS bucket_us,
         abs(c) AS av,
         ts_us - prev_ts AS dt
  FROM lagged
  WHERE prev_ts IS NOT NULL
    AND prev_ts - prev_ts % {HOUR_US} = ts_us - ts_us % {HOUR_US}
), g AS (
  SELECT user_id AS conv_id, bucket_us,
         COUNT(*) AS n_pairs,
         CAST(SUM(av) AS BIGINT) AS sabs_value,
         CAST(SUM(dt) AS BIGINT) AS sabs_gap_us
  FROM pairs GROUP BY 1, 2
)
SELECT conv_id, bucket_us, n_pairs, sabs_value, sabs_gap_us,
       CAST(sabs_value AS DOUBLE) / CAST(n_pairs AS DOUBLE) / 100.0
         AS sma_value,
       CAST(sabs_gap_us AS DOUBLE) / CAST(n_pairs AS DOUBLE) / 1000000.0
         AS sma_gap_s,
       CAST(sabs_value AS DOUBLE) / CAST(n_pairs AS DOUBLE) / 100.0
         + CAST(sabs_gap_us AS DOUBLE) / CAST(n_pairs AS DOUBLE) / 1000000.0
         AS sma
FROM g
"""


QUERIES = {
    "q64_temporal_moments_1d": q64_temporal_moments_1d,
    "q65_histogram_diversity_1h": q65_histogram_diversity_1h,
    "q66_ar2_yule_walker": q66_ar2_yule_walker,
    "q67_amplitude_factors_1h": q67_amplitude_factors_1h,
    "q68_burst_runs": q68_burst_runs,
    "q69_dominant_acf_lag": q69_dominant_acf_lag,
    "q70_paa_sax_1d": q70_paa_sax_1d,
    "q71_ordinal_patterns_1d": q71_ordinal_patterns_1d,
    "q72_sample_entropy_1d": q72_sample_entropy_1d,
    "q73_mean_crossing_rate_1h": q73_mean_crossing_rate_1h,
    "q74_sma_1h": q74_sma_1h,
}

ORACLE_SQL = {
    "q64_temporal_moments_1d": _Q64_SQL,
    "q65_histogram_diversity_1h": _Q65_SQL,
    "q66_ar2_yule_walker": _Q66_SQL,
    "q67_amplitude_factors_1h": _Q67_SQL,
    "q68_burst_runs": _Q68_SQL,
    "q69_dominant_acf_lag": _q69_sql(),
    "q70_paa_sax_1d": _q70_sql(),
    "q71_ordinal_patterns_1d": _q71_sql(),
    "q72_sample_entropy_1d": _Q72_SQL,
    "q73_mean_crossing_rate_1h": _Q73_SQL,
    "q74_sma_1h": _Q74_SQL,
}
