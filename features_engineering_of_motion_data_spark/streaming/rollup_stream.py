"""Structured-Streaming surface (SURVEY §2.10 — stretch beyond the batch
north_rule, marked optional there).

Four operators:

* :func:`stream_tier_1m` — watermarked tumbling-window continuous aggregate
  of the row-local channels (text_len, tool_cadence) per (conv, 1m bucket).
  Same exact-integer sufficient statistics as the batch path, so a finished
  streaming bucket equals the batch bucket bit-for-bit (tested with the
  file source + availableNow trigger).
* :func:`stream_latency_stateful` — the latency channel needs the previous
  turn's ts, which streaming window functions can't provide; this is the
  ``applyInPandasWithState`` custom stateful operator: per-conv state holds
  (last_turn_idx, last_ts); each micro-batch emits latency rows.
* :func:`stream_sessions` — conversation "episodes" via native
  ``session_window`` (gap-based), the streaming analogue of sessionization.
* :func:`stream_dedup_turns` — exactly-once turn ingestion under
  at-least-once delivery (``dropDuplicatesWithinWatermark`` on
  (conv_id, turn_idx), state bounded by the watermark); chains upstream of
  :func:`stream_tier_1m` as one query (pass ``watermark=None`` downstream).

Late turns inside the watermark update their 1m bucket; buckets finalize once
the watermark passes, after which the cascade (1m→1h→1d) is the existing
batch merge over the streamed tier table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LAT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("lat_us", T.LongType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_turn", T.IntegerType()),
        T.StructField("last_ts", T.LongType()),
    ]
)


def stream_tier_1m(
    turns: DataFrame, watermark: str | None = "10 minutes"
) -> DataFrame:
    """Streaming 1m-tier sufficient stats for the row-local channels.

    Emits the FULL sufficient-statistics contract (operators/features.py
    STAT_COLS), so a finalized streamed bucket feeds straight into the batch
    merge algebra — ``rollup_merge(streamed_1m, "1h")`` — closing the
    streaming→batch cascade handoff (tested bit-exact in
    tests/test_streaming.py). ``zc`` is the literal 0: both row-local
    channels are non-negative (text length; tool-call indicator) and the
    engine's sign convention (sign(0)=+1, DESIGN.md §3) admits no crossing
    between non-negative values — identically what the batch pair-scan
    computes. first/last travel by ``min_by``/``max_by`` on turn_idx exactly
    as in the batch aggregation.

    ``watermark=None`` inherits the upstream watermark instead of defining
    one — required when chaining after another stateful operator (e.g.
    :func:`stream_dedup_turns`): Spark forbids redefining the watermark
    between stateful operators in one query.
    """
    wm = turns if watermark is None else turns.withWatermark("ts", watermark)
    base = wm.select(
        "conv_id",
        "ts",
        "turn_idx",
        F.unix_micros("ts").alias("ts_us"),
        F.length("text").cast("long").alias("text_len"),
        F.col("tool").isNotNull().cast("long").alias("tool_cadence"),
    )
    melted = base.selectExpr(
        "conv_id",
        "ts",
        "turn_idx",
        "ts_us",
        "stack(2, 'text_len', text_len, 'tool_cadence', tool_cadence)"
        " as (channel, x)",
    ).filter(F.col("x").isNotNull())
    x_dec = F.col("x").cast("decimal(19,0)")
    return (
        melted.groupBy("conv_id", "channel", F.window("ts", "1 minute"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s1"),
            F.sum(x_dec * x_dec).cast("decimal(38,0)").alias("s2"),
            F.min("x").alias("min_raw"),
            F.max("x").alias("max_raw"),
            F.min_by("ts_us", "turn_idx").alias("first_ts_us"),
            F.max_by("ts_us", "turn_idx").alias("last_ts_us"),
            F.min_by("x", "turn_idx").alias("first_val"),
            F.max_by("x", "turn_idx").alias("last_val"),
        )
        .select(
            "conv_id",
            "channel",
            F.unix_micros(F.col("window.start")).alias("bucket_us"),
            "n",
            "s1",
            "s2",
            "min_raw",
            "max_raw",
            F.lit(0).cast("long").alias("zc"),
            "first_ts_us",
            "last_ts_us",
            "first_val",
            "last_val",
        )
    )


def _latency_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Vectorized: within a micro-batch the lag is a ``Series.shift`` diff;
    only the batch-boundary row uses the carried state value."""
    (conv_id,) = key
    last_turn, last_ts = state.get if state.exists else (None, None)
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values("turn_idx", kind="mergesort")
        ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
        prev = pd.array(ts_us, dtype="Int64").copy()
        prev[1:] = ts_us[:-1]
        prev[0] = pd.NA if last_ts is None else last_ts
        out = pd.DataFrame(
            {
                "conv_id": conv_id,
                "turn_idx": pdf["turn_idx"].astype("int32").to_numpy(),
                "ts_us": ts_us,
                "lat_us": pd.array(ts_us, dtype="Int64") - prev,
            }
        )
        last_turn = int(pdf["turn_idx"].iloc[-1])
        last_ts = int(ts_us[-1])
        yield out
    state.update((last_turn, last_ts))


def stream_latency_stateful(turns: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful operator: per-conv inter-turn latency across
    micro-batches (state carries the previous turn)."""
    return (
        turns.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _latency_fn,
            outputStructType=LAT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EWMA_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ewma_len", T.DoubleType()),
    ]
)
_EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_turn", T.IntegerType()),
        T.StructField("last_y", T.DoubleType()),
    ]
)


def _ewma_fn_factory(alpha: float):
    def _ewma_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Continuation trick: seeding pandas' C kernel with the carried
        ``y`` as a synthetic first element makes ``ewm(adjust=False)`` emit
        EXACTLY the continued recurrence — output[0] == y_prev, then
        ``(1−α)·y + α·x`` per step — so micro-batch boundaries are
        bit-invisible (tested vs the single-pass batch EWMA).

        Ordering guard: ``last_turn`` is not decoration — a delivery with
        ``turn_idx <= last_turn`` (late/out-of-order arrival inside the
        watermark, or an at-least-once re-delivery that slipped past
        upstream dedup) would silently FOLD INTO the recurrence and corrupt
        every subsequent value. Such rows are dropped (emitting nothing for
        them) so the emitted series is exactly the ordered-prefix EWMA —
        wrong-input rows cause a gap, never a wrong value.  Compose
        ``stream_dedup_turns`` upstream to make drops re-delivery-only."""
        (conv_id,) = key
        last_turn, last_y = state.get if state.exists else (None, None)
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("turn_idx", kind="mergesort")
            if last_turn is not None:
                pdf = pdf[pdf["turn_idx"] > last_turn]
                if not len(pdf):
                    continue
            x = pdf["text"].str.len().fillna(0).astype("float64")
            if last_y is not None:
                seeded = pd.concat(
                    [pd.Series([last_y], dtype="float64"), x], ignore_index=True
                )
                y = seeded.ewm(alpha=alpha, adjust=False).mean().to_numpy()[1:]
            else:
                y = x.ewm(alpha=alpha, adjust=False).mean().to_numpy()
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": pdf["turn_idx"].astype("int32").to_numpy(),
                    "ewma_len": y,
                }
            )
            last_turn = int(pdf["turn_idx"].iloc[-1])
            last_y = float(y[-1])
        if last_turn is not None:
            state.update((last_turn, last_y))

    return _ewma_fn


def stream_ewma(
    turns: DataFrame, alpha: float = 0.25, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming EWMA of per-turn text length (the streaming face of q55):
    per-conv state is ONE float + the last turn index, so operator memory is
    O(live conversations) regardless of stream length — the recurrence is
    resumed, never recomputed, and the emitted smoothing is bit-equal to the
    batch single-pass EWMA under ordered delivery.  Out-of-order deliveries
    (turn_idx at or below the carried last_turn) are DROPPED, not folded in
    — see _ewma_fn_factory's ordering guard."""
    return (
        turns.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _ewma_fn_factory(alpha),
            outputStructType=EWMA_SCHEMA,
            stateStructType=_EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_dedup_turns(turns: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming analogue of the batch dedup stage (P4): exactly-once turn
    ingestion under at-least-once delivery.  ``dropDuplicatesWithinWatermark``
    keeps the FIRST arrival of each (conv_id, turn_idx) and drops
    re-deliveries arriving within the watermark delay; per-key state is
    evicted once the watermark passes the key's event time, so operator
    memory is bounded by delivery skew, not stream length — the property
    that makes this deployable on an unbounded 10¹²-turn feed.

    Composes upstream of :func:`stream_tier_1m` (chained stateful operators,
    Spark ≥ 3.5, append mode): dedup → windowed agg in ONE streaming query.

    Contract vs batch ``dedup_turns``: batch breaks (conv, turn) ties by the
    stable row order; streaming keeps the first ARRIVAL.  For re-deliveries
    — bit-identical payloads, the case this operator exists for — the two
    agree exactly (tested); for genuinely conflicting payloads the streaming
    tie-break is arrival order by design.
    """
    return turns.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def stream_sessions(
    turns: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Conversation episodes: gap-based session windows per conv."""
    return (
        turns.withWatermark("ts", watermark)
        .groupBy("conv_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            "conv_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_turns",
        )
    )
