"""Gap-fill + gap-filled features (SURVEY §2.8 G1/G2, DESIGN §6).

Missing turn_idx values strictly inside a channel's observed range are filled
by linear interpolation — ``ts`` linear in ``turn_idx``, value linear in
``ts`` — with NO extrapolation beyond the observed range and no synthesized
text (filled rows carry nulls upstream; here only the numeric series exists).

Interpolated values are float64, so gap-filled features live on the kernel
path: one ``applyInPandas`` per ``(conv_id, channel)`` computes the filled
series and its per-tier features with *pinned numpy ops* (np.interp, np.sum,
np.sqrt) — bitwise identical to the independent oracle (oracle/gapfill.py)
because each group is processed whole in canonical turn order, making the
result independent of Spark partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .features import TIER_US

FILLED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("is_filled", T.BooleanType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("tier", T.StringType()),
        T.StructField("bucket_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("n_filled", T.LongType()),
        T.StructField("f_mean", T.DoubleType()),
        T.StructField("f_std", T.DoubleType()),
        T.StructField("f_rms", T.DoubleType()),
        T.StructField("f_min", T.DoubleType()),
        T.StructField("f_max", T.DoubleType()),
        T.StructField("f_zero_crossings", T.LongType()),
        T.StructField("f_energy", T.DoubleType()),
    ]
)


def fill_series(ti: np.ndarray, ts: np.ndarray, x: np.ndarray):
    """Pinned interpolation kernel shared conceptually with the oracle spec:
    ts_k = np.interp(k, ti, ts); x_k = np.interp(ts_k, ts, x).

    Returns (turn_idx, ts_us, x_float, is_filled) in ascending turn order.
    """
    order = np.argsort(ti, kind="stable")
    ti, ts, x = ti[order], ts[order], x[order]
    tsf = ts.astype(np.float64)
    xf = x.astype(np.float64)
    missing = np.setdiff1d(np.arange(ti[0], ti[-1] + 1, dtype=np.int64), ti)
    if len(missing):
        ts_m = np.interp(missing.astype(np.float64), ti.astype(np.float64), tsf)
        x_m = np.interp(ts_m, tsf, xf)
        ts_m_i = np.floor(ts_m).astype(np.int64)
        all_ti = np.concatenate([ti, missing])
        all_ts = np.concatenate([ts, ts_m_i])
        all_x = np.concatenate([xf, x_m])
        filled = np.concatenate(
            [np.zeros(len(ti), bool), np.ones(len(missing), bool)]
        )
        o = np.argsort(all_ti, kind="stable")
        return all_ti[o], all_ts[o], all_x[o], filled[o]
    return ti, ts, xf, np.zeros(len(ti), bool)


def _tier_features(
    conv_id, channel, tier, ti, ts, x, filled
) -> pd.DataFrame:
    """Per-bucket features, vectorized over bucket RUNS.

    The adjacency terms (zero-crossings) are computed in turn order first;
    then a stable sort by bucket makes each bucket one contiguous run, so a
    run slice ``x[s:e]`` contains exactly the elements (in exactly the
    order) of the oracle's boolean-mask selection — bitwise-equal results
    for ANY ts ordering, without the O(buckets·n) per-bucket masking.

    Order-free reductions (counts, integer sums, min/max) use
    ``ufunc.reduceat``; ONLY the two float sums s1/s2 stay as per-slice
    ``np.sum`` calls because the pinned oracle op is numpy's pairwise
    summation, whose rounding ``np.add.reduceat`` does not reproduce — the
    loop is O(#buckets) slice-sums, not O(n·#buckets) masks.
    """
    step = TIER_US[tier]
    bucket = (ts // step) * step
    sign = np.where(x < 0.0, -1, 1)
    same_bucket = np.concatenate([[False], bucket[1:] == bucket[:-1]])
    flip = np.concatenate([[False], sign[1:] * sign[:-1] < 0])
    cross = (same_bucket & flip).astype(np.int64)

    order = np.argsort(bucket, kind="stable")
    bucket, x, filled, cross = bucket[order], x[order], filled[order], cross[order]
    ub, starts = np.unique(bucket, return_index=True)
    ends = np.append(starts[1:], len(bucket))
    n = ends - starts
    n_filled = np.add.reduceat(filled.astype(np.int64), starts)
    zc = np.add.reduceat(cross, starts)
    f_min = np.minimum.reduceat(x, starts)
    f_max = np.maximum.reduceat(x, starts)
    xx = x * x
    s1 = np.empty(len(starts))
    s2 = np.empty(len(starts))
    for i in range(len(starts)):
        s1[i] = np.sum(x[starts[i] : ends[i]])
        s2[i] = np.sum(xx[starts[i] : ends[i]])
    nd = n.astype(np.float64)
    m = s1 / nd
    q = s2 / nd
    var = q - m * m
    var = np.where(var < 0.0, 0.0, var)
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "channel": channel,
            "tier": tier,
            "bucket_us": ub,
            "n": n,
            "n_filled": n_filled,
            "f_mean": m,
            "f_std": np.sqrt(var),
            "f_rms": np.sqrt(q),
            "f_min": f_min,
            "f_max": f_max,
            "f_zero_crossings": zc,
            "f_energy": s2,
        }
    )


def _features_group(pdf: pd.DataFrame) -> pd.DataFrame:
    conv_id = pdf["conv_id"].iloc[0]
    channel = pdf["channel"].iloc[0]
    tiers = pdf["_tiers"].iloc[0].split(",")
    ti, ts, x, filled = fill_series(
        pdf["turn_idx"].to_numpy(np.int64),
        pdf["ts_us"].to_numpy(np.int64),
        pdf["x"].to_numpy(np.int64),
    )
    frames = [
        _tier_features(conv_id, channel, tier, ti, ts, x, filled)
        for tier in tiers
    ]
    out = pd.concat(frames, ignore_index=True)
    return out[[f.name for f in FEATURE_SCHEMA.fields]]


def _fill_group(pdf: pd.DataFrame) -> pd.DataFrame:
    conv_id = pdf["conv_id"].iloc[0]
    channel = pdf["channel"].iloc[0]
    ti, ts, x, filled = fill_series(
        pdf["turn_idx"].to_numpy(np.int64),
        pdf["ts_us"].to_numpy(np.int64),
        pdf["x"].to_numpy(np.int64),
    )
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "channel": channel,
            "turn_idx": ti.astype(np.int32),
            "ts_us": ts,
            "x": x,
            "is_filled": filled,
        }
    )


def gapfill_series(channels: DataFrame) -> DataFrame:
    """G1+G2: the gap-filled per-turn series (is_filled flags included)."""
    return (
        channels.select("conv_id", "channel", "turn_idx", "ts_us", "x")
        .groupBy("conv_id", "channel")
        .applyInPandas(_fill_group, FILLED_SCHEMA)
    )


def gapfill_features(
    channels: DataFrame, tiers: tuple[str, ...] = ("1m", "1h", "1d")
) -> DataFrame:
    """Per-tier features over the gap-filled series, one kernel pass."""
    from pyspark.sql import functions as F

    return (
        channels.select("conv_id", "channel", "turn_idx", "ts_us", "x")
        .withColumn("_tiers", F.lit(",".join(tiers)))
        .groupBy("conv_id", "channel")
        .applyInPandas(_features_group, FEATURE_SCHEMA)
    )
