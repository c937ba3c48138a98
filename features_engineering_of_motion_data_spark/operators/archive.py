"""Raw-tier archive (SURVEY §2.7 C1–C3, DESIGN §7).

Per ``(conv_id, channel, 1h bucket)`` the full-fidelity turn arrays are stored
compressed: ``turn_dod``/``ts_dod`` (delta-of-delta int64) and ``val_gorilla``
(XOR codec over the float64 bit pattern of the raw integer value — exact,
since |x| ≤ 2⁵³). Encode runs inside one grouped ``applyInPandas`` pass per
``(conv_id, channel)`` — Arrow-batched, pure-numpy kernels, the only Python
loop is per *bucket* (one encode call each), never per row.

Decode (C3, the recompute/audit scan) is a ``mapInPandas`` explode that
reconstructs exactly the channel frame the archive was built from.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..kernels.codecs import decode_dod, decode_xor, encode_dod, encode_xor
from .features import TIER_US

ARCHIVE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("bucket_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("turn_dod", T.BinaryType()),
        T.StructField("ts_dod", T.BinaryType()),
        T.StructField("val_gorilla", T.BinaryType()),
        T.StructField("raw_bytes", T.LongType()),      # 24 B/turn uncompressed
        T.StructField("encoded_bytes", T.LongType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("x", T.LongType()),
    ]
)


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    conv_id = pdf["conv_id"].iloc[0]
    channel = pdf["channel"].iloc[0]
    step = int(pdf["_step"].iloc[0])
    pdf = pdf.sort_values("turn_idx", kind="mergesort")
    ts = pdf["ts_us"].to_numpy(np.int64)
    ti = pdf["turn_idx"].to_numpy(np.int64)
    x = pdf["x"].to_numpy(np.int64)
    bucket = (ts // step) * step
    # stable sort by bucket makes each bucket one contiguous run (a no-op
    # reorder when ts is monotone in turn_idx, the transcript contract, but
    # correct for stray non-monotone series too) — so per-bucket work is a
    # slice, not an O(n) boolean mask per bucket
    o = np.argsort(bucket, kind="stable")
    bucket, ti, ts, x = bucket[o], ti[o], ts[o], x[o]
    ub, starts = np.unique(bucket, return_index=True)
    ends = np.append(starts[1:], len(bucket))
    xf = x.astype(np.float64)
    t_dod = [encode_dod(ti[s:e]) for s, e in zip(starts, ends)]
    s_dod = [encode_dod(ts[s:e]) for s, e in zip(starts, ends)]
    v_gor = [encode_xor(xf[s:e]) for s, e in zip(starts, ends)]
    n = ends - starts
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "channel": channel,
            "bucket_us": ub,
            "n": n,
            "turn_dod": t_dod,
            "ts_dod": s_dod,
            "val_gorilla": v_gor,
            "raw_bytes": 24 * n,
            "encoded_bytes": [
                len(a) + len(b) + len(c) for a, b, c in zip(t_dod, s_dod, v_gor)
            ],
        }
    )


def build_archive(channels: DataFrame, tier: str = "1h") -> DataFrame:
    """C1/C2 encode: channel frame → compressed raw-tier archive table."""
    from pyspark.sql import functions as F

    step = TIER_US[tier]
    return (
        channels.select("conv_id", "channel", "turn_idx", "ts_us", "x")
        .withColumn("_step", F.lit(step))
        .groupBy("conv_id", "channel")
        .applyInPandas(_encode_group, ARCHIVE_SCHEMA)
    )


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k: [] for k in ("conv_id", "channel", "turn_idx", "ts_us", "x")}
        for row in pdf.itertuples(index=False):
            ti = decode_dod(row.turn_dod)
            ts = decode_dod(row.ts_dod)
            x = decode_xor(row.val_gorilla).astype(np.int64)
            out["conv_id"].append(np.full(len(ti), row.conv_id, dtype=object))
            out["channel"].append(np.full(len(ti), row.channel, dtype=object))
            out["turn_idx"].append(ti.astype(np.int32))
            out["ts_us"].append(ts)
            out["x"].append(x)
        if out["turn_idx"]:
            yield pd.DataFrame({k: np.concatenate(v) for k, v in out.items()})


def decode_archive(archive: DataFrame) -> DataFrame:
    """C3 decode-scan: archive table → exact original channel frame rows.

    The per-row loop here iterates over *buckets* (one decode per compressed
    payload); all per-turn work is numpy inside the codec kernels.
    """
    return archive.mapInPandas(_decode_batches, DECODED_SCHEMA)
