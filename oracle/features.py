"""Numpy oracle: dedup, channels, tier features per DESIGN.md §1–§5.

Deliberately written in plain pandas/numpy with Python-int exact arithmetic —
mirroring the reference library's execution substrate (pandas/numpy; SURVEY.md
§0) — and sharing no code with the Spark engine.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

TIER_US = {"1m": 60_000_000, "1h": 3_600_000_000, "1d": 86_400_000_000}


def _md5(s: str | None) -> str:
    if s is None:
        return "￿"  # sort nulls last
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def dedup(df: pd.DataFrame) -> pd.DataFrame:
    """Keep first row per (conv_id, turn_idx), ordered by (ts, md5(text))."""
    d = df.copy()
    d["_h"] = [_md5(t) for t in d["text"]]
    d = d.sort_values(["conv_id", "turn_idx", "ts", "_h"], kind="mergesort")
    d = d.drop_duplicates(["conv_id", "turn_idx"], keep="first")
    return d.drop(columns="_h").reset_index(drop=True)


def derive_channels(df: pd.DataFrame) -> pd.DataFrame:
    """Long-format (conv_id, channel, turn_idx, ts_us, x) with integer x.

    Input must be deduped; ts may be datetime64[us] or int64 microseconds.
    """
    d = df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    ts_us = d["ts"].to_numpy()
    if np.issubdtype(ts_us.dtype, np.datetime64):
        ts_us = ts_us.astype("datetime64[us]").astype("int64")
    else:
        ts_us = ts_us.astype("int64")

    frames = []
    # text_len: rows with non-null text
    mask = d["text"].notna().to_numpy()
    frames.append(
        pd.DataFrame(
            {
                "conv_id": d["conv_id"].to_numpy()[mask],
                "channel": "text_len",
                "turn_idx": d["turn_idx"].to_numpy()[mask],
                "ts_us": ts_us[mask],
                "x": np.array([len(t) for t in d["text"][mask]], dtype=np.int64),
            }
        )
    )
    # inter_turn_latency: ts diff per conv, first turn excluded
    conv = d["conv_id"].to_numpy()
    prev_same = np.concatenate([[False], conv[1:] == conv[:-1]])
    lat = np.empty(len(d), dtype=np.int64)
    lat[1:] = ts_us[1:] - ts_us[:-1]
    frames.append(
        pd.DataFrame(
            {
                "conv_id": conv[prev_same],
                "channel": "inter_turn_latency",
                "turn_idx": d["turn_idx"].to_numpy()[prev_same],
                "ts_us": ts_us[prev_same],
                "x": lat[prev_same],
            }
        )
    )
    # tool_cadence: every turn
    frames.append(
        pd.DataFrame(
            {
                "conv_id": conv,
                "channel": "tool_cadence",
                "turn_idx": d["turn_idx"].to_numpy(),
                "ts_us": ts_us,
                "x": d["tool"].notna().to_numpy().astype(np.int64),
            }
        )
    )
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["conv_id", "channel", "turn_idx"], kind="mergesort").reset_index(drop=True)


def _finalize(n: int, s1: int, s2: int, mn: int, mx: int, zc: int, u: float) -> dict:
    """DESIGN.md §2 pinned float64 finalization."""
    fn = float(n)
    m = float(s1) / fn
    q = float(s2) / fn
    var = q - m * m
    if var < 0.0:
        var = 0.0
    return {
        "f_mean": m / u,
        "f_std": math.sqrt(var) / u,
        "f_rms": math.sqrt(q) / u,
        "f_min": float(mn) / u,
        "f_max": float(mx) / u,
        "f_energy": float(s2) / (u * u),
        "f_zero_crossings": zc,
    }


UNIT = {"text_len": 1.0, "inter_turn_latency": 1e6, "tool_cadence": 1.0}  # .get default 1.0 = the engine's unit_divisor otherwise-branch


def tier_features(channels: pd.DataFrame, tier: str) -> pd.DataFrame:
    """Per-(conv_id, channel, bucket) sufficient stats + finalized features.

    ``channels`` is the output of :func:`derive_channels`. Exact arithmetic:
    s1/s2 via Python ints; zero crossings per DESIGN.md §3.
    """
    step = TIER_US[tier]
    d = channels.sort_values(["conv_id", "channel", "turn_idx"], kind="mergesort")
    conv = d["conv_id"].to_numpy()
    chan = d["channel"].to_numpy()
    x = d["x"].to_numpy()
    ts = d["ts_us"].to_numpy()
    ti = d["turn_idx"].to_numpy()
    bucket = (ts // step) * step

    # crossing indicator vs previous row in same (conv, channel, bucket)
    same_series = np.concatenate(
        [[False], (conv[1:] == conv[:-1]) & (chan[1:] == chan[:-1])]
    )
    same_bucket = np.concatenate([[False], bucket[1:] == bucket[:-1]])
    sign = np.where(x < 0, -1, 1)
    flip = np.concatenate([[False], sign[1:] * sign[:-1] < 0])
    cross = (same_series & same_bucket & flip).astype(np.int64)

    rows = []
    key = pd.DataFrame({"conv_id": conv, "channel": chan, "bucket_us": bucket})
    grp = key.groupby(["conv_id", "channel", "bucket_us"], sort=True).indices
    for (c, ch, b), idx in grp.items():
        xs = x[idx]
        xs_int = [int(v) for v in xs]
        n = len(xs_int)
        s1 = sum(xs_int)
        s2 = sum(v * v for v in xs_int)
        # idx is ordered by turn_idx within the group (stable sort above)
        order = np.argsort(ti[idx], kind="stable")
        first_i, last_i = idx[order[0]], idx[order[-1]]
        rec = {
            "conv_id": c,
            "channel": ch,
            "bucket_us": int(b),
            "n": n,
            "s1": s1,
            "s2": s2,
            "min_raw": int(xs.min()),
            "max_raw": int(xs.max()),
            "zc": int(cross[idx].sum()),
            "first_ts_us": int(ts[first_i]),
            "last_ts_us": int(ts[last_i]),
            "first_val": int(x[first_i]),
            "last_val": int(x[last_i]),
        }
        rec.update(
            _finalize(n, s1, s2, rec["min_raw"], rec["max_raw"], rec["zc"], UNIT.get(ch, 1.0))
        )
        rows.append(rec)
    out = pd.DataFrame(rows)
    return out.sort_values(["conv_id", "channel", "bucket_us"], kind="mergesort").reset_index(drop=True)


def all_tiers(df: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """Dedup → channels → every tier, direct from turns."""
    ch = derive_channels(dedup(df))
    return {t: tier_features(ch, t) for t in ("1m", "1h", "1d")}
