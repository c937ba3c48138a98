"""Independent oracle for gap-fill + gap-filled features (DESIGN.md §6).

Pure pandas/numpy, structured differently from the engine kernel but
implementing the same pinned contract: ts linear in turn_idx (np.interp),
value linear in ts (np.interp), floor(ts) to int µs, features via
np.sum/np.sqrt on the turn-ordered bucket slices, no extrapolation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .features import TIER_US


def fill_channel_frame(channels: pd.DataFrame) -> pd.DataFrame:
    """Input: long channel frame (conv_id, channel, turn_idx, ts_us, x int).
    Output: same + interpolated rows, x float64, is_filled flag."""
    out = []
    for (conv, chan), g in channels.groupby(["conv_id", "channel"], sort=True):
        g = g.sort_values("turn_idx", kind="mergesort")
        ti = g["turn_idx"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.float64)
        full = np.arange(ti[0], ti[-1] + 1, dtype=np.int64)
        hole = ~np.isin(full, ti)
        ts_i = np.interp(full.astype(np.float64), ti.astype(np.float64), ts.astype(np.float64))
        x_i = np.interp(ts_i, ts.astype(np.float64), x)
        df = pd.DataFrame(
            {
                "conv_id": conv,
                "channel": chan,
                "turn_idx": full,
                "ts_us": np.where(hole, np.floor(ts_i).astype(np.int64),
                                  pd.Series(ts, index=ti).reindex(full).to_numpy(na_value=0).astype(np.int64)),
                "x": np.where(hole, x_i, pd.Series(x, index=ti).reindex(full).to_numpy()),
                "is_filled": hole,
            }
        )
        out.append(df)
    return pd.concat(out, ignore_index=True)


def filled_tier_features(filled: pd.DataFrame, tier: str) -> pd.DataFrame:
    """Features of the float series per (conv, channel, bucket), pinned ops."""
    step = TIER_US[tier]
    rows = []
    for (conv, chan), g in filled.groupby(["conv_id", "channel"], sort=True):
        g = g.sort_values("turn_idx", kind="mergesort")
        ts = g["ts_us"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.float64)
        fl = g["is_filled"].to_numpy(bool)
        b = (ts // step) * step
        sgn = np.where(x < 0.0, -1, 1)
        cross = np.zeros(len(x), dtype=np.int64)
        if len(x) > 1:
            cross[1:] = ((b[1:] == b[:-1]) & (sgn[1:] * sgn[:-1] < 0)).astype(np.int64)
        for bv in np.unique(b):
            sel = b == bv
            xs = x[sel]
            n = int(sel.sum())
            s1 = np.sum(xs)
            s2 = np.sum(xs * xs)
            m = s1 / n
            q = s2 / n
            var = q - m * m
            if var < 0.0:
                var = 0.0
            rows.append(
                {
                    "conv_id": conv,
                    "channel": chan,
                    "tier": tier,
                    "bucket_us": int(bv),
                    "n": n,
                    "n_filled": int(fl[sel].sum()),
                    "f_mean": m,
                    "f_std": np.sqrt(var),
                    "f_rms": np.sqrt(q),
                    "f_min": float(np.min(xs)),
                    "f_max": float(np.max(xs)),
                    "f_zero_crossings": int(cross[sel].sum()),
                    "f_energy": s2,
                }
            )
    return pd.DataFrame(rows)
