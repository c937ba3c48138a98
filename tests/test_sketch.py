"""q60 percentile sketch: tier mergeability (the property that makes a log
histogram a continuous-aggregate percentile story) and estimator sanity."""

from __future__ import annotations

import numpy as np
import pandas as pd

from features_engineering_of_motion_data_spark.queries.signal import (
    q60_percentile_sketch_1h,
)

DAY_US = 86_400_000_000


def test_sketch_merges_to_1d_and_estimator_brackets_p50(spark, sf_dir):
    sk = q60_percentile_sketch_1h(spark, sf_dir).toPandas()

    # --- mergeability: 1d sketch == Σ of its 1h sketches (pure count adds)
    merged = (
        sk.assign(day_us=sk["bucket_us"] - sk["bucket_us"] % DAY_US)
        .groupby(["conv_id", "day_us", "log2_bucket"], as_index=False)["cnt"]
        .sum()
    )

    src = pd.read_parquet(f"{sf_dir}/events.parquet")
    src["c"] = np.round(src["value"] * 100, 0).astype("int64")
    ts_us = src["ts"].astype("datetime64[us]").astype("int64")
    src["day_us"] = ts_us - ts_us % DAY_US
    # exact integer bucket: bit length − 1 (independent of the engines' path)
    src["log2_bucket"] = [
        -1 if v == 0 else int(v).bit_length() - 1 for v in src["c"].abs()
    ]
    direct = (
        src.groupby(["user_id", "day_us", "log2_bucket"], as_index=False)
        .size()
        .rename(columns={"user_id": "conv_id", "size": "cnt"})
    )
    key = ["conv_id", "day_us", "log2_bucket"]
    m = merged.sort_values(key).reset_index(drop=True)
    d = direct.sort_values(key).reset_index(drop=True)
    assert len(m) == len(d)
    assert (m[key].to_numpy() == d[key].to_numpy()).all()
    assert (m["cnt"].to_numpy() == d["cnt"].to_numpy()).all()

    # --- estimator: p50_est brackets the RANK median (smallest element with
    # rank·2 ≥ n — what the cumulative-count pick estimates) within its
    # guaranteed [0.75, 1.5) relative band
    for (conv, bucket), g in src.assign(
        bucket_us=ts_us - ts_us % 3_600_000_000
    ).groupby(["user_id", "bucket_us"]):
        row = sk[(sk.conv_id == conv) & (sk.bucket_us == bucket)]
        assert not row.empty
        est = row["p50_est"].iloc[0]
        vals = np.sort(np.abs(g["c"].to_numpy()))
        rank_med = float(vals[(len(vals) - 1) // 2])
        if rank_med > 0:
            ratio = est / rank_med
            assert 0.75 < ratio <= 1.5, (conv, bucket, est, rank_med)


# --- q56 interval-union algebra, property-tested against brute force ---------


def _coverage_brute(ts: list[int], lifetime: int, bucket: int, span: int) -> int:
    """Covered µs in [bucket, bucket+span): brute-force boolean union."""
    import numpy as np

    marks = np.zeros(span, dtype=bool)
    for t in ts:
        lo, hi = max(t - bucket, 0), min(t - bucket + lifetime, span)
        if hi > lo:
            marks[lo:hi] = True
    return int(marks.sum())


def test_q56_window_algebra_equals_brute_union():
    """The running-max contribution formula (novel part = max(0, end −
    max(ts, reach))) equals the brute-force union for adversarial layouts:
    nested intervals, duplicates, exact abutment, bucket-edge clipping."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    SPAN = 1000

    @settings(max_examples=200, deadline=None)
    @given(
        ts=st.lists(st.integers(0, SPAN - 1), min_size=1, max_size=30),
        lifetime=st.integers(1, 400),
    )
    def run(ts, lifetime):
        ts = sorted(ts)
        # the q56 algebra, scalar transcription
        reach = None
        covered = 0
        for t in ts:
            end = min(t + lifetime, SPAN)
            start = max(t, reach) if reach is not None else t
            covered += max(0, end - start)
            reach = end if reach is None else max(reach, end)
        assert covered == _coverage_brute(ts, lifetime, 0, SPAN)

    run()


# --- q61 semantics vs an independent numeric-integration oracle ---------------


def test_q61_semantics_vs_numeric_integration(spark, sf_dir):
    """Cross-engine bitwise agreement (driver contract) cannot catch a bug
    both sides share; this gates the MEANING: per bucket, q61 equals the
    piecewise-linear integral of the series over the bucket span divided by
    the bucket width, computed here by independent np.interp evaluation."""
    import numpy as np
    import pandas as pd

    from features_engineering_of_motion_data_spark.queries.signal import (
        q61_interpolated_twa_1h,
    )

    H = 3_600_000_000
    got = (
        q61_interpolated_twa_1h(spark, sf_dir)
        .toPandas()
        .set_index(["conv_id", "bucket_us"])["itwa_cents"]
        .sort_index()
    )

    src = pd.read_parquet(f"{sf_dir}/events.parquet")
    src["ts_us"] = src["ts"].astype("datetime64[us]").astype("int64")
    src["c"] = np.round(src["value"] * 100, 0).astype("int64")
    want = {}
    for uid, g in src.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        t = g["ts_us"].to_numpy("int64")
        c = g["c"].to_numpy("float64")
        rel = (t - t[0]).astype("float64")
        for b in range((t[0] // H) * H, (t[-1] // H) * H + H, H):
            lo, hi = max(b, t[0]), min(b + H, t[-1])
            if hi <= lo:
                continue
            # exact piecewise-linear integral: trapezoid over the knots
            # (samples + clipped edges) inside [lo, hi]
            knots = np.unique(
                np.concatenate(
                    [[lo, hi], t[(t > lo) & (t < hi)]]
                )
            ).astype("int64")
            vals = np.interp((knots - t[0]).astype("float64"), rel, c)
            integral = np.sum((vals[1:] + vals[:-1]) * np.diff(knots) / 2.0)
            want[(uid, b)] = integral / H
    want = pd.Series(want).sort_index()
    assert set(got.index) == set(want.index)
    np.testing.assert_allclose(
        got.to_numpy(), want.reindex(got.index).to_numpy(), rtol=1e-9
    )
