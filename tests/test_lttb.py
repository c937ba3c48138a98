"""LTTB downsample (q57): exact selection equality vs the independent scalar
oracle, structural invariants, and partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from features_engineering_of_motion_data_spark.kernels.lttb import lttb_select
from features_engineering_of_motion_data_spark.queries.signal import (
    q57_lttb_downsample,
)
from oracle.lttb import lttb_indices


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(3, 400),
    k=st.integers(3, 60),
    seed=st.integers(0, 2**31),
)
def test_kernel_matches_scalar_oracle(n, k, seed):
    rng = np.random.default_rng(seed)
    t = np.cumsum(rng.integers(1, 10**7, n)).astype(np.int64) + 1_700_000_000_000_000
    y = rng.integers(-(10**8), 10**8, n).astype(np.int64)
    got = lttb_select(t, y, k)
    want = np.asarray(lttb_indices(t, y, k), dtype=np.int64)
    assert np.array_equal(got, want)
    # structural invariants
    m = min(n, k)
    assert len(got) == m
    assert got[0] == 0 and got[-1] == n - 1
    assert (np.diff(got) > 0).all()


def test_kernel_edge_cases():
    t = np.array([0, 1, 2], dtype=np.int64)
    y = np.array([5, -3, 9], dtype=np.int64)
    assert np.array_equal(lttb_select(t, y, 3), [0, 1, 2])
    assert np.array_equal(lttb_select(t, y, 10), [0, 1, 2])  # n <= threshold
    with pytest.raises(ValueError):
        lttb_select(np.arange(10, dtype=np.int64), np.arange(10), 2)


def test_query_matches_oracle_and_is_partition_invariant(spark, sf_dir):
    got = q57_lttb_downsample(spark, sf_dir, threshold=20).toPandas()
    got = got.sort_values(["conv_id", "ts_us", "event_id"]).reset_index(drop=True)

    # independent expectation: oracle over the same pinned projection
    src = pd.read_parquet(f"{sf_dir}/events.parquet")
    src["ts_us"] = src["ts"].astype("datetime64[us]").astype("int64")
    src["c"] = np.round(src["value"] * 100, 0).astype("int64")
    rows = []
    for uid, g in src.groupby("user_id", sort=True):
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        idx = lttb_indices(
            g["ts_us"].to_numpy("int64"), g["c"].to_numpy("int64"), 20
        )
        sel = g.iloc[idx]
        rows.append(
            pd.DataFrame(
                {
                    "conv_id": uid,
                    "event_id": sel["event_id"].to_numpy(),
                    "ts_us": sel["ts_us"].to_numpy(),
                    "c": sel["c"].to_numpy(),
                }
            )
        )
    want = (
        pd.concat(rows, ignore_index=True)
        .sort_values(["conv_id", "ts_us", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True)

    # selection is invariant to input partitioning: the same grouped kernel
    # over an adversarially repartitioned input picks identical rows
    from features_engineering_of_motion_data_spark.queries.events import _base

    def _apply(pdf):
        pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
        idx = lttb_select(
            pdf["ts_us"].to_numpy("int64"), pdf["c"].to_numpy("int64"), 20
        )
        out = pdf.iloc[idx][["user_id", "event_id", "ts_us", "c"]]
        return out.rename(columns={"user_id": "conv_id"})

    again = (
        _base(spark, sf_dir)
        .select("user_id", "event_id", "ts_us", "c")
        .repartition(7)
        .groupBy("user_id")
        .applyInPandas(_apply, q57_lttb_downsample(spark, sf_dir).schema)
        .toPandas()
        .sort_values(["conv_id", "ts_us", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again, check_exact=True)
