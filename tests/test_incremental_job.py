"""jobs/rollup.py --incremental: full run, append new files, incremental
refresh → tier outputs bit-identical to a full rerun over the grown input;
unaffected ranges untouched; non-append input rejected clearly."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from features_engineering_of_motion_data_spark.sources.transcripts import (
    read_transcripts,
)
from jobs.rollup import parse_args, run

TIERS = ["1m", "1h"]


def _run(args_list) -> int:
    return run(parse_args(args_list))


def _read_tiers(root: str) -> dict[str, pd.DataFrame]:
    out = {}
    for t in TIERS:
        df = pd.read_parquet(os.path.join(root, f"tier={t}"))
        df["s2"] = df["s2"].map(int)
        out[t] = df.sort_values(
            ["conv_id", "channel", "bucket_start"], kind="mergesort"
        ).reset_index(drop=True)
    return out


@pytest.fixture(scope="module")
def grown_input(spark, tiny_path, tmp_path_factory):
    """An input dir written in two file batches: 80% prefix turns, then the
    20% tail appended as NEW parquet files (append-only file history)."""
    d = str(tmp_path_factory.mktemp("grow_in"))
    turns = read_transcripts(spark, tiny_path)
    w = Window.partitionBy("conv_id")
    tagged = turns.withColumn(
        "_d", F.col("turn_idx") > (F.max("turn_idx").over(w) * 0.8).cast("int")
    )
    tagged.filter(~F.col("_d")).drop("_d").repartition(2).write.mode(
        "overwrite"
    ).parquet(d)
    delta = tagged.filter(F.col("_d")).drop("_d").cache()
    n_delta = delta.count()
    assert n_delta > 0
    return d, delta, n_delta


def _common(tiny_path):
    return ["--tiers", ",".join(TIERS), "--num-parts", "4", "--master", "local[4]"]


def test_incremental_refresh_equals_full_rerun(
    spark, tiny_path, grown_input, tmp_path_factory
):
    d, delta, n_delta = grown_input
    inc_out = str(tmp_path_factory.mktemp("inc_out"))
    full_out = str(tmp_path_factory.mktemp("full_out"))
    common = _common(tiny_path)

    # bootstrap: --incremental with no prior manifest = full run + manifest
    assert _run(["--input", d, "--output", inc_out, "--incremental"] + common) == 0
    assert os.path.exists(os.path.join(inc_out, "_input_manifest.json"))

    # re-run before any append: up to date, nothing rewritten
    assert _run(["--input", d, "--output", inc_out, "--incremental"] + common) == 0

    # append the tail as NEW files, then refresh incrementally
    delta.repartition(2).write.mode("append").parquet(d)
    assert _run(["--input", d, "--output", inc_out, "--incremental"] + common) == 0

    # reference: full run over the grown input
    assert _run(["--input", d, "--output", full_out] + common) == 0
    a, b = _read_tiers(inc_out), _read_tiers(full_out)
    for t in TIERS:
        pd.testing.assert_frame_equal(a[t], b[t], check_exact=True)

    # lineage: the refresh records exactly the delta rows against the new
    # snapshot, and flags itself incremental in the stage metadata it used
    recs = [json.loads(x) for x in open(os.path.join(inc_out, "_ckpt.jsonl"))]
    snaps = {r["snapshot_id"] for r in recs}
    assert len(snaps) == 2  # bootstrap snapshot + refreshed snapshot
    new_snap = json.load(open(os.path.join(inc_out, "_input_manifest.json")))[
        "snapshot_id"
    ]
    delta_recs = [r for r in recs if r["snapshot_id"] == new_snap]
    assert sum(r["rows_in"] for r in delta_recs) == n_delta
    assert all(r["points_out"]["1m"] > 0 for r in delta_recs)


def test_non_append_history_is_rejected(
    spark, tiny_path, grown_input, tmp_path_factory
):
    d, delta, _ = grown_input
    out = str(tmp_path_factory.mktemp("rej_out"))
    common = _common(tiny_path)
    assert _run(["--input", d, "--output", out, "--incremental"] + common) == 0

    # rewrite the input dir in place (same rows, different files) — history
    # is no longer an append of the recorded snapshot. Round-trip through
    # pandas: Spark refuses to overwrite a path its own plan reads.
    from features_engineering_of_motion_data_spark.sources.transcripts import (
        TRANSCRIPT_SCHEMA,
    )

    pdf = read_transcripts(spark, d).toPandas()
    spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA).repartition(3).write.mode(
        "overwrite"
    ).parquet(d)
    with pytest.raises(RuntimeError, match="not an append"):
        _run(["--input", d, "--output", out, "--incremental"] + common)
