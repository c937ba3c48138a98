"""Transcript scan + snapshot pinning (SURVEY.md §2.1 S1/S2).

At 10^12-turn scale the table is Iceberg and ``snapshot_id`` maps to Iceberg's
``snapshot-id`` read option / ``VERSION AS OF``; this sandbox has no Iceberg
runtime jars, so the facade below reads Parquet and derives a deterministic
"snapshot id" from a manifest hash of the input files (path, size, mtime).
The facade is deliberately two functions deep so the production swap is
mechanical (SURVEY.md §7 hard-part 4).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def snapshot_manifest(path: str) -> list[str]:
    """File-level manifest of a local parquet path: sorted
    ``relpath:size:mtime`` entries. The sandbox stand-in for an Iceberg
    snapshot's data-file list; :func:`read_transcripts_delta` diffs two of
    these the way Iceberg's incremental scan diffs two snapshots."""
    entries = []
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    entries.append(f"{os.path.relpath(p, path)}:{st.st_size}:{int(st.st_mtime)}")
    else:
        st = os.stat(path)
        entries.append(f"{os.path.basename(path)}:{st.st_size}:{int(st.st_mtime)}")
    return sorted(entries)


def resolve_snapshot(path: str) -> str:
    """Deterministic snapshot id for a local parquet path (file or dir).

    Production: return Iceberg's current snapshot-id instead; everything
    downstream (checkpoint lineage, resume guard) treats it as an opaque str.
    """
    h = hashlib.sha256("\n".join(snapshot_manifest(path)).encode()).hexdigest()
    return h[:16]


def read_transcripts_delta(
    spark: SparkSession, path: str, prior_entries: list[str]
) -> DataFrame:
    """Incremental scan: only the data files added since ``prior_entries``
    (a :func:`snapshot_manifest` from the previously processed snapshot) —
    the Iceberg ``incremental read between snapshots`` analogue.

    Raises if any prior file was modified or removed (the table history is
    not append-only between the two snapshots; callers must fall back to a
    full recompute — same failure mode as an Iceberg overwrite/rewrite
    snapshot in an incremental-append reader).
    """
    current = snapshot_manifest(path)
    missing = sorted(set(prior_entries) - set(current))
    if missing:
        raise RuntimeError(
            f"input {path} is not an append of the prior snapshot: "
            f"{len(missing)} file(s) changed or vanished, e.g. {missing[:3]}; "
            "run a full (non-incremental) rollup"
        )
    prior_set = set(prior_entries)
    new_files = [
        os.path.join(path, e.rsplit(":", 2)[0]) if os.path.isdir(path) else path
        for e in current
        if e not in prior_set
    ]
    if not new_files:
        return spark.createDataFrame([], TRANSCRIPT_SCHEMA)
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(*new_files)


def read_transcripts(
    spark: SparkSession,
    path: str,
    snapshot_id: str | None = None,
    ts_range: tuple | None = None,
) -> DataFrame:
    """Scan the transcripts table with an optional pinned snapshot.

    ``ts_range=(lo, hi)`` pushes a time predicate down to the parquet scan
    (Catalyst → PushedFilters; verified in tests/test_plans.py).
    """
    if snapshot_id is not None:
        current = resolve_snapshot(path)
        if current != snapshot_id:
            raise RuntimeError(
                f"snapshot mismatch: manifest has {snapshot_id}, input is {current} "
                "(resume must never mix snapshots; SURVEY.md §3 E3)"
            )
    df = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)
    if ts_range is not None:
        lo, hi = ts_range
        df = df.filter(F.col("ts").between(F.lit(lo), F.lit(hi)))
    return df
