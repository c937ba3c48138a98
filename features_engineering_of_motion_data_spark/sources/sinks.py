"""Tier-table sink (SURVEY.md §2.1 S3) with write-side snapshot lineage.

Tier tables are partitioned by ``bucket_date`` (day of ``bucket_start``) so
retention (R4) and resume are partition drops / dynamic overwrites.  Each
:func:`write_tier` is a COMMIT in the Iceberg sense: data files land in an
immutable ``commit=<seq>/`` directory and a JSON snapshot manifest under
``_snapshots/`` records which commit owns each ``bucket_date`` partition.
Historical data files are retained, so :func:`read_tier` can read the table
AS OF any prior snapshot id — the write-side half of the lineage story that
pairs with ``sources/transcripts.resolve_snapshot`` on the read side.  On an
Iceberg deployment ``write_tier`` becomes ``overwritePartitions()`` and
``read_tier(snapshot_id=...)`` becomes ``VERSION AS OF``; the facade keeps
the call sites mechanical to swap (same design rule as transcripts.py).

Layout::

    <path>/commit=<seq>/bucket_date=<d>/*.parquet   immutable data files
    <path>/_snapshots/v<seq>.json                   snapshot manifests

Both pandas/pyarrow and Spark ignore ``_``-prefixed entries, and the
``commit=<seq>`` segment is key=value so raw directory readers still infer
partitions; ``read_tier`` is the correct reader once a partition has been
overwritten (raw reads would see every commit's files — exactly as raw
reads of an Iceberg data dir would).  Single-driver commit protocol: the
manifest write is the atomic commit point (os.replace), matching the
engine's one-driver batch model (jobs/rollup.py).
"""

from __future__ import annotations

import datetime
import hashlib
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SNAP_DIR = "_snapshots"


def _snapshot_paths(path: str) -> list[str]:
    d = os.path.join(path, _SNAP_DIR)
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.startswith("v") and f.endswith(".json")
    )


def list_snapshots(path: str) -> list[dict]:
    """All committed snapshots, oldest first."""
    out = []
    for p in _snapshot_paths(path):
        with open(p, encoding="utf-8") as f:
            out.append(json.load(f))
    return out


def _resolve_manifest(path: str, snapshot_id: str | None) -> dict | None:
    snaps = list_snapshots(path)
    if not snaps:
        return None
    if snapshot_id is None:
        return snaps[-1]
    for s in snaps:
        if s["snapshot_id"] == snapshot_id:
            return s
    raise RuntimeError(
        f"tier table {path} has no snapshot {snapshot_id!r}; "
        f"known: {[s['snapshot_id'] for s in snaps]}"
    )


def _commit(
    path: str,
    partitions: dict[str, list[int]],
    parent: str | None,
    expired: list[str] | None = None,
) -> str:
    """Atomically write the next snapshot manifest; returns its snapshot id.

    ``expired`` records ``bucket_date`` partitions whose data files this
    commit physically deleted, so AS-OF reads of *earlier* snapshots can fail
    with a clear "expired" error instead of a mid-scan path-not-found."""
    seq = len(_snapshot_paths(path))
    listing = []
    for d, commits in sorted(partitions.items()):
        for c in commits:
            pdir = os.path.join(path, f"commit={c}", f"bucket_date={d}")
            for fn in sorted(os.listdir(pdir)):
                if fn.endswith(".parquet"):
                    st = os.stat(os.path.join(pdir, fn))
                    listing.append(f"commit={c}/bucket_date={d}/{fn}:{st.st_size}")
    snap_id = hashlib.sha256("\n".join(listing).encode()).hexdigest()[:16]
    manifest = {
        "seq": seq,
        "snapshot_id": snap_id,
        "parent_id": parent,
        "partitions": partitions,
        "expired_partitions": sorted(expired or []),
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    os.makedirs(os.path.join(path, _SNAP_DIR), exist_ok=True)
    tmp = os.path.join(path, _SNAP_DIR, f".v{seq:05d}.json.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, os.path.join(path, _SNAP_DIR, f"v{seq:05d}.json"))
    return snap_id


def write_tier(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """Commit a tier-table write; returns the new snapshot id.

    ``mode="overwrite"`` replaces exactly the ``bucket_date`` partitions
    present in ``df`` (dynamic-partition-overwrite semantics, expressed as a
    manifest swap — the replaced commits' files stay on disk for time
    travel).  ``mode="append"`` adds this commit's files alongside them.
    """
    parent = _resolve_manifest(path, None)
    seq = parent["seq"] + 1 if parent else 0
    dest = os.path.join(path, f"commit={seq}")
    (
        df.withColumn("bucket_date", F.to_date("bucket_start"))
        .write.mode("overwrite")
        .partitionBy("bucket_date")
        .parquet(dest)
    )
    written = sorted(
        n.split("=", 1)[1] for n in os.listdir(dest) if n.startswith("bucket_date=")
    )
    partitions: dict[str, list[int]] = dict(parent["partitions"]) if parent else {}
    for d in written:
        if mode == "append" and d in partitions:
            partitions[d] = partitions[d] + [seq]
        else:
            partitions[d] = [seq]
    return _commit(path, partitions, parent["snapshot_id"] if parent else None)


def read_tier(
    spark: SparkSession, path: str, snapshot_id: str | None = None
) -> DataFrame:
    """Read the tier table, current or AS OF a prior ``snapshot_id``."""
    manifest = _resolve_manifest(path, snapshot_id)
    if manifest is None:
        # pre-lineage layout (plain partitioned parquet dir)
        return spark.read.parquet(path)
    # retention may have physically deleted partitions this snapshot
    # references: any LATER snapshot's expired_partitions list makes an
    # AS-OF read of those days unservable — fail clearly, up front
    gone = {
        d
        for s in list_snapshots(path)
        if s["seq"] > manifest["seq"]
        for d in s.get("expired_partitions", [])
    } & set(manifest["partitions"])
    if gone:
        raise RuntimeError(
            f"snapshot {manifest['snapshot_id']} of {path} references "
            f"partitions expired by a later retention commit: {sorted(gone)}; "
            "time travel past a retention boundary is not possible"
        )
    dirs = [
        os.path.join(path, f"commit={c}", f"bucket_date={d}")
        for d, commits in sorted(manifest["partitions"].items())
        for c in commits
    ]
    if not dirs:
        raise RuntimeError(f"snapshot {manifest['snapshot_id']} of {path} is empty")
    missing = [d for d in dirs if not os.path.isdir(d)]
    if missing:
        raise RuntimeError(
            f"snapshot {manifest['snapshot_id']} of {path} references "
            f"missing data dirs (corrupt table?): {missing[:3]}"
        )
    return spark.read.option("basePath", path).parquet(*dirs).drop("commit")


def compact(
    spark: SparkSession,
    path: str,
    max_records_per_file: int | None = None,
) -> str | None:
    """Small-file compaction (Iceberg ``rewrite_data_files`` analogue).

    Incremental refresh runs append-mode commits, so at deployment cadence a
    hot ``bucket_date`` partition accumulates one small file per refresh —
    the classic small-file problem that degrades scan parallelism and
    planning at 10¹²-turn scale.  ``compact`` rewrites every partition whose
    live data is fragmented (owned by >1 commit, or >1 file within its one
    commit) into a fresh single-commit layout and commits a snapshot pointing
    those partitions at the rewrite.  Readers see a pure metadata swap: the
    row set is unchanged (bit-for-bit — no column is touched), and prior
    snapshots still time-travel to the original files, which stay on disk
    until :func:`expire` removes their partitions.

    Scale shape: ONE Spark job — the fragmented partitions are read with
    partition pruning, shuffled once by ``bucket_date`` (so each output
    partition is written by one task), and written back with
    ``partitionBy``; there is no per-partition driver loop.  File sizing
    within a partition delegates to ``max_records_per_file`` (the
    row-granularity stand-in for Iceberg's byte-based bin-packing target).

    Returns the new snapshot id, or ``None`` when nothing is fragmented.
    """
    manifest = _resolve_manifest(path, None)
    if manifest is None:
        return None  # pre-lineage layout: nothing to commit against

    def _files(d: str, commits: list[int]) -> list[str]:
        out = []
        for c in commits:
            pdir = os.path.join(path, f"commit={c}", f"bucket_date={d}")
            if os.path.isdir(pdir):
                out += [
                    os.path.join(pdir, f)
                    for f in os.listdir(pdir)
                    if f.endswith(".parquet")
                ]
        return out

    frag = {
        d: commits
        for d, commits in manifest["partitions"].items()
        if len(commits) > 1 or len(_files(d, commits)) > 1
    }
    if not frag:
        return None

    seq = manifest["seq"] + 1
    dest = os.path.join(path, f"commit={seq}")
    dirs = [
        os.path.join(path, f"commit={c}", f"bucket_date={d}")
        for d, commits in sorted(frag.items())
        for c in commits
    ]
    df = spark.read.option("basePath", path).parquet(*dirs).drop("commit")
    writer = df.repartition("bucket_date").write.mode("overwrite").partitionBy(
        "bucket_date"
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(dest)

    partitions = {
        d: ([seq] if d in frag else commits)
        for d, commits in manifest["partitions"].items()
    }
    return _commit(path, partitions, manifest["snapshot_id"])


def expire(spark, path: str, older_than) -> int:
    """Retention enforcement (R4): drop partitions older than a cutoff.

    Commits a new snapshot without the expired partitions AND physically
    deletes their data files from every commit (Iceberg analogue: DELETE on
    a partition-aligned predicate + expire_snapshots/vacuum).  Time travel
    to snapshots that referenced the expired days is intentionally lost —
    retention means the data is gone.  Returns the number of distinct
    ``bucket_date`` partitions dropped.  Falls back to raw ``bucket_date=``
    dir deletion for pre-lineage layouts.
    """
    if isinstance(older_than, str):
        older_than = datetime.date.fromisoformat(older_than)
    elif isinstance(older_than, datetime.datetime):
        older_than = older_than.date()
    if not os.path.isdir(path):
        return 0

    manifest = _resolve_manifest(path, None)
    if manifest is None:
        dropped = 0
        for name in os.listdir(path):
            if not name.startswith("bucket_date="):
                continue
            d = datetime.date.fromisoformat(name.split("=", 1)[1])
            if d < older_than:
                shutil.rmtree(os.path.join(path, name))
                dropped += 1
        return dropped

    keep: dict[str, list[int]] = {}
    expired: list[str] = []
    for d, commits in manifest["partitions"].items():
        if datetime.date.fromisoformat(d) < older_than:
            expired.append(d)
        else:
            keep[d] = commits
    if not expired:
        return 0
    for name in os.listdir(path):
        if not name.startswith("commit="):
            continue
        for d in expired:
            pdir = os.path.join(path, name, f"bucket_date={d}")
            if os.path.isdir(pdir):
                shutil.rmtree(pdir)
    _commit(path, keep, manifest["snapshot_id"], expired=expired)
    return len(expired)
