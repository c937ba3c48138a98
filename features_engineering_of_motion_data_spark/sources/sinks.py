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

# columns whose per-file min/max land in the snapshot manifest (the Iceberg
# data-skipping analogue: writers record column bounds per data file so point
# lookups and time-range scans prune to the files that can match, before the
# engine ever opens a footer). conv_id bounds are effective because the
# rollup job lays files out via repartitionByRange(conv_id, …) — each file
# within a bucket_date partition covers a narrow conv range.
_STAT_COLS = ("conv_id", "bucket_start")


def _ts_us(v) -> int:
    """datetime → µs since epoch, exact integer math (UTC, tz-naive or aware)."""
    import calendar

    return calendar.timegm(v.utctimetuple()) * 1_000_000 + v.microsecond


def _stat_value(v):
    if isinstance(v, bytes):
        v = v.decode("utf-8", errors="replace")
    if isinstance(v, datetime.datetime):
        return _ts_us(v)
    return v


def _file_stats(fp: str) -> dict:
    """Per-file row count + min/max bounds for _STAT_COLS, read once from the
    parquet footer at commit time (at deployment the writer task reports these,
    as Iceberg's writers do; reading the footer driver-side is the local
    facade's equivalent — O(files touched by this commit), no data scan)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(fp).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict = {"rows": md.num_rows}
    for col in _STAT_COLS:
        if col not in idx:
            continue
        mins: list | None = []
        maxs: list = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            if st is None or not st.has_min_max:
                mins = None
                break
            mins.append(_stat_value(st.min))
            maxs.append(_stat_value(st.max))
        if mins:
            out[col] = [min(mins), max(maxs)]
    return out


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
    table_schema: str | None = None,
) -> str:
    """Atomically write the next snapshot manifest; returns its snapshot id.

    ``expired`` records ``bucket_date`` partitions whose data files this
    commit physically deleted, so AS-OF reads of *earlier* snapshots can fail
    with a clear "expired" error instead of a mid-scan path-not-found."""
    seq = len(_snapshot_paths(path))
    snaps = list_snapshots(path)
    prior_stats = snaps[-1].get("file_stats", {}) if snaps else {}
    listing = []
    file_stats: dict[str, dict] = {}
    for d, commits in sorted(partitions.items()):
        for c in commits:
            pdir = os.path.join(path, f"commit={c}", f"bucket_date={d}")
            for fn in sorted(os.listdir(pdir)):
                if fn.endswith(".parquet"):
                    fp = os.path.join(pdir, fn)
                    rel = f"commit={c}/bucket_date={d}/{fn}"
                    listing.append(f"{rel}:{os.stat(fp).st_size}")
                    # data files are immutable: stats carry over from the
                    # parent snapshot; only this commit's new files get a
                    # footer read
                    file_stats[rel] = prior_stats.get(rel) or _file_stats(fp)
    snap_id = hashlib.sha256("\n".join(listing).encode()).hexdigest()[:16]
    if table_schema is None and snaps:
        # metadata-only commits (compact, expire) carry the schema forward
        table_schema = snaps[-1].get("table_schema")
    manifest = {
        "seq": seq,
        "snapshot_id": snap_id,
        "parent_id": parent,
        "partitions": partitions,
        "expired_partitions": sorted(expired or []),
        "file_stats": file_stats,
        "table_schema": table_schema,
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

    Schema evolution is Iceberg-style: each commit records the writing
    frame's schema in its manifest, and :func:`read_tier` reads with the
    resolved snapshot's schema — files written before a column was added
    yield NULL for it (parquet schema-on-read clipping), and time travel to
    a pre-evolution snapshot reads the old shape.  No ``mergeSchema`` footer
    sweep — at 10¹²-turn scale the schema lives in metadata, not in an
    all-files footer merge.
    """
    parent = _resolve_manifest(path, None)
    seq = parent["seq"] + 1 if parent else 0
    dest = os.path.join(path, f"commit={seq}")
    full = df.withColumn("bucket_date", F.to_date("bucket_start"))
    full.write.mode("overwrite").partitionBy("bucket_date").parquet(dest)
    written = sorted(
        n.split("=", 1)[1] for n in os.listdir(dest) if n.startswith("bucket_date=")
    )
    partitions: dict[str, list[int]] = dict(parent["partitions"]) if parent else {}
    for d in written:
        if mode == "append" and d in partitions:
            partitions[d] = partitions[d] + [seq]
        else:
            partitions[d] = [seq]
    return _commit(
        path,
        partitions,
        parent["snapshot_id"] if parent else None,
        table_schema=full.schema.json(),
    )


def _norm_bound(v):
    if isinstance(v, str):
        v = datetime.datetime.fromisoformat(v)
    if isinstance(v, datetime.datetime):
        return _ts_us(v)
    return v


def read_tier(
    spark: SparkSession,
    path: str,
    snapshot_id: str | None = None,
    conv_id: str | tuple | None = None,
    bucket_range: tuple | None = None,
) -> DataFrame:
    """Read the tier table, current or AS OF a prior ``snapshot_id``.

    ``conv_id`` (a point value or an inclusive ``(lo, hi)`` range) and
    ``bucket_range`` (inclusive ``(lo, hi)`` on ``bucket_start``; datetimes
    or ISO strings, either end ``None`` for open) use the manifest's
    per-file column bounds to PRUNE the file list before Spark plans the
    scan — the Iceberg data-skipping path.  At 10¹²-turn scale this is what
    makes "show me this conversation's history" O(days × ~1 file) instead
    of O(all files): the rollup job's repartitionByRange(conv_id) layout
    means each file covers a narrow conv range, so the bounds are tight.
    The matching predicate is ALWAYS applied to the rows as well (pruning
    is a superset guarantee — files without stats are kept), so results
    equal a full scan + filter, bit for bit.
    """
    manifest = _resolve_manifest(path, snapshot_id)
    if manifest is None:
        # pre-lineage layout (plain partitioned parquet dir)
        df = spark.read.parquet(path)
        return _apply_read_filters(df, conv_id, bucket_range)
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
    sources = dirs
    stats = manifest.get("file_stats") or {}
    bounds = {}
    if conv_id is not None:
        bounds["conv_id"] = (
            conv_id if isinstance(conv_id, tuple) else (conv_id, conv_id)
        )
    if bucket_range is not None:
        bounds["bucket_start"] = (
            _norm_bound(bucket_range[0]),
            _norm_bound(bucket_range[1]),
        )
    if bounds and stats:
        kept = []
        for d in dirs:
            prefix = os.path.relpath(d, path)
            for fn in sorted(os.listdir(d)):
                if not fn.endswith(".parquet"):
                    continue
                st = stats.get(f"{prefix}/{fn}")
                keep = True
                for col, (lo, hi) in bounds.items():
                    mnmx = (st or {}).get(col)
                    if mnmx is None:
                        continue  # no bounds recorded → cannot prune
                    if (hi is not None and mnmx[0] > hi) or (
                        lo is not None and mnmx[1] < lo
                    ):
                        keep = False
                        break
                if keep:
                    kept.append(os.path.join(d, fn))
        sources = kept
    reader = spark.read.option("basePath", path)
    schema_json = manifest.get("table_schema")
    if schema_json:
        # Iceberg-style schema evolution: the snapshot's recorded schema is
        # the read schema; files predating an added column yield NULL for it
        # (parquet schema-on-read), with no mergeSchema footer sweep
        from pyspark.sql.types import StructType

        reader = reader.schema(StructType.fromJson(json.loads(schema_json)))
    if not sources:
        # every file pruned: empty frame with the table schema (cheap — one
        # footer read off the first live file)
        first_dir = dirs[0]
        first_file = next(
            os.path.join(first_dir, f)
            for f in sorted(os.listdir(first_dir))
            if f.endswith(".parquet")
        )
        df = reader.parquet(first_file).drop("commit").filter(F.lit(False))
    else:
        df = reader.parquet(*sources).drop("commit")
    return _apply_read_filters(df, conv_id, bucket_range)


def _apply_read_filters(
    df: DataFrame, conv_id: str | tuple | None, bucket_range: tuple | None
) -> DataFrame:
    if conv_id is not None:
        if isinstance(conv_id, tuple):
            lo, hi = conv_id
            if lo is not None:
                df = df.filter(F.col("conv_id") >= lo)
            if hi is not None:
                df = df.filter(F.col("conv_id") <= hi)
        else:
            df = df.filter(F.col("conv_id") == conv_id)
    if bucket_range is not None:
        lo, hi = (
            datetime.datetime.fromisoformat(v) if isinstance(v, str) else v
            for v in bucket_range
        )
        if lo is not None:
            df = df.filter(F.col("bucket_start") >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col("bucket_start") <= F.lit(hi))
    return df


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
    # sort by conv_id within each rewritten partition: when
    # max_records_per_file splits a partition into several files, each file
    # then covers a DISJOINT conv_id range, so the manifest's file-level
    # bounds (data skipping) stay as selective after compaction as the
    # original range-clustered layout (Iceberg analogue: a sort order on the
    # rewrite spec)
    writer = (
        df.repartition("bucket_date")
        .sortWithinPartitions("bucket_date", "conv_id", "channel", "bucket_start")
        .write.mode("overwrite")
        .partitionBy("bucket_date")
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


def apply_retention(
    spark: SparkSession,
    root: str,
    policy: dict[str, int | None],
    now: datetime.date | datetime.datetime | str,
    compact_small_files: bool = False,
) -> dict[str, dict]:
    """Cascading per-tier retention policy (TimescaleDB
    ``add_retention_policy`` / InfluxDB retention-period face, applied
    explicitly — a batch engine has no daemon; a production scheduler calls
    this at its cadence).

    ``policy`` maps tier name → days to keep (``None`` = keep forever), with
    tier tables laid out as ``<root>/tier=<T>`` — the layout
    ``jobs/rollup.py`` writes.  The canonical cascade keeps raw short and
    each coarser tier longer (e.g. ``{"1m": 7, "1h": 90, "1d": None}``):
    the data a tier expires remains SUMMARIZED in every coarser tier, which
    is the whole point of the rollup cascade.

    ``now`` is an explicit argument, not a wall-clock read — retention is
    deterministic, replayable and testable.  With ``compact_small_files``
    the surviving partitions of each touched tier are also compacted
    (:func:`compact`) in the same pass.

    Returns per-tier ``{"dropped_partitions": n, "compacted_snapshot": id}``.
    """
    if isinstance(now, str):
        now = datetime.date.fromisoformat(now)
    if isinstance(now, datetime.datetime):
        now = now.date()
    results: dict[str, dict] = {}
    for tier, keep_days in policy.items():
        p = os.path.join(root, f"tier={tier}")
        out = {"dropped_partitions": 0, "compacted_snapshot": None}
        if os.path.isdir(p):
            if keep_days is not None:
                cutoff = now - datetime.timedelta(days=int(keep_days))
                out["dropped_partitions"] = expire(spark, p, cutoff)
            if compact_small_files:
                out["compacted_snapshot"] = compact(spark, p)
        results[tier] = out
    return results


def register_tier_views(
    spark: SparkSession,
    root: str,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    snapshot_ids: dict[str, str] | None = None,
) -> list[str]:
    """SQL face of the tier tables: one temp view per tier
    (``tier_1m`` …) over :func:`read_tier`'s snapshot-resolved frame, so
    downstream users query the engine's output with plain ``spark.sql`` —
    Catalyst sees the same plan the DataFrame read produces (scan of the
    resolved snapshot's files; filters/pruning push down through the view).

    ``snapshot_ids`` optionally pins individual tiers AS OF a snapshot —
    SQL-visible time travel.  Returns the created view names; tiers whose
    table does not exist under ``<root>/tier=<T>`` are skipped.
    """
    created = []
    for tier in tiers:
        p = os.path.join(root, f"tier={tier}")
        if not os.path.isdir(p):
            continue
        snap = (snapshot_ids or {}).get(tier)
        name = f"tier_{tier}"
        read_tier(spark, p, snapshot_id=snap).createOrReplaceTempView(name)
        created.append(name)
    return created
